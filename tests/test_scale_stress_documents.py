"""16x scale-stress for the DOCUMENTS family (round-7 qz wave): replicate
every document 16x with shifted ids and IDENTICAL text/source/lang, then
pin the corpus-statistics operators two ways:

  * full DuckDB-oracle hash equality on the scaled parquet for PSI drift
    (qz02), content-defined chunk dedup (qz03), the filter waterfall
    (qz05), the jackknife (qz07 — fold hashes re-derive on the new ids)
    and the Hill estimator (qz09);
  * algebraic replication invariants the oracle equality cannot express:
    chunk boundaries are a pure function of text, so 16x replication
    leaves the DISTINCT chunk set untouched while every multiplicity
    scales — per source, n_distinct is unchanged, n_chunks and
    total_tokens scale exactly 16x, and dup_tokens lands exactly at
    15*total_old + dup_old (every once-unique chunk now dedups 15
    copies); the waterfall rules are per-document content functions, so
    every qz05 counter scales exactly 16x.

Source is sf0.001 (the chunker's oracle re-shingles the corpus in
DuckDB; 16x of sf0.001 keeps that under a few seconds per query while
still exercising 10x-larger groups and out-of-generator id ranges).
"""

import math
import os
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.001"
DOC_REPLICAS = 16

STRESSED = [
    "qz02_split_psi_drift",
    "qz03_cdc_chunk_dedup",
    "qz05_filter_waterfall",
    "qz07_jackknife_source_mean",
    "qz09_hill_tail_exponent",
    # round-7 third wave: KS on the 16x grid (integer cross-multiplied
    # max over a 16x-denser value domain), the langid F1 report, and
    # the apportionment (sum-== -budget must hold with 16x token counts)
    "qz12_ks_source_drift",
    "qz13_langid_f1_report",
    "qz15_token_apportionment",
]


@pytest.fixture(scope="module")
def scaled_doc_dir(spark):
    d = os.path.join(
        tempfile.gettempdir(),
        "scale_stress_doc_" + SRC.strip("/").replace("/", "_"),
    )
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        docs = spark.read.parquet(f"{SRC}/documents.parquet")
        n = docs.count()
        reps = spark.range(DOC_REPLICAS).select(F.col("id").alias("rep"))
        (
            docs.crossJoin(reps)
            .select(
                # originals (rep 0) keep their ids; replica ids exceed
                # every original id
                (F.col("doc_id") + F.col("rep") * (n + 1)).alias("doc_id"),
                "text",
                "lang",
                "source",
                "n_chars",
            )
            .write.mode("overwrite")
            .parquet(f"{d}/documents.parquet")
        )
        open(marker, "w").write("ok")
    return d


def _normalize(df, cols):
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.mark.parametrize("name", STRESSED)
def test_scaled_docs_query_matches_oracle(spark, scaled_doc_dir, name):
    from kafka2delta_spark.queryset import ORACLES, QUERIES, load_all_querysets

    load_all_querysets()
    sdf = QUERIES[name](spark, scaled_doc_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{scaled_doc_dir}/documents.parquet/*.parquet')"
    )
    odf = con.execute(ORACLES[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert len(sdf) == len(odf), name
    cols = sorted(sdf.columns)
    assert _normalize(sdf, cols) == _normalize(odf, cols), name


def test_cdc_chunk_replication_closed_form(spark, scaled_doc_dir):
    """Content-defined boundaries are a pure function of text, so 16x
    replication scales multiplicities without creating or destroying a
    single distinct chunk."""
    from kafka2delta_spark.functions.corpuseval import qz03_cdc_chunk_dedup

    base = {r.source: r for r in qz03_cdc_chunk_dedup(spark, SRC).collect()}
    scaled = {
        r.source: r for r in qz03_cdc_chunk_dedup(spark, scaled_doc_dir).collect()
    }
    assert base.keys() == scaled.keys()
    for src, b in base.items():
        s = scaled[src]
        assert s.n_distinct == b.n_distinct, src
        assert s.n_chunks == DOC_REPLICAS * b.n_chunks, src
        assert s.total_tokens == DOC_REPLICAS * b.total_tokens, src
        # every chunk's multiplicity goes cnt -> 16*cnt, so the duplicate
        # token mass lands exactly at 15*total + dup
        assert s.dup_tokens == (DOC_REPLICAS - 1) * b.total_tokens + b.dup_tokens, src
        assert s.dedup_ratio_e4 >= b.dedup_ratio_e4, src


def test_waterfall_replication_scales_exactly(spark, scaled_doc_dir):
    """Every q74 rule is a per-document content function: replicating the
    corpus 16x must scale every waterfall and solo counter exactly 16x."""
    from kafka2delta_spark.functions.corpuseval import qz05_filter_waterfall

    base = {r.source: r for r in qz05_filter_waterfall(spark, SRC).collect()}
    scaled = {
        r.source: r
        for r in qz05_filter_waterfall(spark, scaled_doc_dir).collect()
    }
    assert base.keys() == scaled.keys()
    counters = [
        "n_docs", "n_kept", "wf_len", "wf_cpt", "wf_stop", "wf_punct",
        "solo_len", "solo_cpt", "solo_stop", "solo_punct",
    ]
    for src, b in base.items():
        s = scaled[src]
        for c in counters:
            assert s[c] == DOC_REPLICAS * b[c], (src, c)


def test_ks_replication_invariance(spark, scaled_doc_dir):
    """Uniform 16x replication scales cum_s, cum_rest, N_s, N_rest all by
    16, so D's integer numerator scales by 256 and ks_e6 is EXACTLY
    invariant — the scale-free property that makes KS a usable drift
    gate on growing corpora."""
    from kafka2delta_spark.functions.robustats import qz12_ks_source_drift

    base = {r.source: r for r in qz12_ks_source_drift(spark, SRC).collect()}
    scaled = {
        r.source: r for r in qz12_ks_source_drift(spark, scaled_doc_dir).collect()
    }
    assert base.keys() == scaled.keys()
    for src, b in base.items():
        s = scaled[src]
        assert s.n_source == DOC_REPLICAS * b.n_source, src
        assert s.d_num == DOC_REPLICAS * DOC_REPLICAS * b.d_num, src
        assert s.ks_e6 == b.ks_e6, src


def test_apportionment_replication_invariance(spark, scaled_doc_dir):
    """16x token counts scale every sqrt-weight by 4 uniformly, so the
    quotas — and therefore the full integer allocation — are unchanged."""
    from kafka2delta_spark.functions.robustats import qz15_token_apportionment

    base = {r.source: r for r in qz15_token_apportionment(spark, SRC).collect()}
    scaled = {
        r.source: r
        for r in qz15_token_apportionment(spark, scaled_doc_dir).collect()
    }
    assert base.keys() == scaled.keys()
    for src, b in base.items():
        s = scaled[src]
        assert s.src_tokens == DOC_REPLICAS * b.src_tokens, src
        assert s.alloc_tokens == b.alloc_tokens, src
