"""16x scale-stress for the EMBEDDINGS family (VERDICT r06 item 5): the
21 previously pinned operators are all events/users-shaped; this module
replicates every vector 16x with shifted ids and IDENTICAL coordinates
and pins the vector-search operators two ways:

  * full DuckDB-oracle hash equality on the scaled parquet for the PQ
    encode (qx85), IVF-PQ ADC search (qx94), int8 recall (qx51) and
    Lloyd k-means (q76) — their oracles re-derive the same algorithm on
    the 16x corpus in ~1 s each;
  * algebraic replication invariants that the oracle cannot check
    cheaply: exact replication leaves Lloyd centroids bit-identical
    (floor(16s/16c) = floor(s/c)), so every replica must receive its
    original's PQ codes (codebook stability), and qx84's mined triplets
    for ORIGINAL anchors must be exactly unchanged (distances are a
    function of coordinates only, and replica ids are strictly larger
    than every original id, so min-id/max(-id) tiebreaks still pick the
    originals — margin preservation). qx84's brute-force oracle is
    O(anchors x corpus) in DuckDB and does not finish at 16x, which is
    exactly why the invariant route exists.
"""

import math
import os
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.01"
EMB_REPLICAS = 16


@pytest.fixture(scope="module")
def scaled_emb_dir(spark):
    d = os.path.join(
        tempfile.gettempdir(),
        "scale_stress_emb_" + SRC.strip("/").replace("/", "_"),
    )
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
        n = emb.count()
        reps = spark.range(EMB_REPLICAS).select(F.col("id").alias("rep"))
        (
            emb.crossJoin(reps)
            .select(
                # identical coordinates and labels; ids shift by rep*(n+1)
                # so originals (rep 0) keep their ids and every replica id
                # exceeds every original id
                (F.col("vec_id") + F.col("rep") * (n + 1)).alias("vec_id"),
                "embedding",
                "label",
            )
            .write.mode("overwrite")
            .parquet(f"{d}/embeddings.parquet")
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
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                vals.append(str([x for x in v]))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


STRESSED = [
    "q76_kmeans_lloyd",
    "qx85_pq_codebook_encode",
    "qx94_ivfpq_adc_search",
    "qx51_quantized_ann_recall",
]


@pytest.mark.parametrize("name", STRESSED)
def test_scaled_embedding_query_matches_oracle(spark, scaled_emb_dir, name):
    from kafka2delta_spark.queryset import ORACLES, QUERIES, load_all_querysets

    load_all_querysets()
    sdf = QUERIES[name](spark, scaled_emb_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{scaled_emb_dir}/embeddings.parquet/*.parquet')"
    )
    odf = con.execute(ORACLES[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert len(sdf) == len(odf), name
    cols = sorted(sdf.columns)
    assert _normalize(sdf, cols) == _normalize(odf, cols), name
    # the scale-up really happened: per-vector outputs cover 16x rows
    if name in ("q76_kmeans_lloyd", "qx85_pq_codebook_encode"):
        assert len(sdf) == EMB_REPLICAS * 500


def test_pq_codes_are_replication_invariant(spark, scaled_emb_dir):
    """Codebook stability: exact 16x replication leaves every Lloyd
    centroid bit-identical, so each replica must encode to its
    original's PQ codes and reconstruction error."""
    from kafka2delta_spark.queryset import QUERIES, load_all_querysets

    load_all_querysets()
    q = QUERIES["qx85_pq_codebook_encode"]
    base = {r["vec_id"]: tuple(r) for r in q(spark, SRC).collect()}
    n = len(base)
    scaled = q(spark, scaled_emb_dir).collect()
    assert len(scaled) == EMB_REPLICAS * n
    for r in scaled:
        orig = base[r["vec_id"] % (n + 1)]
        assert tuple(r)[1:] == orig[1:], r["vec_id"]


def test_hard_negative_margins_are_replication_invariant(
    spark, scaled_emb_dir
):
    """Margin preservation: distances depend only on coordinates, and
    every replica id exceeds every original id, so the min-nid /
    max(-nid) tiebreaks keep selecting originals — an ORIGINAL anchor's
    mined triplet (pos/neg ids, distances, margin, violation flag) must
    come out of the 16x corpus exactly unchanged."""
    from kafka2delta_spark.queryset import QUERIES, load_all_querysets

    load_all_querysets()
    q = QUERIES["qx84_hard_negative_mining"]
    base = {r["vec_id"]: tuple(r) for r in q(spark, SRC).collect()}
    assert base, "base run mined no anchors"
    scaled = {
        r["vec_id"]: tuple(r)
        for r in q(spark, scaled_emb_dir).collect()
        if r["vec_id"] in base  # original anchors only
    }
    assert set(scaled) == set(base)
    for vid, row in base.items():
        assert scaled[vid] == row, vid
