"""Synthetic scale-up gate: replicate the driver tables 8-16x with shifted
keys, then run the query shapes whose scale behavior is least obvious from
sf0.01 (two-pass global rank, trailing-frame windows, skew profile, exact
quantiles, full-scan aggregation) against a DuckDB oracle over the SAME
scaled parquet. The point is regression evidence that the distributed
shapes stay CORRECT when every group is ~10x larger and key ranges no
longer match the generator's — not performance (local timing is noise).

The scaled dataset is built once per machine under /tmp keyed by the
source dir (the `_events_multibatch_dir` convention).
"""

import math
import os
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.01"
EVENTS_REPLICAS = 16
LINEITEM_REPLICAS = 8

#: queries stressed, chosen for scale-sensitive plans:
#: q01 full-scan agg, q33 two-pass global rank, qx30 exact grouped
#: quantiles, qx38 trailing-frame window, qx44 skew profile (its
#: heavy-hitter ordering must stay total under 16x duplicate counts).
STRESSED = [
    "q01_pricing_summary",
    "q33_customer_percentiles",
    "qx30_exact_grouped_quantiles",
    "qx38_rolling_zscore_anomalies",
    "qx44_join_key_skew_profile",
    # round 5: the id-based rank machinery (rankstats) on its global
    # (qx52, 16x events) and weighted (qx53, 8x lineitem) forms — the
    # monotonically_increasing_id run-start arithmetic must hold when
    # range partitions carry 10x the rows and replica values interleave
    "qx52_range_partition_planner",
    "qx53_weighted_median_by_rank",
    # round 5 continuation: the KMV overlap estimator must take its
    # capped (est = (K-1)*2^52 div h_K) branch once 16x replication
    # pushes distinct users past K; the mode/CUSUM/motif/attribution
    # windows must stay total under interleaved replica timestamps;
    # the Gini histogram closed form must hold when every multiplicity
    # is 16x
    "qx61_kmv_set_overlap",
    "qx62_grouped_mode",
    "qx64_cusum_changepoints",
    "qx73_event_concentration_gini",
    "qx78_sequence_motifs",
    "qx79_linear_attribution",
    # round 6: gaps-and-islands day arithmetic under 16x users (qx81);
    # the netted +1/-1 sweep when every day holds 16x interleaved
    # session boundaries (qx82); the KMV rollup cube once leaf sketches
    # saturate past K and every lattice level takes the capped-estimate
    # branch — merge-equals-direct must survive capping (qx83); Markov
    # eval totals under 16x transitions (qx86); rank-based seasonal
    # triage as daily-count ratios concentrate (qx89); entropy closed
    # form on 16x users (qx90); inter-arrival CASE-ladder bucketing
    # with replica-shifted gaps (qx96); dense-grid ACF when the lagged
    # join carries 16x counts per cell (qx98)
    "qx81_activity_streaks",
    "qx82_concurrent_sessions",
    "qx83_kmv_rollup_cube",
    "qx86_markov_prediction_eval",
    "qx89_seasonal_anomaly_days",
    "qx90_user_type_entropy",
    "qx96_interarrival_histogram",
    "qx98_daily_count_acf",
    # round 7: the cumulative-histogram boundary reads (trimmed/
    # winsorized partial sums, p99 bracket) when every (type, value)
    # multiplicity is 16x and replica-shifted values interleave — the
    # arg_min-at-boundary arithmetic must hold on much denser histograms
    "qz11_trimmed_winsorized_mean",
    "qz17_p99_interarrival",
    # round 9: the cross-batch streaming consumers had never run at 16x.
    # These three drain the two-batch split scaffold BUILT FROM THE SCALED
    # TABLE (160k events, 16x users), so per-key state genuinely crosses a
    # batch boundary at scale: q56 stream-stream interval-join state, q57
    # applyInPandasWithState sessionization (16x keys, sessions spanning
    # the midpoint), qx70 the ledgered incremental-maintenance family.
    "q56_stream_stream_interval_join",
    "q57_stateful_sessionize",
    "qx70_streaming_cusum",
]


@pytest.fixture(scope="module")
def scaled_dir(spark):
    d = os.path.join(
        tempfile.gettempdir(), "scale_stress_" + SRC.strip("/").replace("/", "_")
    )
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        from kafka2delta_spark.sources.tables import load_table

        ev = load_table(spark, SRC, "events")
        n_ev = ev.count()
        reps = spark.range(EVENTS_REPLICAS).select(F.col("id").alias("rep"))
        (
            ev.crossJoin(reps)
            .select(
                (F.col("event_id") + F.col("rep") * (n_ev + 1)).alias("event_id"),
                # shift each replica 1 minute so per-user order interleaves
                # rather than producing exact ties
                (F.col("ts") + F.make_interval(mins=F.col("rep"))).alias("ts"),
                (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
                "event_type",
                (F.col("value") + F.col("rep")).alias("value"),
                "props",
            )
            .write.mode("overwrite")
            .parquet(f"{d}/events.parquet")
        )
        li = spark.read.parquet(f"{SRC}/lineitem.parquet")
        n_ord = li.agg(F.max("l_orderkey")).collect()[0][0]
        reps8 = spark.range(LINEITEM_REPLICAS).select(F.col("id").alias("rep"))
        (
            li.crossJoin(reps8)
            .select(
                (F.col("l_orderkey") + F.col("rep") * (n_ord + 1)).alias(
                    "l_orderkey"
                ),
                "l_partkey", "l_suppkey", "l_linenumber",
                (F.col("l_quantity") + F.col("rep") % 3).alias("l_quantity"),
                (F.col("l_extendedprice") * (1 + F.col("rep"))).alias(
                    "l_extendedprice"
                ),
                "l_discount", "l_tax", "l_returnflag", "l_linestatus",
                "l_shipdate",
            )
            .write.mode("overwrite")
            .parquet(f"{d}/lineitem.parquet")
        )
        # dimension tables pass through unscaled
        for t in ("part", "orders", "customer", "supplier", "nation", "region",
                  "documents", "embeddings"):
            spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
                "overwrite"
            ).parquet(f"{d}/{t}.parquet")
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


@pytest.mark.parametrize("name", STRESSED)
def test_scaled_query_matches_oracle(spark, scaled_dir, name):
    from kafka2delta_spark.queryset import ORACLES, QUERIES, load_all_querysets

    load_all_querysets()
    sdf = QUERIES[name](spark, scaled_dir).toPandas()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{scaled_dir}/{t}.parquet/*.parquet')"
        )
    odf = con.execute(ORACLES[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert len(sdf) == len(odf), name
    cols = sorted(sdf.columns)
    assert _normalize(sdf, cols) == _normalize(odf, cols), name
    # the scale-up really happened: events-derived outputs must be larger
    if name == "qx38_rolling_zscore_anomalies":
        assert len(sdf) > 1000
    if name == "qx83_kmv_rollup_cube":
        # 16x distinct users must saturate the sketches: every lattice
        # level above the leaves takes the capped-estimate branch
        full = sdf[sdf["level"].isin(["type", "dow", "all"])]
        assert (full["sketch_size"] == 64).all()


def test_streaming_maintenance_equals_batch_on_scaled_data(spark, scaled_dir):
    """qx46's maintained flag set must equal qx38's batch answer on the
    16x corpus too — the per-user tail handoff at batch boundaries has
    16x more users and interleaved replica timestamps to get wrong."""
    from kafka2delta_spark.queryset import QUERIES, load_all_querysets

    load_all_querysets()
    batch = {
        tuple(r)
        for r in QUERIES["qx38_rolling_zscore_anomalies"](spark, scaled_dir).collect()
    }
    streamed = {
        tuple(r)
        for r in QUERIES["qx46_streaming_anomalies"](spark, scaled_dir).collect()
    }
    assert len(batch) > 1000
    assert streamed == batch


def test_exact_dedup_catches_replicated_corpus(spark, tmp_path):
    """Replicate documents 4x with shifted ids but IDENTICAL text: exact
    dedup must report precisely 3 duplicates per original, and the
    near-dup pair pipeline must stay bounded (caps hold under a corpus
    that is 75% duplicates) while agreeing with DuckDB on the same
    scaled parquet."""
    from kafka2delta_spark.queryset import ORACLES, QUERIES, load_all_querysets
    from kafka2delta_spark.sources.tables import load_table

    load_all_querysets()
    d = str(tmp_path / "dupcorpus")
    docs = load_table(spark, SRC, "documents")
    n = docs.count()
    reps = spark.range(4).select(F.col("id").alias("rep"))
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * (n + 1)).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        .write.mode("overwrite")
        .parquet(f"{d}/documents.parquet")
    )
    out = QUERIES["q85_exact_dedup"](spark, d).collect()[0]
    assert out["n_docs"] == 4 * n
    # every replica group collapses to one distinct content key
    assert out["n_dups"] >= 3 * (out["n_distinct"] - 1)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    sdf = QUERIES["q88_jaccard_similar_pairs"](spark, d).toPandas()
    odf = con.execute(ORACLES["q88_jaccard_similar_pairs"]).fetchdf()
    cols = sorted(sdf.columns)
    assert sorted(odf.columns) == cols
    assert _normalize(sdf, cols) == _normalize(odf, cols)
    # replicas share every shingle: each original must pair with its
    # copies at jaccard 1.0 unless the df cap dropped its entire shingle
    # set (stop-phrase-only docs) — require a substantial yield
    assert (sdf["jaccard"] == 1.0).sum() > n


def test_gini_is_replication_invariant(spark, scaled_dir):
    """Replicating every user 16x (same per-user event counts) multiplies
    every count-value multiplicity by 16 and leaves the Lorenz curve and
    Gini coefficient EXACTLY unchanged — the closed form must reproduce
    this algebraic identity, not just match the oracle."""
    from kafka2delta_spark.queryset import QUERIES, load_all_querysets

    load_all_querysets()
    q = QUERIES["qx73_event_concentration_gini"]
    base = {r["decile"]: r for r in q(spark, SRC).collect()}
    scaled = {r["decile"]: r for r in q(spark, scaled_dir).collect()}
    assert set(base) == set(scaled)
    for d in base:
        assert scaled[d]["gini_e6"] == base[d]["gini_e6"]
        assert scaled[d]["lorenz_e6"] == base[d]["lorenz_e6"]
        assert scaled[d]["rank_at"] == base[d]["rank_at"] * EVENTS_REPLICAS
        assert (
            scaled[d]["cum_events"] == base[d]["cum_events"] * EVENTS_REPLICAS
        )
