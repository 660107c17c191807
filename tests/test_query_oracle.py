"""Query-surface regression: a representative subset of the registered
queries checked against their DuckDB oracles at sf0.001 (fast; the full
70-query gate runs via tools/check_correctness.py at sf0.01).

Mirrors the driver's comparison: row count, sorted column names, and an
order-insensitive stringified value multiset."""

from __future__ import annotations

import math

import pytest

SF_DIR = "/root/testdata/sf0.001"

# one representative per operator family
SUBSET = [
    "q01_pricing_summary",        # scan-filter-agg
    "q03_shipping_priority",      # join + top-k
    "q04_order_priority_exists",  # semi join / EXISTS
    "q17_small_quantity_revenue", # correlated subquery (decorrelated)
    "q22_grouping_sets",          # grouping sets
    "q31_topk_orders_per_priority",  # ranking window
    "q33_customer_percentiles",   # two-pass global rank (empty partitions at
                                  # sf0.001: 150 rows over 8+ range buckets)
    "q64_sequence_packing",       # two-level cumsum, same edge
    "q45_map_functions",          # map HOFs
    "q50_tumbling_hourly_counts", # event-time window (batch form)
    "q60_asof_last_view_before_purchase",  # as-of join
    "q62_salted_heavy_hitters",   # salted skew agg
    "q70_latest_event_per_user",  # CDC latest-state
    "q85_exact_dedup",            # dedup
    "q86_minhash_lsh_pairs",      # MinHash LSH
    "q90_cosine_topk_bruteforce", # similarity
    "q93_ann_ivf_topk",           # IVF ANN
    "q69_bloom_semi_join",        # bloom-prefiltered semi join
    "q74_quality_filter",         # composite curation rules
    "q75_global_row_index",       # two-pass global index, no global window
    "q76_kmeans_lloyd",           # iterative Lloyd, fixed-point geometry
    "q78_doc_chunking",           # per-row explode chunking
    "q79_quality_model_score",    # fixed-point linear quality model
    "q59_token_budget_selection", # budget cumsum (shares two_level_cumsum)
    "q48_zorder_layout",          # Morton interleave + zone-map stats
    "q49_incremental_user_rollup",  # foreachBatch additive view maintenance
    "q39_histogram_quantiles",    # mergeable fixed-width histogram quantiles
    "q47_resample_ffill",         # hourly grid + forward fill
    "qx01_bm25_retrieval",        # lexical retrieval scoring
    "qx02_weighted_sample",       # deterministic weighted sampling
    "qx04_incremental_dedup",     # new-batch-vs-corpus dedup
    "qx06_leakage_safe_split",    # cluster-level split assignment
    "qx09_asof_next_view_after_purchase",  # forward as-of
    "qx10_ewm_rolling_value",     # fixed-point EW rolling aggregate
    "qx11_countmin_heavy_hitters",  # mergeable CM sketch
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _normalize(df, cols):
    out = []
    for _, row in df[cols].iterrows():
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, float):
                vals.append(f"{v:.6f}".rstrip("0").rstrip("."))
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                vals.append(str(list(v)))
            else:
                vals.append(str(v))
        out.append("|".join(vals))
    return sorted(out)


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.fixture(scope="module")
def registry():
    from kafka2delta_spark.queryset import ORACLES, QUERIES, load_all_querysets

    load_all_querysets()
    return QUERIES, ORACLES


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, registry, name):
    queries, oracles = registry
    spark_pdf = queries[name](spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(oracles[name]).fetchdf()
    cols = sorted(spark_pdf.columns)
    assert cols == sorted(duck_pdf.columns), "schema mismatch"
    assert len(spark_pdf) == len(duck_pdf), "row count mismatch"
    assert _normalize(spark_pdf, cols) == _normalize(duck_pdf, cols)
