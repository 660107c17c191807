"""Null-heavy corpus parity: Spark vs the DuckDB oracle on data with NULLs.

The driver's correctness gate runs on null-free testdata, so it cannot see
a query whose Spark plan and oracle SQL disagree about NULL semantics —
exactly the divergence that appears the first time real data has a failed
fetch/encode/parse. This suite injects deterministic NULLs into the value
columns of events/documents/embeddings (keys and ts stay NOT NULL, like
the TPC-H tables) and re-runs the full value-hash comparison for every
query the 2026-08-15 audit found divergent, plus the contracts adopted:

- vector operators exclude NULL embeddings at scan
  (sources/tables.py::load_embeddings), mirrored as
  ``WHERE embedding IS NOT NULL`` in their oracles — DuckDB's
  list_inner_product rejects NULL lists outright;
- grouped order statistics (qx30/qx50/qz11) use the defined-key +
  defined-measurement contract — a NULL value row would sit at OPPOSITE
  ends of the two engines' sort orders (Spark NULLS FIRST, DuckDB NULLS
  LAST) and the rank machinery documents pre-filtered NULLs;
- qx10's EWM runs over the OBSERVED series (collect_list skips NULLs,
  DuckDB list() keeps them — filtering is the only shared frame);
- token pipelines (q59/q64) exclude no-token NULL bodies;
- q95/q95b follow the multimodal kernels' NULL-payload contracts;
- qy04 tests snapshot presence with a marker column, not the content
  hash (md5(NULL) is NULL for a PRESENT doc — the audit's one genuine
  wrong-answer bug);
- qy06's conversion ratios are NULL on a zero denominator (DuckDB
  ``// 0``), never an ANSI divide-by-zero.
"""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/tools")

from build_degenerate_fixtures import (  # noqa: E402
    build_nonfinite,
    build_nullkeys,
    build_nullvals,
    build_unicode,
)
from check_correctness import ORACLE_TABLES, normalize, register_oracle_views  # noqa: E402

SRC = "/root/testdata/sf0.001"

# every query the null-heavy audit flagged, now under an explicit contract
AUDITED = [
    "q59_token_budget_selection",
    "q64_sequence_packing",
    "q76_kmeans_lloyd",
    "q89_embedding_near_dups",
    "q90_cosine_topk_bruteforce",
    "q91_ann_lsh_topk",
    "q93_ann_ivf_topk",
    "q94_ann_recall_eval",
    "q95_multimodal_features",
    "q95b_audio_pcm_windows",
    "q99_embedding_quantization",
    "qx03_semantic_dedup",
    "qx10_ewm_rolling_value",
    "qx30_exact_grouped_quantiles",
    "qx50_robust_dispersion",
    "qx51_quantized_ann_recall",
    "qx83_kmv_rollup_cube",
    "qx84_hard_negative_mining",
    "qx85_pq_codebook_encode",
    "qx94_ivfpq_adc_search",
    "qy02_filtered_ann_topk",
    "qy03_mmr_diversified_topk",
    "qy04_corpus_snapshot_diff",
    "qy06_session_funnel",
    "qz04_loo_1nn_accuracy",
    "qz11_trimmed_winsorized_mean",
]


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    """sf0.001 with deterministic NULLs in the pipeline tables' value
    columns (single parquet files, like the real testdata layout).
    Injection lives in tools/build_degenerate_fixtures.py — shared with
    the one-command ``check_correctness.py --fixture nullvals`` sweep."""
    return build_nullvals(SRC, str(tmp_path_factory.mktemp("nullheavy")))


@pytest.fixture(scope="module")
def null_oracle_con(null_sf_dir):
    con = duckdb.connect()
    register_oracle_views(con, null_sf_dir)
    yield con
    con.close()


def test_fixture_actually_has_nulls(spark, null_sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{null_sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{null_sf_dir}/embeddings.parquet")
    assert docs.filter(F.col("text").isNull()).count() > 0
    assert emb.filter(F.col("embedding").isNull()).count() > 0


@pytest.mark.parametrize("name", AUDITED)
def test_null_corpus_oracle_parity(spark, null_sf_dir, null_oracle_con, name):
    import __spark_entry__ as entry
    from kafka2delta_spark.queryset import ORACLES

    sdf = entry.queries()[name](spark, null_sf_dir).toPandas()
    odf = null_oracle_con.execute(ORACLES[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    assert normalize(sdf, cols) == normalize(odf, cols)


# ---------------------------------------------------------------------------
# NULL join/group KEYS (anonymous events: user_id IS NULL) — a second
# audit sweep (2026-08-15) found 21 divergent queries, all user-keyed.
# Contracts adopted, engine + oracle in lockstep:
# - keyed state (CDC merge q71/qx55/qx58, rollups q49/qx13, sessionize
#   q57/qx82-family, retention qx26/qx92, anomalies qx38/qx46, per-user
#   gaps qx96/qy10, streaks qx81, distinct-USER sketches qx19/qx23/qx59/
#   qx61/qx83) excludes NULL keys: keyed state cannot address NULL, and
#   pooling anonymous events into one pseudo-user fabricates data;
# - asof_join fixes the OPERATOR: window partitionBy groups NULL keys
#   (anonymous purchases would "match" anonymous views) where SQL ASOF
#   never matches NULL — the right side now drops NULL keys, left rows
#   keep LEFT JOIN NULL semantics (q60/qx09, oracles unchanged);
# - TYPE-keyed streaming counts (qx70 cusum) keep anonymous events: only
#   the watermark sentinel is excluded, null-safely (eqNullSafe).
# ---------------------------------------------------------------------------

KEY_AUDITED = [
    "q49_incremental_user_rollup",
    "q57_stateful_sessionize",
    "q58_stream_stream_left_outer_join",
    "q60_asof_last_view_before_purchase",
    "q71_cdc_merge_changelog",
    "qx08_stream_full_outer_join",
    "qx09_asof_next_view_after_purchase",
    "qx13_store_change_feed",
    "qx19_kmv_distinct_sketch",
    "qx23_streaming_kmv_distinct",
    "qx46_streaming_anomalies",
    "qx55_schema_evolution_merge",
    "qx58_ivm_retraction_agg",
    "qx59_rolling_kmv_distinct",
    "qx61_kmv_set_overlap",
    "qx70_streaming_cusum",
    "qx81_activity_streaks",
    "qx83_kmv_rollup_cube",
    "qx92_streaming_retention",
    "qx99_streaming_concurrency",
    "qy10_streaming_interarrival",
    # batch siblings whose shared oracles carry the same contract
    "qx26_retention_cohorts",
    "qx38_rolling_zscore_anomalies",
    "qx82_concurrent_sessions",
    "qx96_interarrival_histogram",
    "qy06_session_funnel",
]


@pytest.fixture(scope="module")
def nullkey_sf_dir(tmp_path_factory):
    """sf0.001 with ~5% anonymous events (NULL user_id); all other
    columns intact."""
    dst = str(tmp_path_factory.mktemp("nullkeys"))
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(f"""COPY (SELECT event_id, ts,
        CASE WHEN event_id % 19 != 11 THEN user_id END AS user_id,
        event_type, value, props
        FROM read_parquet('{SRC}/events.parquet'))
        TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.close()
    return dst


@pytest.fixture(scope="module")
def nullkey_oracle_con(nullkey_sf_dir):
    con = duckdb.connect()
    register_oracle_views(con, nullkey_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", KEY_AUDITED)
def test_null_key_oracle_parity(spark, nullkey_sf_dir, nullkey_oracle_con, name):
    import __spark_entry__ as entry
    from kafka2delta_spark.queryset import ORACLES

    sdf = entry.queries()[name](spark, nullkey_sf_dir).toPandas()
    odf = nullkey_oracle_con.execute(ORACLES[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    assert normalize(sdf, cols) == normalize(odf, cols)


def test_asof_join_null_keys_follow_sql_semantics(spark):
    """The operator-level pin for the asof fix: NULL-key left rows come
    back with NULL as-of values (never matched to NULL-key right rows)."""
    import datetime

    from kafka2delta_spark.operators.asof import asof_join

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)
    left = spark.createDataFrame(
        [(1, t0), (None, t0)], "k bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t0 - datetime.timedelta(minutes=5), 10.0),
         (None, t0 - datetime.timedelta(minutes=1), 99.0)],
        "k bigint, ts timestamp, v double",
    )
    out = {r["k"]: r["v_asof"] for r in asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", value_cols=["v"]
    ).collect()}
    assert out[1] == 10.0
    assert out[None] is None  # NULL key never matches, row is kept


# ---------------------------------------------------------------------------
# NaN / ±Infinity measurements — a DISTINCT failure class from NULL: the
# milli fixed-point conversion (floor(value*1000) -> BIGINT) died loudly
# on either engine (Spark ANSI long-overflow on ±Inf, DuckDB INT64
# conversion error on NaN), so one corrupt sensor reading killed the
# whole job. The contract (functions/measure.py): non-finite is not a
# measurement -> NULL at the conversion, flowing into the same NULL
# semantics pinned above. Defined-measurement filters (qx10/qx30/qx50/
# qz11) use the FINITE form so NaN cannot re-enter the rank machinery as
# a NULL. 21 queries were affected in the 2026-08-15 audit.
# ---------------------------------------------------------------------------

NAN_AUDITED = [
    "q29_trailing_hour_frame",
    "q47_resample_ffill",
    "q48_zorder_layout",
    "q49_incremental_user_rollup",
    "qx10_ewm_rolling_value",
    "qx12_stream_static_enrichment",
    "qx13_store_change_feed",
    "qx28_zone_map_pruning",
    "qx29_user_value_trend",
    "qx30_exact_grouped_quantiles",
    "qx32_user_feature_vector",
    "qx38_rolling_zscore_anomalies",
    "qx39_session_attribution",
    "qx46_streaming_anomalies",
    "qx47_snapshot_fingerprint",
    "qx50_robust_dispersion",
    "qx55_schema_evolution_merge",
    "qx58_ivm_retraction_agg",
    "qx74_feature_correlation_audit",
    "qx79_linear_attribution",
    "qz11_trimmed_winsorized_mean",
]


@pytest.fixture(scope="module")
def nan_sf_dir(tmp_path_factory):
    """sf0.001 with NaN (~3%) and ±Infinity (~3%) injected into
    events.value; everything else intact."""
    dst = str(tmp_path_factory.mktemp("nanvals"))
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(f"""COPY (SELECT event_id, ts, user_id, event_type,
        CASE WHEN event_id % 29 = 17 THEN 'nan'::DOUBLE
             WHEN event_id % 31 = 19 THEN 'infinity'::DOUBLE
             WHEN event_id % 37 = 23 THEN '-infinity'::DOUBLE
             ELSE value END AS value, props
        FROM read_parquet('{SRC}/events.parquet'))
        TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.close()
    return dst


@pytest.fixture(scope="module")
def nan_oracle_con(nan_sf_dir):
    con = duckdb.connect()
    register_oracle_views(con, nan_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", NAN_AUDITED)
def test_nonfinite_value_oracle_parity(spark, nan_sf_dir, nan_oracle_con, name):
    import __spark_entry__ as entry
    from kafka2delta_spark.queryset import ORACLES

    sdf = entry.queries()[name](spark, nan_sf_dir).toPandas()
    odf = nan_oracle_con.execute(ORACLES[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    assert normalize(sdf, cols) == normalize(odf, cols)


def test_v1000_contract_unit(spark):
    """The conversion itself: finite -> milli bigint, NULL/NaN/±Inf -> NULL."""
    from kafka2delta_spark.functions.measure import finite, v1000

    df = spark.createDataFrame(
        [(1, 2.5), (2, float("nan")), (3, float("inf")),
         (4, float("-inf")), (5, None), (6, -0.0015)],
        "id bigint, value double",
    )
    rows = {r["id"]: (r["f"], r["v"]) for r in df.select(
        "id", finite("value").alias("f"), v1000("value").alias("v")
    ).collect()}
    assert rows[1] == (True, 2500)
    assert rows[2] == (False, None)
    assert rows[3] == (False, None)
    assert rows[4] == (False, None)
    assert rows[5] == (False, None)
    assert rows[6] == (True, -2)  # floor, not truncate


# ---------------------------------------------------------------------------
# Unicode text edges — engine-native string semantics are NOT portable
# outside ASCII. The 2026-08-15 audit (emoji, CJK, NBSP, combining
# chars, zero-width, case-mapping traps injected into documents.text)
# found 11 divergent queries, three root causes, three contracts:
# - case folding is ASCII-scoped (measure.ascii_lower / translate):
#   Java lower('İ' U+0130) yields "i̇" (TWO code points) where utf8proc
#   yields "i", silently forking every token/shingle/minhash/simhash;
# - edit distance counts UTF-8 BYTES (qx54): DuckDB levenshtein is
#   byte-based, Spark's counts code points — Spark now measures bytes
#   via the lossless ISO-8859-1 byte->char decode of the prefix;
# - binary payloads are encode(text), never text::BLOB (the DuckDB cast
#   rejects non-ASCII), and q95's header_sum sums the first 16 BYTES
#   hex-parsed off the blob (ord() counts code points).
# ---------------------------------------------------------------------------

UNICODE_AUDITED = [
    "q86_minhash_lsh_pairs",
    "q87_simhash_fingerprints",
    "q87b_simhash_hamming_pairs",
    "q95_multimodal_features",
    "q96_multimodal_metadata_join",
    "q97_video_frame_sampling",
    "qx40_inverted_index",
    "qx54_editdist_pair_verify",
    "qx75_lsh_band_sweep",
    "qx80_winnowing_fingerprint_pairs",
    "qz03_cdc_chunk_dedup",
]


@pytest.fixture(scope="module")
def unicode_sf_dir(tmp_path_factory):
    """sf0.001 with deterministic Unicode edge cases injected into
    documents.text (n_chars recomputed from the new text)."""
    dst = str(tmp_path_factory.mktemp("unicode"))
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(f"""
    COPY (
      WITH m AS (
        SELECT doc_id, lang, source,
          CASE doc_id % 11
            WHEN 1 THEN 'café ñoño ' || text
            WHEN 2 THEN text || ' 日本語テキスト 中文 한국어'
            WHEN 3 THEN '🚀🔥💯 ' || text || ' 🎉'
            WHEN 4 THEN replace(text, ' the ', ' the' || chr(160))
            WHEN 5 THEN text || ' İstanbul ß STRASSE ligatures ﬁﬂ'
            WHEN 6 THEN text || ' cafe' || chr(769) || ' naive' || chr(776)
            WHEN 7 THEN text || ' zero' || chr(8203) || 'width' || chr(8205) || 'joined'
            ELSE text END AS text
        FROM read_parquet('{SRC}/documents.parquet'))
      SELECT doc_id, text, lang, source, length(text) AS n_chars FROM m
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    con.close()
    return dst


@pytest.fixture(scope="module")
def unicode_oracle_con(unicode_sf_dir):
    con = duckdb.connect()
    register_oracle_views(con, unicode_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", UNICODE_AUDITED)
def test_unicode_text_oracle_parity(spark, unicode_sf_dir, unicode_oracle_con, name):
    import __spark_entry__ as entry
    from kafka2delta_spark.queryset import ORACLES

    sdf = entry.queries()[name](spark, unicode_sf_dir).toPandas()
    odf = unicode_oracle_con.execute(ORACLES[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    assert normalize(sdf, cols) == normalize(odf, cols)


def test_ascii_lower_is_portable_on_the_trap_codepoints(spark):
    """The contract's unit pin: ascii_lower folds A-Z only and passes the
    known engine-divergent code points through unchanged."""
    from kafka2delta_spark.functions.measure import ascii_lower

    rows = spark.createDataFrame(
        [("İstanbul ß STRAßE ﬁ ABCz",)], "s string"
    ).select(ascii_lower("s").alias("f")).collect()
    # 'İ', 'ß', 'ﬁ' untouched; only A-Z folded
    assert rows[0]["f"] == "İstanbul ß straße ﬁ abcz"
