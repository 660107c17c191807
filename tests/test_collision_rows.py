"""Adversarial hash/band-collision pins (round-12 campaign; the eighth
parity dimension).

Every cap, tie-break, and bucket path in the dedup/CDC core assumes hash
collisions are rare. This module makes them CERTAIN:

  * the CDC tie-break: ``latest_per_key(tie_break_hash=True)`` orders by
    ``(lsn, xxhash64(all), row struct)``. xxhash64 collisions between
    DISTINCT rows are constructible two independent ways — Spark skips
    NULL columns when chaining (so ``(5, NULL)`` and ``(NULL, 5)`` always
    collide), and the per-long XXH64 step is a bijection whose inverse is
    implemented below (so for any two prefixes a trailing long can be
    solved to force equal hashes). The pinned contract: the winner among
    colliding rows is the lexicographic ROW-STRUCT max — a total,
    layout-independent function of content, proven identical across
    partitionings, input orders, and the window/max_by strategies.
  * the LSH band space: the `collisions` fixture's magnet pair (band-0
    collision at ~1% token Jaccard), rotation pair (identical shingle
    sets, different texts), and the 64/65 identical clusters bracketing
    BAND_BUCKET_CAP/SHINGLE_DF_CAP. Shape-pinned here; the full 228-query
    artifact is CORRECTNESS_DEGEN_collisions.json.

The XXH64 reimplementation below is validated against Spark's own
``xxhash64`` before anything depends on it.
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from build_degenerate_fixtures import (  # noqa: E402
    COLL_AT_HI,
    COLL_AT_LO,
    COLL_MAG_DOC_A,
    COLL_MAG_DOC_B,
    COLL_MAGNET,
    COLL_OVER_HI,
    COLL_OVER_LO,
    COLL_ROT_DOC_A,
    COLL_ROT_DOC_B,
    build_collisions,
)
from check_correctness import normalize, register_oracle_views  # noqa: E402

SRC = "/root/testdata/sf0.001"

# --- XXH64-on-long, exactly Spark's XxHash64 per-column step -------------
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _rotr(x: int, r: int) -> int:
    return ((x >> r) | (x << (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_long(l: int, seed: int) -> int:
    """One chained column step of Spark's xxhash64 on a non-null long."""
    h = (seed + _P5 + 8) & _M
    k1 = (_rotl((l * _P2) & _M, 31) * _P1) & _M
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _fmix(h)


_INV_P1 = pow(_P1, -1, 1 << 64)
_INV_P2 = pow(_P2, -1, 1 << 64)
_INV_P3 = pow(_P3, -1, 1 << 64)


def _inv_xorshift(h: int, k: int) -> int:
    r = h
    for _ in range(64 // k + 1):
        r = h ^ (r >> k)
    return r


def _inv_fmix(h: int) -> int:
    h = _inv_xorshift(h, 32)
    h = (h * _INV_P3) & _M
    h = _inv_xorshift(h, 29)
    h = (h * _INV_P2) & _M
    h = _inv_xorshift(h, 33)
    return h


def inv_xxh64_long(target: int, seed: int) -> int:
    """The unique long l with xxh64_long(l, seed) == target — every step
    (odd-constant multiply, rotate, xor-shift) is a bijection on Z/2^64,
    so the per-long step has NO same-length collisions; collisions must
    be built ACROSS columns, which is exactly what craft_collision does."""
    h = _inv_fmix(target)
    h = (((h - _P4) & _M) * _INV_P1) & _M
    h = _rotr(h, 27)
    k1 = h ^ ((seed + _P5 + 8) & _M)
    return (_rotr((k1 * _INV_P1) & _M, 31) * _INV_P2) & _M


def _u(x: int) -> int:
    return x & _M


def _s(x: int) -> int:
    return x - (1 << 64) if x >= 1 << 63 else x


def craft_collision(pk: int, lsn: int, a1: int, a2: int, b1: int):
    """Two distinct (pk, lsn, a, b) long rows with identical
    xxhash64(pk, lsn, a, b): fix row1's payload (a1, b1), then solve
    row2's trailing b2 so the chained hash lands on the same value."""
    pre = xxh64_long(_u(lsn), xxh64_long(_u(pk), 42))
    target = xxh64_long(_u(b1), xxh64_long(_u(a1), pre))
    b2 = _s(inv_xxh64_long(target, xxh64_long(_u(a2), pre)))
    return (pk, lsn, a1, b1), (pk, lsn, a2, b2)


def test_xxh64_reimpl_matches_spark(spark):
    """Everything below rests on this: the Python per-long step and its
    chaining equal Spark's xxhash64 bit-for-bit, including the NULL-skip
    (a NULL column leaves the running hash untouched)."""
    df = spark.createDataFrame(
        [(5, 7), (123456789, -42), (-1, 0)], "a: long, b: long"
    )
    got = [r[0] for r in df.select(F.xxhash64("a", "b")).collect()]
    exp = [
        _s(xxh64_long(_u(b), xxh64_long(_u(a), 42)))
        for a, b in ((5, 7), (123456789, -42), (-1, 0))
    ]
    assert got == exp
    dfn = spark.createDataFrame([(5, None), (None, 5)], "a: long, b: long")
    g = [r[0] for r in dfn.select(F.xxhash64("a", "b")).collect()]
    assert g[0] == g[1] == _s(xxh64_long(5, 42))


def _winners(spark, rows, schema, layouts):
    """latest_per_key(tie_break_hash=True) winner under several physical
    layouts, both strategies."""
    from kafka2delta_spark.cdc.dedup import latest_per_key

    out = []
    for mk in layouts:
        df = mk(spark.createDataFrame(rows, schema))
        for strategy in ("max_by", "window"):
            w = latest_per_key(
                df, ["pk"], "lsn", strategy=strategy, tie_break_hash=True
            ).collect()
            assert len(w) == 1
            out.append(tuple(w[0]))
    return out


_LAYOUTS = (
    lambda d: d,
    lambda d: d.repartition(7),
    lambda d: d.repartition(1),
    lambda d: d.orderBy(F.rand(seed=3)).repartition(5, "pk"),
)


def test_crafted_hash_collision_winner_is_struct_max(spark):
    """Two DISTINCT rows, same pk, same lsn, same xxhash64 (engineered via
    the inverse step). Contract: the winner is the lexicographic row-
    struct max, identical across layouts and strategies — without the
    struct fallback the winner is whichever row the hash-agg happens to
    fold last, i.e. partition-layout-dependent."""
    r1, r2 = craft_collision(pk=1, lsn=10, a1=111, a2=222, b1=1000)
    schema = "pk: long, lsn: long, a: long, b: long"
    df = spark.createDataFrame([r1, r2], schema)
    hashes = [
        r[0] for r in df.select(F.xxhash64("pk", "lsn", "a", "b")).collect()
    ]
    assert hashes[0] == hashes[1], "collision crafting regressed"
    winners = _winners(spark, [r1, r2], schema, _LAYOUTS)
    assert set(winners) == {max(r1, r2)}  # struct max == Python tuple max


def test_null_swap_collision_winner_is_struct_max(spark):
    """The no-arithmetic collision: Spark's xxhash64 skips NULL columns,
    so (5, NULL) and (NULL, 5) payloads always collide. Struct order
    puts NULL below any value, so the a=5 row wins everywhere."""
    r1 = (1, 10, 5, None)
    r2 = (1, 10, None, 5)
    schema = "pk: long, lsn: long, a: long, b: long"
    df = spark.createDataFrame([r1, r2], schema)
    hashes = [
        r[0] for r in df.select(F.xxhash64("pk", "lsn", "a", "b")).collect()
    ]
    assert hashes[0] == hashes[1]
    winners = _winners(spark, [r1, r2], schema, _LAYOUTS)
    assert set(winners) == {r1}


def test_identical_duplicates_still_collapse(spark):
    """Exact duplicate rows (the common Debezium snapshot case) tie on
    every order component including the struct; any winner is the same
    value, and exactly one row survives."""
    from kafka2delta_spark.cdc.dedup import latest_per_key

    rows = [(1, 10, 5, 6)] * 4 + [(1, 9, 99, 99)]
    df = spark.createDataFrame(rows, "pk: long, lsn: long, a: long, b: long")
    out = latest_per_key(df, ["pk"], "lsn", tie_break_hash=True).collect()
    assert [tuple(r) for r in out] == [(1, 10, 5, 6)]


# --- the collisions fixture ------------------------------------------------


@pytest.fixture(scope="module")
def coll_sf_dir(tmp_path_factory):
    return build_collisions(SRC, str(tmp_path_factory.mktemp("collisions")))


@pytest.fixture(scope="module")
def coll_oracle_con(coll_sf_dir):
    con = duckdb.connect()
    register_oracle_views(con, coll_sf_dir)
    yield con
    con.close()


def test_magnet_pair_collides_in_band0_only(spark, coll_sf_dir):
    """The brute-forced magnet shingle (md5 starting '000' under seeds 0
    AND 1) wins band 0's minima in both magnet docs, so two documents at
    ~1% token Jaccard collide in exactly one band — the adversarial
    false-positive LSH candidate. Checked against the REAL band pipeline,
    not a model of it."""
    from kafka2delta_spark.functions.dedup import band_rows

    h0 = hashlib.md5(f"0:{COLL_MAGNET}".encode()).hexdigest()
    h1 = hashlib.md5(f"1:{COLL_MAGNET}".encode()).hexdigest()
    assert h0.startswith("000") and h1.startswith("000")

    bands = (
        band_rows(spark, coll_sf_dir)
        .filter(F.col("doc_id").isin(COLL_MAG_DOC_A, COLL_MAG_DOC_B))
        .collect()
    )
    keys = {(r.doc_id, r.band_id): r.band_key for r in bands}
    assert keys[(COLL_MAG_DOC_A, 0)] == keys[(COLL_MAG_DOC_B, 0)] == h0 + h1
    for b in (1, 2, 3):
        assert keys[(COLL_MAG_DOC_A, b)] != keys[(COLL_MAG_DOC_B, b)]


def test_rotation_pair_identical_shingle_sets(spark, coll_sf_dir):
    """Different texts (different token multisets — exact dedup keeps
    them apart) with IDENTICAL k=3 shingle sets: all 8 minhashes equal,
    so the pair collides in all 4 bands."""
    from kafka2delta_spark.functions.dedup import band_rows, shingle_rows

    sh = (
        shingle_rows(spark, coll_sf_dir)
        .filter(F.col("doc_id").isin(COLL_ROT_DOC_A, COLL_ROT_DOC_B))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("shingle")).alias("sh"))
        .collect()
    )
    sets = {r.doc_id: tuple(r.sh) for r in sh}
    assert sets[COLL_ROT_DOC_A] == sets[COLL_ROT_DOC_B]
    bands = (
        band_rows(spark, coll_sf_dir)
        .filter(F.col("doc_id").isin(COLL_ROT_DOC_A, COLL_ROT_DOC_B))
        .groupBy("band_id", "band_key")
        .count()
        .collect()
    )
    assert len(bands) == 4 and all(r["count"] == 2 for r in bands)


def test_cluster_band_widths_bracket_the_cap(spark, coll_sf_dir):
    """The 65-doc cluster's band buckets are one PAST BAND_BUCKET_CAP
    (dropped from candidate generation on both engines); the 64-doc
    cluster sits exactly AT it (kept -> C(64,2) pairs)."""
    from kafka2delta_spark.functions.dedup import (
        BAND_BUCKET_CAP,
        band_rows,
        minhash_lsh_pairs,
    )

    over = set(range(COLL_OVER_LO, COLL_OVER_HI + 1))
    at = set(range(COLL_AT_LO, COLL_AT_HI + 1))
    widths = (
        band_rows(spark, coll_sf_dir)
        .groupBy("band_id", "band_key")
        .agg(F.collect_set("doc_id").alias("ids"))
        .collect()
    )
    w_over = [len(r.ids) for r in widths if over <= set(r.ids)]
    w_at = [len(r.ids) for r in widths if at <= set(r.ids)]
    assert len(w_over) == 4 and all(w == 65 for w in w_over)
    assert len(w_at) == 4 and all(w == 64 for w in w_at)
    assert BAND_BUCKET_CAP == 64
    pairs = minhash_lsh_pairs(spark, coll_sf_dir).collect()
    ids = {(r.doc_a, r.doc_b) for r in pairs}
    assert not any(a in over and b in over for a, b in ids)
    n_at = sum(1 for a, b in ids if a in at and b in at)
    assert n_at == 64 * 63 // 2


def test_duplicate_event_ids_are_value_identical(spark, coll_sf_dir):
    """events carries ~4% EXACT duplicate rows (same event_id, same
    everything): every duplicated key's rows agree on all columns, so
    any latest-per-key winner is the same value."""
    ev = spark.read.parquet(f"{coll_sf_dir}/events.parquet")
    assert ev.count() > ev.select("event_id").distinct().count()
    per_key = ev.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.struct(*[c for c in ev.columns])).alias("nd"),
    )
    assert per_key.filter(F.col("n") > 1).count() > 0
    assert per_key.filter(F.col("nd") > 1).count() == 0


COLLISION_AUDITED = [
    # LSH band space under magnet/rotation/cluster collisions
    "q86_minhash_lsh_pairs",
    "q88_jaccard_similar_pairs",
    "q85_exact_dedup",
    "qx75_lsh_band_sweep",
    "qx04_incremental_dedup",
    "q98_neardup_clusters",
    "qx87_dedup_threshold_sweep",
    # score ties from the identical clusters through ranking/top-k
    "qx01_bm25_retrieval",
    "qx40_inverted_index",
    "qx80_winnowing_fingerprint_pairs",
    "qx20_duplicated_spans",
    # identical-embedding ties through ANN/top-k
    "q90_cosine_topk_bruteforce",
    "q91_ann_lsh_topk",
    "q93_ann_ivf_topk",
    "q89_embedding_near_dups",
    "qy03_mmr_diversified_topk",
    # duplicate event_ids through latest-per-key / sessionize / windows
    "q70_latest_event_per_user",
    "q49_incremental_user_rollup",
    "qx58_ivm_retraction_agg",
    "q57_stateful_sessionize",
]


@pytest.mark.parametrize("name", COLLISION_AUDITED)
def test_collision_oracle_parity(spark, coll_sf_dir, coll_oracle_con, name):
    import __spark_entry__ as entry
    from kafka2delta_spark.queryset import ORACLES

    sdf = entry.queries()[name](spark, coll_sf_dir).toPandas()
    odf = coll_oracle_con.execute(ORACLES[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    assert normalize(sdf, cols) == normalize(odf, cols)
