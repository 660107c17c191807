"""Scale-replication parity pins (round-12 campaign; the ninth parity
dimension).

The 100 TB design has two standing evidence legs: the timing-side
scaling study (SCALING.json / SCALING_PIN.json — cost grows ~linearly in
volume) and the layout stress sweep (hashes don't depend on partition
geometry).  This module adds the missing third leg: **value-level oracle
parity on data materially larger than any gated scale**.  The
key-shifted replicator from tools/bench_scaling.py multiplies rows AND
distinct keys (referential integrity preserved per replica; identical
replica text/vectors maximize duplicate-cluster pressure on the dedup
caps), so every operator family is re-proven against DuckDB on a corpus
where:

  * group/join cardinalities crossed a power of two (hash tables
    resize, AQE picks different plans),
  * shingle doc-frequencies and LSH band buckets cross
    SHINGLE_DF_CAP/BAND_BUCKET_CAP (the capped candidate generation
    must drop the same pairs on both engines),
  * per-key event history is duplicated under new keys (latest-per-key
    reductions see k x the distinct-key state).

The full-228 artifact at factor 8 over sf0.1 (~sf0.8 equivalent) is
CORRECTNESS_SCALE8.json; this module keeps the machinery honest at
factor 2 over sf0.001 so a regression fails the suite, not the next
ad-hoc study.  Reference semantics at stake: the latest-per-key MERGE
reduction (ref stream/stream.py:92-96) and every §2.2 operator family.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from bench_scaling import build_scaled  # noqa: E402
from check_correctness import normalize, register_oracle_views  # noqa: E402

SRC = "/root/testdata/sf0.001"
FACTOR = 2

# One query per operator family; names must exist in the registry.
PARITY_BAND = [
    "q01_pricing_summary",         # full-scan agg
    "q09_product_profit",          # 6-way join
    "q21_cube_returnflag_status",  # cube agg
    "q29_trailing_hour_frame",     # range-frame window
    "q34_event_gaps",              # lag window over events
    "q62_salted_heavy_hitters",    # skew-salted agg
    "q70_latest_event_per_user",   # CDC latest-per-key dedup
    "q73_pii_redaction",           # regex text scan
    "q85_exact_dedup",             # exact dedup
    "q86_minhash_lsh_pairs",       # banded LSH under cap pressure
    "q88_jaccard_similar_pairs",   # capped shingle pair stats
    "q90_cosine_topk_bruteforce",  # fixed-anchor ANN scan
    "qx01_bm25_retrieval",         # term-stats retrieval
    "qx40_inverted_index",         # posting-list build
]


@pytest.fixture(scope="module")
def scaled_dir(tmp_path_factory):
    dst = str(tmp_path_factory.mktemp("scalepar") / f"x{FACTOR}")
    return build_scaled(SRC, dst, FACTOR)


@pytest.fixture(scope="module")
def oracle(scaled_dir):
    con = duckdb.connect()
    register_oracle_views(con, scaled_dir)
    yield con
    con.close()


def test_replicator_multiplies_rows_and_keys(scaled_dir):
    """The replication the parity claims rest on: factor k multiplies
    both row counts and DISTINCT key cardinalities exactly (key shifts
    are disjoint across replicas), and the fixed dims copy through."""
    con = duckdb.connect()

    def one(sql):
        return con.execute(sql).fetchone()[0]

    for tbl, keycol in [
        ("lineitem", "l_orderkey"),
        ("events", "user_id"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ]:
        base_rows = one(f"SELECT count(*) FROM read_parquet('{SRC}/{tbl}.parquet')")
        base_keys = one(
            f"SELECT count(DISTINCT {keycol}) FROM read_parquet('{SRC}/{tbl}.parquet')"
        )
        rows = one(f"SELECT count(*) FROM read_parquet('{scaled_dir}/{tbl}.parquet')")
        keys = one(
            f"SELECT count(DISTINCT {keycol}) "
            f"FROM read_parquet('{scaled_dir}/{tbl}.parquet')"
        )
        assert rows == FACTOR * base_rows, tbl
        assert keys == FACTOR * base_keys, (tbl, keycol)
    for dim in ("region", "nation"):
        assert one(
            f"SELECT count(*) FROM read_parquet('{scaled_dir}/{dim}.parquet')"
        ) == one(f"SELECT count(*) FROM read_parquet('{SRC}/{dim}.parquet')"), dim
    # referential integrity survives the shift: no orphan lineitem keys
    assert one(
        f"SELECT count(*) FROM read_parquet('{scaled_dir}/lineitem.parquet') l "
        f"ANTI JOIN read_parquet('{scaled_dir}/orders.parquet') o "
        f"ON l.l_orderkey = o.o_orderkey"
    ) == 0
    con.close()


def test_replicator_deterministic(scaled_dir, tmp_path):
    """Two builds produce value-identical tables (the artifact is
    reproducible; no hidden randomness in the replicator)."""
    again = build_scaled(SRC, str(tmp_path / "again"), FACTOR)
    con = duckdb.connect()
    for tbl in ("lineitem", "documents", "events"):
        diff = con.execute(
            f"SELECT count(*) FROM ("
            f"  SELECT * FROM read_parquet('{scaled_dir}/{tbl}.parquet')"
            f"  EXCEPT ALL"
            f"  SELECT * FROM read_parquet('{again}/{tbl}.parquet'))"
        ).fetchone()[0]
        assert diff == 0, tbl
    con.close()


@pytest.mark.parametrize("name", PARITY_BAND)
def test_scale_parity_band(spark, scaled_dir, oracle, name):
    """Full value parity (count + schema + normalized values) for one
    query per operator family on the factor-2 replica."""
    from kafka2delta_spark.queryset import QUERIES, ORACLES, load_all_querysets

    load_all_querysets()
    sdf = QUERIES[name](spark, scaled_dir).toPandas()
    odf = oracle.execute(ORACLES[name]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert len(sdf) == len(odf), (name, len(sdf), len(odf))
    cols = sorted(sdf.columns)
    assert normalize(sdf, cols) == normalize(odf, cols), name
