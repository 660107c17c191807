"""Pathological per-row SIZE skew: Spark vs the DuckDB oracle.

The round-9 degenerate campaign covered value corruption (NULLs, NaN/Inf,
Unicode traps); this one covers the OTHER axis of 100 TB reality — row
size. The fixture (tools/build_degenerate_fixtures.py::build_pathological,
shared with the one-command ``check_correctness.py --fixture pathological``
sweep) blows five sf0.001 documents up to pathological shapes and hands one
user ~50% of all events:

- a ~4 MB body where every token is unique (high entropy — worst case for
  shingle/minhash explode width),
- an exact 100k-token document,
- a ~2 MB one-phrase repeat (low entropy — hot shingle keys),
- a 2 MB single unbroken token (no whitespace anywhere),
- a ~16.6 MB body crossing parquet's 16 MB page edge.

The campaign found and fixed two operators that are quadratic (or worse)
in row size:

- q78_doc_chunking exploded chunk STARTS while carrying the full text
  column — every output UnsafeRow copies the whole body (16 MB × 110k
  chunks ≈ 1.8 TB in one task) — and per-chunk ``substring`` re-walks
  code points from offset 0. Fixed with two-level blocks: cut the body
  once into ~67k-char blocks (+overlap), char-split each block once,
  slice the array per chunk. Oracle restructured identically.
- qx21_bpe_pair_counts built char pairs via ``substr(wd, i, 1)`` — O(i)
  per call, O(len²) per word on BOTH engines; a 2 MB single token never
  finishes. Fixed with block-split + one codegen'd
  ``regexp_extract_all(blk, '(?s)(?=(\\S\\S))\\S', 1)`` pass (consuming
  one code point per match keeps scanning code-point-aligned — a bare
  lookahead fires at UTF-16 low-surrogate offsets and mints bogus pairs
  on emoji). Oracle indexes a pre-split char array, O(len) per word.

Existing caps that the fixture PROVES hold (no cap added, oracles
unchanged): shingle/band candidate generation is bounded by document-
frequency / bucket-width caps (SHINGLE_DF_CAP, BAND_BUCKET_CAP,
WINNOW_FP_DF_CAP) — the 16 MB doc adds shingles but never pairs beyond
cap²; the collect_list assemblies (qx33 sequences, sessionization) hold
per-group state linear in the group's own rows, which the hot user
stresses at 50% of the table; edit-distance is prefix-capped at 80 chars
(EDIT_PREFIX_CHARS) so the 2 MB token costs O(80²), not O(len²).
"""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/tools")

from build_degenerate_fixtures import (  # noqa: E402
    PATH_100K_DOC,
    PATH_MEGA_DOC,
    PATH_ONE_TOKEN_DOC,
    PATH_PAGE_EDGE_DOC,
    PATH_REPEAT_DOC,
    build_pathological,
)
from check_correctness import normalize, register_oracle_views  # noqa: E402

SRC = "/root/testdata/sf0.001"

# the explode / collect_list / per-row-linear band the campaign targets
SIZE_AUDITED = [
    # fixed this round
    "q78_doc_chunking",
    "qx21_bpe_pair_counts",
    # shingle explode + banded candidate generation (cap discipline)
    "q85_exact_dedup",
    "q86_minhash_lsh_pairs",
    "q87_simhash_fingerprints",
    "q88_jaccard_similar_pairs",
    "qx04_incremental_dedup",
    "qx20_duplicated_spans",
    "qx24_containment_pairs",
    "qx80_winnowing_fingerprint_pairs",
    # token pipelines (per-doc token counts in the millions)
    "q59_token_budget_selection",
    "q64_sequence_packing",
    "q82_token_counting",
    "qx14_bigram_logprob_quality",
    "qx40_inverted_index",
    # per-doc scalar passes over multi-MB bodies
    "q80_text_quality_stats",
    "q81_language_id",
    # hot-user skew: collect_list assemblies + sessionization
    "qx32_user_feature_vector",
    "qx33_user_event_sequences",
    "q57_stateful_sessionize",
    "qx82_concurrent_sessions",
    "qy06_session_funnel",
]


@pytest.fixture(scope="module")
def path_sf_dir(tmp_path_factory):
    return build_pathological(SRC, str(tmp_path_factory.mktemp("pathological")))


@pytest.fixture(scope="module")
def path_oracle_con(path_sf_dir):
    con = duckdb.connect()
    register_oracle_views(con, path_sf_dir)
    yield con
    con.close()


def test_fixture_actually_is_pathological(spark, path_sf_dir):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{path_sf_dir}/documents.parquet")
    sizes = {r["doc_id"]: (r["n"], r["toks"]) for r in docs.select(
        "doc_id",
        F.length("text").alias("n"),
        F.size(F.split("text", r"\s+")).alias("toks"),
    ).collect()}
    assert sizes[PATH_PAGE_EDGE_DOC][0] > 16 * 1024 * 1024  # past the edge
    assert sizes[PATH_MEGA_DOC][0] > 4_000_000
    assert sizes[PATH_100K_DOC][1] == 100_000
    assert sizes[PATH_REPEAT_DOC][0] > 2_000_000
    assert sizes[PATH_ONE_TOKEN_DOC] == (2_000_000, 1)  # no whitespace at all
    ev = spark.read.parquet(f"{path_sf_dir}/events.parquet")
    top = (ev.groupBy("user_id").count().orderBy(F.desc("count"))
           .first()["count"])
    assert top >= ev.count() * 0.5  # one user owns half the table


@pytest.mark.parametrize("name", SIZE_AUDITED)
def test_pathological_rows_oracle_parity(spark, path_sf_dir, path_oracle_con, name):
    import __spark_entry__ as entry
    from kafka2delta_spark.queryset import ORACLES

    sdf = entry.queries()[name](spark, path_sf_dir).toPandas()
    odf = path_oracle_con.execute(ORACLES[name]).fetchdf()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)
    assert len(sdf) == len(odf), f"{name}: {len(sdf)} vs {len(odf)} rows"
    assert normalize(sdf, cols) == normalize(odf, cols)


def test_chunker_block_layout_matches_naive_semantics(spark):
    """The q78 rewrite's unit pin: block-layout chunks are byte-identical
    to the naive per-start substring definition, including the partial
    last chunk, a doc shorter than one block, and — the 2026-08-16 ADVICE
    gap — docs spanning MULTIPLE CHUNK_LONG_BLOCKs, so the block-boundary
    stitching (overlap carry, exclusion of chunk starts inside the
    overlap region via the CHUNK_LONG_BLOCK-1 bound, chunk_idx
    continuity across blocks) is pinned by this fast unit test and not
    only by the fixture parity sweep."""
    from pyspark.sql import functions as F

    from kafka2delta_spark.functions.pipeline import (
        CHUNK_LONG_BLOCK,
        CHUNK_SIZE,
        CHUNK_STRIDE,
        q78_doc_chunking,
    )

    import tempfile

    def body_of(n_chars: int) -> str:
        # period-free BMP content: a repeat with period 150 or 270,000
        # would make block-misaligned slices hash-equal by accident
        return "".join(chr(0x3041 + (i * 7919) % 83) for i in range(n_chars))

    assert CHUNK_LONG_BLOCK == 270_000 and CHUNK_STRIDE == 150  # pins below
    bodies = {
        1: body_of(240_000),                  # 1 long-block (prior coverage)
        2: "short ünïcode ✨ text",            # naive path, partial chunk
        3: body_of(600_000),                  # 3 blocks; exact stride multiple
        4: body_of(CHUNK_LONG_BLOCK + 30),    # ends INSIDE block 0's overlap
        5: body_of(2 * CHUNK_LONG_BLOCK),     # len exactly on a block edge
    }
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, b, "ja", "s", len(b)) for i, b in bodies.items()],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).write.parquet(f"{d}/documents.parquet")
        got = {(r["doc_id"], r["chunk_idx"]): (r["chunk_start"], r["chunk_len"], r["chunk_md5"])
               for r in q78_doc_chunking(spark, d).collect()}

    import hashlib

    for doc_id, body in bodies.items():
        starts = list(range(0, len(body), CHUNK_STRIDE))
        rows = [r for r in got if r[0] == doc_id]
        assert len(rows) == len(starts), f"doc {doc_id}"
        for s in starts:
            chunk = body[s:s + CHUNK_SIZE]
            st, ln, h = got[(doc_id, s // CHUNK_STRIDE)]
            assert st == s and ln == len(chunk), f"doc {doc_id} start {s}"
            assert h == hashlib.md5(chunk.encode()).hexdigest(), \
                f"doc {doc_id} start {s}"


def test_split_alias_not_inlined_into_lambda(spark):
    """Plan-shape guard (2026-08-16 ADVICE): q78's long path and q67 keep
    their O(block)/O(len) token/char split evaluated ONCE per row by
    binding it as a named alias that CollapseProject declines to inline
    (a non-cheap alias referenced more than once). That optimizer
    heuristic is undocumented and version-dependent; if a Spark upgrade
    starts inlining it, the split re-runs once per lambda element
    (measured +27 s per block on the pathological fixture, never-
    finishing for q67 on a 16.9 MB doc) with no correctness test
    failing. Pin the plan: exactly one `split(` in each optimized plan —
    an inlined split appears once per reference site instead."""
    from kafka2delta_spark.functions.dedup import q67_boilerplate_chunks
    from kafka2delta_spark.functions.pipeline import q78_doc_chunking

    sf = "/root/testdata/sf0.001"
    import re

    for name, fn in (("q78", q78_doc_chunking), ("q67", q67_boilerplate_chunks)):
        df = fn(spark, sf)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        # word-boundary anchor (2026-08-16 ADVICE): a bare substring
        # count also matches split_part( / str_split( etc., so a
        # harmless refactor could flip the assertion either way.
        n = len(re.findall(r"(?<![A-Za-z_])split\(", plan))
        assert n == 1, f"{name}: expected exactly 1 split( in optimized " \
                       f"plan, found {n} — CollapseProject inlined the " \
                       f"multiply-referenced alias?\n{plan}"


def test_bpe_pairs_code_point_aligned_on_emoji(spark):
    """The qx21 rewrite's unit pin: supplementary-plane characters yield
    code-point pairs, never surrogate-half garbage, across a block
    boundary too."""
    import tempfile

    from pyspark.sql import functions as F

    from kafka2delta_spark.functions.text import qx21_bpe_pair_counts

    body = "🚀🔥💯xé日aa x😀😀y"
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(1, body, "en", "s", len(body))],
            "doc_id bigint, text string, lang string, source string, n_chars bigint",
        ).write.parquet(f"{d}/documents.parquet")
        rows = qx21_bpe_pair_counts(spark, d).collect()
    got = {(r["pair_left"], r["pair_right"]): r["n_occurrences"] for r in rows}
    assert got[("😀", "😀")] == 1
    assert got[("🚀", "🔥")] == 1
    assert got[("a", "a")] == 1
    assert "?" not in "".join(k[0] + k[1] for k in got)
