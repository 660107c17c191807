#!/usr/bin/env python
"""Build the four degenerate test fixtures from a clean sf directory.

Each fixture is a full copy of the source scale factor's ten parquet
tables with ONE class of real-world corruption injected deterministically
(same injections the round-9 degenerate-input campaign pinned with tests —
tests/test_null_corpus.py imports these builders, so the one-command
artifact and the test suite can never drift):

  nullvals  — NULLs in the value columns of documents/events/embeddings
              (failed fetches/parses; keys and ts stay NOT NULL).
  nullkeys  — ~5% anonymous events (user_id IS NULL).
  nonfinite — NaN (~3%) and ±Infinity (~3%) in events.value
              (corrupt sensor readings).
  unicode   — Unicode edge cases in documents.text (emoji, CJK, NBSP,
              combining chars, zero-width, case-mapping traps), n_chars
              recomputed.
  pathological — per-row SIZE skew (the round-10 campaign): a ~4 MB
              all-unique-token body, an exact 100k-token doc, a ~2 MB
              low-entropy repeated phrase, a 2 MB single unbroken token
              (no whitespace at all), a ~16.6 MB body crossing parquet's
              16 MB page edge, and one user reassigned ~50% of all
              events (hot-key skew for sessionization/collect_list).

Usage:
    python tools/build_degenerate_fixtures.py <name|all> [--src SRC] [--dst DST]

Defaults: SRC=/root/testdata/sf0.001, DST=/tmp/degen_fixtures/<name>.
The correctness sweep over a built fixture is
``python tools/check_correctness.py --fixture <name>`` (which calls into
this module and then runs the full query-vs-oracle comparison).
"""

from __future__ import annotations

import argparse
import os

DEFAULT_SRC = "/root/testdata/sf0.001"
DEFAULT_ROOT = "/tmp/degen_fixtures"

ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

FIXTURES = (
    "nullvals", "nullkeys", "nonfinite", "unicode", "pathological",
    "timeskew", "compound", "collisions",
)

# Pathological-row knobs (deterministic; doc ids chosen from sf0.001's
# 0..499 range). Sizes are the round-10 campaign targets: "multi-MB
# bodies, a 100k-token doc, a value at the 16 MB parquet page edge, one
# user owning ~50% of events".
PATH_MEGA_DOC = 7        # ~4.1 MB, every token unique (high entropy)
PATH_100K_DOC = 23       # exactly 100k tokens (~1.3 MB)
PATH_REPEAT_DOC = 41     # ~2.1 MB, one 11-token phrase repeated 30k times
PATH_ONE_TOKEN_DOC = 59  # 2 MB single unbroken token (no whitespace)
PATH_PAGE_EDGE_DOC = 77  # ~16.9 MB — PAST the 16 MiB parquet page edge
PATH_ABUT_PII_DOC = 95   # abutting emails/phones: run-start-only contract
#                          (a 1200-unique-token paragraph repeated 1280x)


def _copy_tables(con, src: str, dst: str, tables) -> None:
    for t in tables:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )


def build_nullvals(src: str, dst: str) -> str:
    """NULLs in the pipeline tables' value columns; keys/ts stay NOT NULL
    (like the TPC-H tables)."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    _copy_tables(con, src, dst, (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem",
    ))
    con.execute(f"""COPY (SELECT doc_id,
        CASE WHEN doc_id % 7 != 3 THEN text END AS text, lang, source, n_chars
        FROM read_parquet('{src}/documents.parquet'))
        TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT event_id, ts, user_id,
        CASE WHEN event_id % 17 != 9 THEN event_type END AS event_type,
        CASE WHEN event_id % 11 != 5 THEN value END AS value,
        CASE WHEN event_id % 13 != 7 THEN props END AS props
        FROM read_parquet('{src}/events.parquet'))
        TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT vec_id,
        CASE WHEN vec_id % 9 != 4 THEN embedding END AS embedding,
        CASE WHEN vec_id % 13 != 6 THEN label END AS label
        FROM read_parquet('{src}/embeddings.parquet'))
        TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
    con.close()
    return dst


def build_nullkeys(src: str, dst: str) -> str:
    """~5% anonymous events (NULL user_id); all other columns intact."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    _copy_tables(con, src, dst, (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ))
    con.execute(f"""COPY (SELECT event_id, ts,
        CASE WHEN event_id % 19 != 11 THEN user_id END AS user_id,
        event_type, value, props
        FROM read_parquet('{src}/events.parquet'))
        TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.close()
    return dst


def build_nonfinite(src: str, dst: str) -> str:
    """NaN (~3%) and ±Infinity (~3%) in events.value; everything else
    intact."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    _copy_tables(con, src, dst, (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "documents", "embeddings",
    ))
    con.execute(f"""COPY (SELECT event_id, ts, user_id, event_type,
        CASE WHEN event_id % 29 = 17 THEN 'nan'::DOUBLE
             WHEN event_id % 31 = 19 THEN 'infinity'::DOUBLE
             WHEN event_id % 37 = 23 THEN '-infinity'::DOUBLE
             ELSE value END AS value, props
        FROM read_parquet('{src}/events.parquet'))
        TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.close()
    return dst


def build_unicode(src: str, dst: str) -> str:
    """Deterministic Unicode edge cases in documents.text (n_chars
    recomputed from the new text)."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    _copy_tables(con, src, dst, (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ))
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
        FROM read_parquet('{src}/documents.parquet'))
      SELECT doc_id, text, lang, source, length(text) AS n_chars FROM m
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    con.close()
    return dst


def build_pathological(src: str, dst: str) -> str:
    """Per-row size skew: five documents blown up to pathological shapes
    (n_chars recomputed) and one existing user reassigned ~50% of all
    events. Embeddings keep their fixed dimension — vector dim is a
    schema contract (cosine requires equal dims), so array-size stress
    lives in the multi-MB string columns, which is also where parquet's
    16 MB page edge bites."""
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    _copy_tables(con, src, dst, (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "embeddings",
    ))
    con.execute(f"""
    COPY (
      WITH mega AS (
        SELECT string_agg(substr(md5(i::VARCHAR), 1, 12), ' ' ORDER BY i) AS body
        FROM range(320000) t(i)),
      toks100k AS (
        SELECT string_agg('w' || substr(md5((i * 7)::VARCHAR), 1, 6), ' ' ORDER BY i) AS body
        FROM range(100000) t(i)),
      para AS (
        SELECT string_agg(substr(md5('p' || i::VARCHAR), 1, 10), ' ' ORDER BY i) AS p
        FROM range(1200) t(i)),
      m AS (
        SELECT d.doc_id, d.lang, d.source,
          CASE d.doc_id
            WHEN {PATH_MEGA_DOC}      THEN (SELECT body FROM mega)
            WHEN {PATH_100K_DOC}      THEN (SELECT body FROM toks100k)
            WHEN {PATH_REPEAT_DOC}    THEN repeat('lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod ', 30000)
            WHEN {PATH_ONE_TOKEN_DOC} THEN repeat('x', 2000000)
            WHEN {PATH_PAGE_EDGE_DOC} THEN (SELECT repeat(p || ' ', 1280) FROM para)
            WHEN {PATH_ABUT_PII_DOC}  THEN 'a@bb.cc1@dd.ee then a@b.cc.x@d.ee chain a@b.cc1@d.ee2@e.ff digits 555-123-45678901 tail x@y.zz.a@b.cc done'
            ELSE d.text END AS text
        FROM read_parquet('{src}/documents.parquet') d)
      SELECT doc_id, text, lang, source, length(text) AS n_chars FROM m
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      WITH hot AS (SELECT min(user_id) AS u
                   FROM read_parquet('{src}/events.parquet')
                   WHERE user_id IS NOT NULL)
      SELECT event_id, ts,
             CASE WHEN event_id % 2 = 0 THEN (SELECT u FROM hot)
                  ELSE user_id END AS user_id,
             event_type, value, props
      FROM read_parquet('{src}/events.parquet')
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.close()
    return dst


def build_timeskew(src: str, dst: str) -> str:
    """Temporal disorder (the round-11 campaign; seventh parity
    dimension): clock-skewed timestamps and destroyed physical time
    order, injected deterministically by key.

    events (by event_id % 17):
      == 3  -> ts shifted 80 YEARS into the past (~1944: negative epoch;
               floor-vs-truncate integer division on negative epoch
               microseconds is the classic engine divergence)
      == 5  -> ts shifted 100 YEARS into the future (~2124)
      == 7  -> ts pinned to 1969-12-31 23:59:59.5 (epoch -0.5 s: a
               NEGATIVE epoch with a FRACTIONAL second — rounding-mode
               traps on every epoch/bucket conversion)
      == 9  -> ts pinned to 2024-01-15 12:00:00 exactly (mass ties:
               order-sensitivity under equal sort keys)
    plus the physical row order is shuffled by hash(event_id), so any
    operator that silently relied on the parquet's near-time-order
    (sessionization, inter-arrival, as-of logic) sees worst-case input.

    orders (by o_orderkey % 23): == 7 -> o_orderdate -100 years
    (pre-1970 DATEs), == 11 -> +100 years; physical order shuffled by
    hash(o_orderkey). lineitem's l_shipdate shifts with the parent order
    (join consistency: date arithmetic between the two tables stays
    coherent).
    """
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    _copy_tables(con, src, dst, (
        "region", "nation", "customer", "supplier", "part",
        "documents", "embeddings",
    ))
    con.execute(f"""
    COPY (
      SELECT event_id,
             CASE event_id % 17
               WHEN 3 THEN ts - INTERVAL 80 YEARS
               WHEN 5 THEN ts + INTERVAL 100 YEARS
               WHEN 7 THEN TIMESTAMP '1969-12-31 23:59:59.5'
               WHEN 9 THEN TIMESTAMP '2024-01-15 12:00:00'
               ELSE ts END AS ts,
             user_id, event_type, value, props
      FROM read_parquet('{src}/events.parquet')
      ORDER BY hash(event_id)
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      SELECT * REPLACE (
        CASE o_orderkey % 23
          WHEN 7 THEN o_orderdate - INTERVAL 100 YEARS
          WHEN 11 THEN o_orderdate + INTERVAL 100 YEARS
          ELSE o_orderdate END AS o_orderdate)
      FROM read_parquet('{src}/orders.parquet')
      ORDER BY hash(o_orderkey)
    ) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      SELECT l.* REPLACE (
        CASE l.l_orderkey % 23
          WHEN 7 THEN l.l_shipdate - INTERVAL 100 YEARS
          WHEN 11 THEN l.l_shipdate + INTERVAL 100 YEARS
          ELSE l.l_shipdate END AS l_shipdate)
      FROM read_parquet('{src}/lineitem.parquet') l
      ORDER BY hash(l.l_orderkey), hash(l.l_linenumber)
    ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")
    con.close()
    return dst


COMPOUND_BIG_UNI_DOC = 61   # ~1.1 MB emoji/CJK/combining body: size x unicode
COMPOUND_ABUT_PII_DOC = 95  # abutting emails: PII x unicode fixture context


def build_compound(src: str, dst: str) -> str:
    """ALL six corruption classes composed on one fixture (the round-11
    interaction campaign). Each single-dimension fixture proves one class
    in isolation; this one proves the classes don't mask or amplify each
    other — the overlaps are deliberate and deterministic:

      events: timeskew shifts (1944/2124/epoch -0.5 s/mass ties, same
        ``% 17`` sites as build_timeskew) x NULL user_id (``% 19 = 11``,
        so some anonymous rows are ALSO pre-1970 — NULL-keyed late data)
        x NULL value/props/event_type (nullvals sites; ``% 17 = 9`` makes
        every mass-tie row ALSO a NULL event_type — ties under a NULL
        group key) x NaN/±Inf (nonfinite sites, NULL wins where both
        match) x a hot user owning ~half the non-anonymous events
        (hot-key skew ON TOP of NULL keys) x physical order shuffled.
      documents: the unicode traps (same ``% 11`` sites) x NULL text
        (``% 7 = 3``, NULL wins) x a NEW multi-MB emoji/CJK/combining
        body (doc 61, ~1.2 M code points / ~2.2 MB UTF-8 — per-row size
        skew expressed in non-ASCII, where code-point != byte !=
        grapheme) x the abutting-PII row (doc 95).
      embeddings: NULL embedding (``% 9 = 4``) and NULL label
        (``% 13 = 6``).
      orders/lineitem: ±100-year date shifts (same ``% 23`` sites,
        join-consistent) x shuffled physical order.
    """
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    _copy_tables(con, src, dst, (
        "region", "nation", "customer", "supplier", "part",
    ))
    con.execute(f"""
    COPY (
      WITH hot AS (SELECT min(user_id) AS u
                   FROM read_parquet('{src}/events.parquet')
                   WHERE user_id IS NOT NULL)
      SELECT event_id,
             CASE event_id % 17
               WHEN 3 THEN ts - INTERVAL 80 YEARS
               WHEN 5 THEN ts + INTERVAL 100 YEARS
               WHEN 7 THEN TIMESTAMP '1969-12-31 23:59:59.5'
               WHEN 9 THEN TIMESTAMP '2024-01-15 12:00:00'
               ELSE ts END AS ts,
             CASE WHEN event_id % 19 = 11 THEN NULL
                  WHEN event_id % 2 = 0 THEN (SELECT u FROM hot)
                  ELSE user_id END AS user_id,
             CASE WHEN event_id % 17 != 9 THEN event_type END AS event_type,
             CASE WHEN event_id % 11 = 5 THEN NULL
                  WHEN event_id % 29 = 17 THEN 'nan'::DOUBLE
                  WHEN event_id % 31 = 19 THEN 'infinity'::DOUBLE
                  WHEN event_id % 37 = 23 THEN '-infinity'::DOUBLE
                  ELSE value END AS value,
             CASE WHEN event_id % 13 != 7 THEN props END AS props
      FROM read_parquet('{src}/events.parquet')
      ORDER BY hash(event_id)
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      WITH uni AS (
        SELECT string_agg(
          '🚀日本語' || chr(160) || 'cafe' || chr(769) || ' 中文테스트 ﬁß'
            || chr(8203) || 'x' || substr(md5(i::VARCHAR), 1, 8), ' '
          ORDER BY i) AS body
        FROM range(40000) t(i)),
      m AS (
        SELECT d.doc_id, d.lang, d.source,
          CASE
            WHEN d.doc_id = {COMPOUND_BIG_UNI_DOC} THEN (SELECT body FROM uni)
            WHEN d.doc_id = {COMPOUND_ABUT_PII_DOC} THEN
              'a@bb.cc1@dd.ee then a@b.cc.x@d.ee chain a@b.cc1@d.ee2@e.ff'
              || ' digits 555-123-45678901 tail x@y.zz.a@b.cc done'
            WHEN d.doc_id % 7 = 3 THEN NULL
            ELSE CASE d.doc_id % 11
              WHEN 1 THEN 'café ñoño ' || d.text
              WHEN 2 THEN d.text || ' 日本語テキスト 中文 한국어'
              WHEN 3 THEN '🚀🔥💯 ' || d.text || ' 🎉'
              WHEN 4 THEN replace(d.text, ' the ', ' the' || chr(160))
              WHEN 5 THEN d.text || ' İstanbul ß STRASSE ligatures ﬁﬂ'
              WHEN 6 THEN d.text || ' cafe' || chr(769) || ' naive' || chr(776)
              WHEN 7 THEN d.text || ' zero' || chr(8203) || 'width' || chr(8205) || 'joined'
              ELSE d.text END
          END AS text
        FROM read_parquet('{src}/documents.parquet') d)
      SELECT doc_id, text, lang, source, length(text) AS n_chars FROM m
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""COPY (SELECT vec_id,
        CASE WHEN vec_id % 9 != 4 THEN embedding END AS embedding,
        CASE WHEN vec_id % 13 != 6 THEN label END AS label
        FROM read_parquet('{src}/embeddings.parquet'))
        TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      SELECT * REPLACE (
        CASE o_orderkey % 23
          WHEN 7 THEN o_orderdate - INTERVAL 100 YEARS
          WHEN 11 THEN o_orderdate + INTERVAL 100 YEARS
          ELSE o_orderdate END AS o_orderdate)
      FROM read_parquet('{src}/orders.parquet')
      ORDER BY hash(o_orderkey)
    ) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      SELECT l.* REPLACE (
        CASE l.l_orderkey % 23
          WHEN 7 THEN l.l_shipdate - INTERVAL 100 YEARS
          WHEN 11 THEN l.l_shipdate + INTERVAL 100 YEARS
          ELSE l.l_shipdate END AS l_shipdate)
      FROM read_parquet('{src}/lineitem.parquet') l
      ORDER BY hash(l.l_orderkey), hash(l.l_linenumber)
    ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)""")
    con.close()
    return dst


# --- collisions fixture (round-12 campaign; eighth parity dimension) ------
#
# Adversarial hash/band collisions: every cap, tie-break, and bucket path
# in the dedup/retrieval/CDC core assumes collisions are RARE; this
# fixture makes them the common case.
#
# The magnet shingle: a 3-token phrase brute-forced (40M md5 candidates)
# so that md5('0:'||s) and md5('1:'||s) BOTH start with '000' — i.e. it
# wins the min over seeds 0 and 1 against any realistic 40-shingle doc.
# Two documents that share ONLY this phrase (token Jaccard ~1.2%)
# therefore collide in LSH band 0 while bands 1-3 differ: a candidate
# pair with NO textual similarity. Verified deterministically by
# tests/test_collision_rows.py against the real pipeline.
COLL_MAGNET = "mag7831402a mag7831402b mag7831402c"
# md5('0:'||magnet) = 0004fbf2..., md5('1:'||magnet) = 0007e7dd...
COLL_MAG_DOC_A = 310
COLL_MAG_DOC_B = 311
COLL_MAG_TEXT_A = COLL_MAGNET + " " + " ".join(f"fa0x{i}" for i in range(40))
COLL_MAG_TEXT_B = COLL_MAGNET + " " + " ".join(f"fb0x{i}" for i in range(40))
# Rotation pair: different texts (different token MULTISETS, so exact
# dedup keeps them distinct) whose k=3 shingle SETS are identical —
# MinHash signatures match in all 8 seeds, so they collide in ALL 4
# bands and their shingle-space Jaccard is exactly 1.0.
COLL_ROT_DOC_A = 300
COLL_ROT_DOC_B = 301
COLL_ROT_TEXT_A = "alpha beta " * 50 + "alpha"
COLL_ROT_TEXT_B = "beta alpha " * 50 + "beta"
# Identical-text clusters bracketing the candidate caps: every shingle
# and band bucket of the 65-cluster has width 65 (one past
# SHINGLE_DF_CAP/BAND_BUCKET_CAP=64, dropped on both engines); the
# 64-cluster sits exactly AT the cap (kept -> C(64,2)=2016 pairs).
COLL_OVER_LO, COLL_OVER_HI = 100, 164     # 65 docs
COLL_AT_LO, COLL_AT_HI = 200, 263         # 64 docs
COLL_OVER_TEXT = "over cap duplicate cluster body " + " ".join(
    f"ovr{i}tok" for i in range(24)
)
COLL_AT_TEXT = "at cap duplicate cluster body " + " ".join(
    f"atc{i}tok" for i in range(24)
)
# Stop phrase appended to doc_id % 5 == 4 (75 docs after exclusions):
# its 5 interior shingles exceed SHINGLE_DF_CAP and leave q88's shingle
# space; the crossing shingles at each doc's tail stay.
COLL_STOP_PHRASE = "shared stop phrase occurs verbatim here everywhere"


def build_collisions(src: str, dst: str) -> str:
    """Adversarial hash/band collisions (round-12 campaign; the eighth
    parity dimension):

      documents: the 65/64 identical-text clusters bracketing
        BAND_BUCKET_CAP/SHINGLE_DF_CAP, the rotation pair (identical
        shingle sets, different texts), the magnet pair (band-0 LSH
        collision at ~1% token Jaccard), and a 75-doc shared stop
        phrase saturating the shingle-DF cap. The identical clusters
        also force mass SCORE ties in every retrieval/ranking query
        (equal BM25, equal TF-IDF, equal quality scores) — any top-k
        that breaks ties by partition layout instead of a key diverges
        here.
      events: ~4% of rows duplicated EXACTLY (same event_id, same
        everything — at-least-once upstream delivery), physical order
        shuffled: every latest-per-key / distinct / join path sees
        duplicate primary keys whose winner must be value-identical.
      embeddings: vec_ids 100..169 share ONE identical vector — exact
        cosine ties in every ANN/top-k path, and a 70-wide sign-LSH /
        IVF bucket of zero-distance neighbors.
    """
    import duckdb

    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    _copy_tables(con, src, dst, (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem",
    ))
    con.execute(f"""
    COPY (
      WITH m AS (
        SELECT d.doc_id, d.lang, d.source,
          CASE
            WHEN d.doc_id BETWEEN {COLL_OVER_LO} AND {COLL_OVER_HI}
              THEN '{COLL_OVER_TEXT}'
            WHEN d.doc_id BETWEEN {COLL_AT_LO} AND {COLL_AT_HI}
              THEN '{COLL_AT_TEXT}'
            WHEN d.doc_id = {COLL_ROT_DOC_A} THEN '{COLL_ROT_TEXT_A}'
            WHEN d.doc_id = {COLL_ROT_DOC_B} THEN '{COLL_ROT_TEXT_B}'
            WHEN d.doc_id = {COLL_MAG_DOC_A} THEN '{COLL_MAG_TEXT_A}'
            WHEN d.doc_id = {COLL_MAG_DOC_B} THEN '{COLL_MAG_TEXT_B}'
            WHEN d.doc_id % 5 = 4 THEN d.text || ' {COLL_STOP_PHRASE}'
            ELSE d.text END AS text
        FROM read_parquet('{src}/documents.parquet') d)
      SELECT doc_id, text, lang, source, length(text) AS n_chars FROM m
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      WITH base AS (
        SELECT * FROM read_parquet('{src}/events.parquet')),
      dupd AS (
        SELECT * FROM base
        UNION ALL
        SELECT * FROM base WHERE event_id % 23 = 5)
      SELECT * FROM dupd ORDER BY hash(event_id + 1e6::BIGINT), hash(ts)
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
    COPY (
      WITH shared AS (
        SELECT embedding AS e FROM read_parquet('{src}/embeddings.parquet')
        WHERE vec_id = 100)
      SELECT vec_id,
             CASE WHEN vec_id BETWEEN 100 AND 169 THEN (SELECT e FROM shared)
                  ELSE embedding END AS embedding,
             label
      FROM read_parquet('{src}/embeddings.parquet')
    ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
    con.close()
    return dst


BUILDERS = {
    "nullvals": build_nullvals,
    "nullkeys": build_nullkeys,
    "nonfinite": build_nonfinite,
    "unicode": build_unicode,
    "pathological": build_pathological,
    "timeskew": build_timeskew,
    "compound": build_compound,
    "collisions": build_collisions,
}


def build_fixture(name: str, src: str = DEFAULT_SRC, dst: str | None = None) -> str:
    """Build one fixture; returns the directory holding its ten tables."""
    if name not in BUILDERS:
        raise ValueError(f"unknown fixture {name!r}; one of {sorted(BUILDERS)}")
    if dst is None:
        dst = os.path.join(DEFAULT_ROOT, name)
    return BUILDERS[name](src, dst)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", choices=(*FIXTURES, "all"))
    ap.add_argument("--src", default=DEFAULT_SRC)
    ap.add_argument("--dst", default=None,
                    help=f"output dir (default {DEFAULT_ROOT}/<name>)")
    args = ap.parse_args()
    names = FIXTURES if args.name == "all" else (args.name,)
    for n in names:
        dst = args.dst if (args.dst and args.name != "all") else None
        out = build_fixture(n, args.src, dst)
        print(f"built fixture {n}: {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
