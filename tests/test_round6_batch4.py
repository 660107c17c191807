"""Invariant tests for qx83 (KMV rollup cube), qx88 (WAV header audit),
and qx91 (source modularity) at sf0.001.
"""

import struct

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_kmv_cube_levels_consistent(spark):
    from kafka2delta_spark.operators.advanced import KMV_K
    from kafka2delta_spark.operators.advanced import qx83_kmv_rollup_cube

    rows = qx83_kmv_rollup_cube(spark, SF_DIR).collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r["level"], []).append(r)
    assert set(by_level) == {"type_dow", "type", "dow", "all"}
    # exactness below K: any cell whose sketch is not full must be exact
    for r in rows:
        if r["sketch_size"] < KMV_K:
            assert r["est_distinct"] == r["true_distinct"]
            assert r["err_e4"] == 0
    # lattice consistency: true distincts can only grow up the lattice
    all_row = by_level["all"][0]
    for r in by_level["type"] + by_level["dow"]:
        assert r["true_distinct"] <= all_row["true_distinct"]
    for r in by_level["type_dow"]:
        t = next(
            x for x in by_level["type"] if x["event_type"] == r["event_type"]
        )
        assert r["true_distinct"] <= t["true_distinct"]


def test_wav_header_parses_with_struct(spark):
    # parse the synthesized binary with python's struct module — an
    # independent third implementation of the little-endian layout
    from kafka2delta_spark.functions.multimodal import synthesize_wav_header
    from kafka2delta_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id").limit(50)
    payloads = docs.select(
        "doc_id",
        synthesize_wav_header(
            F.lit(8000) + (F.col("doc_id") % 5) * 4000,
            F.lit(1) + F.col("doc_id") % 2,
            F.lit(1000) + F.col("doc_id") % 9000,
        ).alias("p"),
    ).collect()
    for r in payloads:
        p = bytes(r["p"])
        doc_id = r["doc_id"]
        assert p[:4] == b"RIFF" and p[8:16] == b"WAVEfmt "
        assert len(p) == 44
        (fmt_size,) = struct.unpack("<I", p[16:20])
        audio_fmt, ch = struct.unpack("<HH", p[20:24])
        sr, br = struct.unpack("<II", p[24:32])
        ba, bits = struct.unpack("<HH", p[32:36])
        assert p[36:40] == b"data"
        (ds,) = struct.unpack("<I", p[40:44])
        assert fmt_size == 16 and audio_fmt == 1 and bits == 16
        assert ch == 1 + doc_id % 2
        assert sr == 8000 + (doc_id % 5) * 4000
        assert ba == ch * 2 and br == sr * ba
        assert ds == (1000 + doc_id % 9000) * ba
        (chunk,) = struct.unpack("<I", p[4:8])
        assert chunk == ds + 36


def test_modularity_graph_identities(spark):
    from kafka2delta_spark.functions.dedup import _jaccard_edges
    from kafka2delta_spark.operators.mining import qx91_source_modularity

    m = _jaccard_edges(spark, SF_DIR).count()
    rows = {r["source"]: r for r in qx91_source_modularity(spark, SF_DIR).collect()}
    total = rows.pop("ALL")
    # every edge endpoint lands in exactly one source: Σ degree = 2m
    assert total["degree_sum"] == 2 * m
    assert sum(r["degree_sum"] for r in rows.values()) == 2 * m
    # intra edges cannot exceed total edges; Q <= 1
    assert total["intra_edges"] <= m
    assert sum(r["intra_edges"] for r in rows.values()) == total["intra_edges"]
    assert total["modularity_e6"] <= 1_000_000
    # q_num identity: 4m*e_s - d_s^2 per source
    for r in rows.values():
        assert (
            r["q_num"]
            == 4 * m * r["intra_edges"] - r["degree_sum"] * r["degree_sum"]
        )
