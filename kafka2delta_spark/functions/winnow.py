"""Winnowing document fingerprints (the MOSS algorithm) — qx80.

Robust near-dup detection for partial overlap: instead of hashing EVERY
k-gram (q83's rolling fingerprints) or sketching the whole doc (q86
minhash), winnowing slides a window of ``WINNOW_W`` consecutive k-gram
hashes over the document and keeps each window's MINIMUM — guaranteeing
that any shared substring of length ≥ w + k − 1 tokens contributes at
least one COMMON selected fingerprint to both documents, at an expected
density of only 2/(w+1) of the k-gram stream (Schleimer, Wilkerson &
Aiken, SIGMOD 2003 — the algorithm behind MOSS). Selection here is by
hash VALUE within the window (set semantics after distinct), which keeps
both engines trivially identical; the positional tie rules of the paper
matter only for position-reporting, which this operator does not emit.

Scale shape: the fingerprint table is ~2/(w+1) the size of the k-gram
stream; pair generation reuses the q88 bucket discipline (group by
fingerprint, document-frequency cap against boilerplate, in-bucket pair
expansion) — never an all-pairs join. All arithmetic integer; hashes are
the engine-portable 52-bit md5 prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka2delta_spark.functions.dedup import pairs_within_groups
from kafka2delta_spark.queryset import register
from kafka2delta_spark.functions.measure import ascii_lower
from kafka2delta_spark.sources.tables import load_table

WINNOW_K = 3  # tokens per k-gram
WINNOW_W = 4  # k-gram hashes per winnowing window
WINNOW_FP_DF_CAP = 64  # drop fingerprints shared by more docs (boilerplate)
WINNOW_MIN_SHARED = 2  # report pairs sharing at least this many fingerprints


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, fp) winnowed fingerprints.

    Positional k-grams (lead-window over posexplode — the shingle_rows
    codegen idiom, but keeping order and duplicates: winnowing is defined
    over the k-gram STREAM), 52-bit md5 hashes, per-window minimum via a
    bounded ROWS frame, full windows only (pos ≥ w), then distinct."""
    docs = load_table(spark, sf_dir, "documents")
    k, w = WINNOW_K, WINNOW_W
    tok_t = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", F.split(ascii_lower(F.col("text")), r"\s+").alias("toks"))
        .filter(F.size("toks") >= k + w - 1)
    )
    tok_rows = tok_t.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    wd = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", off).over(wd) for off in range(1, k)]
    grams = (
        tok_rows.select(
            "doc_id",
            "pos",
            F.concat_ws(" ", F.col("tok"), *leads).alias("kgram"),
            leads[-1].alias("last_tok"),
        )
        .filter(F.col("last_tok").isNotNull())
        .select(
            "doc_id",
            "pos",
            F.expr(
                "cast(conv(substr(md5(kgram), 1, 13), 16, 10) as bigint)"
            ).alias("h"),
        )
    )
    fp = (
        grams.withColumn(
            "fp",
            F.min("h").over(wd.rowsBetween(-(w - 1), 0)),
        )
        .filter(F.col("pos") >= w - 1)  # full windows only (pos is 0-based)
        .select("doc_id", "fp")
        .distinct()
    )
    return fp


def _winnow_sql() -> str:
    """The identical pipeline in DuckDB SQL (CTE body up to ``fp``)."""
    k, w = WINNOW_K, WINNOW_W
    return f"""t AS (
        SELECT doc_id, regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+') AS toks
        FROM documents),
    gi AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - {k - 1})) AS pos
        FROM t WHERE len(toks) >= {k + w - 1}),
    g AS (
        -- indexed concat, not toks[pos:pos+n]: DuckDB copies the outer
        -- list per row-level slice, O(len²) on multi-MB docs (measured:
        -- the slice form never finishes on a 2.4M-token doc, the
        -- indexed form takes 1 s)
        SELECT doc_id, pos,
               ('0x' || substr(md5(concat_ws(' ',
                    {", ".join(f"toks[pos + {j}]" for j in range(k))})), 1, 13))::BIGINT AS h
        FROM gi),
    fp AS (
        SELECT DISTINCT doc_id, fp FROM (
            SELECT doc_id, pos,
                   MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                                ROWS BETWEEN {w - 1} PRECEDING
                                AND CURRENT ROW) AS fp
            FROM g)
        WHERE pos >= {w})"""


@register(
    "qx80_winnowing_fingerprint_pairs",
    oracle=f"""
    WITH {_winnow_sql()},
    sz AS (SELECT doc_id, COUNT(*) AS n_fp FROM fp GROUP BY doc_id),
    keep AS (
        SELECT fp FROM fp GROUP BY fp
        HAVING COUNT(*) BETWEEN 2 AND {WINNOW_FP_DF_CAP}),
    pr AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM fp a JOIN keep USING (fp)
        JOIN fp b ON b.fp = a.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           CAST(n_shared AS BIGINT) AS n_shared,
           CAST(sa.n_fp AS BIGINT)  AS n_fp_a,
           CAST(sb.n_fp AS BIGINT)  AS n_fp_b,
           CAST(n_shared * 10000 // LEAST(sa.n_fp, sb.n_fp) AS BIGINT)
               AS overlap_e4
    FROM pr
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE n_shared >= {WINNOW_MIN_SHARED}
    """,
)
def qx80_winnowing_fingerprint_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Document pairs sharing ≥ {WINNOW_MIN_SHARED} winnowed fingerprints,
    with the overlap coefficient (shared / smaller fingerprint set, e4) —
    the MOSS-style partial-overlap detector that catches a paragraph
    lifted into an otherwise-different document, which whole-document
    Jaccard (q88) dilutes below threshold.

    Plan: fingerprinting is one doc-partitioned window chain (no
    shuffle beyond the doc repartition shared with shingle_rows); pair
    generation groups by fingerprint with a document-frequency cap of
    {WINNOW_FP_DF_CAP} (boilerplate fingerprints are dropped, the q88
    SHINGLE_DF_CAP discipline), expands pairs inside buckets only, and
    hash-aggregates (doc_a, doc_b). At 100 TB the fingerprint table is
    ~2/(w+1) = 40% of the k-gram stream and pair width is bounded by
    cap²; overlap is exact integer e4 (div truncation both engines)."""
    # fp has THREE consumers (sz, and buckets below) and the plan proved
    # Catalyst re-plans the whole explode+window fingerprint pipeline for
    # each (guide §7.2, duplicated subtrees) — pin one materialization.
    fp = winnow_fingerprints(spark, sf_dir).localCheckpoint(eager=False)
    sz = fp.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fp")
    ).localCheckpoint(eager=False)  # consumed twice (sa and sb), tiny
    buckets = fp.groupBy("fp").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    ).filter(F.size("ids").between(2, WINNOW_FP_DF_CAP))
    pr = (
        pairs_within_groups(buckets)
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )
    # per-doc fingerprint counts are corpus cardinality — a forced
    # broadcast hard-fails at 100 TB (>8 GB cap). Plain doc-id joins keep
    # the single fingerprint pass shared between sz and pr, and the pair
    # side is bounded by buckets·C(cap,2), so AQE broadcasts THAT side at
    # runtime; at worst this degrades to a shuffle hash join on doc id.
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_fp_a"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_fp_b"))
    return (
        pr.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            "n_fp_a",
            "n_fp_b",
            F.expr(
                "cast(n_shared * 10000 div least(n_fp_a, n_fp_b) as bigint)"
            ).alias("overlap_e4"),
        )
    )
