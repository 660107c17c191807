"""Training-data pipeline operators: splits, packing, sampling, contamination, eval.

The ops a large-scale LLM training-data pipeline runs between "documents
exist" and "batches reach the trainer", beyond dedup/similarity (dedup.py,
similarity.py):

  * q63 — deterministic train/val/test assignment. Hash-based (md5 hex
    prefix), so membership is a pure function of the key: stable across
    runs, machines, and engine versions; no rand() seed coordination, no
    shuffle — embarrassingly parallel per row.
  * q64 — sequence packing: assign documents to fixed-token-budget bins.
    The Spark-parallel form is cumulative-token binning per stream (one
    window over a per-group sort) — deterministic, one shuffle; true
    first-fit packing is inherently sequential, and at 100 TB the
    per-group cumsum is the shape that scales (groups are the parallel
    unit).
  * q65 — stratified sampling: fixed fraction per (lang, source) stratum,
    rank-by-hash so the sample is deterministic and reproducible —
    ``df.sampleBy`` is seeded-random per task and not stable across
    retries/planning changes.
  * q84 — benchmark contamination: which corpus docs share 5-gram
    shingles with a benchmark set. Equi-join on the shingle — at scale
    the benchmark side is tiny and broadcast, so the corpus never
    shuffles.
  * q94 — ANN quality eval: recall of the q91 LSH index against the q90
    exact top-k, composed from the registered operators themselves (the
    oracle composes their oracle SQL the same way).

All oracles implement the identical algorithm on DuckDB (md5 prefixes,
window cumsums, shingle joins) — scoring is cross-checked, not just
plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka2delta_spark.queryset import ORACLES, register
from kafka2delta_spark.functions.measure import ascii_lower
from kafka2delta_spark.sources.tables import load_table

# import for side effect: q90/q91 must be registered before q94 composes them
from kafka2delta_spark.functions import similarity  # noqa: F401
from kafka2delta_spark.functions.dedup import shingle_rows, shingles_sql

# md5-hex-prefix split bounds: first 2 hex chars are uniform over 00..ff.
# 'cd' = 205/256 ~ 80%; 'e6' = 230/256 ~ 90%.
TRAIN_BOUND = "cd"
VAL_BOUND = "e6"

PACK_TOKENS = 2048  # q64 bin budget

SAMPLE_PCT = 10  # q65 per-stratum sample: ceil(n/10) docs

BENCH_MOD = 29  # q84 stand-in benchmark set: doc_id % 29 == 0
CONTAM_K = 5  # shingle width for contamination


@register(
    "q63_dataset_split",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, lang, n_chars,
               CASE WHEN substr(md5(doc_id::VARCHAR), 1, 2) < '{TRAIN_BOUND}'
                        THEN 'train'
                    WHEN substr(md5(doc_id::VARCHAR), 1, 2) < '{VAL_BOUND}'
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM documents)
    SELECT split, lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned GROUP BY split, lang
    """,
)
def q63_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (~80/10/10) keyed on md5(doc_id):
    membership is a pure per-row function — no global shuffle, no seed
    state, identical on any engine or cluster size."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(bucket < TRAIN_BOUND, "train")
        .when(bucket < VAL_BOUND, "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "q64_sequence_packing",
    oracle=rf"""
    WITH toks AS (
        -- a NULL body has no tokens: excluded from packing (mirrors the
        -- engine; also avoids NULL-ordering divergence in the cumsum)
        SELECT doc_id, lang,
               len(regexp_split_to_array(text, '\s+')) AS n_tokens
        FROM documents WHERE text IS NOT NULL),
    packed AS (
        SELECT lang, n_tokens,
               CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                               ROWS UNBOUNDED PRECEDING) - 1)
                          / {PACK_TOKENS}) AS BIGINT) AS bin_id
        FROM toks)
    SELECT lang, bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed GROUP BY lang, bin_id
    """,
)
def q64_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into ~{PACK_TOKENS}-token training bins per language
    stream: cumulative token count over a deterministic order, bin id =
    cumsum div budget — the parallel-friendly approximation of first-fit
    packing (a doc may straddle its bin boundary; the trainer's sample
    cutter handles the tail).

    The cumsum is two-level so parallelism is NOT bounded by the number of
    languages (a ``W.partitionBy("lang")`` window makes a monolingual 100 TB
    corpus ONE task): see :func:`two_level_cumsum`."""
    docs = load_table(spark, sf_dir, "documents")
    # no-token (NULL body) docs are excluded from packing (see oracle)
    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", "lang", F.size(F.split("text", r"\s+")).alias("n_tokens")
    )
    cum = two_level_cumsum(spark, toks, ["lang"], [F.col("doc_id")], "n_tokens")
    packed = cum.select(
        "lang",
        "n_tokens",
        F.floor((F.col("__cum") - 1) / PACK_TOKENS).alias("bin_id"),
    )
    return packed.groupBy("lang", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


def two_level_cumsum(
    spark: SparkSession,
    df: DataFrame,
    group_cols: list[str],
    order_exprs: list,
    value_col: str,
) -> DataFrame:
    """Grouped running sum whose parallelism is NOT bounded by the group
    count (shared by q64 packing and q59 budget selection).

    A plain ``W.partitionBy(*group_cols)`` window serializes each group
    into one task — a monolingual 100 TB corpus becomes ONE task. Instead:
    range-partition on (group, order) → local cumsum per (partition, group)
    slice (parallel); per-slice totals (metadata-sized, ≤ n_parts × groups
    rows) → per-group prefix offsets via a tiny window, broadcast back.
    ``__cum`` = offset + local cumsum — exactly the single-window value.
    """
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parted = df.repartitionByRange(n_parts, *group_cols, *order_exprs).withColumn(
        "__pid", F.spark_partition_id()
    )
    wl = (
        W.partitionBy("__pid", *group_cols)
        .orderBy(*order_exprs)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = parted.withColumn("__local_sum", F.sum(value_col).over(wl))
    sums = parted.groupBy("__pid", *group_cols).agg(
        F.sum(value_col).alias("__slice_sum")
    )
    woff = (
        W.partitionBy(*group_cols)
        .orderBy("__pid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = sums.select(
        "__pid",
        *group_cols,
        F.coalesce(F.sum("__slice_sum").over(woff), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), ["__pid", *group_cols])
        .withColumn("__cum", F.col("__local_sum") + F.col("__off"))
        .drop("__pid", "__local_sum", "__off")
    )


@register(
    "q65_stratified_sample",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (PARTITION BY lang, source
                                  ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY lang, source) AS n
        FROM documents)
    SELECT doc_id, lang, source
    FROM ranked WHERE rn <= (n + {SAMPLE_PCT} - 1) // {SAMPLE_PCT}
    """,
)
def q65_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% sample per (lang, source) stratum: rank docs by
    md5(doc_id) inside the stratum, keep the first ceil(n/10). Unlike
    seeded ``sampleBy``, the sample is a deterministic function of the
    data — stable under retries, partitioning changes, and engines."""
    docs = load_table(spark, sf_dir, "documents")
    wo = W.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wc = W.partitionBy("lang", "source")
    ranked = docs.select(
        "doc_id",
        "lang",
        "source",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    quota = F.expr(f"(n + {SAMPLE_PCT} - 1) div {SAMPLE_PCT}")
    return ranked.filter(F.col("rn") <= quota).select("doc_id", "lang", "source")


@register(
    "q66_domain_mixture",
    oracle=r"""
    WITH s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
                   AS src_tokens
        FROM documents GROUP BY source),
    tot AS (SELECT SUM(src_tokens) AS t, SUM(sqrt(src_tokens)) AS st,
                   MIN(src_tokens) AS mn
            FROM s)
    SELECT source, n_docs, src_tokens,
           ROUND(src_tokens * 1.0 / t, 6)        AS natural_share,
           ROUND(sqrt(src_tokens) / st, 6)       AS target_share,
           ROUND(sqrt(mn * 1.0 / src_tokens), 6) AS sample_rate,
           CAST(FLOOR(src_tokens * sqrt(mn * 1.0 / src_tokens)) AS BIGINT)
               AS sampled_tokens
    FROM s CROSS JOIN tot
    """,
)
def q66_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixture reweighting (τ = 2, i.e. √-scaling
    — the standard multilingual/domain rebalancing): target share of domain
    i ∝ √tokens_i, flattening the natural distribution without letting any
    domain dominate. The per-domain downsampling rate that realizes the
    target WITHOUT upsampling is rate_i = √(min_tokens / tokens_i)
    (derived: rate ∝ target/natural ∝ 1/√tokens, normalized so the
    smallest domain keeps rate 1.0).

    Scale: one hash-agg over the corpus (source cardinality is tiny) + a
    broadcast of the 1-row totals — the corpus is scanned once and never
    shuffled beyond the per-source partial agg."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.size(F.split("text", r"\s+")).cast("long").alias("n_toks")
    )
    s = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_toks").alias("src_tokens")
    )
    tot = s.agg(
        F.sum("src_tokens").alias("t"),
        F.sum(F.sqrt("src_tokens")).alias("st"),
        F.min("src_tokens").alias("mn"),
    )
    rate = F.sqrt(F.col("mn") / F.col("src_tokens"))
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "src_tokens",
        F.round(F.col("src_tokens") / F.col("t"), 6).alias("natural_share"),
        F.round(F.sqrt("src_tokens") / F.col("st"), 6).alias("target_share"),
        F.round(rate, 6).alias("sample_rate"),
        F.floor(F.col("src_tokens") * rate).cast("long").alias("sampled_tokens"),
    )


@register(
    "q84_benchmark_contamination",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\s+') AS toks
        FROM documents),
    sh_t AS (
        SELECT doc_id, {shingles_sql(k=CONTAM_K)} AS sh
        FROM t WHERE len(toks) >= {CONTAM_K}),
    ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh_t),
    bench AS (SELECT doc_id, shingle FROM ex WHERE doc_id % {BENCH_MOD} = 0),
    corpus AS (SELECT doc_id, shingle FROM ex WHERE doc_id % {BENCH_MOD} != 0)
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_contaminated_grams,
           CAST(COUNT(DISTINCT b.doc_id) AS BIGINT) AS n_bench_docs
    FROM corpus c JOIN bench b ON c.shingle = b.shingle
    GROUP BY c.doc_id
    """,
)
def q84_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: corpus docs sharing {CONTAM_K}-gram
    shingles with a benchmark set (stand-in: doc_id % {BENCH_MOD} == 0 —
    in production, a second table). With a REAL benchmark table (fixed
    size, doesn't grow with the corpus) the right plan pins a broadcast
    so the corpus-side scan never shuffles; this stand-in derives from
    the corpus itself (1/{BENCH_MOD} of it), so a forced hint would be a
    scale lie — the hint is left off and AQE broadcasts the bench side
    at runtime whenever it is actually small, degrading to a shuffle
    hash join on the shingle key instead of dying at the 8 GB cap."""
    # sh splits into the bench and corpus sides of the join — two
    # consumers, so without a pinned materialization the shingle
    # explode+window pipeline is planned twice (guide §7.2).
    sh = shingle_rows(spark, sf_dir, k=CONTAM_K).localCheckpoint(eager=False)
    is_bench = F.col("doc_id") % BENCH_MOD == 0
    bench = sh.filter(is_bench).select(
        F.col("doc_id").alias("bench_doc"), "shingle"
    )
    corpus = sh.filter(~is_bench)
    return (
        corpus.join(bench, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_contaminated_grams"),
            F.count_distinct("bench_doc").alias("n_bench_docs"),
        )
    )


def _recall_oracle() -> str:
    return f"""
    WITH exact_topk AS ({ORACLES["q90_cosine_topk_bruteforce"]}),
    approx_topk AS ({ORACLES["q91_ann_lsh_topk"]})
    SELECT e.qid,
           CAST(COUNT(a.nid) AS BIGINT) AS n_found,
           ROUND(COUNT(a.nid) / {similarity.TOP_K}.0, 4) AS recall
    FROM exact_topk e
    LEFT JOIN approx_topk a ON a.qid = e.qid AND a.nid = e.nid
    GROUP BY e.qid
    """


@register("q94_ann_recall_eval", oracle=_recall_oracle())
def q94_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the LSH ANN index (q91) against exact top-k (q90),
    composed from the registered operators themselves — the eval loop a
    pipeline runs when tuning N_TABLES/BITS_PER_TABLE. Both inputs are
    per-query top-{similarity.TOP_K} sets, so the join is trivially
    small; they come from the session-checkpointed ann_topk_cached so
    the recall eval does not re-run the two scoring pipelines it is
    grading (guide §7.2 — same pattern as dedup's _jaccard_pairs)."""
    exact_df, approx_df = similarity.ann_topk_cached(spark, sf_dir)
    exact = exact_df.select("qid", "nid")
    approx = approx_df.select(
        F.col("qid").alias("a_qid"), F.col("nid").alias("a_nid")
    )
    return (
        exact.join(
            approx,
            (F.col("qid") == F.col("a_qid")) & (F.col("nid") == F.col("a_nid")),
            "left",
        )
        .groupBy("qid")
        .agg(
            F.count("a_nid").alias("n_found"),
            F.round(F.count("a_nid") / similarity.TOP_K, 4).alias("recall"),
        )
    )


# q75: global row index / shard export. Rank by doc_id is a pure function
# of the data, so the index is reproducible bit-for-bit across backfills
# even though repartitionByRange samples its partition boundaries — only
# WHERE a row ranks locally moves, never its global rank.
N_SHARDS = 8


@register(
    "q75_global_row_index",
    oracle=f"""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS global_idx,
           CAST((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) % {N_SHARDS} AS BIGINT)
               AS shard_id
    FROM documents
    """,
)
def q75_global_row_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global row index + training-shard assignment WITHOUT a
    global window.

    The training-export step needs every document numbered 0..N-1 in a
    stable global order (here: doc_id) and dealt round-robin into shards.
    ``ROW_NUMBER() OVER (ORDER BY doc_id)`` is the one-task WindowExec trap
    (same failure q33 fixes). Delegates to ``rankstats.global_ranks`` —
    the range-exchange + mid-offset two-pass whose prefix arithmetic runs
    over PER-PARTITION counts (n_parts rows, metadata-sized at any corpus
    size). An earlier draft bucketed by a fixed doc_id width
    and lifted local ranks with a triangular join over the bucket counts —
    but bucket count is corpus/width, so both the broadcast and the
    O(buckets²) triangle grow with the data; ``global_ranks`` replaces
    that with a pure function of the data at fixed metadata cost. Unlike
    ``zipWithIndex`` (RDD, two jobs, partition-order-dependent) the
    result is a pure function of the data: ranks are data-deterministic
    even though range-partition boundaries are sampled. Round-robin
    sharding (idx % {N_SHARDS}) balances shard sizes to within one row; in
    production the writer would ``partitionBy(shard_id)``."""
    from kafka2delta_spark.operators.rankstats import global_ranks

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    idx = F.col("rk0").cast("bigint")
    return global_ranks(docs, ["doc_id"]).select(
        "doc_id",
        idx.alias("global_idx"),
        (idx % N_SHARDS).alias("shard_id"),
    )


# q78: fixed-size overlapping character chunks — the doc -> training-sample
# split. chunk_size/stride in characters (both engines' substr is
# character-based, so unicode-safe).
CHUNK_SIZE = 200
CHUNK_STRIDE = 150
# Short/long cutoff for the hybrid chunker: docs up to this length take
# the naive explode-the-starts shape, whose worst case inside the cutoff
# stays bounded (carry ≤ cutoff²/stride ≈ 30 MB, substring walk ≤
# cutoff²/stride ≈ 30M code points per doc).
CHUNK_BLOCK = CHUNK_STRIDE * 450
# Block width for the long-doc path (a multiple of the stride so global
# chunk starts land exactly on block-local offsets). Wider than the
# cutoff: the per-block substring still walks O(block_start) code
# points, so the total outer walk is O(len²/block) — 270k chars keeps it
# ~5×10⁸ steps on a 16.9 MB doc while per-row memory stays ~a block.
CHUNK_LONG_BLOCK = CHUNK_STRIDE * 1800


@register(
    "q78_doc_chunking",
    oracle=f"""
    -- same two-level block layout as the engine (each substr re-scans
    -- its input string, so chunking the full body per chunk is
    -- O(len^2/stride) here too — blocks bound every substr's input to
    -- ~{CHUNK_STRIDE * 450} chars); the two unnests zip positionally
    WITH blocks AS (
        SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
               unnest(range(0, CAST(length(text) AS BIGINT),
                            {CHUNK_STRIDE * 450})) AS b,
               substr(text,
                      unnest(range(0, CAST(length(text) AS BIGINT),
                                   {CHUNK_STRIDE * 450})) + 1,
                      {CHUNK_STRIDE * 450 + CHUNK_SIZE - CHUNK_STRIDE}) AS blk
        FROM documents
        WHERE length(text) > 0),
    g AS (
        SELECT doc_id,
               b + unnest(range(0, least({CHUNK_STRIDE * 450}, n - b),
                                {CHUNK_STRIDE})) AS s,
               substr(blk,
                      unnest(range(0, least({CHUNK_STRIDE * 450}, n - b),
                                   {CHUNK_STRIDE})) + 1,
                      {CHUNK_SIZE}) AS c
        FROM blocks)
    SELECT doc_id,
           CAST(s / {CHUNK_STRIDE} AS BIGINT)   AS chunk_idx,
           CAST(s AS BIGINT)                    AS chunk_start,
           CAST(length(c) AS BIGINT)            AS chunk_len,
           md5(c)                               AS chunk_md5
    FROM g
    """,
)
def q78_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-size chunking (size {CHUNK_SIZE}, stride
    {CHUNK_STRIDE}): every document becomes ceil(len/stride) training
    samples with {CHUNK_SIZE - CHUNK_STRIDE}-char overlap. No shuffle,
    embarrassingly parallel. Chunk text is emitted as md5 (the artifact
    stays index-sized; the writer variant would keep the text column).

    Two-level block layout (round-10 pathological campaign): the naive
    shape — explode chunk STARTS while carrying ``text`` — copies the
    whole body into every output UnsafeRow (a 16 MB doc × 110k chunks
    materializes ~1.8 TB in one task; measured as a never-finishing
    straggler), and ``substring(text, s, n)`` re-walks code points from
    offset 0 every call, O(len²/stride) per doc. Instead the body is cut
    ONCE into ~{CHUNK_BLOCK}-char blocks (each extended by the
    {CHUNK_SIZE - CHUNK_STRIDE}-char overlap so no chunk straddles), the
    explode carries only a block, and chunks substring within it — carry
    is flat per row and the code-point walk is O(len²/block + len·block/
    stride), ~1000× less than naive at 16 MB. Semantics are identical
    for any Unicode input (block boundaries are multiples of the stride,
    offsets stay character-based).

    HYBRID: the block machinery only pays for itself past ~1 block of
    text — on a 50k-doc corpus of ~500-char bodies it measured 80×
    SLOWER than the naive shape (a char-split array per tiny doc). Docs
    with length ≤ {CHUNK_BLOCK} take the naive path, whose worst case
    inside the cutoff is bounded (carry ≤ block·chunks ≈ 30 MB, walk ≤
    block²/stride ≈ 30M); only longer docs take the block path. Both
    branches read the same scan; at 100 TB the long branch is the rare
    tail (giant concatenated crawls), the short branch the bulk."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    overlap = CHUNK_SIZE - CHUNK_STRIDE

    naive_chunk = F.substring(F.col("text"), F.col("s").cast("int") + 1, CHUNK_SIZE)
    short = (
        docs.filter(F.length("text") <= CHUNK_BLOCK)
        .select(
            "doc_id",
            "text",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"),
                    (F.length("text") - 1).cast("bigint"),
                    F.lit(CHUNK_STRIDE).cast("bigint"),
                )
            ).alias("s"),
        )
        .select(
            "doc_id",
            (F.col("s") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
            F.col("s").alias("chunk_start"),
            F.length(naive_chunk).cast("bigint").alias("chunk_len"),
            F.md5(naive_chunk).alias("chunk_md5"),
        )
    )

    blocks = F.expr(
        f"transform(sequence(0L, bigint(length(text)) - 1L, {CHUNK_LONG_BLOCK}L),"
        f" b -> struct(b AS b,"
        f"  substring(text, int(b) + 1, {CHUNK_LONG_BLOCK + overlap}) AS blk))"
    )
    b = (
        docs.filter(F.length("text") > CHUNK_BLOCK)
        .select(
            "doc_id",
            F.explode(blocks).alias("e"),
        )
        .select(
            "doc_id",
            F.col("e.b").alias("b"),
            # one O(block) char split; chunks below index it O(1) — a
            # substring per chunk would re-walk code points from the
            # block start (measured 92 s on the 16 MB doc)
            F.split(F.col("e.blk"), "").alias("cs"),
        )
    )
    # NOTE the sequence bound reads size(cs): besides being the correct
    # local bound, it makes `cs` a MULTIPLY-referenced non-cheap alias,
    # which stops CollapseProject from inlining the char split into the
    # lambda — inlined, the block re-splits once per chunk (measured
    # +27 s on the pathological fixture for exactly that plan).
    chunks = F.expr(
        f"transform("
        f" sequence(0L, least({CHUNK_LONG_BLOCK - 1}L, size(cs) - 1), {CHUNK_STRIDE}L),"
        f" o -> struct(b + o AS s,"
        f"  array_join(slice(cs, int(o) + 1, {CHUNK_SIZE}), '') AS c))"
    )
    long = (
        b.select("doc_id", F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            (F.col("c.s") / CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
            F.col("c.s").alias("chunk_start"),
            F.length("c.c").cast("bigint").alias("chunk_len"),
            F.md5("c.c").alias("chunk_md5"),
        )
    )
    return short.unionByName(long)


# q59: per-language token-budget selection — "take the best documents until
# the budget is spent", the curriculum/budgeting step between scoring and
# packing. Order = quality proxy (longer docs first; doc_id tiebreak keeps
# it total and deterministic).
BUDGET_TOKENS = 5_000


@register(
    "q59_token_budget_selection",
    oracle=rf"""
    WITH toks AS (
        -- NULL bodies carry no tokens and cannot join a budget (see q64)
        SELECT doc_id, lang, length(text) AS n_chars,
               len(regexp_split_to_array(text, '\s+')) AS n_tokens
        FROM documents WHERE text IS NOT NULL),
    cum AS (
        SELECT doc_id, lang, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang
                                   ORDER BY n_chars DESC, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM toks)
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM cum WHERE cum_tokens <= {BUDGET_TOKENS}
    """,
)
def q59_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select documents per language, best-first, until a
    {BUDGET_TOKENS}-token budget is filled (docs straddling the boundary
    are dropped — conservative). The running total reuses
    :func:`two_level_cumsum`, so a single dominant language does not
    serialize the scan; the budget filter is a pure per-row predicate on
    the cumsum."""
    docs = load_table(spark, sf_dir, "documents")
    # no-token (NULL body) docs are excluded from the budget (see oracle)
    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        F.size(F.split("text", r"\s+")).alias("n_tokens"),
    )
    cum = two_level_cumsum(
        spark,
        toks,
        ["lang"],
        [F.col("n_chars").desc(), F.col("doc_id")],
        "n_tokens",
    )
    return cum.filter(F.col("__cum") <= BUDGET_TOKENS).select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("__cum").cast("bigint").alias("cum_tokens"),
    )


# ---------------------------------------------------------------------------
# qx27: the flagship end-to-end corpus build — quality gate -> near-dup
# canonicalization -> leakage-safe split -> per-split stats, composed
# from the same primitives the individual queries register (q74 rules,
# q98 clusters, qx06 assignment). One operator a user actually ships.
# ---------------------------------------------------------------------------


def _corpus_build_oracle() -> str:
    from kafka2delta_spark.functions.curation import (
        MAX_CPT,
        MAX_PUNCT_RATIO,
        MAX_TOKENS,
        MIN_CPT,
        MIN_STOPWORD_RATIO,
        MIN_TOKENS,
        _STOP_IN,
    )
    from kafka2delta_spark.functions.dedup import _leakage_split_oracle

    return rf"""
    WITH assign AS ({_leakage_split_oracle()}),
    q AS (
        SELECT doc_id, LENGTH(text) AS n_chars,
               regexp_split_to_array(text, '\s+') AS toks,
               LENGTH(text) - LENGTH(regexp_replace(text, '[^\w\s]', '', 'g'))
                   AS n_punct
        FROM documents),
    kept AS (
        SELECT doc_id, len(toks) AS n_tokens
        FROM q
        WHERE len(toks) BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
          AND n_chars * 1.0 / len(toks) BETWEEN {MIN_CPT} AND {MAX_CPT}
          AND len(list_filter(toks, x -> x IN ({_STOP_IN}))) * 1.0
              / len(toks) >= {MIN_STOPWORD_RATIO}
          AND n_punct * 1.0 / n_chars <= {MAX_PUNCT_RATIO}),
    ka AS (
        SELECT k.doc_id, k.n_tokens, a.cluster_id, a.split
        FROM kept k JOIN assign a USING (doc_id)),
    canon AS (
        SELECT *, MIN(doc_id) OVER (PARTITION BY cluster_id) AS rep
        FROM ka)
    SELECT split,
           CAST(COUNT(*) AS BIGINT)                   AS n_docs,
           CAST(COUNT(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           CAST(SUM(n_tokens) AS BIGINT)              AS total_tokens
    FROM canon WHERE doc_id = rep GROUP BY split
    """


@register("qx27_corpus_build", oracle=_corpus_build_oracle())
def qx27_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus build: apply the q74 composite quality gate,
    drop near-duplicate non-canonicals (min doc_id per q98 cluster AMONG
    the quality-kept docs — a cluster whose canonical fails quality
    falls to its next member), assign the qx06 leakage-safe cluster-level
    split, report per-split doc / cluster / token totals — the numbers a
    training run budgets against.

    Plan: the quality gate is per-row codegen over the documents scan;
    cluster + split assignment reuses the SAME checkpointed edge list and
    label propagation as q98/qx06 (one materialized graph per session);
    the join back is one doc_id shuffle; canonicalization is a window
    min within clusters (partition count = cluster count, each tiny);
    the final agg is three rows. Composing operators does not multiply
    their cost — the expensive artifacts are shared, which is the point
    of materializing them."""
    from kafka2delta_spark.functions.curation import (
        MAX_CPT,
        MAX_PUNCT_RATIO,
        MAX_TOKENS,
        MIN_CPT,
        MIN_STOPWORD_RATIO,
        MIN_TOKENS,
    )
    from kafka2delta_spark.functions.dedup import qx06_leakage_safe_split
    from kafka2delta_spark.functions.text import STOPWORDS, TOKEN_SPLIT_RE
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), TOKEN_SPLIT_RE)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    kept = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (
            n_tokens.between(MIN_TOKENS, MAX_TOKENS)
            & (n_chars * 1.0 / n_tokens).between(MIN_CPT, MAX_CPT)
            & (n_stop * 1.0 / n_tokens >= MIN_STOPWORD_RATIO)
            & (n_punct * 1.0 / n_chars <= MAX_PUNCT_RATIO)
        ).alias("keep"),
    ).filter("keep")
    assign = qx06_leakage_safe_split(spark, sf_dir)
    ka = kept.join(assign, "doc_id")
    w = W.partitionBy("cluster_id")
    canon = ka.withColumn("rep", F.min("doc_id").over(w)).filter(
        F.col("doc_id") == F.col("rep")
    )
    return canon.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


# ---------------------------------------------------------------------------
# qx67: temporal holdout split — the time-based evaluation split that
# prevents future leakage (random splits let a model train on events
# AFTER its test window). Cutoff = min_ts + 80% of the observed span,
# computed in integer microseconds so both engines carve the identical
# boundary; per-user train/test counts plus the cold-start flag (users
# who appear ONLY in the holdout — the slice random splits silently
# misrepresent).
# ---------------------------------------------------------------------------

#: holdout fraction in percent (the last 20% of the time span)
HOLDOUT_PCT = 20


@register(
    "qx67_temporal_holdout_split",
    oracle=f"""
    WITH b AS (
        SELECT epoch_us(MIN(ts)) AS mn, epoch_us(MAX(ts)) AS mx FROM events),
    c AS (SELECT mn + (mx - mn) * {100 - HOLDOUT_PCT} // 100 AS cutoff FROM b),
    s AS (
        SELECT user_id,
               SUM(CASE WHEN epoch_us(ts) < c.cutoff THEN 1 ELSE 0 END)
                   AS n_train,
               SUM(CASE WHEN epoch_us(ts) >= c.cutoff THEN 1 ELSE 0 END)
                   AS n_test
        FROM events CROSS JOIN c GROUP BY user_id)
    SELECT user_id,
           CAST(n_train AS BIGINT) AS n_train,
           CAST(n_test AS BIGINT)  AS n_test,
           CAST(CASE WHEN n_train = 0 AND n_test > 0 THEN 1 ELSE 0 END AS INT)
               AS cold_start
    FROM s
    """,
)
def qx67_temporal_holdout_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user train/holdout event counts under an 80/20 time-span split
    with the cold-start flag.

    Plan: the cutoff is a 2-value global agg broadcast into a conditional
    aggregate — one full scan, one hash-agg on user_id with map-side
    partials, no window, no join shuffle (the cutoff side is a scalar).
    Integer-microsecond arithmetic keeps the boundary bit-identical
    across engines at any scale."""
    events = load_table(spark, sf_dir, "events")
    b = events.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
    ).select(
        F.expr(f"mn + (mx - mn) * {100 - HOLDOUT_PCT} div 100").alias("cutoff")
    )
    return (
        events.crossJoin(F.broadcast(b))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.unix_micros("ts") < F.col("cutoff"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_train"),
            F.sum(
                F.when(F.unix_micros("ts") >= F.col("cutoff"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_test"),
        )
        .select(
            "user_id",
            "n_train",
            "n_test",
            F.when((F.col("n_train") == 0) & (F.col("n_test") > 0), 1)
            .otherwise(0)
            .cast("int")
            .alias("cold_start"),
        )
    )


# ---------------------------------------------------------------------------
# qx68: per-source dedup yield funnel — the curation dashboard number:
# how many docs each source contributes, how many survive EXACT dedup
# (distinct sorted-token-bag fingerprints, q85's key), and how many the
# source KEEPS after global near-dup clustering under the min-id
# canonical rule (docs that are their own cluster representative,
# q98's clusters). Sources whose yield collapses between the stages are
# template mills; sources that keep everything are genuinely diverse.
# ---------------------------------------------------------------------------


def _yield_funnel_oracle() -> str:
    from kafka2delta_spark.functions.dedup import _JACCARD_PAIRS_SQL

    return f"""
    WITH RECURSIVE edges AS (
        SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS_SQL}) jp),
    und AS (SELECT doc_a AS a, doc_b AS b FROM edges
            UNION ALL SELECT doc_b, doc_a FROM edges),
    reach AS (
        SELECT doc_id AS node, doc_id AS root FROM documents
        UNION
        SELECT u.b AS node, r.root FROM reach r JOIN und u ON u.a = r.node),
    cl AS (SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node),
    norm AS (
        SELECT doc_id, source,
               md5(array_to_string(list_sort(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+')), ' '))
                   AS content_key
        FROM documents)
    SELECT n.source,
           CAST(COUNT(*) AS BIGINT)                        AS n_docs,
           CAST(COUNT(DISTINCT n.content_key) AS BIGINT)   AS n_exact_unique,
           CAST(SUM(CASE WHEN c.cluster_id = n.doc_id THEN 1 ELSE 0 END)
                AS BIGINT)                                 AS n_canonical
    FROM norm n JOIN cl c ON c.node = n.doc_id
    GROUP BY n.source
    """


@register("qx68_dedup_yield_funnel", oracle=_yield_funnel_oracle())
def qx68_dedup_yield_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_exact_unique, n_canonical) — the dedup funnel
    per source: raw volume, exact-dup survivors, near-dup canonical
    survivors (cluster representative = min doc id, matching q98).

    Plan: reuses q98's cluster assignment (which itself consumes the
    session-checkpointed Jaccard edge list) joined to a 3-column
    projection of documents; the funnel is then ONE hash-agg on source.
    The exact-dedup stage shuffles 16-byte md5 keys, never text. All
    counts integer-exact."""
    from kafka2delta_spark.functions.dedup import q98_neardup_clusters

    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(
        F.array_join(F.array_sort(F.split(ascii_lower(F.col("text")), r"\s+")), " ")
    )
    norm = docs.select("doc_id", "source", key.alias("content_key"))
    cl = q98_neardup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    return (
        norm.join(cl, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count_distinct("content_key").cast("bigint").alias(
                "n_exact_unique"
            ),
            F.sum(
                F.when(F.col("cluster_id") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_canonical"),
        )
    )


# ---------------------------------------------------------------------------
# qx93: length-bucketed inference batch planner — the TEXT analogue of
# qx77's image decode planner. Sequences are padded to their bucket
# width (the next power of two >= token count), so a batch of
# same-bucket docs wastes (width − len) tokens per doc; the planner
# packs each bucket into fixed-token-budget batches and reports the
# exact padding waste per batch — the table an inference scheduler
# reads to size buckets (too few buckets → waste; too many → ragged
# batches).
# ---------------------------------------------------------------------------

SEQ_TOKEN_BUDGET = 4096  # padded tokens per inference batch
SEQ_MIN_BUCKET = 16      # smallest padded width


@register(
    "qx93_length_bucketed_batches",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               len(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+')) AS n_tokens
        FROM documents),
    b AS (
        SELECT doc_id, n_tokens,
               GREATEST({SEQ_MIN_BUCKET},
                        CASE WHEN n_tokens <= 1 THEN 1
                             ELSE 1::BIGINT << length(bin(n_tokens - 1))
                        END) AS width
        FROM toks WHERE n_tokens > 0),
    r AS (
        SELECT doc_id, n_tokens, width,
               ROW_NUMBER() OVER (PARTITION BY width ORDER BY doc_id) - 1
                   AS rk,
               GREATEST(1, {SEQ_TOKEN_BUDGET} // width) AS cap
        FROM b)
    SELECT CAST(width AS BIGINT)       AS width,
           CAST(rk // cap AS BIGINT)   AS batch_seq,
           CAST(COUNT(*) AS BIGINT)    AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_real,
           CAST(COUNT(*) * width AS BIGINT) AS tokens_padded,
           CAST((COUNT(*) * width - SUM(n_tokens)) * 10000
                // (COUNT(*) * width) AS BIGINT) AS waste_e4
    FROM r GROUP BY width, rk // cap
    """,
)
def qx93_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into inference batches by padded-length bucket
    (width = next power of two ≥ token count, floor {SEQ_MIN_BUCKET}),
    each batch holding ⌊{SEQ_TOKEN_BUDGET}/width⌋ sequences, and report
    the exact per-batch padding waste (e4). Deterministic packing order
    (doc_id) makes the whole plan hash-gated.

    Plan: one scan computes token counts and widths (pure codegen); the
    per-bucket sequence number is a window over the WIDTH partition —
    the bucket alphabet is ~log₂(max_len) wide, so each bucket is one
    ordered slice, and at 100 TB batch numbering would run per
    (shard, width) with rankstats' metadata-sized prefix offsets lifting
    local ranks to global, exactly like the qx52 range planner; the
    per-bucket window here is the semantics spec for that. Widths and
    waste are exact integers on both engines (widths via bit-length
    shifts, never float LOG2 — Spark's log(x)/log(2) misrounds at exact
    powers of two; cross-checked by the power-of-two invariant test)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(F.split(ascii_lower("text"), r"\s+")).cast("bigint").alias(
            "n_tokens"
        ),
    ).filter(F.col("n_tokens") > 0)
    # next power of two via INTEGER bit-length (1 << bitlen(n-1)), not
    # POWER(2, CEIL(LOG2 n)): Spark's log2 is log(x)/log(2), which returns
    # 29.000000000000004 at exactly 2^29 (also 2^31, 2^39, ...), while
    # DuckDB's std::log2 is exact — a doc with exactly 2^k tokens would
    # bucket to a different width across engines. Bit-length arithmetic is
    # exact on both (validated equal over 1..100000 on each engine).
    b = toks.select(
        "doc_id",
        "n_tokens",
        F.greatest(
            F.lit(SEQ_MIN_BUCKET).cast("bigint"),
            F.expr(
                "case when n_tokens <= 1 then cast(1 as bigint) "
                "else shiftleft(cast(1 as bigint), length(bin(n_tokens - 1))) end"
            ),
        ).alias("width"),
    )
    r = b.select(
        "n_tokens",
        "width",
        (
            F.row_number().over(W.partitionBy("width").orderBy("doc_id")) - 1
        ).alias("rk"),
        # a sequence longer than the whole batch budget still forms its
        # own batch — without the floor, cap = budget div width = 0 and
        # the batch number divides by zero (found by the pathological
        # fixture's 2.4M-token docs; same floor in the oracle)
        F.expr(f"greatest(cast(1 as bigint), {SEQ_TOKEN_BUDGET} div width)").alias("cap"),
    )
    return (
        r.groupBy("width", F.expr("rk div cap").alias("batch_seq"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("tokens_real"),
        )
        .select(
            F.col("width").cast("bigint"),
            F.col("batch_seq").cast("bigint"),
            "n_docs",
            "tokens_real",
            (F.col("n_docs") * F.col("width"))
            .cast("bigint")
            .alias("tokens_padded"),
            F.expr(
                "cast((n_docs * width - tokens_real) * 10000"
                " div (n_docs * width) as bigint)"
            ).alias("waste_e4"),
        )
    )
