"""Round-7 corpus-QA / retrieval-evaluation operators (qy01..qy09).

The training-data pipeline steps that close the loop AFTER dedup/curation
have run: intra-document repetition screening, filtered and diversified
ANN retrieval, snapshot diffing between corpus builds, held-out LM
perplexity, funnel conversion over sessionized behavior, deterministic
weighted sampling, stratified split quotas, and embedding-space label
cohesion. Every query follows the repo's exactness contract: integer or
fixed-point arithmetic wherever values are hashed, float only as single
IEEE ops on identical integer inputs or order-pinned folds, and DuckDB
oracles that spell out the same arithmetic.

No reference counterpart: the reference engine (570 LoC, CDC only) has
none of these; they extend the mandated LLM-pipeline surface
(SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka2delta_spark.operators.advanced import kmv_hash_duck, kmv_hash_spark
from kafka2delta_spark.queryset import register
from kafka2delta_spark.functions.measure import ascii_lower
from kafka2delta_spark.sources.tables import load_embeddings, load_table

# ---------------------------------------------------------------------------
# qy01: intra-document repetition — the Gopher-style "duplicate n-gram
# fraction" quality signal. Templated/spammy documents repeat the same
# phrases internally; this measures it exactly from 3-gram multiplicities.
# Distinct from q88-family INTER-document similarity: no pairs, no joins —
# the whole statistic is per-document.
# ---------------------------------------------------------------------------

REPEAT_K = 3  # shingle order
REPEAT_MIN_SHINGLES = 8  # below this, ratios are noise


@register(
    "qy01_intra_doc_repetition",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+') AS toks
        FROM documents),
    sh AS (
        SELECT doc_id, source,
               -- indexed concat, not a list slice (slices copy the
               -- outer list per element, O(len²) on multi-MB docs)
               unnest([concat_ws(' ', {", ".join(f"toks[i + {j}]" for j in range(REPEAT_K))})
                       for i in range(1, len(toks) - {REPEAT_K - 2})]) AS shingle
        FROM t WHERE len(toks) >= {REPEAT_K}),
    m AS (
        SELECT doc_id, source, shingle, COUNT(*) AS c
        FROM sh GROUP BY doc_id, source, shingle),
    d AS (
        SELECT doc_id, source,
               SUM(c)   AS n_shingles,
               COUNT(*) AS n_distinct,
               MAX(c)   AS max_mult
        FROM m GROUP BY doc_id, source)
    SELECT doc_id, source,
           CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(max_mult   AS BIGINT) AS max_mult,
           CAST((n_shingles - n_distinct) * 10000 // n_shingles AS BIGINT)
               AS dup_fraction_e4
    FROM d WHERE n_shingles >= {REPEAT_MIN_SHINGLES}
    """,
)
def qy01_intra_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repeated-{REPEAT_K}-gram statistics: total and
    distinct shingle counts, the largest single multiplicity, and the
    duplicated fraction (e4) — near-zero for organic prose, large for
    templated or stutter-generated text.

    Plan: position-explode + lead window builds RAW (multiplicity-
    preserving) shingles — q88's shingle_rows dedups per doc, which
    would erase the statistic — then two doc-keyed hash-aggs. Everything
    stays partitioned by doc_id; no pair expansion, no corpus-wide join.
    All integers; the fraction is exact integer e4 (div truncates
    identically on both engines)."""
    docs = load_table(spark, sf_dir, "documents")
    tok_t = docs.select(
        "doc_id", "source", F.split(ascii_lower("text"), r"\s+").alias("toks")
    ).filter(F.size("toks") >= REPEAT_K)
    rows = tok_t.select(
        "doc_id", "source", F.posexplode("toks").alias("pos", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", off).over(w) for off in range(1, REPEAT_K)]
    sh = rows.select(
        "doc_id",
        "source",
        F.concat_ws(" ", F.col("tok"), *leads).alias("shingle"),
        leads[-1].alias("__last"),
    ).filter(F.col("__last").isNotNull())
    m = sh.groupBy("doc_id", "source", "shingle").agg(
        F.count(F.lit(1)).alias("c")
    )
    return (
        m.groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("bigint").alias("n_shingles"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.max("c").cast("bigint").alias("max_mult"),
        )
        .filter(F.col("n_shingles") >= REPEAT_MIN_SHINGLES)
        .withColumn(
            "dup_fraction_e4",
            F.expr(
                "cast((n_shingles - n_distinct) * 10000 div n_shingles"
                " as bigint)"
            ),
        )
    )


# ---------------------------------------------------------------------------
# qy02: label-filtered exact ANN top-k — "filtered vector search", the
# production retrieval mode where a metadata predicate (here: the label
# column) restricts the candidate set BEFORE ranking. The exactness
# baseline for a label-partitioned IVF at scale.
# ---------------------------------------------------------------------------


@register(
    "qy02_filtered_ann_topk",
    oracle="""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
               WHERE embedding IS NOT NULL),
    n AS (SELECT vec_id, label, v,
                 sqrt(list_dot_product(v, v)) AS nrm FROM e),
    q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv, nrm AS qn
          FROM n WHERE vec_id < 5),
    scored AS (
        SELECT q.qid, q.qlabel, n.vec_id AS nid,
               list_dot_product(q.qv, n.v) / (q.qn * n.nrm) AS cosine
        FROM q JOIN n ON n.label = q.qlabel AND n.vec_id <> q.qid)
    SELECT qid, CAST(qlabel AS BIGINT) AS qlabel, nid,
           ROUND(cosine, 4) AS cosine, rk
    FROM (
        SELECT qid, qlabel, nid, cosine,
               ROW_NUMBER() OVER (PARTITION BY qid
                                  ORDER BY cosine DESC, nid) AS rk
        FROM scored)
    WHERE rk <= 3
    """,
)
def qy02_filtered_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 restricted to candidates sharing the query's
    label — filtered vector search, the retrieval mode real systems
    serve far more often than unfiltered top-k. Same scoring recipe as
    q90 (identical op order on both engines), with the label equi-join
    replacing the open cross join.

    At 100 TB the label predicate is the partition key: candidates prune
    to one label partition per query BEFORE any distance math (the plan
    here pushes the equi-join condition into the broadcast hash join),
    and the per-label IVF (q93's layout, one index per label) is the
    approximate path this query is the recall oracle for."""
    from kafka2delta_spark.functions.similarity import N_QUERIES, TOP_K, _vec, dot

    emb = load_embeddings(spark, sf_dir)
    n = emb.select("vec_id", "label", _vec().alias("v")).select(
        "vec_id", "label", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nrm")
    )
    # pinned: the tiny query frame is broadcast against the full corpus
    # side — unpinned, the norm pipeline re-ran under the broadcast
    # branch (embeddings scanned twice in one plan)
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    ).localCheckpoint(eager=False)
    scored = n.join(
        F.broadcast(q),
        (F.col("label") == F.col("qlabel")) & (F.col("vec_id") != F.col("qid")),
    ).select(
        "qid",
        "qlabel",
        F.col("vec_id").alias("nid"),
        (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
            "cosine"
        ),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "qid",
            F.col("qlabel").cast("bigint").alias("qlabel"),
            "nid",
            F.round("cosine", 4).alias("cosine"),
            "rk",
        )
    )


# ---------------------------------------------------------------------------
# qy04: corpus snapshot diff — the incremental-build primitive: given
# yesterday's corpus and today's, classify every document as added /
# changed / unchanged by content hash, so downstream stages (shingling,
# embedding, indexing) reprocess only the delta. Snapshots are simulated
# deterministically from the one documents table: snapshot A lacks the
# doc_id % 10 == 0 docs (they are "added" in B) and carries a mutated
# body for doc_id % 7 == 0 (those are "changed").
# ---------------------------------------------------------------------------


@register(
    "qy04_corpus_snapshot_diff",
    oracle="""
    WITH b AS (
        SELECT doc_id, source, md5(text) AS h FROM documents),
    a AS (
        SELECT doc_id, source,
               md5(CASE WHEN doc_id % 7 = 0 THEN 'v2 ' || text
                        ELSE text END) AS h
        FROM documents WHERE doc_id % 10 <> 0),
    d AS (
        SELECT b.source,
               CASE WHEN a.doc_id IS NULL THEN 'added'
                    WHEN a.h <> b.h THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM b LEFT JOIN a USING (doc_id))
    SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM d GROUP BY source, status
    """,
)
def qy04_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash diff between two corpus snapshots, counted per
    (source, status): the reprocess-only-the-delta planner input for an
    incremental pipeline (a corpus-level sibling of the CDC layer's
    read_changes).

    Plan: both snapshots project off ONE documents scan (hash = md5 of
    the body — byte-identical across engines), then a doc_id-keyed left
    join and a source-alphabet-sized hash-agg. At 100 TB the join
    co-partitions on doc_id and the hashes are precomputed persisted
    columns, so a daily diff reads two hash columns, not two corpora."""
    docs = load_table(spark, sf_dir, "documents")
    b = docs.select("doc_id", "source", F.md5("text").alias("h"))
    a = docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.lit("v2 "), F.col("text"))
            ).otherwise(F.col("text"))
        ).alias("h_a"),
        # explicit presence marker: h_a is NULL for a PRESENT doc whose
        # body is NULL (md5(NULL)), so the hash cannot double as the
        # left-join presence test the way the oracle's a.doc_id can
        F.lit(1).alias("__in_a"),
    )
    status = (
        F.when(F.col("__in_a").isNull(), "added")
        .when(F.col("h_a") != F.col("h"), "changed")
        .otherwise("unchanged")
    )
    return (
        b.join(a, "doc_id", "left")
        .select("source", status.alias("status"))
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# qy07: deterministic weighted sampling without replacement — A-ES
# (Efraimidis & Spirakis 2006): each item draws u ~ U(0,1) and the k
# largest u^(1/w) win. Rank by ln(u)/w (monotone in u^(1/w)); u comes
# from the portable 52-bit md5 hash, so the "randomness" is reproducible
# bit-for-bit on both engines — the property a sampling step in a data
# pipeline actually needs (reruns must pick the same sample).
# ---------------------------------------------------------------------------

SAMPLE_K = 50


@register(
    "qy07_weighted_reservoir_sample",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, n_chars,
               {kmv_hash_duck("doc_id")} AS h
        FROM documents),
    k AS (
        SELECT doc_id, source, n_chars,
               ln(h / {float(1 << 52)}) / n_chars AS key
        FROM d WHERE n_chars > 0),
    t AS (
        SELECT doc_id, source, n_chars, key
        FROM k ORDER BY key DESC, doc_id LIMIT {SAMPLE_K})
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
           CAST(FLOOR(key * 1000000) AS BIGINT) AS key_e6,
           CAST(ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) AS BIGINT) AS rk
    FROM t
    """,
)
def qy07_weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{SAMPLE_K} weighted sample (weight = n_chars): longer
    documents proportionally likelier, selection reproducible across
    engines and reruns because u is the md5-prefix hash, not an RNG.

    Plan: the key is three per-row ops (hash, one ln, one divide — both
    engines evaluate the identical IEEE ops on identical inputs), then a
    distributed top-k (TakeOrderedAndProject: per-partition heaps +
    driver merge of {SAMPLE_K} rows) — NEVER a global sort. The rank
    window runs on the {SAMPLE_K} surviving rows only (limit-bounded, so
    the audit's global-window detector stays quiet). Key emitted as
    floor-e6 — floor of identical doubles is identical, with no
    round-half boundary to disagree on."""
    docs = load_table(spark, sf_dir, "documents")
    k = docs.filter(F.col("n_chars") > 0).select(
        "doc_id",
        "source",
        "n_chars",
        (
            F.log(F.expr(kmv_hash_spark("doc_id")) / F.lit(float(1 << 52)))
            / F.col("n_chars")
        ).alias("key"),
    )
    top = k.orderBy(F.desc("key"), F.asc("doc_id")).limit(SAMPLE_K)
    w = W.orderBy(F.desc("key"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "source",
        F.col("n_chars").cast("bigint").alias("weight"),
        F.floor(F.col("key") * 1_000_000).cast("bigint").alias("key_e6"),
        F.row_number().over(w).cast("bigint").alias("rk"),
    )


# ---------------------------------------------------------------------------
# qy08: stratified quota split — exact per-source 10/10/80 val/test/train
# assignment by hash order. Complements qx06 (which makes splits
# NEAR-DUP-SAFE): this one guarantees every stratum contributes its
# exact quota, the property mixture-controlled eval sets need.
# ---------------------------------------------------------------------------


@register(
    "qy08_stratified_quota_split",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source,
               {kmv_hash_duck("doc_id")} AS h
        FROM documents),
    r AS (
        SELECT doc_id, source, h,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id)
                   AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM d)
    SELECT doc_id, source,
           CASE WHEN rn <= (n + 9) // 10 THEN 'val'
                WHEN rn <= 2 * ((n + 9) // 10) THEN 'test'
                ELSE 'train' END AS split
    FROM r
    """,
)
def qy08_stratified_quota_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified split: within every source, docs order by
    their portable hash (reshuffle-proof, rerun-stable) and the first
    ⌈10%⌉ go to val, the next ⌈10%⌉ to test, the rest to train — exact
    quotas per stratum by construction.

    Plan: ONE window pass partitioned by source (the stratum alphabet is
    bounded, so partitions parallelize and no single task sees more than
    one stratum's rows; contrast q75, whose GLOBAL numbering needs the
    rankstats two-pass). Quota arithmetic is pure integer ceil-div."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", F.expr(kmv_hash_spark("doc_id")).alias("h")
    )
    ws = W.partitionBy("source")
    wr = ws.orderBy("h", "doc_id")
    r = d.select(
        "doc_id",
        "source",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    quota = F.expr("(n + 9) div 10")
    return r.select(
        "doc_id",
        "source",
        F.when(F.col("rn") <= quota, "val")
        .when(F.col("rn") <= 2 * quota, "test")
        .otherwise("train")
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# qy05: held-out bigram perplexity — the generalization companion to qx14
# (which scores the corpus under a model trained on ITSELF, no smoothing
# possible or needed) and qx97 (vocabulary OOV across splits): train an
# add-1-smoothed bigram LM on the train split, score the HELD-OUT split.
# The float sum of per-bigram NLL terms is order-pinned on both engines
# (the qx90 sorted-fold idiom), so per-doc totals are bit-identical, not
# merely close.
# ---------------------------------------------------------------------------

# doc_id % 5 == 0 is held out; the rest train the LM. On this data
# layout (doc ids round-robin by source) the holdout is SOURCE-ALIGNED —
# whole sources are held out — which makes this the cross-SOURCE
# generalization eval, the harder variant where unseen bigrams and
# contexts are guaranteed. For a within-source random split, key the
# modulus on md5(doc_id) instead (the qz02/qz07 discipline).
HOLDOUT_MOD = 5


@register(
    "qy05_heldout_bigram_perplexity",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+') AS toks
        FROM documents),
    bg AS (
        SELECT doc_id,
               unnest([struct_pack(w1 := toks[i], w2 := toks[i+1])
                       for i in range(1, len(toks))]) AS b
        FROM t WHERE len(toks) >= 2),
    pairs AS (SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg),
    train AS (SELECT * FROM pairs WHERE doc_id % {HOLDOUT_MOD} <> 0),
    held  AS (SELECT * FROM pairs WHERE doc_id % {HOLDOUT_MOD} = 0),
    cb AS (SELECT w1, w2, COUNT(*) AS c12 FROM train GROUP BY w1, w2),
    cu AS (SELECT w1, COUNT(*) AS c1 FROM train GROUP BY w1),
    v  AS (SELECT COUNT(DISTINCT w2) AS vsz FROM train),
    terms AS (
        SELECT held.doc_id, held.w1, held.w2,
               -ln((COALESCE(cb.c12, 0) + 1.0)
                   / (COALESCE(cu.c1, 0) + v.vsz)) AS nll
        FROM held
        LEFT JOIN cb ON cb.w1 = held.w1 AND cb.w2 = held.w2
        LEFT JOIN cu ON cu.w1 = held.w1
        CROSS JOIN v),
    agg AS (
        SELECT doc_id,
               COUNT(*) AS n_bigrams,
               list_reduce(
                   list_prepend(0.0::DOUBLE,
                       list_transform(
                           list(struct_pack(w1 := w1, w2 := w2, nll := nll)
                                ORDER BY w1, w2),
                           x -> x.nll)),
                   (a, b) -> a + b) AS total
        FROM terms GROUP BY doc_id)
    SELECT doc_id,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CAST(FLOOR(total * 1000000 / n_bigrams) AS BIGINT) AS avg_nll_e6
    FROM agg
    """,
)
def qy05_heldout_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-held-out-document average negative log-likelihood under an
    add-1 (Laplace) bigram LM trained on the other {HOLDOUT_MOD - 1}/
    {HOLDOUT_MOD} of the corpus — the perplexity filter (CCNet-style)
    run with a disjoint train/held split, so unseen bigrams and contexts
    actually occur and smoothing is load-bearing. On this data layout
    the doc_id modulus makes the holdout SOURCE-aligned (see the
    HOLDOUT_MOD comment): this is deliberately the cross-source
    generalization variant, not a within-source random split.

    Exactness: every probability is a ratio of exact integers
    ((c12+1)/(c1+V)), so both engines feed identical doubles to one ln
    each; the per-doc SUM of those terms is a left fold over the
    (w1, w2)-sorted bigram list on BOTH engines (equal bigrams produce
    equal terms, so tie order is irrelevant) — bit-identical totals, and
    the output is floor-e6 of total/n (identical doubles, no rounding
    boundary). Plan: one bigram explode feeds the model hash-aggs AND
    the held-side scoring joins (keyed on the same bigram/context keys);
    the fold list is per-document, bounded by document length."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(ascii_lower("text"), r"\s+").alias("toks")
    ).filter(F.size("toks") >= 2)
    idx = F.sequence(F.lit(1), F.size("toks") - 1)
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at("toks", i).alias("w1"),
                    F.element_at("toks", i + 1).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    train = pairs.filter(F.col("doc_id") % HOLDOUT_MOD != 0)
    held = pairs.filter(F.col("doc_id") % HOLDOUT_MOD == 0)
    # pinned bigram model; the context table and the vocabulary size are
    # re-aggregations of it (each train bigram row contributes one cb
    # count; distinct w2 over cb = distinct w2 over train), so the train
    # explode runs once instead of three times
    cb = (
        train.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=False)
    )
    cu = cb.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v = cb.agg(F.count_distinct("w2").alias("vsz"))
    terms = (
        held.join(cb, ["w1", "w2"], "left")
        .join(cu, "w1", "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "w1",
            "w2",
            (
                -F.log(
                    (F.coalesce("c12", F.lit(0)) + F.lit(1.0))
                    / (F.coalesce("c1", F.lit(0)) + F.col("vsz"))
                )
            ).alias("nll"),
        )
    )
    return (
        terms.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.expr(
                "aggregate(sort_array(collect_list(struct(w1, w2, nll))), "
                "cast(0.0 as double), (acc, s) -> acc + s.nll)"
            ).alias("total"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.floor(F.col("total") * 1_000_000 / F.col("n_bigrams"))
            .cast("bigint")
            .alias("avg_nll_e6"),
        )
    )


# ---------------------------------------------------------------------------
# qy06: session funnel conversion — the ordered view -> click -> purchase
# progression within gap-rule sessions. Distinct from qx78 (which counts
# ADJACENT fixed-length motifs): funnel steps may be separated by any
# other activity; each step just needs a strictly-later matching event.
# ---------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def _funnel_oracle() -> str:
    from kafka2delta_spark.operators.analytic import SESSIONIZED_SQL

    return f"""
    WITH {SESSIONIZED_SQL},
    f AS (
        SELECT user_id, session_seq,
               MIN(CASE WHEN event_type = '{FUNNEL_STEPS[0]}'
                        THEN epoch_us(ts) END) AS t0
        FROM s GROUP BY user_id, session_seq),
    g AS (
        SELECT s.user_id, s.session_seq, f.t0,
               MIN(CASE WHEN s.event_type = '{FUNNEL_STEPS[1]}'
                         AND epoch_us(s.ts) > f.t0
                        THEN epoch_us(s.ts) END) AS t1
        FROM s JOIN f USING (user_id, session_seq)
        GROUP BY s.user_id, s.session_seq, f.t0),
    h AS (
        SELECT s.user_id, s.session_seq, g.t0, g.t1,
               MIN(CASE WHEN s.event_type = '{FUNNEL_STEPS[2]}'
                         AND epoch_us(s.ts) > g.t1
                        THEN epoch_us(s.ts) END) AS t2
        FROM s JOIN g USING (user_id, session_seq)
        GROUP BY s.user_id, s.session_seq, g.t0, g.t1)
    SELECT CAST(COUNT(*) AS BIGINT)                    AS n_sessions,
           CAST(COUNT(t0) AS BIGINT)                   AS n_step1,
           CAST(COUNT(t1) AS BIGINT)                   AS n_step2,
           CAST(COUNT(t2) AS BIGINT)                   AS n_step3,
           CAST(COUNT(t1) * 10000 // COUNT(t0) AS BIGINT) AS conv_1_2_e4,
           CAST(COUNT(t2) * 10000 // COUNT(t1) AS BIGINT) AS conv_2_3_e4
    FROM h
    """


@register("qy06_session_funnel", oracle=_funnel_oracle())
def qy06_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion over gap-rule sessions: how many sessions reach
    a view, then a strictly-later click, then a strictly-later purchase,
    with step-to-step conversion rates (e4). Steps are ORDERED but not
    adjacent — any activity may intervene (the difference from qx78's
    adjacent motifs).

    Determinism: step times are integer microseconds and each step is a
    conditional MIN with a STRICT > comparison, so ties (an equal-time
    next step) are excluded by the same rule on both engines — no
    tiebreak heuristics in play. Plan: one user_id shuffle sessionizes,
    then three session-keyed conditional-min hash-aggs chained by joins
    that reuse the session partitioning; the final count row is a scalar
    aggregate. All integers end-to-end."""
    from kafka2delta_spark.operators.analytic import sessionize_events

    # pinned: the sessionized rows feed all three funnel-step joins —
    # unpinned, the sessionize window pipeline re-ran per step (events
    # scanned 3x in one plan); the pin is 4 narrow columns
    s = sessionize_events(load_table(spark, sf_dir, "events")).select(
        "user_id", "session_seq", "event_type", F.unix_micros("ts").alias("us")
    ).localCheckpoint(eager=False)
    key = ["user_id", "session_seq"]
    f = s.groupBy(*key).agg(
        F.min(F.when(F.col("event_type") == FUNNEL_STEPS[0], F.col("us"))).alias(
            "t0"
        )
    )
    g = (
        s.join(f, key)
        .groupBy(*key, "t0")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == FUNNEL_STEPS[1])
                    & (F.col("us") > F.col("t0")),
                    F.col("us"),
                )
            ).alias("t1")
        )
    )
    h = (
        s.join(g, key)
        .groupBy(*key, "t0", "t1")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == FUNNEL_STEPS[2])
                    & (F.col("us") > F.col("t1")),
                    F.col("us"),
                )
            ).alias("t2")
        )
    )
    return h.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.count("t0").cast("bigint").alias("n_step1"),
        F.count("t1").cast("bigint").alias("n_step2"),
        F.count("t2").cast("bigint").alias("n_step3"),
        # a slice where no session reaches the prior step has an
        # undefined conversion rate: NULL, matching DuckDB's `// 0`
        # (ANSI `div` would crash the whole query instead)
        F.expr(
            "cast(case when count(t0) = 0 then null"
            " else count(t1) * 10000 div count(t0) end as bigint)"
        ).alias("conv_1_2_e4"),
        F.expr(
            "cast(case when count(t1) = 0 then null"
            " else count(t2) * 10000 div count(t1) end as bigint)"
        ).alias("conv_2_3_e4"),
    )


# ---------------------------------------------------------------------------
# qy09: embedding-space label cohesion via moment identities — mean
# pairwise dot products WITHIN and ACROSS labels computed from per-label
# moment sums alone:
#
#   sum_{i != j in A} <v_i, v_j> = ||S_A||^2 - Q_A      (S_A = sum of
#   sum_{i in A, j in B} <v_i, v_j> = <S_A, S_B>         vectors, Q_A =
#                                                        sum of norms^2)
#
# so NO pair is ever materialized: the whole statistic reduces to one
# (label, dim) hash-agg — the alignment/uniformity-style diagnostic for
# contrastive-training data, computable at any corpus size.
# ---------------------------------------------------------------------------


@register(
    "qy09_label_cohesion_moments",
    oracle="""
    WITH x AS (
        SELECT vec_id, label, t.i - 1 AS d,
               CAST(FLOOR((embedding::DOUBLE[])[t.i] * 1000000) AS BIGINT)
                   AS xi
        FROM embeddings, range(1, 65) AS t(i)),
    s AS (
        SELECT label, d,
               SUM(xi)::HUGEINT AS sd,
               SUM(xi::HUGEINT * xi) AS qd
        FROM x GROUP BY label, d),
    m AS (
        SELECT label,
               COUNT(DISTINCT d) AS nd,
               SUM(sd * sd) AS s2,
               SUM(qd)      AS q
        FROM s GROUP BY label),
    n AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
    lab AS (SELECT m.label, m.s2, m.q, n.n FROM m JOIN n USING (label)),
    cross_d AS (
        SELECT a.label AS label_a, b.label AS label_b,
               SUM(a.sd * b.sd) AS sab
        FROM s a JOIN s b ON a.d = b.d AND a.label < b.label
        GROUP BY a.label, b.label)
    SELECT CAST(label AS BIGINT) AS label_a, CAST(label AS BIGINT) AS label_b,
           CAST(n AS BIGINT) AS n_a, CAST(n AS BIGINT) AS n_b,
           CAST((s2 - q) // (n * (n - 1)) AS BIGINT) AS mean_dot
    FROM lab
    UNION ALL
    SELECT CAST(c.label_a AS BIGINT), CAST(c.label_b AS BIGINT),
           CAST(na.n AS BIGINT), CAST(nb.n AS BIGINT),
           CAST(c.sab // (na.n * nb.n) AS BIGINT)
    FROM cross_d c
    JOIN n na ON na.label = c.label_a
    JOIN n nb ON nb.label = c.label_b
    """,
)
def qy09_label_cohesion_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean pairwise fixed-point dot product within every label (the
    diagonal rows) and across every unordered label pair — high diagonal
    / low off-diagonal means the labels are embedding-separable, the
    signal contrastive-pair mining (qx84) presupposes.

    Scale design: the pairwise sums collapse to MOMENT IDENTITIES
    (Σ_{i≠j}<vi,vj> = ||Σv||² − Σ||v||²; cross = <S_A, S_B>), so the
    only data-sized operation is one (label, dim) hash-agg with map-side
    combine — labels × 64 cells — and everything after runs on that
    metadata-sized table. No pair, no join against the corpus, no UDF.
    Arithmetic: coordinate sums stay int64; their SQUARES are carried in
    DECIMAL(38,0) / HUGEINT (a label's Σv scales with its row count, so
    the square overflows int64 at scale by design, not accident); the
    mean divides back under 2⁶³ (|dot| ≤ 64·(10⁶·0.6)² < 2.4e13) and
    both engines' integer division truncates identically."""
    emb = load_table(spark, sf_dir, "embeddings")
    # ONE embeddings pass: posexplode_OUTER keeps a (d = NULL) marker
    # row for NULL/empty embedding arrays, so the per-label row count n
    # reads off the pinned (label, d) aggregate — each embedding row
    # contributes exactly one row with d = 0 or d = NULL — instead of a
    # second corpus scan; the moment sums filter the NULL-d rows back
    # out (they carried no coordinates before either). The aggregate is
    # labels x 65 cells, consumed by four downstream frames.
    x = emb.select(
        "label",
        F.posexplode_outer(
            F.transform(
                "embedding",
                lambda c: F.floor(c.cast("double") * 1_000_000).cast("bigint"),
            )
        ).alias("d", "xi"),
    )
    s_full = (
        x.groupBy("label", "d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum("xi").cast("decimal(38,0)").alias("sd"),
            F.sum(F.col("xi").cast("decimal(38,0)") * F.col("xi")).alias("qd"),
        )
        .localCheckpoint(eager=False)
    )
    s = s_full.filter(F.col("d").isNotNull()).select("label", "d", "sd", "qd")
    m = s.groupBy("label").agg(
        F.sum(F.col("sd") * F.col("sd")).alias("s2"),
        F.sum("qd").alias("q"),
    )
    n = (
        s_full.filter((F.col("d") == 0) | F.col("d").isNull())
        .groupBy("label")
        .agg(F.sum("cnt").cast("bigint").alias("n"))
    )
    diag = (
        m.join(n, "label")
        .select(
            F.col("label").cast("bigint").alias("label_a"),
            F.col("label").cast("bigint").alias("label_b"),
            F.col("n").alias("n_a"),
            F.col("n").alias("n_b"),
            F.expr("cast((s2 - q) div (n * (n - 1)) as bigint)").alias(
                "mean_dot"
            ),
        )
    )
    sa = s.select(
        F.col("label").alias("label_a"), "d", F.col("sd").alias("sd_a")
    )
    sb = s.select(
        F.col("label").alias("label_b"), "d", F.col("sd").alias("sd_b")
    )
    cross = (
        sa.join(sb, "d")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("sd_a") * F.col("sd_b")).alias("sab"))
    )
    off = (
        cross.join(
            n.select(F.col("label").alias("label_a"), F.col("n").alias("n_a")),
            "label_a",
        )
        .join(
            n.select(F.col("label").alias("label_b"), F.col("n").alias("n_b")),
            "label_b",
        )
        .select(
            F.col("label_a").cast("bigint"),
            F.col("label_b").cast("bigint"),
            "n_a",
            "n_b",
            F.expr("cast(sab div (n_a * n_b) as bigint)").alias("mean_dot"),
        )
    )
    return diag.unionByName(off)


# ---------------------------------------------------------------------------
# qy03: MMR-diversified top-k — Maximal Marginal Relevance (Carbonell &
# Goldstein 1998): after qy02/q90 retrieve by pure similarity, re-rank a
# small candidate pool so each successive pick balances relevance to the
# query against redundancy with what's already picked:
#
#   pick_t = argmax_c [ λ·rel(c) − (1−λ)·max_{s∈picked} sim(c, s) ]
#
# The dedup-at-retrieval-time step of a RAG/training-mix pipeline. The
# iteration is over a POOL-sized frame (pool = 8 per query), so the K
# rounds unroll as bounded DataFrame ops — the corpus is touched exactly
# once, by the pool construction.
# ---------------------------------------------------------------------------

MMR_POOL = 8
MMR_K = 3
# λ = 1/2: exactly representable, so λ·rel − (1−λ)·maxsim is the same two
# IEEE ops on both engines


def _mmr_oracle() -> str:
    from kafka2delta_spark.functions.similarity import N_QUERIES

    head = f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE embedding IS NOT NULL),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn
          FROM n WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.qid, n.vec_id AS nid, n.v, n.nrm,
               list_dot_product(q.qv, n.v) / (q.qn * n.nrm) AS rel
        FROM q JOIN n ON n.vec_id <> q.qid),
    pool AS (
        SELECT qid, nid, v, nrm, rel FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                         ORDER BY rel DESC, nid) AS rk
            FROM scored)
        WHERE rk <= {MMR_POOL}),
    sims AS (
        SELECT a.qid, a.nid AS na, b.nid AS nb,
               list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS sim
        FROM pool a JOIN pool b ON a.qid = b.qid AND a.nid <> b.nid),
    s1 AS (
        SELECT qid, nid, rel AS score FROM (
            SELECT qid, nid, rel,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY rel DESC, nid) AS rk
            FROM pool) WHERE rk = 1)"""
    prev_sel = ["s1"]
    rounds = []
    for t in range(2, MMR_K + 1):
        sel_union = " UNION ALL ".join(
            f"SELECT qid, nid FROM {s}" for s in prev_sel
        )
        rounds.append(f"""
    sel{t} AS ({sel_union}),
    c{t} AS (
        SELECT p.qid, p.nid,
               0.5 * p.rel - 0.5 * MAX(m.sim) AS mmr
        FROM pool p
        JOIN sims m ON m.qid = p.qid AND m.na = p.nid
        JOIN sel{t} s ON s.qid = m.qid AND s.nid = m.nb
        WHERE NOT EXISTS (SELECT 1 FROM sel{t} x
                          WHERE x.qid = p.qid AND x.nid = p.nid)
        GROUP BY p.qid, p.nid, p.rel),
    p{t} AS (
        SELECT qid, nid, mmr AS score FROM (
            SELECT qid, nid, mmr,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY mmr DESC, nid) AS rk
            FROM c{t}) WHERE rk = 1)""")
        prev_sel.append(f"p{t}")
    finals = " UNION ALL ".join(
        f"SELECT qid, CAST({i + 1} AS BIGINT) AS pick_rk, nid, "
        f"CAST(FLOOR(score * 1000000) AS BIGINT) AS score_e6 FROM {s}"
        for i, s in enumerate(prev_sel)
    )
    return head + "," + ",".join(rounds) + "\n    " + finals


@register("qy03_mmr_diversified_topk", oracle=_mmr_oracle())
def qy03_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR re-ranking: {MMR_K} picks per query from a relevance-top-
    {MMR_POOL} pool, each maximizing λ·relevance − (1−λ)·max-similarity-
    to-picked (λ = 1/2). pick_rk 1 scores pure relevance (nothing picked
    yet); later scores are the marginal-relevance values.

    Exactness: both engines build the identical pool (same cosine
    doubles, same (rel DESC, nid) rank), the identical pairwise sim
    doubles, and each round's score is the same two IEEE ops on them;
    argmax tie-breaks on nid. Scores emit as floor-e6. Plan: the corpus
    is scanned ONCE for the pool (the q90 broadcast-query shape); every
    subsequent frame is queries×{MMR_POOL} rows, so the {MMR_K}-round
    loop adds no data-sized work at any corpus size — MMR's quadratic
    term exists only inside the bounded pool."""
    from kafka2delta_spark.functions.similarity import N_QUERIES, _vec, dot

    emb = load_embeddings(spark, sf_dir)
    n = emb.select("vec_id", _vec().alias("v")).select(
        "vec_id", "v", F.sqrt(dot(F.col("v"), F.col("v"))).alias("nrm")
    )
    q = n.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    scored = n.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        F.col("vec_id").alias("nid"),
        "v",
        "nrm",
        (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
            "rel"
        ),
    )
    wp = W.partitionBy("qid").orderBy(F.desc("rel"), F.asc("nid"))
    pool = (
        scored.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") <= MMR_POOL)
        .select("qid", "nid", "v", "nrm", "rel")
        .localCheckpoint(eager=False)  # consumed by sims + every round
    )
    a, b = pool.alias("a"), pool.alias("b")
    sims = (
        a.join(
            b,
            (F.col("a.qid") == F.col("b.qid"))
            & (F.col("a.nid") != F.col("b.nid")),
        )
        .select(
            F.col("a.qid").alias("qid"),
            F.col("a.nid").alias("cnid"),
            F.col("b.nid").alias("nb"),
            (
                dot(F.col("a.v"), F.col("b.v"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("sim"),
        )
        .localCheckpoint(eager=False)
    )
    sel = (
        pool.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .select("qid", "nid", F.col("rel").alias("score"))
        .withColumn("pick_rk", F.lit(1).cast("bigint"))
    )
    for t in range(2, MMR_K + 1):
        picked = sel.select("qid", "nid")
        cand = pool.join(picked, ["qid", "nid"], "left_anti")
        ms = (
            sims.join(
                picked.select(F.col("qid"), F.col("nid").alias("nb")),
                ["qid", "nb"],
            )
            .groupBy("qid", "cnid")
            .agg(F.max("sim").alias("maxsim"))
        )
        mmr = cand.join(
            ms, (cand.qid == ms.qid) & (cand.nid == ms.cnid)
        ).select(
            cand.qid.alias("qid"),
            "nid",
            (F.lit(0.5) * F.col("rel") - F.lit(0.5) * F.col("maxsim")).alias(
                "mmr"
            ),
        )
        pick = (
            mmr.groupBy("qid")
            .agg(
                F.max_by(
                    F.struct("nid", "mmr"), F.struct("mmr", -F.col("nid"))
                ).alias("p")
            )
            .select(
                "qid",
                F.col("p.nid").alias("nid"),
                F.col("p.mmr").alias("score"),
            )
            .withColumn("pick_rk", F.lit(t).cast("bigint"))
        )
        sel = sel.unionByName(pick)
    return sel.select(
        "qid",
        "pick_rk",
        "nid",
        F.floor(F.col("score") * 1_000_000).cast("bigint").alias("score_e6"),
    )
