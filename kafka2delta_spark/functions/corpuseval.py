"""Round-7 second wave (qz01..qz10): corpus-robustness statistics.

The measurement layer a production training-data pipeline runs on TOP of
its curation stages — validating that the quality model discriminates
(qz01 AUC), that splits stay distributionally aligned (qz02 PSI), that
storage dedup would pay (qz03 content-defined chunking), that the
embedding space is label-coherent (qz04 1-NN), which filter actually
does the work (qz05 waterfall), how lexical scorers compose (qz06 RRF
fusion), how stable per-source means are (qz07 jackknife), similarity
with term importance (qz08 IDF-weighted Jaccard), whether length tails
are power-law (qz09 Hill), and community structure beyond connectivity
(qz10 label propagation).

Exactness contract (repo-wide): hashed values are integers or fixed
point; floats appear only as identical single IEEE ops on identical
integer-derived inputs, or as order-pinned folds (the qx90 sorted-fold
idiom); integer division truncates identically on both engines for the
non-negative operands used here.

No reference counterpart: the reference engine (570 LoC, CDC only —
ref stream/stream.py) has none of these; they extend the mandated
LLM-pipeline surface (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka2delta_spark.operators.advanced import kmv_hash_duck, kmv_hash_spark
from kafka2delta_spark.queryset import register
from kafka2delta_spark.functions.measure import ascii_lower
from kafka2delta_spark.sources.tables import load_embeddings, load_table

# ---------------------------------------------------------------------------
# qz01: exact ROC-AUC of the q79 quality logit against near-dup membership
# — the single-number companion to qx95's reliability diagram. AUC is the
# Mann-Whitney U statistic normalized: P(score_pos > score_neg) + ½P(=).
# Computed exactly from MIDRANKS (average rank within a tie group), which
# reduce to per-distinct-score integer arithmetic — no pairwise work, no
# global window (ranks via rankstats' two-pass range exchange).
# ---------------------------------------------------------------------------


def _auc_oracle() -> str:
    from kafka2delta_spark.functions.curation import _QUALITY_LOGIT_SQL
    from kafka2delta_spark.functions.dedup import _JACCARD_PAIRS_SQL

    return (
        _QUALITY_LOGIT_SQL
        + f""",
    edges AS MATERIALIZED (SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS_SQL}) jp),
    dup AS (
        SELECT DISTINCT doc_id FROM (
            SELECT doc_a AS doc_id FROM edges
            UNION ALL SELECT doc_b FROM edges)),
    lab AS (
        SELECT s.doc_id, s.logit_micro,
               CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
        FROM scored s LEFT JOIN dup ON dup.doc_id = s.doc_id),
    rk AS (
        SELECT logit_micro, is_dup,
               ROW_NUMBER() OVER (ORDER BY logit_micro, doc_id) AS r1
        FROM lab),
    g AS (
        SELECT logit_micro,
               MIN(r1)::HUGEINT     AS mn,
               COUNT(*)::HUGEINT    AS cnt,
               SUM(is_dup)::HUGEINT AS npos
        FROM rk GROUP BY logit_micro),
    t AS (
        SELECT SUM(npos)                          AS np,
               SUM(cnt) - SUM(npos)               AS nn,
               SUM(npos * (2 * mn + cnt - 1))     AS s2
        FROM g)
    SELECT CAST(np AS BIGINT) AS n_pos,
           CAST(nn AS BIGINT) AS n_neg,
           CAST(s2 - np * (np + 1) AS BIGINT) AS u2_num,
           CAST(CASE WHEN np = 0 OR nn = 0 THEN 500000
                     ELSE (s2 - np * (np + 1)) * 1000000 // (2 * np * nn)
                END AS BIGINT) AS auc_e6
    FROM t
    """
    )


@register("qz01_quality_auc", oracle=_auc_oracle())
def qz01_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC (Mann-Whitney, midrank tie handling) of the q79
    quality logit against q98 near-dup membership — AUC ≈ 0.5 means the
    model cannot separate duplicated boilerplate from organic text;
    qx95's decile gradient condensed to one auditable number.

    Exactness: with 1-based global ranks over (logit, doc_id), the
    doubled midrank sum of positives is Σ_g n⁺_g·(2·minrank_g + n_g − 1)
    over distinct-logit groups — pure integers (doubling clears the ½ of
    the average rank), carried in decimal(38) because rank sums are
    O(n²) at scale. AUC_e6 = (2Σr⁺ − n⁺(n⁺+1))·10⁶ div (2n⁺n⁻), with
    the empty-class case pinned to 500000 (the 0.5 convention) — the
    qx91 zero-edge guard applied here.

    Plan: logits are per-row codegen; the dup label is two columns off
    the session-checkpointed q88 edge list; global ranks use rankstats'
    ``global_ranks`` two-pass (range exchange + mid-offset — NO global
    window, no single-task sort); then one hash-agg per distinct logit
    and a scalar aggregate. Nothing pairwise anywhere."""
    from kafka2delta_spark.functions.curation import quality_logits
    from kafka2delta_spark.functions.dedup import _jaccard_edges
    from kafka2delta_spark.operators.rankstats import midrank_histogram

    docs = load_table(spark, sf_dir, "documents")
    logits = quality_logits(docs)
    e = _jaccard_edges(spark, sf_dir)
    dup = (
        e.select(F.col("doc_a").alias("doc_id"))
        .unionByName(e.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    lab = logits.join(dup, "doc_id", "left").select(
        "doc_id",
        "logit_micro",
        F.coalesce("is_dup", F.lit(0)).alias("is_dup"),
    )
    # Midranks need only per-distinct-logit facts (min rank = #smaller
    # values + 1, count, positive count) — the value-histogram closed
    # form (midrank_histogram): one map-side-combined agg replaces the
    # data-sized range exchange + eager checkpoint + rank join of the
    # former global_ranks pass. logit_micro is a quantized bounded score
    # (hundreds of distinct cells), the domain the qx53/qx30 rule asks
    # for.
    dec = "decimal(38,0)"
    g = midrank_histogram(
        lab.select("logit_micro", "is_dup"),
        "logit_micro",
        extra_aggs=[F.sum("is_dup").alias("__npos")],
    ).select(
        F.col("__mn").cast(dec).alias("mn"),
        F.col("__cnt").cast(dec).alias("cnt"),
        F.col("__npos").cast(dec).alias("npos"),
    )
    t = g.agg(
        F.sum("npos").alias("np"),
        (F.sum("cnt") - F.sum("npos")).alias("nn"),
        F.sum(F.col("npos") * (2 * F.col("mn") + F.col("cnt") - 1)).alias("s2"),
    )
    u2 = F.col("s2") - F.col("np") * (F.col("np") + 1)
    return t.select(
        F.col("np").cast("bigint").alias("n_pos"),
        F.col("nn").cast("bigint").alias("n_neg"),
        u2.cast("bigint").alias("u2_num"),
        F.when((F.col("np") == 0) | (F.col("nn") == 0), F.lit(500000))
        .otherwise(
            F.expr(
                "(s2 - np * (np + 1)) * 1000000"
                " div (2 * np * nn)"
            )
        )
        .cast("bigint")
        .alias("auc_e6"),
    )


# ---------------------------------------------------------------------------
# qz02: Population Stability Index between the train and holdout splits
# over log2 document-length buckets — the standard "did my split (or my
# new snapshot) drift?" gate in ML data pipelines. Buckets come from the
# qx96 integer CASE ladder (no float log anywhere near a boundary);
# Laplace-smoothed shares make every term defined even for empty buckets.
# ---------------------------------------------------------------------------

PSI_MAX_BUCKET = 14  # n_chars >= 2^13 collapse here
PSI_K = PSI_MAX_BUCKET + 1  # bucket alphabet size (0..14), Laplace constant
# hash(doc_id) % 10 < 8 -> train, else holdout. The HASH matters: raw
# doc_id % k is constant within a source on this data layout (ids are
# assigned round-robin by source), which would silently turn a "random
# split" into a source split.
PSI_TRAIN_MOD = 10


def _chars_bucket_sql(col: str) -> str:
    """Portable CASE ladder: 0 for < 1, k for [2^(k-1), 2^k)."""
    branches = [f"WHEN {col} < 1 THEN 0"]
    for k in range(1, PSI_MAX_BUCKET):
        branches.append(f"WHEN {col} < {1 << k} THEN {k}")
    return "CASE " + " ".join(branches) + f" ELSE {PSI_MAX_BUCKET} END"


@register(
    "qz02_split_psi_drift",
    oracle=f"""
    WITH d AS (
        SELECT {_chars_bucket_sql('n_chars')} AS bucket,
               CASE WHEN ({kmv_hash_duck('doc_id')}) % {PSI_TRAIN_MOD} < 8
                    THEN 1 ELSE 0 END AS is_train
        FROM documents),
    c AS (
        SELECT bucket,
               SUM(is_train)     AS a,
               SUM(1 - is_train) AS b
        FROM d GROUP BY bucket),
    spine AS (
        SELECT r.range AS bucket,
               COALESCE(c.a, 0) AS a, COALESCE(c.b, 0) AS b
        FROM range(0, {PSI_K}) r LEFT JOIN c ON c.bucket = r.range),
    tot AS (SELECT SUM(a) AS ta, SUM(b) AS tb FROM spine),
    terms AS (
        SELECT s.bucket, s.a, s.b,
               ((s.a + 1) / (t.ta + {PSI_K})
                - (s.b + 1) / (t.tb + {PSI_K}))
               * ln(((s.a + 1) / (t.ta + {PSI_K}))
                    / ((s.b + 1) / (t.tb + {PSI_K}))) AS term
        FROM spine s CROSS JOIN tot t),
    total AS (
        SELECT list_reduce(
                   list_prepend(0.0::DOUBLE,
                       list_transform(
                           list(struct_pack(bucket := bucket, term := term)
                                ORDER BY bucket),
                           x -> x.term)),
                   (acc, v) -> acc + v) AS psi
        FROM terms)
    SELECT CAST(m.bucket AS INT) AS bucket,
           CAST(m.a AS BIGINT) AS n_train,
           CAST(m.b AS BIGINT) AS n_holdout,
           CAST(FLOOR(m.term * 1000000000) AS BIGINT) AS term_e9,
           CAST(FLOOR(total.psi * 1000000000) AS BIGINT) AS psi_total_e9
    FROM terms m CROSS JOIN total
    """,
)
def qz02_split_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the hash-assigned train (80%)
    and holdout (20%) splits over log2 length buckets: per-bucket
    Laplace-smoothed shares p, q and term (p−q)·ln(p/q), plus the PSI
    total repeated on every row (PSI < 0.1 = stable, the industry rule
    of thumb this query parameterizes).

    Exactness: buckets are the qx96 integer CASE ladder (no float log at
    a boundary); p and q are each ONE division of exact integers (+1 /
    +K Laplace makes empty buckets well-defined), ln(p/q) is one
    division + one ln on those identical doubles, and the PSI total is
    the qx90 order-pinned fold over the FIXED {PSI_K}-bucket alphabet
    (every bucket enumerated off a literal spine, so both engines fold
    the identical term list).

    Plan: one scan → one {PSI_K}-cell hash-agg with map-side combine;
    everything after (spine join, totals, fold) is alphabet-sized. The
    100 TB cost is the scan, exactly once."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        F.expr(_chars_bucket_sql("n_chars")).alias("bucket"),
        F.when(F.expr(kmv_hash_spark("doc_id")) % PSI_TRAIN_MOD < 8, 1)
        .otherwise(0)
        .alias("is_train"),
    )
    # pinned: the {PSI_K}-cell table feeds the spine join, the totals
    # and the PSI fold — unpinned, docs was scanned 4x in one plan
    c = d.groupBy("bucket").agg(
        F.sum("is_train").alias("a"),
        F.sum(1 - F.col("is_train")).alias("b"),
    ).localCheckpoint(eager=False)
    spine = spark.range(0, PSI_K, 1, 1).select(F.col("id").cast("int").alias("bucket"))
    s = spine.join(c, "bucket", "left").select(
        "bucket",
        F.coalesce("a", F.lit(0)).alias("a"),
        F.coalesce("b", F.lit(0)).alias("b"),
    )
    tot = s.agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
    p = (F.col("a") + 1) / (F.col("ta") + PSI_K)
    q = (F.col("b") + 1) / (F.col("tb") + PSI_K)
    terms = s.crossJoin(F.broadcast(tot)).select(
        "bucket", "a", "b", ((p - q) * F.log(p / q)).alias("term")
    )
    total = terms.agg(
        F.expr(
            "aggregate(sort_array(collect_list(struct(bucket, term))), "
            "cast(0.0 as double), (acc, v) -> acc + v.term)"
        ).alias("psi")
    )
    return terms.crossJoin(F.broadcast(total)).select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("a").cast("bigint").alias("n_train"),
        F.col("b").cast("bigint").alias("n_holdout"),
        F.floor(F.col("term") * 1_000_000_000).cast("bigint").alias("term_e9"),
        F.floor(F.col("psi") * 1_000_000_000)
        .cast("bigint")
        .alias("psi_total_e9"),
    )


# ---------------------------------------------------------------------------
# qz03: content-defined chunking dedup — the LBFS/restic/borg storage
# primitive: chunk boundaries are a pure function of LOCAL content (a
# k-gram hash hitting 0 mod M), so shared runs chunk identically in
# every document that contains them and dedup finds them regardless of
# offset. Distinct from q78 (FIXED-size chunks: one inserted byte shifts
# every later boundary) and q67 (verbatim-chunk boilerplate REPORT):
# this measures the storage dedup RATIO the chunk store would achieve.
# ---------------------------------------------------------------------------

CDC_K = 3  # boundary-decision k-gram width
CDC_MOD = 16  # expected chunk length in tokens


@register(
    "qz03_cdc_chunk_dedup",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source,
               regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+') AS toks
        FROM documents),
    p AS (
        SELECT doc_id, source,
               unnest([struct_pack(
                           i := i,
                           tok := toks[i],
                           gram := CASE WHEN i >= 2
                                             AND i + {CDC_K - 1} <= len(toks)
                                        -- indexed concat, not a list
                                        -- slice: slices copy the outer
                                        -- list per element, O(len²)
                                        THEN concat_ws(' ', {", ".join(f"toks[i + {j}]" for j in range(CDC_K))})
                                   END)
                       for i in range(1, len(toks) + 1)]) AS u
        FROM t WHERE len(toks) >= {CDC_K}),
    r AS (
        SELECT doc_id, source, u.i AS i, u.tok AS tok,
               CASE WHEN u.gram IS NOT NULL
                         AND ({kmv_hash_duck("u.gram")}) % {CDC_MOD} = 0
                    THEN 1 ELSE 0 END AS flag
        FROM p),
    c AS (
        SELECT doc_id, source, i, tok,
               SUM(flag) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS UNBOUNDED PRECEDING) AS chunk_id
        FROM r),
    ch AS (
        SELECT source, doc_id, chunk_id,
               COUNT(*) AS n_tok,
               md5(string_agg(tok, ' ' ORDER BY i)) AS h
        FROM c GROUP BY source, doc_id, chunk_id),
    g AS (
        SELECT source, h, COUNT(*) AS cnt, MIN(n_tok) AS len
        FROM ch GROUP BY source, h)
    SELECT source,
           CAST(SUM(cnt) AS BIGINT)              AS n_chunks,
           CAST(COUNT(*) AS BIGINT)              AS n_distinct,
           CAST(SUM(cnt * len) AS BIGINT)        AS total_tokens,
           CAST(SUM((cnt - 1) * len) AS BIGINT)  AS dup_tokens,
           CAST(SUM((cnt - 1) * len) * 10000 // SUM(cnt * len) AS BIGINT)
               AS dedup_ratio_e4
    FROM g GROUP BY source
    """,
)
def qz03_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup audit per source: cut a chunk
    boundary wherever the {CDC_K}-gram hash ≡ 0 (mod {CDC_MOD}) —
    boundaries depend only on a {CDC_K}-token window, so insertions
    shift NOTHING outside their own chunk — then count how many chunk
    tokens a content-addressed store would dedup away. Docs under
    {CDC_K} tokens are excluded on both engines (no gram to cut on).

    Exactness: boundaries come from the portable md5-prefix hash; chunk
    identity is md5 of the position-ordered token string; every output
    is integer (ratio = exact e4 integer division).

    Plan: position-explode + two lead() in one doc-partitioned window
    pass builds grams and flags, the SAME window partitioning computes
    the running boundary count (chunk ids), one (doc, chunk) hash-agg
    rebuilds chunk text, one (source, hash) hash-agg counts multiplicity
    — all shuffles are doc- or hash-keyed, nothing pairwise, no UDF. At
    100 TB this is the standard shuffle-bounded shape; expected chunk
    length is the {CDC_MOD} knob."""
    docs = load_table(spark, sf_dir, "documents")
    tok_t = docs.select(
        "doc_id", "source", F.split(ascii_lower("text"), r"\s+").alias("toks")
    ).filter(F.size("toks") >= CDC_K)
    rows = tok_t.select(
        "doc_id", "source", F.posexplode("toks").alias("pos", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", off).over(w) for off in range(1, CDC_K)]
    gram = rows.select(
        "doc_id",
        "source",
        "pos",
        "tok",
        F.concat_ws(" ", F.col("tok"), *leads).alias("gram"),
        leads[-1].alias("__last"),
    )
    flagged = gram.select(
        "doc_id",
        "source",
        "pos",
        "tok",
        F.when(
            (F.col("pos") >= 1)
            & F.col("__last").isNotNull()
            & (F.expr(kmv_hash_spark("gram")) % CDC_MOD == 0),
            1,
        )
        .otherwise(0)
        .alias("flag"),
    )
    wc = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    c = flagged.select(
        "doc_id",
        "source",
        "pos",
        "tok",
        F.sum("flag").over(wc).alias("chunk_id"),
    )
    ch = c.groupBy("source", "doc_id", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.tok,
                ),
                " ",
            )
        ).alias("h"),
    )
    g = ch.groupBy("source", "h").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("n_tok").alias("len")
    )
    return g.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(F.col("cnt") * F.col("len")).cast("bigint").alias("total_tokens"),
        F.sum((F.col("cnt") - 1) * F.col("len"))
        .cast("bigint")
        .alias("dup_tokens"),
        F.expr(
            "cast(sum((cnt - 1) * len) * 10000 div sum(cnt * len) as bigint)"
        ).alias("dedup_ratio_e4"),
    )


# ---------------------------------------------------------------------------
# qz04: leave-one-out 1-NN label accuracy — the classic embedding-quality
# eval: for each probe vector, does its nearest OTHER neighbor carry the
# same label? The measured justification for qy02's label-filtered
# retrieval and qx84's contrastive mining (both presuppose labels are
# embedding-coherent; this query scores how coherent).
# ---------------------------------------------------------------------------

LOO_PROBES = 100  # vec_id < 100 are the evaluation probes


@register(
    "qz04_loo_1nn_accuracy",
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
               WHERE embedding IS NOT NULL),
    n AS (SELECT vec_id, label, v,
                 sqrt(list_dot_product(v, v)) AS nrm FROM e),
    q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv, nrm AS qn
          FROM n WHERE vec_id < {LOO_PROBES}),
    scored AS (
        SELECT q.qid, q.qlabel, n.label AS nlabel, n.vec_id AS nid,
               list_dot_product(q.qv, n.v) / (q.qn * n.nrm) AS cosine
        FROM q JOIN n ON n.vec_id <> q.qid),
    nn AS (
        SELECT qid, qlabel, nlabel FROM (
            SELECT qid, qlabel, nlabel,
                   ROW_NUMBER() OVER (PARTITION BY qid
                                      ORDER BY cosine DESC, nid) AS rk
            FROM scored)
        WHERE rk = 1)
    SELECT CAST(qlabel AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
           CAST(SUM(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END) * 10000
                // COUNT(*) AS BIGINT) AS acc_e4
    FROM nn GROUP BY qlabel
    """,
)
def qz04_loo_1nn_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 1-NN label accuracy over {LOO_PROBES} probe vectors:
    per true label, how often the cosine-nearest other vector agrees.
    High accuracy = labels are embedding-separable (the signal qy09
    measures via moments, here measured the way an eval harness would).

    Exactness: the q90 cosine recipe (identical op order on both
    engines); the argmax tie-breaks on (cosine DESC, nid ASC) via
    ``max_by`` over a (cosine, −nid) struct; accuracy is exact integer
    e4. Plan: the probe set is bounded ({LOO_PROBES} rows → broadcast),
    so the corpus is scanned ONCE and never self-joined; per-probe
    argmax is one hash-agg. At 100 TB this is the standard
    bounded-probe eval shape — probes broadcast, corpus streams."""
    from kafka2delta_spark.functions.similarity import _vec, dot

    emb = load_embeddings(spark, sf_dir)
    n = emb.select("vec_id", "label", _vec().alias("v")).select(
        "vec_id",
        "label",
        "v",
        F.sqrt(dot(F.col("v"), F.col("v"))).alias("nrm"),
    )
    # pinned: the bounded probe frame is broadcast against the full
    # corpus side — unpinned, the norm pipeline re-ran under the
    # broadcast branch (embeddings scanned twice in one plan)
    q = n.filter(F.col("vec_id") < LOO_PROBES).select(
        F.col("vec_id").alias("qid"),
        F.col("label").alias("qlabel"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    ).localCheckpoint(eager=False)
    scored = n.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid",
        "qlabel",
        F.col("label").alias("nlabel"),
        F.col("vec_id").alias("nid"),
        (dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).alias(
            "cosine"
        ),
    )
    nn = scored.groupBy("qid", "qlabel").agg(
        F.max_by(
            F.col("nlabel"), F.struct(F.col("cosine"), -F.col("nid"))
        ).alias("nlabel")
    )
    correct = F.sum(F.when(F.col("nlabel") == F.col("qlabel"), 1).otherwise(0))
    return nn.groupBy(F.col("qlabel").cast("bigint").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        correct.cast("bigint").alias("n_correct"),
        F.expr(
            "cast(sum(case when nlabel = qlabel then 1 else 0 end) * 10000"
            " div count(1) as bigint)"
        ).alias("acc_e4"),
    )


# ---------------------------------------------------------------------------
# qz05: quality-gate waterfall attribution — q74 reports how many docs
# fail EACH rule; this reports which rule fires FIRST in the gate's
# declared order (waterfall) next to each rule's unconditional failure
# count (solo). waterfall ≪ solo for a rule means earlier rules already
# catch its docs — the measurement behind reordering or retiring filters.
# ---------------------------------------------------------------------------


def _wf_rules_sql() -> str:
    from kafka2delta_spark.functions.curation import (
        MAX_CPT,
        MAX_PUNCT_RATIO,
        MAX_TOKENS,
        MIN_CPT,
        MIN_STOPWORD_RATIO,
        MIN_TOKENS,
        _STOP_IN,
    )

    return rf"""
    WITH t AS (
        SELECT source, LENGTH(text) AS n_chars,
               regexp_split_to_array(text, '\s+') AS toks,
               LENGTH(text) - LENGTH(regexp_replace(text, '[^\w\s]', '', 'g'))
                   AS n_punct
        FROM documents),
    r AS (
        SELECT source,
               len(toks) BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}     AS ok_len,
               n_chars * 1.0 / len(toks) BETWEEN {MIN_CPT} AND {MAX_CPT}
                                                                   AS ok_cpt,
               len(list_filter(toks, x -> x IN ({_STOP_IN}))) * 1.0
                   / len(toks) >= {MIN_STOPWORD_RATIO}             AS ok_stop,
               n_punct * 1.0 / n_chars <= {MAX_PUNCT_RATIO}        AS ok_punct
        FROM t)"""


@register(
    "qz05_filter_waterfall",
    oracle=_wf_rules_sql()
    + """
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN ok_len AND ok_cpt AND ok_stop AND ok_punct
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN NOT ok_len THEN 1 ELSE 0 END) AS BIGINT)
               AS wf_len,
           CAST(SUM(CASE WHEN ok_len AND NOT ok_cpt THEN 1 ELSE 0 END)
               AS BIGINT) AS wf_cpt,
           CAST(SUM(CASE WHEN ok_len AND ok_cpt AND NOT ok_stop
                         THEN 1 ELSE 0 END) AS BIGINT) AS wf_stop,
           CAST(SUM(CASE WHEN ok_len AND ok_cpt AND ok_stop AND NOT ok_punct
                         THEN 1 ELSE 0 END) AS BIGINT) AS wf_punct,
           CAST(SUM(CASE WHEN NOT ok_len THEN 1 ELSE 0 END) AS BIGINT)
               AS solo_len,
           CAST(SUM(CASE WHEN NOT ok_cpt THEN 1 ELSE 0 END) AS BIGINT)
               AS solo_cpt,
           CAST(SUM(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT)
               AS solo_stop,
           CAST(SUM(CASE WHEN NOT ok_punct THEN 1 ELSE 0 END) AS BIGINT)
               AS solo_punct
    FROM r GROUP BY source
    """,
)
def qz05_filter_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source filter attribution for the q74 quality gate: waterfall
    counts (first rule to fire, in the gate's declared len → cpt → stop
    → punct order) next to solo counts (docs failing the rule at all).
    Σ waterfall + kept = docs by construction; a rule whose waterfall
    count is far below its solo count is redundant where it sits.

    Exactness: q74's own rule expressions verbatim (integer-ratio
    boundaries, bit-identical comparisons); everything else is
    conditional integer sums. Plan: ONE scan, one source-keyed hash-agg
    with map-side combine — adding the 8 attribution counters costs no
    extra pass over what q74 already pays."""
    from kafka2delta_spark.functions.curation import (
        MAX_CPT,
        MAX_PUNCT_RATIO,
        MAX_TOKENS,
        MIN_CPT,
        MIN_STOPWORD_RATIO,
        MIN_TOKENS,
        STOPWORDS,
    )
    from kafka2delta_spark.functions.text import TOKEN_SPLIT_RE

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), TOKEN_SPLIT_RE)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    r = docs.select(
        "source",
        n_tokens.between(MIN_TOKENS, MAX_TOKENS).alias("ok_len"),
        (n_chars * 1.0 / n_tokens).between(MIN_CPT, MAX_CPT).alias("ok_cpt"),
        (n_stop * 1.0 / n_tokens >= MIN_STOPWORD_RATIO).alias("ok_stop"),
        (n_punct * 1.0 / n_chars <= MAX_PUNCT_RATIO).alias("ok_punct"),
    )
    ok = lambda c: F.col(c)  # noqa: E731
    cnt = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")  # noqa: E731
    keep = ok("ok_len") & ok("ok_cpt") & ok("ok_stop") & ok("ok_punct")
    return r.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        cnt(keep).alias("n_kept"),
        cnt(~ok("ok_len")).alias("wf_len"),
        cnt(ok("ok_len") & ~ok("ok_cpt")).alias("wf_cpt"),
        cnt(ok("ok_len") & ok("ok_cpt") & ~ok("ok_stop")).alias("wf_stop"),
        cnt(ok("ok_len") & ok("ok_cpt") & ok("ok_stop") & ~ok("ok_punct")).alias(
            "wf_punct"
        ),
        cnt(~ok("ok_len")).alias("solo_len"),
        cnt(~ok("ok_cpt")).alias("solo_cpt"),
        cnt(~ok("ok_stop")).alias("solo_stop"),
        cnt(~ok("ok_punct")).alias("solo_punct"),
    )


# ---------------------------------------------------------------------------
# qz06: reciprocal-rank fusion of BM25 and query-likelihood (Dirichlet)
# rankings — the hybrid-retrieval combiner (Cormack et al. 2009): fused
# score = Σ_lists 1/(C + rank). Rank-based, so the two scorers need no
# score calibration — and with 1/(C+r) carried as FLOOR(1e9/(C+r)) the
# whole fusion is exact integer arithmetic.
# ---------------------------------------------------------------------------

RRF_C = 60
RRF_DEPTH = 10  # fuse the two top-10 lists
QLD_MU = 500  # Dirichlet smoothing mass


def _rrf_oracle() -> str:
    from kafka2delta_spark.functions.retrieval import BM25_TERMS, _bm25_oracle

    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    cf_pivots = ", ".join(
        f"SUM(CASE WHEN term = '{t}' THEN cf END) AS cf_{t}"
        for t in BM25_TERMS
    )
    tf_pivots = ", ".join(
        f"SUM(CASE WHEN term = '{t}' THEN tf ELSE 0 END) AS tf_{t}"
        for t in BM25_TERMS
    )
    # per-term Dirichlet log-likelihood, summed in fixed declaration order
    ql_sum = " + ".join(
        f"ln(((tf_{t} * nt + {QLD_MU} * cf_{t}) * 1.0)"
        f" / (nt * (dl + {QLD_MU})))"
        for t in BM25_TERMS
    )
    return f"""
    WITH bm AS (
        SELECT doc_id, rk AS rk_b FROM ({_bm25_oracle()}) bm25q),
    d AS (
        SELECT doc_id,
               regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+') AS toks
        FROM documents),
    dl AS (SELECT doc_id, len(toks) AS dl FROM d),
    tr AS (SELECT doc_id, unnest(toks) AS term FROM d),
    hits AS (SELECT doc_id, term FROM tr WHERE term IN ({terms})),
    cf AS (
        SELECT {cf_pivots}, (SELECT COUNT(*) FROM tr) AS nt
        FROM (SELECT term, COUNT(*) AS cf FROM hits GROUP BY term) c),
    tf AS (
        SELECT doc_id, {tf_pivots}
        FROM (SELECT doc_id, term, COUNT(*) AS tf FROM hits
              GROUP BY doc_id, term) x
        GROUP BY doc_id),
    ql_scored AS (
        SELECT tf.doc_id, {ql_sum} AS score
        FROM tf JOIN dl USING (doc_id) CROSS JOIN cf),
    ql AS (
        SELECT doc_id, rk_q FROM (
            SELECT doc_id,
                   ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk_q
            FROM ql_scored)
        WHERE rk_q <= {RRF_DEPTH}),
    fused AS (
        SELECT COALESCE(bm.doc_id, ql.doc_id) AS doc_id,
               bm.rk_b, ql.rk_q,
               COALESCE(1000000000 // ({RRF_C} + bm.rk_b), 0)
               + COALESCE(1000000000 // ({RRF_C} + ql.rk_q), 0) AS rrf
        FROM bm FULL OUTER JOIN ql ON bm.doc_id = ql.doc_id)
    SELECT doc_id,
           CAST(rk_b AS BIGINT) AS rk_bm25,
           CAST(rk_q AS BIGINT) AS rk_qld,
           CAST(rrf AS BIGINT) AS rrf_score,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT)
               AS fused_rk
    FROM fused
    """


@register("qz06_rrf_hybrid_fusion", oracle=_rrf_oracle())
def qz06_rrf_hybrid_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval models over the same fixed
    query: qx01's BM25 top-{RRF_DEPTH} and a Dirichlet-smoothed query-
    likelihood top-{RRF_DEPTH} (μ = {QLD_MU}), fused as
    Σ floor(10⁹/({RRF_C}+rank)) — rank-based, calibration-free, and
    exact INTEGER arithmetic end to end once the two rank lists exist.

    Exactness: the QL score per (doc, term) is one division of exact
    int64 products + one ln (tf·N_tokens and μ·cf stay far under 2⁶³ at
    any plausible corpus), per-term scores pivot into FIXED columns
    summed in declaration order (the qx01 float-order discipline);
    missing docs in one list contribute 0 by the RRF convention
    (COALESCE on both engines).

    Plan: BM25 reuses qx01's registered pipeline verbatim (composition,
    not re-derivation); QL touches only query-term hits after the
    explode filter; the fusion join is {RRF_DEPTH}+{RRF_DEPTH} rows.
    Corpus-sized work: the token explode, twice (once per scorer's
    pipeline) — at 100 TB both scorers would read one materialized
    (doc, term, tf) postings table built once."""
    from kafka2delta_spark.functions.retrieval import (
        BM25_TERMS,
        bm25_doc_stats_cached,
        qx01_bm25_retrieval,
    )

    bm = qx01_bm25_retrieval(spark, sf_dir).select(
        "doc_id", F.col("rk").cast("bigint").alias("rk_b")
    )
    # Both corpus facts the QL leg needs — nt (total token count) and
    # per-term cf — read off the SAME pinned per-doc stats frame qx01's
    # BM25 already built (bm25_doc_stats_cached): nt = Σ dl (identical
    # to counting exploded tokens; NULL-text docs contribute nothing on
    # either formulation), cf_t = Σ tf_t over hit docs. The former shape
    # paid a full token explode for nt and a second for hits (guide
    # §2.3/§2.4: the corpus-sized explode existed only to count a 3-term
    # literal vocabulary, now counted inside each row).
    X = bm25_doc_stats_cached(spark, sf_dir)
    cf = X.agg(
        F.sum("dl").cast("bigint").alias("nt"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, F.col(f"tf_{t}")))
            .cast("bigint")
            .alias(f"cf_{t}")
            for t in BM25_TERMS
        ],
    )
    hit = None
    for t in BM25_TERMS:
        h = F.col(f"tf_{t}") > 0
        hit = h if hit is None else (hit | h)
    tf = X.filter(hit).select(
        "doc_id",
        "dl",
        *[F.col(f"tf_{t}") for t in BM25_TERMS],
    )
    ql_term = lambda t: F.log(  # noqa: E731
        (
            (F.col(f"tf_{t}") * F.col("nt") + QLD_MU * F.col(f"cf_{t}"))
            * F.lit(1.0)
        )
        / (F.col("nt") * (F.col("dl") + QLD_MU))
    )
    score = ql_term(BM25_TERMS[0])
    for t in BM25_TERMS[1:]:
        score = score + ql_term(t)
    ql_scored = tf.crossJoin(F.broadcast(cf)).select(
        "doc_id", score.alias("score")
    )
    wq = W.orderBy(F.desc("score"), F.asc("doc_id"))
    ql = (
        ql_scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(RRF_DEPTH)
        .select(
            "doc_id", F.row_number().over(wq).cast("bigint").alias("rk_q")
        )
    )
    fused = (
        bm.join(ql, "doc_id", "full_outer")
        .select(
            "doc_id",
            "rk_b",
            "rk_q",
            (
                F.coalesce(
                    F.expr(f"1000000000 div ({RRF_C} + rk_b)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000000 div ({RRF_C} + rk_q)"), F.lit(0)
                )
            ).alias("rrf"),
        )
    )
    wf = W.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return fused.select(
        "doc_id",
        F.col("rk_b").alias("rk_bm25"),
        F.col("rk_q").alias("rk_qld"),
        F.col("rrf").cast("bigint").alias("rrf_score"),
        F.row_number().over(wf).cast("bigint").alias("fused_rk"),
    )


# ---------------------------------------------------------------------------
# qz07: delete-one-fold jackknife of the per-source mean quality logit —
# the standard-error a source-level dashboard should print next to every
# mean. Folds are md5(doc_id) % 10 — hash-deterministic, so the
# resampling is reproducible across engines, runs, and cluster sizes
# (and NOT raw doc_id % 10, which is constant per source here — see the
# qz02 layout note).
# ---------------------------------------------------------------------------

JK_FOLDS = 10


def _jk_oracle() -> str:
    from kafka2delta_spark.functions.curation import _QUALITY_LOGIT_SQL

    return (
        _QUALITY_LOGIT_SQL
        + f""",
    folds AS (
        SELECT source, ({kmv_hash_duck('doc_id')}) % {JK_FOLDS} AS fold,
               SUM(logit_micro) AS s_f, COUNT(*) AS n_f
        FROM scored
        GROUP BY source, ({kmv_hash_duck('doc_id')}) % {JK_FOLDS}),
    src AS (
        SELECT source, SUM(s_f) AS s, SUM(n_f) AS n, COUNT(*) AS nf,
               list(struct_pack(fold := fold, s_f := s_f, n_f := n_f)
                    ORDER BY fold) AS fl
        FROM folds GROUP BY source
        HAVING COUNT(*) >= 2),
    m AS (
        SELECT source, s, n, nf, fl,
               list_reduce(
                   list_prepend(0.0::DOUBLE,
                       list_transform(fl, x -> (s - x.s_f) / (n - x.n_f))),
                   (a, b) -> a + b) / nf AS tbar
        FROM src),
    v AS (
        SELECT source, s, n, nf, tbar,
               list_reduce(
                   list_prepend(0.0::DOUBLE,
                       list_transform(fl,
                           x -> ((s - x.s_f) / (n - x.n_f) - tbar)
                                * ((s - x.s_f) / (n - x.n_f) - tbar))),
                   (a, b) -> a + b) AS ssq
        FROM m)
    SELECT source,
           CAST(n AS BIGINT)  AS n_docs,
           CAST(nf AS BIGINT) AS n_folds,
           CAST(s // n AS BIGINT) AS mean_logit_micro,
           CAST(FLOOR(sqrt((nf - 1.0) / nf * ssq) * 1000) AS BIGINT)
               AS jk_se_micro_e3
    FROM v
    """
    )


@register("qz07_jackknife_source_mean", oracle=_jk_oracle())
def qz07_jackknife_source_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-fold jackknife standard error of each source's mean
    quality logit over {JK_FOLDS} hash-deterministic folds — the
    uncertainty bar for qx56-style per-source quality decisions, from
    resampling rather than a normality assumption.

    Exactness: fold sums are exact integers; each leave-one-out estimate
    is ONE division of integers; their mean and the squared-deviation
    sum are order-pinned folds over the fold-sorted list (the qx90
    idiom, ≤ {JK_FOLDS} elements); SE applies the (F−1)/F factor and one
    sqrt — identical IEEE ops on identical doubles, emitted floor-e3.
    Sources with a single nonempty fold are excluded (SE undefined; its
    leave-one-out estimate divides by zero) on BOTH engines.

    Plan: one scan → one (source, fold) hash-agg with map-side combine;
    everything after runs on |sources|·{JK_FOLDS} rows. The resampling
    never touches the data again — the scale property that makes
    jackknife-by-fold-sums THE distributed resampling recipe."""
    from kafka2delta_spark.functions.curation import quality_logits

    docs = load_table(spark, sf_dir, "documents")
    folds = (
        quality_logits(docs)
        .groupBy(
            "source",
            (F.expr(kmv_hash_spark("doc_id")) % JK_FOLDS).alias("fold"),
        )
        .agg(
            F.sum("logit_micro").alias("s_f"),
            F.count(F.lit(1)).alias("n_f"),
        )
    )
    src = (
        folds.groupBy("source")
        .agg(
            F.sum("s_f").alias("s"),
            F.sum("n_f").alias("n"),
            F.count(F.lit(1)).alias("nf"),
            F.expr(
                "sort_array(collect_list(struct(fold, s_f, n_f)))"
            ).alias("fl"),
        )
        .filter(F.col("nf") >= 2)
    )
    m = src.select(
        "source",
        "s",
        "n",
        "nf",
        "fl",
        (
            F.expr(
                "aggregate(fl, cast(0.0 as double),"
                " (a, x) -> a + (s - x.s_f) / (n - x.n_f))"
            )
            / F.col("nf")
        ).alias("tbar"),
    )
    v = m.select(
        "source",
        "n",
        "nf",
        "s",
        "tbar",
        F.expr(
            "aggregate(fl, cast(0.0 as double),"
            " (a, x) -> a + ((s - x.s_f) / (n - x.n_f) - tbar)"
            " * ((s - x.s_f) / (n - x.n_f) - tbar))"
        ).alias("ssq"),
    )
    return v.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("nf").cast("bigint").alias("n_folds"),
        F.expr("cast(s div n as bigint)").alias("mean_logit_micro"),
        F.floor(
            F.sqrt((F.col("nf") - 1.0) / F.col("nf") * F.col("ssq")) * 1000
        )
        .cast("bigint")
        .alias("jk_se_micro_e3"),
    )


# ---------------------------------------------------------------------------
# qz08: IDF-weighted Jaccard similarity — q88 counts every shingle
# equally; weighting by IDF makes rare shared phrases dominate and stop
# phrases (already df-capped) irrelevant, the weighting real dedup
# pipelines apply before thresholding. Weights are e6 fixed-point, so
# intersection/union masses — and the ratio — are exact integers.
# ---------------------------------------------------------------------------

WJ_THRESHOLD_E4 = 1200  # keep pairs with weighted Jaccard >= 0.12 (q88's bar)


def _wjaccard_oracle() -> str:
    from kafka2delta_spark.functions.dedup import SHINGLE_DF_CAP, shingles_sql

    return f"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+') AS toks
        FROM documents),
    sh_t AS (
        SELECT doc_id, {shingles_sql(k=3)} AS sh FROM t WHERE len(toks) >= 3),
    raw_ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh_t),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM raw_ex),
    df AS (SELECT shingle, COUNT(*) AS df FROM raw_ex GROUP BY shingle),
    wdf AS (
        SELECT df.shingle,
               CAST(FLOOR(ln(nd.n / df.df) * 1000000) AS BIGINT) AS w
        FROM df CROSS JOIN nd WHERE df.df <= {SHINGLE_DF_CAP}),
    ex AS (
        SELECT r.doc_id, r.shingle, wdf.w
        FROM raw_ex r JOIN wdf USING (shingle)),
    wsz AS (SELECT doc_id, SUM(w) AS tw FROM ex GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w) AS iw
        FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           CAST(iw AS BIGINT) AS inter_w,
           CAST(sa.tw + sb.tw - iw AS BIGINT) AS union_w,
           CAST(iw * 10000 // (sa.tw + sb.tw - iw) AS BIGINT) AS wjaccard_e4
    FROM inter
    JOIN wsz sa ON sa.doc_id = doc_a
    JOIN wsz sb ON sb.doc_id = doc_b
    WHERE iw * 10000 // (sa.tw + sb.tw - iw) >= {WJ_THRESHOLD_E4}
    """


@register("qz08_idf_weighted_jaccard", oracle=_wjaccard_oracle())
def qz08_idf_weighted_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDF-weighted Jaccard pairs: J_w = Σ_{{shared}} w_t / Σ_{{union}} w_t
    with w_t = floor(10⁶·ln(N/df_t)) — rare shared phrases dominate the
    score, and high-df shingles are dropped entirely by q88's df-cap
    discipline (weights live on the same reduced space, so the ratio is
    exact on it).

    Exactness: each weight is one division of exact integers + one ln,
    floored to e6 fixed point; from there intersection mass, union mass
    (W_a + W_b − inter, by inclusion-exclusion on distinct-shingle
    sets), and the e4 ratio are pure integer arithmetic.

    Plan: the q88 candidate shape reused with a weight attached — one
    groupBy(shingle) builds df AND the in-bucket pair expansion
    (pairs_within_groups, bounded by C(cap,2) per shingle); per-doc
    weight totals are one hash-agg; size lookups join on doc id (never
    force-broadcast — the round-7 rule: AQE broadcasts the pair side
    when it is actually small). Candidate volume is bounded by
    n_shingles·C({SHINGLE_DF_CAP},2), the same 100 TB envelope as q88."""
    from kafka2delta_spark.functions.dedup import (
        SHINGLE_DF_CAP,
        pairs_within_groups,
        shingle_rows_cached,
    )

    ex = shingle_rows_cached(spark, sf_dir, k=3)
    nd = ex.agg(F.count_distinct("doc_id").alias("n"))
    by_shingle = ex.groupBy("shingle").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids"),
        F.count(F.lit(1)).alias("df"),
    )
    grouped = (
        by_shingle.filter(F.col("df") <= SHINGLE_DF_CAP)
        .crossJoin(F.broadcast(nd))
        .select(
            "ids",
            F.floor(F.log(F.col("n") / F.col("df")) * 1_000_000)
            .cast("bigint")
            .alias("w"),
        )
    )
    wsz = (
        grouped.select(F.explode("ids").alias("doc_id"), "w")
        .groupBy("doc_id")
        .agg(F.sum("w").alias("tw"))
    )
    inter = (
        pairs_within_groups(grouped.filter(F.size("ids") > 1))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum("w").alias("iw"))
    )
    sa = wsz.select(F.col("doc_id").alias("doc_a"), F.col("tw").alias("tw_a"))
    sb = wsz.select(F.col("doc_id").alias("doc_b"), F.col("tw").alias("tw_b"))
    uw = F.col("tw_a") + F.col("tw_b") - F.col("iw")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("iw").cast("bigint").alias("inter_w"),
            uw.cast("bigint").alias("union_w"),
            F.expr("cast(iw * 10000 div (tw_a + tw_b - iw) as bigint)").alias(
                "wjaccard_e4"
            ),
        )
        .filter(F.col("wjaccard_e4") >= WJ_THRESHOLD_E4)
    )


# ---------------------------------------------------------------------------
# qz09: Hill tail-exponent estimator of per-source document lengths —
# heavy-tail audit: α ≈ 1 means a few giant documents dominate a
# source's token mass (length caps / sampling needed); large α means the
# tail decays fast. Hill (1975): 1/α̂ = mean of ln(x_(i)/x_(k)) over the
# top-k order statistics.
# ---------------------------------------------------------------------------

HILL_K = 25  # tail order statistics per source


@register(
    "qz09_hill_tail_exponent",
    oracle=f"""
    WITH r AS (
        SELECT source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rk
        FROM documents WHERE n_chars >= 1),
    xk AS (SELECT source, n_chars AS x_k FROM r WHERE rk = {HILL_K}),
    s AS (
        SELECT r.source, xk.x_k,
               list_reduce(
                   list_prepend(0.0::DOUBLE,
                       list_transform(
                           list(struct_pack(rk := r.rk, x := r.n_chars)
                                ORDER BY rk),
                           t -> ln(t.x / xk.x_k))),
                   (a, b) -> a + b) AS sum_ln
        FROM r JOIN xk ON xk.source = r.source
        WHERE r.rk < {HILL_K}
        GROUP BY r.source, xk.x_k)
    SELECT source,
           CAST(x_k AS BIGINT) AS x_k,
           CAST(FLOOR(sum_ln * 1000000000) AS BIGINT) AS sum_ln_e9,
           CAST(FLOOR(sum_ln / {HILL_K - 1} * 1000000) AS BIGINT)
               AS alpha_inv_e6,
           CAST(CASE WHEN sum_ln > 0
                     THEN FLOOR({HILL_K - 1} / sum_ln * 1000000)
                     ELSE 0 END AS BIGINT) AS alpha_e6
    FROM s
    """,
)
def qz09_hill_tail_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-exponent estimate of document length per source from
    the top-{HILL_K} order statistics: 1/α̂ = (1/{HILL_K - 1})·
    Σ ln(x_(i)/x_({HILL_K})). Sources with fewer than {HILL_K} positive-
    length docs drop out (no {HILL_K}-th order statistic) on both
    engines; a degenerate all-equal tail pins α to the 0 sentinel.

    Exactness: each term is one division of exact integers + one ln;
    the sum is the order-pinned fold over the rank-sorted ≤{HILL_K - 1}-
    element list (ties in length produce EQUAL terms, so the rank
    tiebreak cannot change the sum); outputs are floors of identical
    doubles.

    Plan: one window pass partitioned by source (bounded strata — the
    qy08 argument) ranks lengths; everything after runs on
    |sources|·{HILL_K} rows. At 100 TB the top-{HILL_K} per source
    would come from a per-partition heap (the q31 top-k idiom) rather
    than a full sort — the rank window here is already only over each
    source's rows."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 1)
    wr = W.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    r = docs.select("source", "n_chars", F.row_number().over(wr).alias("rk"))
    xk = r.filter(F.col("rk") == HILL_K).select(
        "source", F.col("n_chars").alias("x_k")
    )
    s = (
        r.filter(F.col("rk") < HILL_K)
        .join(xk, "source")
        .groupBy("source", "x_k")
        .agg(
            F.expr(
                "aggregate(sort_array(collect_list(struct(rk, n_chars))), "
                "cast(0.0 as double), (a, t) -> a + ln(t.n_chars / x_k))"
            ).alias("sum_ln")
        )
    )
    return s.select(
        "source",
        F.col("x_k").cast("bigint").alias("x_k"),
        F.floor(F.col("sum_ln") * 1_000_000_000)
        .cast("bigint")
        .alias("sum_ln_e9"),
        F.floor(F.col("sum_ln") / (HILL_K - 1) * 1_000_000)
        .cast("bigint")
        .alias("alpha_inv_e6"),
        F.when(
            F.col("sum_ln") > 0,
            F.floor((HILL_K - 1) / F.col("sum_ln") * 1_000_000),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("alpha_e6"),
    )


# ---------------------------------------------------------------------------
# qz10: synchronous label propagation (3 rounds) on the near-dup graph —
# community detection BEYOND connectivity: q98's connected components
# call a whole chain one cluster; LPA's majority vote splits chains at
# their thin edges. Deterministic variant: every node simultaneously
# adopts its neighbors' most frequent label, ties broken by smallest
# label — no RNG, same fixpoint trajectory on both engines.
# ---------------------------------------------------------------------------

LPA_ROUNDS = 3


def _lpa_oracle() -> str:
    from kafka2delta_spark.functions.dedup import _JACCARD_PAIRS_SQL

    rounds = []
    for t in range(1, LPA_ROUNDS + 1):
        rounds.append(f"""
    v{t} AS (
        SELECT u.src, l.lbl, COUNT(*) AS cnt
        FROM und u JOIN l{t - 1} l ON l.node = u.dst
        GROUP BY u.src, l.lbl),
    l{t} AS (
        SELECT src AS node, lbl FROM (
            SELECT src, lbl,
                   ROW_NUMBER() OVER (PARTITION BY src
                                      ORDER BY cnt DESC, lbl) AS rk
            FROM v{t}) WHERE rk = 1)""")
    return f"""
    WITH edges AS MATERIALIZED (
        SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS_SQL}) jp),
    und AS (
        SELECT doc_a AS src, doc_b AS dst FROM edges
        UNION ALL SELECT doc_b, doc_a FROM edges),
    l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM und),
    {",".join(rounds)},
    sizes AS (SELECT lbl, COUNT(*) AS sz FROM l{LPA_ROUNDS} GROUP BY lbl)
    SELECT l.node AS doc_id, CAST(l.lbl AS BIGINT) AS community,
           CAST(s.sz AS BIGINT) AS comm_size
    FROM l{LPA_ROUNDS} l JOIN sizes s ON s.lbl = l.lbl
    """


@register("qz10_label_propagation", oracle=_lpa_oracle())
def qz10_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{LPA_ROUNDS} synchronous label-propagation rounds on the q88
    near-dup graph: each node adopts the most frequent label among its
    neighbors, ties to the smallest label (labels start as node ids).
    Output: every node's community label and the community size —
    sub-component structure the CC view (q98) cannot express.

    Determinism: synchronous updates + the (count DESC, label ASC)
    argmax make the trajectory a pure function of the graph — no RNG,
    no visit order. The argmax is ``max_by`` over a (cnt, −lbl) struct
    (one hash-agg), matching the oracle's ROW_NUMBER pick exactly.

    Plan: per round, one join of the edge list against the |V|-row
    label table and two hash-aggs — edge-list-sized work, the qx22
    PageRank envelope; ``localCheckpoint`` truncates the plan per round
    (the CC discipline at dedup.py:600). Near-dup graphs are edge-sparse
    after the df-cap, so {LPA_ROUNDS} rounds ≈ {LPA_ROUNDS} edge scans
    at any corpus size."""
    from kafka2delta_spark.functions.dedup import _jaccard_edges

    e = _jaccard_edges(spark, sf_dir)
    und = e.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        e.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    labels = und.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    for _ in range(LPA_ROUNDS):
        votes = (
            und.join(
                labels.select(F.col("node").alias("dst"), "lbl"), "dst"
            )
            .groupBy("src", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.groupBy("src")
            .agg(
                F.max_by(
                    F.col("lbl"), F.struct(F.col("cnt"), -F.col("lbl"))
                ).alias("lbl")
            )
            .select(F.col("src").alias("node"), "lbl")
            .localCheckpoint(eager=False)
        )
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("sz"))
    return labels.join(sizes, "lbl").select(
        F.col("node").alias("doc_id"),
        F.col("lbl").cast("bigint").alias("community"),
        F.col("sz").cast("bigint").alias("comm_size"),
    )
