"""Retrieval + selection operators for training-data pipelines.

Operators a corpus-curation stack runs between dedup and export, none
present in the reference (its query surface is filter/LIKE/count —
ref stream/test/stream_test.py:206-209); all follow the repo's
oracle-portability discipline (md5-derived randomness, fixed-point or
fixed-order float arithmetic):

  * qx01 — BM25 lexical scoring (Okapi, Lucene's +1-inside-log idf): the
    standard retrieval baseline used for benchmark-contamination sweeps
    and quality-targeted subset selection. Scale shape: token explode is
    filtered to the (tiny, literal) query vocabulary BEFORE any shuffle,
    per-(doc, term) tf is one hash-agg, df and corpus stats are
    metadata-sized broadcasts — the corpus never shuffles by itself.
  * qx02 — deterministic weighted sampling (Efraimidis-Spirakis A-ES):
    priority u^(1/w) with u drawn from md5(doc_id) — a pure function of
    the data, reproducible across runs/cluster sizes, unlike
    ``rand()``-based sampling. Per-group top-k by priority = one
    partitioned window over k·|groups| rows.
  * qx03 — semantic dedup (SemDeDup-flavored, Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings with the real Lloyd k-means
    (clustering.py), keep each cluster's medoid, and prune other vectors
    whose squared distance to the centroid is under a radius — redundant
    near-center points add least diversity per token. All geometry in
    exact fixed-point BIGINT, so both engines agree bit-for-bit; cost is
    linear per cluster (no pairwise work).
  * qx05 — per-source KL divergence from the corpus token distribution:
    the drift telemetry a mixture-reweighting step (pipeline.py q66)
    consumes. One token explode, hash-aggs all the way down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka2delta_spark.queryset import register
from kafka2delta_spark.functions.measure import ascii_lower
from kafka2delta_spark.sources.tables import (
    load_embeddings,
    load_table,
    sf_fingerprint,
)

# BM25 parameters (Okapi defaults) and the query vocabulary — literals
# baked into both engines' plans, like the LSH hyperplanes.
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("join", "vector", "stream")
BM25_TOP_K = 10


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    # Per-term scores pivot into FIXED columns summed in a fixed order:
    # SQL SUM over a per-doc term group has no ordering guarantee, and
    # three floats added in different orders can differ in the last ulp —
    # enough to flip a 4dp round under the hash gate.
    per_term = " + ".join(
        f"COALESCE(s_{t}, 0.0)" for t in BM25_TERMS
    )
    pivots = ", ".join(
        f"SUM(CASE WHEN term = '{t}' THEN score END) AS s_{t}"
        for t in BM25_TERMS
    )
    return f"""
    WITH d AS (
        SELECT doc_id,
               len(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+'))::DOUBLE AS dl,
               regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+') AS toks
        FROM documents),
    stats AS (SELECT COUNT(*)::DOUBLE AS n, SUM(dl) / COUNT(*) AS avgdl FROM d),
    tr AS (SELECT doc_id, dl, unnest(toks) AS term FROM d),
    tf AS (SELECT doc_id, term, dl, COUNT(*)::DOUBLE AS tf
           FROM tr WHERE term IN ({terms}) GROUP BY doc_id, term, dl),
    df AS (SELECT term, COUNT(*)::DOUBLE AS df FROM tf GROUP BY term),
    ts AS (
        SELECT tf.doc_id, tf.term,
               ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1)
                 * tf.tf * ({BM25_K1} + 1)
                 / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * tf.dl / s.avgdl))
                 AS score
        FROM tf JOIN df USING (term) CROSS JOIN stats s),
    scored AS (
        SELECT doc_id, {pivots} FROM ts GROUP BY doc_id),
    total AS (SELECT doc_id, {per_term} AS score FROM scored)
    SELECT doc_id, ROUND(score, 4) AS bm25, rk FROM (
        SELECT doc_id, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rk
        FROM total)
    WHERE rk <= {BM25_TOP_K}
    """


#: (session, sf_dir, fingerprint) -> pinned per-doc query-term stats.
#: Both lexical scorers (qx01 BM25 and qz06's query-likelihood leg) and
#: everything composing them (qz06 fusion, qz16 agreement) need the same
#: three facts per document: its token count and its per-query-term
#: occurrence counts. In production this is ONE materialized stats table
#: refreshed per ingest; the session cache mirrors that shape
#: (content-fingerprint key = the round-7 drift rule). Cluster-mode note:
#: localCheckpoint trades lineage for plan truncation — an executor loss
#: recomputes from the checkpoint's surviving blocks only.
_TERM_STATS_CACHE: dict = {}


def bm25_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc query-term stats in ONE tokenize pass and NO explode:
    ``(doc_id, dl, tf_<term>…)`` with ``tf_t = size(filter(toks, = t))``
    — exactly the exploded ``(doc, term)`` group count, computed inside
    the row (guide §2.3: the corpus-sized explode+shuffle existed only
    to count a 3-term literal vocabulary). NULL text yields NULL dl/tf,
    matching what the explode pipelines produced by dropping the rows."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(ascii_lower("text"), r"\s+").alias("toks")
    )

    def tf(t: str):
        # closure factory, NOT a default-arg lambda: pyspark's
        # higher-order builder reads the lambda's arity, so a second
        # (defaulted) parameter flips it into the (element, index) form
        return F.size(F.filter("toks", lambda x: x == F.lit(t)))

    return docs.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        *[tf(t).cast("bigint").alias(f"tf_{t}") for t in BM25_TERMS],
    )


def bm25_doc_stats_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached :func:`bm25_doc_stats` (values identical; the cache
    only changes WHERE the tokenize pass's cost is paid)."""
    key = (id(spark), sf_dir, sf_fingerprint(sf_dir))
    if key not in _TERM_STATS_CACHE:
        _TERM_STATS_CACHE[key] = bm25_doc_stats(spark, sf_dir).localCheckpoint(
            eager=False
        )
    return _TERM_STATS_CACHE[key]


@register("qx01_bm25_retrieval", oracle=_bm25_oracle())
def qx01_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-{k} documents for a fixed query-term set.

    Plan: the token explode filters to the literal vocabulary before the
    (doc, term) hash-agg, so the shuffle carries only query-term hits.
    df (one row per term) and the (N, avgdl) scalar broadcast back;
    final scoring is per-row arithmetic plus a top-k over |hit docs|
    rows. The (N, avgdl) corpus stats cost a second lightweight scan of
    the two projected columns — in production those are precomputed
    table statistics, refreshed per ingest, not recomputed per query.
    Per-term scores pivot into fixed columns summed in declaration order
    — float addition is re-ordered freely by SQL engines otherwise, and
    the oracle gate hashes exact 4dp rounds."""
    # One tokenize pass, no explode (bm25_doc_stats): the per-term tf is
    # computed inside each row, so the only aggregate left is the 1-row
    # corpus stats (n, avgdl, per-term df) and the only shuffled rows are
    # the hit docs' scores feeding the top-k. The former shape paid a
    # second full tokenize for (n, avgdl) and a corpus-sized explode
    # before the postings filter.
    X = bm25_doc_stats_cached(spark, sf_dir)
    stats = X.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (F.sum(F.col("dl").cast("double")) / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{t}") > 0, 1).otherwise(0))
            .cast("double")
            .alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    # per-term score in the exact expression shape (and therefore float
    # op order) of the former per-posting-row formula; missing terms stay
    # NULL so the declaration-order coalesce-sum is unchanged
    def s_term(t: str):
        tf_d = F.col(f"tf_{t}").cast("double")
        df_d = F.col(f"df_{t}")
        idf = F.log((F.col("n") - df_d + 0.5) / (df_d + 0.5) + 1)
        denom = tf_d + BM25_K1 * (
            1 - BM25_B + BM25_B * F.col("dl").cast("double") / F.col("avgdl")
        )
        return F.when(
            F.col(f"tf_{t}") > 0, idf * tf_d * (BM25_K1 + 1) / denom
        )

    hit = None
    total = None
    for t in BM25_TERMS:
        h = F.col(f"tf_{t}") > 0
        hit = h if hit is None else (hit | h)
        piece = F.coalesce(s_term(t), F.lit(0.0))
        total = piece if total is None else total + piece
    scored = (
        X.filter(hit)
        .crossJoin(F.broadcast(stats))
        .select("doc_id", total.alias("score"))
    )
    # distributed top-k (TakeOrderedAndProject: per-partition heads +
    # driver merge of K rows), NEVER a global row_number window — that
    # would sort the whole corpus in one task. The K survivors rank via
    # a broadcast triangular self-join (rk = 1 + strictly-better count)
    # so no WindowExec, partitioned or otherwise, touches this path.
    # K rows, two consumers (the triangular rank join) — pin so the
    # scoring pipeline upstream is planned once, not twice
    topk = (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_TOP_K)
        .localCheckpoint(eager=False)
    )
    other = topk.select(F.col("score").alias("s2"), F.col("doc_id").alias("d2"))
    best = (F.col("s2") > F.col("score")) | (
        (F.col("s2") == F.col("score")) & (F.col("d2") < F.col("doc_id"))
    )
    return (
        topk.join(F.broadcast(other), best, "left")
        .groupBy("doc_id", "score")
        .agg((F.count("d2") + 1).cast("int").alias("rk"))
        .select("doc_id", F.round("score", 4).alias("bm25"), "rk")
    )


# Weighted sampling: k docs per language, weight = n_chars (longer docs
# carry more training tokens). Priority u^(1/w) (Efraimidis-Spirakis);
# u comes from the first 8 md5 hex chars of the doc id — identical on
# both engines, so the "random" sample is a pure function of the data.
SAMPLE_K = 5
_U32 = 4294967296.0  # 2^32


def _ws_oracle() -> str:
    return f"""
    WITH u AS (
        SELECT lang, doc_id, n_chars,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                    AS BIGINT) / {_U32} AS u
        FROM documents WHERE n_chars > 0),
    keyed AS (
        SELECT lang, doc_id,
               pow(u, 1.0 / n_chars) AS ky
        FROM u)
    SELECT lang, doc_id, rk FROM (
        SELECT lang, doc_id,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY ky DESC, doc_id) AS rk
        FROM keyed)
    WHERE rk <= {SAMPLE_K}
    """


@register("qx02_weighted_sample", oracle=_ws_oracle())
def qx02_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample: top-{k} docs per language under
    Efraimidis-Spirakis priorities u^(1/w), w = n_chars.

    Why not ``rand()``/``sample()``: those depend on partition layout and
    seeds per task — not reproducible across runs or cluster sizes, which
    breaks dataset versioning. md5-derived u makes the sample a pure
    function of the data (same discipline as the shard writer's hash
    assignment). One partitioned window; at scale this is the standard
    distributed weighted reservoir — each partition keeps its local top-k
    and the combine keeps the global top-k per group. Output is integer
    ranks + ids only, so last-ulp pow() differences can't reach the hash
    gate (priorities from 32 md5-random bits make near-ties vanishingly
    rare)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        / F.lit(_U32)
    )
    keyed = docs.select(
        "lang", "doc_id", F.pow(u, 1.0 / F.col("n_chars")).alias("ky")
    )
    w = W.partitionBy("lang").orderBy(F.desc("ky"), F.asc("doc_id"))
    return (
        keyed.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= SAMPLE_K)
    )


# Semantic-dedup radius in fixed-point squared-distance units (SCALE=1e6
# per coordinate, 64 dims): the q76 sq_dist distribution at test scale
# spans ~7.4e11..1.04e12 with median ~9.7e11; the radius sits just under
# the median so roughly the nearer half of each cluster is prunable.
SEMDEDUP_RADIUS = 950_000_000_000


def _semdedup_oracle() -> str:
    from kafka2delta_spark.functions.clustering import lloyd_oracle_ctes

    return f"""
    WITH {lloyd_oracle_ctes()},
    a2 AS (
        SELECT vec_id, cid, dist FROM s2
        QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
                                   ORDER BY dist, cid) = 1
    ),
    med AS (
        SELECT vec_id AS medoid_id, cid FROM a2
        QUALIFY ROW_NUMBER() OVER (PARTITION BY cid
                                   ORDER BY dist, vec_id) = 1
    )
    SELECT a2.vec_id,
           CAST(a2.cid AS BIGINT) AS cluster,
           CAST(a2.dist AS BIGINT) AS sq_dist,
           CAST(CASE WHEN a2.vec_id = med.medoid_id
                       OR a2.dist > {SEMDEDUP_RADIUS}
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM a2 JOIN med ON med.cid = a2.cid
    """


@register("qx03_semantic_dedup", oracle=_semdedup_oracle())
def qx03_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-flavored semantic pruning (arXiv:2303.09540): cluster the
    embedding corpus with the real Lloyd k-means, keep each cluster's
    medoid (closest to centroid, ties to smallest id), and drop other
    vectors inside the centroid radius — near-center points are the most
    redundant; far points carry diversity.

    Scale shape: everything reuses the k-means plan (corpus never
    shuffles during refinement), the final assignment is one broadcast
    argmin pass, the medoid is a per-cluster window over K groups, and
    the keep flag is a per-row comparison — linear in the corpus, no
    pairwise similarity anywhere. Geometry is exact BIGINT fixed-point,
    so cluster boundaries, medoids, and the radius test are bit-equal
    across engines."""
    from kafka2delta_spark.functions.clustering import (
        _assign,
        _fixed_vec,
        lloyd_centroids,
    )

    emb = load_embeddings(spark, sf_dir).select(
        "vec_id", _fixed_vec().alias("vi")
    )
    assigned = _assign(emb, lloyd_centroids(emb)).select(
        "vec_id", "cid", F.col("__dist").alias("sq_dist")
    )
    mw = W.partitionBy("cid").orderBy("sq_dist", "vec_id")
    # NOT pinned: measured 1.1 s -> 1.7 s with a checkpoint here — the
    # medoid branch's duplicate assign pass overlaps the final pass,
    # while the checkpoint serializes it into a blocking prefix job
    med = (
        assigned.select(
            "cid", "vec_id", F.row_number().over(mw).alias("__mrk")
        )
        .filter(F.col("__mrk") == 1)
        .select("cid", F.col("vec_id").alias("medoid_id"))
    )
    keep = (
        (F.col("vec_id") == F.col("medoid_id"))
        | (F.col("sq_dist") > SEMDEDUP_RADIUS)
    ).cast("int")
    return assigned.join(F.broadcast(med), "cid").select(
        "vec_id",
        F.col("cid").cast("bigint").alias("cluster"),
        "sq_dist",
        keep.alias("keep"),
    )


def _kl_oracle() -> str:
    return r"""
    WITH tr AS (
        SELECT source, unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\s+')) AS tok
        FROM documents),
    st AS (SELECT source, tok, COUNT(*)::DOUBLE AS c FROM tr GROUP BY source, tok),
    ns AS (SELECT source, SUM(c) AS n FROM st GROUP BY source),
    ct AS (SELECT tok, SUM(c) AS ctot FROM st GROUP BY tok),
    tot AS (SELECT SUM(c) AS ntot FROM st)
    SELECT st.source, CAST(ns.n AS BIGINT) AS n_tokens,
           ROUND(SUM((st.c / ns.n) * ln((st.c / ns.n) / (ct.ctot / tot.ntot))), 4)
               AS kl
    FROM st
    JOIN ns USING (source)
    JOIN ct USING (tok)
    CROSS JOIN tot
    GROUP BY st.source, ns.n
    """


@register("qx05_domain_kl_divergence", oracle=_kl_oracle())
def qx05_domain_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's token distribution from the whole
    corpus — the telemetry a mixture-reweighting step (q66) reads: a
    source whose KL drifts up is diverging from the target distribution.
    KL(p_s || p_corpus) = sum_t p_s(t) ln(p_s(t)/p(t)); every source term
    is present in the corpus by construction, so the log is always
    finite, and KL >= 0 with equality iff the source matches the corpus.

    Plan: one token explode -> (source, tok) hash-agg; per-source and
    per-token totals re-aggregate from those counts (tiny vs the token
    stream); the only join is (source, tok) x tok — a hash shuffle on
    the token key, the same key the counts already grouped on. Final
    per-source reduction is |sources| rows. Summation over the vocabulary
    is float — rounded to 4dp like the repo's other statistical sums
    (q92), orders of magnitude above cross-engine accumulation jitter."""
    tr = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split(ascii_lower("text"), r"\s+")).alias("tok")
    )
    # pinned: the (source, tok) counts feed three re-aggregations AND
    # the final join — unpinned, the token explode re-ran per consumer
    # (docs scanned 4x in one plan)
    st = (
        tr.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .localCheckpoint(eager=False)
    )
    ns = st.groupBy("source").agg(F.sum("c").alias("n"))
    ct = st.groupBy("tok").agg(F.sum("c").alias("ctot"))
    tot = st.agg(F.sum("c").alias("ntot"))
    p_s = F.col("c") / F.col("n")
    p = F.col("ctot") / F.col("ntot")
    return (
        st.join(F.broadcast(ns), "source")
        .join(ct, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "n")
        .agg(F.round(F.sum(p_s * F.log(p_s / p)), 4).alias("kl"))
        .select("source", F.col("n").cast("bigint").alias("n_tokens"), "kl")
    )


@register(
    "qx40_inverted_index",
    oracle="""
    WITH tr AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+')) AS term
        FROM documents),
    occ AS (
        SELECT doc_id, unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+')) AS term
        FROM documents),
    tf AS (SELECT term, COUNT(*) AS total_tf FROM occ GROUP BY term),
    post AS (
        SELECT term, list(doc_id ORDER BY doc_id) AS postings,
               COUNT(*) AS df
        FROM tr GROUP BY term)
    SELECT p.term, CAST(p.df AS BIGINT) AS df,
           CAST(t.total_tf AS BIGINT)   AS total_tf,
           array_to_string(p.postings, '|') AS postings
    FROM post p JOIN tf t ON t.term = p.term
    """,
)
def qx40_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: one row per term with its document
    frequency, total term frequency, and the full posting list (sorted
    doc_ids) — the index-build step behind qx01's BM25 scoring,
    materialized instead of consumed inline. The posting lists are
    gate-hashed element-for-element; they are emitted as numerically
    sorted ``'|'``-joined strings (not arrays) so the driver's pandas
    row canonicalizer — which cannot sort list-valued columns — hashes
    them; value content is identical.

    Plan: one explode + two hash-aggs sharing the term key — postings
    from collect_set (dedup inside the aggregate, sorted once at the
    end), occurrence totals from a plain count whose one-row-per-term
    result broadcasts onto the postings side (verified plan:
    BroadcastHashJoin, build = the totals agg). Per-term
    state IS the posting list — that is the artifact an index build
    materializes, not an accident of the plan; at 100 TB the output is
    range-sharded by term and a df cap (stop-word postings are the known
    skew: corpus-length lists) routes ultra-common terms to the q88
    SHINGLE_DF_CAP treatment — drop or impact-order truncate, the
    documented retrieval-index tradeoff."""
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", F.explode(F.split(ascii_lower("text"), r"\s+")).alias("term")
    )
    # ONE hash-agg: the occurrence total is a plain count in the SAME
    # per-term aggregate as the posting list — the former two aggs +
    # broadcast join re-ran the explode once per agg (documents scanned
    # 2x in one plan)
    post = occ.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_set("doc_id")),
                lambda x: x.cast("string"),
            ),
            "|",
        ).alias("postings"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
        F.count(F.lit(1)).cast("bigint").alias("total_tf"),
    )
    return post.select("term", "df", "total_tf", "postings")


CHAR_TERMS_TOP_K = 5


@register(
    "qx49_source_characteristic_terms",
    oracle=f"""
    WITH tr AS (
        SELECT source, unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+')) AS term
        FROM documents),
    tf AS (SELECT source, term, COUNT(*) AS tf FROM tr GROUP BY source, term),
    df AS (SELECT term, COUNT(DISTINCT source) AS df FROM tr GROUP BY term),
    ns AS (SELECT COUNT(DISTINCT source) AS n_src FROM documents),
    scored AS (
        SELECT tf.source, tf.term, tf.tf, df.df,
               tf.tf * ln((ns.n_src + 1.0) / (df.df + 0.5)) AS score
        FROM tf JOIN df USING (term) CROSS JOIN ns),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                     ORDER BY ROUND(score, 4) DESC, term) AS rk
        FROM scored)
    SELECT source, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           ROUND(score, 4) AS tfidf, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {CHAR_TERMS_TOP_K}
    """,
)
def qx49_source_characteristic_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic vocabulary per source: top-{k} terms by smoothed
    TF-IDF (BM25's idf floor keeps the score positive when a term spans
    every source, so the ranking degrades gracefully to
    term-frequency on a flat corpus instead of collapsing to zero) —
    the per-domain keyword profile used for source triage and mixture
    debugging in corpus curation.

    Plan: one explode feeds both the (source, term) tf hash-agg and the
    per-term source-df hash-agg; df shuffle-joins back onto tf on the
    shared term key (vocabulary-sized — never force-broadcast) while the
    one-row source count broadcasts; the per-source top-k is a window over the SOURCE
    partition (group-bounded rank — never a global sort; the q31
    per-group pattern, safe at any source count). The rank key is the
    4dp-ROUNDED score (then term): JVM ``Math.log`` and libm ``log``
    are not bit-identical, so ranking raw doubles risks a cross-engine
    order flip when two (tf, df) pairs score within an ulp; rounding
    first makes the sort key engine-identical, with the term tiebreak
    resolving within-bucket order."""
    docs = load_table(spark, sf_dir, "documents")
    tr = docs.select(
        "source", F.explode(F.split(ascii_lower("text"), r"\s+")).alias("term")
    )
    # pinned: the source-df table is the per-term count of tf's rows
    # (tf holds each (source, term) pair exactly once; count("source")
    # skips NULL sources exactly like countDistinct did), so the token
    # explode runs once instead of twice
    tf = (
        tr.groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    df = tf.groupBy("term").agg(F.count(F.col("source")).alias("df"))
    ns = docs.agg(F.countDistinct("source").alias("n_src"))
    scored = (
        # df spans the FULL vocabulary (grows with the corpus) — no
        # forced broadcast; tf and df share the term key so the join
        # co-partitions, and AQE broadcasts df only when actually small
        tf.join(df, "term")
        .crossJoin(F.broadcast(ns))
        .select(
            "source", "term", "tf", "df",
            (
                F.col("tf")
                * F.log((F.col("n_src") + 1.0) / (F.col("df") + 0.5))
            ).alias("score"),
        )
    )
    w = W.partitionBy("source").orderBy(
        F.desc(F.round("score", 4)), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= CHAR_TERMS_TOP_K)
        .select(
            "source", "term",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.round("score", 4).alias("tfidf"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )
