"""Text analysis for training-data pipelines.

All operators are pure native-expression pipelines (JVM codegen, zero
Python UDFs): tokenization by regex, quality scoring from length/stopword/
punctuation statistics, n-gram language identification, BPE-ish token
counting, and content fingerprinting. Each has a DuckDB oracle implementing
the identical arithmetic, so the scoring logic itself is cross-checked, not
just the plumbing.

Scale: every query here is embarrassingly parallel (per-row expressions +
one hash-agg); no shuffles except the final aggregation. At 100 TB the
scans stay pruned to (doc_id, text) and the per-language marker arrays are
literal constants folded into codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka2delta_spark.queryset import register
from kafka2delta_spark.functions.measure import ascii_lower
from kafka2delta_spark.sources.tables import load_table
from kafka2delta_spark.session import local_rows

TOKEN_SPLIT_RE = r"\s+"
BPE_ISH_RE = r"\w+|[^\w\s]"

# language marker words (n-gram heuristic): tiny per-language stopword sets.
# Deterministic and cross-engine-safe — the list is baked into both the
# Spark plan and the oracle SQL.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "la", "y", "los"],
    "zh": ["的", "是", "了", "在"],
}
STOPWORDS = ["the", "a", "and", "of", "to", "in"]


def tokens_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, TOKEN_SPLIT_RE)


@register(
    "q80_text_quality_stats",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, text,
               regexp_split_to_array(text, '\\s+') AS toks
        FROM documents)
    SELECT doc_id, lang,
           LENGTH(text)                                       AS n_chars,
           len(toks)                                          AS n_tokens,
           len(list_distinct(toks))                           AS n_unique,
           ROUND(LENGTH(text) * 1.0 / len(toks), 4)           AS chars_per_token,
           len(list_filter(toks, t -> t IN ({",".join(repr(s) for s in STOPWORDS)})))
                                                              AS n_stopwords,
           ROUND(len(list_filter(toks, t -> t IN ({",".join(repr(s) for s in STOPWORDS)})))
                 * 1.0 / len(toks), 4)                        AS stopword_ratio,
           LENGTH(text) - LENGTH(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                                                              AS n_punct
    FROM t
    """,
)
def q80_text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: length, token counts, type-token
    stats, stopword ratio, punctuation count."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens_col()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.round(F.length("text") / F.size(toks), 4).alias("chars_per_token"),
        n_stop.alias("n_stopwords"),
        F.round(n_stop / F.size(toks), 4).alias("stopword_ratio"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
        ).alias("n_punct"),
    )


def _lang_score_spark(toks: Column, lang: str) -> Column:
    arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def _lang_score_sql(lang: str) -> str:
    markers = ",".join(repr(m) for m in LANG_MARKERS[lang])
    return f"len(list_filter(toks, t -> t IN ({markers})))"


_LANGS = list(LANG_MARKERS)
_PRED_SQL = "CASE "
for _l in _LANGS:
    _others = [f"s_{o}" for o in _LANGS if o != _l]
    _PRED_SQL += f"WHEN s_{_l} >= GREATEST({', '.join(_others)}) THEN '{_l}' "
_PRED_SQL += "END"


@register(
    "q81_language_id",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang,
               regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+') AS toks
        FROM documents),
    scored AS (
        SELECT doc_id, lang,
               {", ".join(f"{_lang_score_sql(lang)} AS s_{lang}" for lang in _LANGS)}
        FROM t)
    SELECT lang, {_PRED_SQL} AS predicted, COUNT(*) AS n
    FROM scored
    GROUP BY lang, predicted
    """,
)
def q81_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: score each language by marker hits, pick
    the argmax with a fixed preference order on ties (identical CASE chain
    on both engines). Output is the (label, prediction) confusion table."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(ascii_lower(F.col("text")), TOKEN_SPLIT_RE)
    scored = docs.select(
        "doc_id",
        "lang",
        *[_lang_score_spark(toks, lang).alias(f"s_{lang}") for lang in _LANGS],
    )
    pred = None
    for lang in _LANGS:
        others = [F.col(f"s_{o}") for o in _LANGS if o != lang]
        cond = F.col(f"s_{lang}") >= F.greatest(*others)
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    return (
        scored.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "q82_token_counting",
    oracle=r"""
    SELECT lang,
           CAST(SUM(len(regexp_extract_all(text, '\w+|[^\w\s]'))) AS BIGINT)
               AS total_bpe_tokens,
           CAST(SUM(len(regexp_split_to_array(text, '\s+'))) AS BIGINT)
               AS total_ws_tokens,
           ROUND(AVG(len(regexp_extract_all(text, '\w+|[^\w\s]'))), 4)
               AS avg_bpe_tokens
    FROM documents
    GROUP BY lang
    """,
)
def q82_token_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    (word runs + single punctuation marks) — the standard pre-tokenizer
    shape. Aggregated per language."""
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_ISH_RE), 0))
    ws = F.size(tokens_col())
    return docs.groupBy("lang").agg(
        F.sum(bpe).cast("bigint").alias("total_bpe_tokens"),
        F.sum(ws).cast("bigint").alias("total_ws_tokens"),
        F.round(F.avg(bpe), 4).alias("avg_bpe_tokens"),
    )


@register(
    "q83_doc_fingerprints",
    oracle=r"""
    WITH fp AS (
        SELECT doc_id, source,
               substring(md5(translate(regexp_replace(text, '[^\w]', '', 'g'), 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz')), 1, 16)
                   AS fingerprint
        FROM documents)
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT fingerprint) AS n_distinct,
           MIN(fingerprint) AS min_fp
    FROM fp
    GROUP BY source
    """,
)
def q83_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: normalize (lowercase, strip non-word chars)
    then hash — the exact-dedup key. Aggregated per source with distinct
    counts (duplicate fingerprints ⇒ exact dups after normalization)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.substring(
        F.md5(ascii_lower(F.regexp_replace("text", r"[^\w]", ""))), 1, 16
    ).alias("fingerprint")
    return (
        docs.select("source", fp)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("fingerprint").alias("n_distinct"),
            F.min("fingerprint").alias("min_fp"),
        )
    )


@register(
    "q68_intra_doc_repetition",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, lang, regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\s+') AS toks
        FROM documents),
    sh AS (
        SELECT doc_id, lang,
               len(toks) - 2 AS total,
               -- indexed concat, not a list slice (slices copy the
               -- outer list per element, O(len²) on multi-MB docs)
               len(list_distinct([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
                                  for i in range(1, len(toks) - 1)])) AS uniq
        FROM t WHERE len(toks) >= 3)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT)                      AS n_docs,
           ROUND(AVG(1.0 - uniq * 1.0 / total), 4)       AS avg_repetition,
           ROUND(MAX(1.0 - uniq * 1.0 / total), 4)       AS max_repetition,
           CAST(SUM(CASE WHEN 1.0 - uniq * 1.0 / total > 0.05
                         THEN 1 ELSE 0 END) AS BIGINT)   AS n_repetitive
    FROM sh GROUP BY lang
    """,
)
def q68_intra_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition score (the Gopher-style duplicate-n-gram
    quality rule): fraction of a doc's 3-gram shingles that are repeats,
    ``1 - distinct/total``; docs above 5% flagged repetitive. Per-language
    aggregate for threshold tuning.

    Plan: distinct-shingle counts come from ``shingle_rows`` (posexplode +
    window ``lead`` — whole-stage codegen, measured 3× faster than the
    interpreted array-HOF form at bench scale), totals are pure per-row
    arithmetic; one doc_id equi-join + one hash-agg on lang."""
    from kafka2delta_spark.functions.dedup import shingle_rows_cached

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(ascii_lower(F.col("text")), TOKEN_SPLIT_RE)
    totals = docs.select(
        "doc_id", "lang", (F.size(toks) - 2).alias("total")
    ).filter(F.size(toks) >= 3)
    uniq = (
        shingle_rows_cached(spark, sf_dir, 3)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("uniq"))
    )
    per_doc = totals.join(uniq, "doc_id")
    rep = F.lit(1.0) - F.col("uniq") / F.col("total")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(rep), 4).alias("avg_repetition"),
        F.round(F.max(rep), 4).alias("max_repetition"),
        F.sum(F.when(rep > 0.05, 1).otherwise(0)).alias("n_repetitive"),
    )


# qx14's truncation contract: quality scoring reads each document's
# FIRST (BIGRAM_SCORE_PREFIX - 1) bigrams only — the CCNet-style
# perplexity filter scores a bounded prefix, so one 100k-token document
# costs the same as a hundred 1k-token ones. Enforced identically in the
# Spark plan (least() on the sequence bound) and the oracle (the range
# cross join); counts in the output reflect the truncation on both.
BIGRAM_SCORE_PREFIX = 10_000


@register(
    "qx14_bigram_logprob_quality",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\s+') AS toks
        FROM documents),
    bg AS (
        -- scoring reads the first {BIGRAM_SCORE_PREFIX} tokens per doc
        -- (loud truncation contract, mirrored in the Spark plan)
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM t, (SELECT unnest(range(1, {BIGRAM_SCORE_PREFIX})) AS i) idx
        WHERE i <= len(toks) - 1),
    cb AS (SELECT w1, w2, COUNT(*)::DOUBLE AS c12 FROM bg GROUP BY w1, w2),
    cu AS (SELECT w1, COUNT(*)::DOUBLE AS c1 FROM bg GROUP BY w1),
    scored AS (
        SELECT bg.doc_id, ln(cb.c12 / cu.c1) AS lp
        FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(lp), 4) AS avg_logp
    FROM scored GROUP BY doc_id
    """,
)
def qx14_bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM quality score: each document's mean log-probability
    under the corpus's own bigram model — the perplexity-filter shape
    (CCNet-style) real curation pipelines run, with the n-gram LM
    standing in for KenLM (not installed, and the Spark-side shape is
    identical: per-doc n-grams joined to broadcastable model tables).
    Low avg_logp = improbable token transitions = likely noise/garbled
    text; high = fluent but possibly boilerplate. No smoothing needed:
    the model is trained on the scored corpus itself, so every bigram
    has support.

    Plan: one bigram explode feeds BOTH model tables (bigram and
    unigram-context counts hash-agg from the same exchange) and the
    per-doc scoring join; joins are keyed on the bigram/context — the
    same keys the counts grouped on — and the final reduction is one
    per-doc hash-agg. Float: per-bigram ln() is exact-input-identical on
    both engines; the per-doc mean is rounded 4dp, orders of magnitude
    above accumulation-order jitter (precedent: q92/qx05)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(ascii_lower("text"), r"\s+").alias("toks")
    ).filter(F.size("toks") >= 2)
    # first (BIGRAM_SCORE_PREFIX - 1) bigrams per doc (truncation
    # contract above); the size >= 2 filter also keeps sequence() off
    # its start > stop DESCENDING default for a single-token doc, where
    # element_at(toks, 0) would throw
    idx = F.sequence(
        F.lit(1), F.least(F.size("toks") - 1, F.lit(BIGRAM_SCORE_PREFIX - 1))
    )
    bg = docs.select(
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
    # pinned bigram model; the context (unigram) table is its w1-sum —
    # identical to counting the bigram stream again (each bigram row has
    # exactly one w1), so the explode runs for the model once, not twice
    cb = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("c12"))
        .localCheckpoint(eager=False)
    )
    cu = cb.groupBy("w1").agg(F.sum("c12").alias("c1"))
    scored = (
        bg.join(cb, ["w1", "w2"])
        .join(cu, "w1")
        .select("doc_id", F.log(F.col("c12") / F.col("c1")).alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(F.avg("lp"), 4).alias("avg_logp"),
    )


# ---------------------------------------------------------------------------
# qx21: BPE merge-step pair counting — the inner loop of byte-pair-encoding
# vocabulary induction (Sennrich et al., "Neural Machine Translation of
# Rare Words with Subword Units", ACL 2016): count adjacent symbol pairs
# across the corpus; the argmax pair is the next merge rule.
# ---------------------------------------------------------------------------

BPE_TOP_PAIRS = 20
# Block width for per-document pair extraction (chars; one char of
# overlap is added per block so boundary pairs survive). Bounds both the
# per-row substring walk (O(len²/block)) and the per-task array size.
BPE_BLOCK = 131072


@register(
    "qx21_bpe_pair_counts",
    oracle=f"""
    WITH w AS (SELECT unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+')) AS wd
               FROM documents),
    cs_t AS (SELECT regexp_extract_all(wd, '.') AS cs
             FROM w WHERE length(wd) >= 2),
    p AS (SELECT unnest([[cs[i], cs[i + 1]] for i in range(1, len(cs))]) AS pr
          FROM cs_t)
    SELECT pr[1] AS pair_left, pr[2] AS pair_right,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM p
    GROUP BY pr[1], pr[2]
    ORDER BY n_occurrences DESC, pair_left, pair_right
    LIMIT {BPE_TOP_PAIRS}
    """,
)
def qx21_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent character-pair counts over whitespace words — the
    first iteration of BPE vocabulary learning (each subsequent iteration
    merges the winning pair and recounts; one iteration is registered
    because the recount loop is this same query re-run on rewritten
    symbol sequences).

    Plan (reworked by the round-10 pathological campaign): a pair is two
    adjacent non-whitespace code points, so instead of exploding words
    the text is cut ONCE into ~{BPE_BLOCK}-char blocks (one overlap char
    so boundary pairs survive; substring per block keeps the code-point
    walk O(len²/block), the q78 discipline), blocks are repartitioned —
    the giant-single-document skew fix: without it one 16 MB body is one
    straggler task; the shuffle moves only corpus bytes once — and each
    block yields its overlapping pairs in a single codegen'd
    ``regexp_extract_all`` pass. The pattern ``(?s)(?=(\\S\\S))\\S``
    CONSUMES one code point per match, which keeps scanning
    code-point-aligned (a bare lookahead also fires at UTF-16
    low-surrogate offsets, minting bogus pairs on emoji — measured) and
    still yields every overlapping pair. One hash-agg on the 2-char pair
    with map-side partials — alphabet² keys, so the agg shuffle is tiny
    regardless of corpus size; left/right split off the winning 20 pairs
    only. Two prior shapes died on the pathological fixture: per-pair
    ``substr(wd, i, 1)`` is O(len²) per word (never finishes on a 2 MB
    single token — and the oracle's old substr comprehension had the
    same bound), and higher-order-function lambdas (``transform``)
    evaluate interpreted, ~µs per element."""
    docs = load_table(spark, sf_dir, "documents")
    blocks = docs.select(ascii_lower(F.col("text")).alias("lt")).select(
        F.explode(
            F.expr(
                f"transform(sequence(0L, bigint(length(lt)) - 1L, {BPE_BLOCK}L),"
                f" b -> substring(lt, int(b) + 1, {BPE_BLOCK + 1}))"
            )
        ).alias("blk")
    )
    pairs = blocks.repartition(spark.sparkContext.defaultParallelism).select(
        F.explode(
            F.expr(r"regexp_extract_all(blk, '(?s)(?=(\\S\\S))\\S', 1)")
        ).alias("p")
    )
    top = (
        pairs.groupBy("p")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("p"))
        .limit(BPE_TOP_PAIRS)
    )
    return top.select(
        F.substring("p", 1, 1).alias("pair_left"),
        F.substring("p", 2, 1).alias("pair_right"),
        "n_occurrences",
    ).orderBy(F.desc("n_occurrences"), F.asc("pair_left"), F.asc("pair_right"))


VOCAB_KS = [10, 100, 1000]


@register(
    "qx35_vocab_coverage",
    oracle=f"""
    WITH w AS (SELECT unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+')) AS wd
               FROM documents),
    freq AS (SELECT wd, COUNT(*) AS n FROM w GROUP BY wd),
    ranked AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, wd) AS rk FROM freq),
    tot AS (SELECT SUM(n) AS total, COUNT(*) AS vocab FROM freq)
    SELECT k,
           CAST((SELECT vocab FROM tot) AS BIGINT)  AS n_vocab,
           CAST((SELECT SUM(n) FROM ranked WHERE rk <= k) AS BIGINT)
                                                    AS covered_occurrences,
           CAST((SELECT total FROM tot) AS BIGINT)  AS total_occurrences,
           ROUND((SELECT SUM(n) FROM ranked WHERE rk <= k) * 1.0
                 / (SELECT total FROM tot), 4)      AS coverage
    FROM (SELECT unnest([{",".join(str(k) for k in VOCAB_KS)}]) AS k)
    """,
)
def qx35_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the fraction of all token occurrences
    covered by the k most frequent words, k in {10, 100, 1000} — the
    Zipf head-mass measurement that sizes a tokenizer vocabulary (when
    coverage plateaus, extra vocab buys nothing).

    Plan: one hash-agg builds the (word, count) table; ONE
    orderBy+limit(max k) takes the head (TakeOrderedAndProject —
    per-partition heads, K-row merge, no global sort or rank window);
    the head is checkpointed (max-k rows) and ranked by a broadcast
    triangular self-join, so all three coverages reduce in a single
    conditional aggregation over it. Totals are one two-column agg over
    the same frequency table. Deterministic ties: (count desc, word
    asc)."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(ascii_lower("text"), TOKEN_SPLIT_RE)).alias("wd")
    )
    freq = words.groupBy("wd").agg(F.count(F.lit(1)).alias("n"))
    tot = freq.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("vocab"),
    )
    head = (
        freq.orderBy(F.desc("n"), F.asc("wd"))
        .limit(max(VOCAB_KS))
        .localCheckpoint(eager=True)
    )
    other = head.select(F.col("n").alias("n2"), F.col("wd").alias("w2"))
    better = (F.col("n2") > F.col("n")) | (
        (F.col("n2") == F.col("n")) & (F.col("w2") < F.col("wd"))
    )
    ranked = (
        head.join(F.broadcast(other), better, "left")
        .groupBy("wd", "n")
        .agg((F.count("w2") + 1).alias("rk"))
    )
    ks_df = local_rows(spark, [(k,) for k in VOCAB_KS], "k int")
    covered = (
        ranked.crossJoin(F.broadcast(ks_df))
        .filter(F.col("rk") <= F.col("k"))
        .groupBy("k")
        .agg(F.sum("n").cast("bigint").alias("covered"))
    )
    return (
        covered.crossJoin(F.broadcast(tot))
        .select(
            "k",
            F.col("vocab").alias("n_vocab"),
            F.col("covered").alias("covered_occurrences"),
            F.col("total").alias("total_occurrences"),
            F.round(F.col("covered") / F.col("total"), 4).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# qx43: BPE vocabulary learning — the full iterative merge loop (qx21 is
# one iteration of this). Each round: count adjacent symbol pairs weighted
# by word frequency, take the argmax pair, rewrite every word's symbol
# sequence with that merge applied greedily left-to-right.
#
# The rewrite trick (both engines, no lookbehind needed — DuckDB's RE2 has
# none): double every inter-symbol space and pad, so each candidate match
# owns its delimiters; a plain (non-regex) replace of ' a  b ' with
# ' ab ' is then exactly the greedy non-overlapping merge, and a final
# space-collapse + trim restores canonical form. Verified on the
# overlap case ('a a a' -> 'aa a') and the adjacent case
# ('a b a b' -> 'ab ab').
# ---------------------------------------------------------------------------

BPE_N_MERGES = 5


def bpe_merge_expr(s, left: str, right: str):
    """Greedy left-to-right merge of the adjacent symbol pair
    (``left``, ``right``) in a space-separated symbol string: double
    every delimiter so each match owns its spaces, literal-replace
    ``' left  right '`` with ``' leftright '``, collapse and trim.
    Pure codegen (no regex lookarounds, no Python UDF); shared by the
    qx43 loop and the unit test that pins the greedy semantics."""
    padded = F.concat(F.lit(" "), F.replace(s, F.lit(" "), F.lit("  ")), F.lit(" "))
    merged = F.replace(
        padded, F.lit(f" {left}  {right} "), F.lit(f" {left}{right} ")
    )
    return F.trim(F.regexp_replace(merged, " +", " "))


def _bpe_oracle() -> str:
    # Every CTE is AS MATERIALIZED: DuckDB inlines plain CTEs, and each
    # s_k references b_k FOUR times (two scalar subqueries, each twice
    # in the replace), so the inlined chain re-evaluates s_{k-1} — and
    # transitively s0 — ~4^k times. Invisible on a small corpus; on the
    # pathological fixture each chain evaluation is seconds and the
    # blowup measured 64 CPU-minutes before timing out. Materialized,
    # each round is computed once, like the Spark loop's localCheckpoint.
    ctes = [
        """w AS MATERIALIZED (
        SELECT wd, COUNT(*) AS cnt
        FROM (SELECT unnest(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+')) AS wd
              FROM documents)
        WHERE wd <> '' GROUP BY wd),
    s0 AS MATERIALIZED (
        -- regexp char split, not a substr(wd, i, 1) comprehension:
        -- substr re-walks from the word start per element, O(len²) on
        -- the pathological fixture's 2 MB single token ('.' is safe —
        -- words cannot contain the newlines RE2's '.' excludes)
        SELECT wd, cnt,
               array_to_string(regexp_extract_all(wd, '.'), ' ') AS s
        FROM w)"""
    ]
    for k in range(1, BPE_N_MERGES + 1):
        ctes.append(f"""p{k} AS MATERIALIZED (
        SELECT pr[1] AS l, pr[2] AS r, CAST(SUM(cnt) AS BIGINT) AS n
        FROM (SELECT cnt, unnest([[toks[i], toks[i + 1]]
                                  for i in range(1, len(toks))]) AS pr
              FROM (SELECT cnt, string_split(s, ' ') AS toks FROM s{k - 1})
              WHERE len(toks) >= 2)
        GROUP BY pr[1], pr[2]),
    b{k} AS MATERIALIZED (SELECT l, r, n FROM p{k} ORDER BY n DESC, l, r LIMIT 1),
    s{k} AS MATERIALIZED (
        SELECT wd, cnt,
               trim(regexp_replace(
                   replace(' ' || replace(s, ' ', '  ') || ' ',
                           ' ' || (SELECT l FROM b{k}) || '  '
                               || (SELECT r FROM b{k}) || ' ',
                           ' ' || (SELECT l FROM b{k})
                               || (SELECT r FROM b{k}) || ' '),
                   ' +', ' ', 'g')) AS s
        FROM s{k - 1})""")
    unions = " UNION ALL ".join(
        f"SELECT {k} AS iteration, l AS pair_left, r AS pair_right,"
        f" n AS n_occurrences FROM b{k}"
        for k in range(1, BPE_N_MERGES + 1)
    )
    joined = ",\n    ".join(ctes)
    return f"WITH {joined}\n    {unions}"


@register("qx43_bpe_learn", oracle=_bpe_oracle())
def qx43_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction (Sennrich et al., ACL 2016), the real
    iterative loop: BPE_N_MERGES merge rounds, each counting frequency-weighted
    adjacent symbol pairs over the (distinct-word, count) table, choosing
    the argmax pair (total-order tiebreak: count desc, pair asc), and
    greedily rewriting every word's symbol sequence. Returns the learned
    merge table — the tokenizer artifact itself.

    Plan: the corpus collapses to the distinct-word frequency table ONCE
    (one hash-agg over the token explode); every subsequent round runs
    over vocabulary-sized data, not corpus-sized — the property that
    makes corpus-scale BPE training tractable (at 100 TB the vocab table
    is millions of rows while the corpus is trillions of tokens). Per
    round: one pair-explode + hash-agg, a 1-row argmax collect (driver
    metadata, like q76's centroids), and a per-row codegen rewrite
    (double-space pad + literal replace + collapse — see module comment;
    no Python UDFs). ``localCheckpoint`` per round truncates lineage so
    the plan stays flat across iterations."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        docs.select(
            F.explode(F.split(ascii_lower("text"), TOKEN_SPLIT_RE)).alias("wd")
        )
        .filter(F.col("wd") != "")
        .groupBy("wd")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    syms = w.select(
        "wd", "cnt", F.array_join(F.split("wd", ""), " ").alias("s")
    ).localCheckpoint(eager=True)

    merges = []
    for k in range(1, BPE_N_MERGES + 1):
        # the pair is emitted as ONE 'l r' string and split only on the
        # vocabulary-sized agg output: a transform lambda building
        # STRUCTS evaluates interpreted at ~17x the cost of the concat
        # form (measured 53.7 s vs 3.2 s over 2M elements — the
        # pathological fixture's 2 MB single token is 2M symbols in one
        # row, times BPE_N_MERGES rounds). Symbols never contain spaces,
        # so the split is unambiguous.
        pairs = (
            syms.select("cnt", F.split("s", " ").alias("toks"))
            .filter(F.size("toks") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(toks) - 1),"
                        " i -> concat(toks[i - 1], ' ', toks[i]))"
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("cnt").cast("bigint").alias("n"))
            .select(
                F.split_part("p", F.lit(" "), F.lit(1)).alias("l"),
                F.split_part("p", F.lit(" "), F.lit(2)).alias("r"),
                "n",
            )
        )
        best = pairs.orderBy(F.desc("n"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not best:
            break
        l, r, n = best[0]["l"], best[0]["r"], best[0]["n"]
        merges.append((k, l, r, n))
        if k < BPE_N_MERGES:
            # the final round's rewrite is never read (only the argmax
            # above feeds the merge table) — skipping it drops one full
            # vocabulary rewrite + eager materialization per query
            syms = syms.withColumn(
                "s", bpe_merge_expr(F.col("s"), l, r)
            ).localCheckpoint(eager=True)

    return local_rows(
        spark,
        merges,
        "iteration int, pair_left string, pair_right string, n_occurrences bigint",
    )
