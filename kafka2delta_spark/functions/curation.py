"""Corpus-curation operators: PII redaction, composite quality filtering,
and derived source blocklists.

The C4/Gopher-style cleaning steps every large-scale training-data pipeline
runs between raw crawl and tokenizer. All native-expression pipelines (regex
+ arithmetic in whole-stage codegen, zero Python UDFs); each has a DuckDB
oracle implementing the identical arithmetic so the rule logic itself is
cross-checked, not just the plumbing.

Scale: q73/q74 are embarrassingly parallel (per-row regex + one hash-agg).
q77 is a two-phase shape — tiny derived aggregate (one row per source)
broadcast back as an anti-join — so the corpus scans twice but never
shuffles full-width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka2delta_spark.functions.text import STOPWORDS, TOKEN_SPLIT_RE
from kafka2delta_spark.queryset import register
from kafka2delta_spark.functions.measure import ascii_lower
from kafka2delta_spark.sources.tables import load_table

# RE2-safe (DuckDB) and java.util.regex-safe (Spark) — no lookaround, no
# backreferences, so the same pattern text behaves identically on both.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\d{3}-\d{3}-\d{4}"
# Java-regex form of EMAIL_RE for the Spark sites. The bare pattern is
# O(len²) in java.util.regex on a long run of local-part characters
# (every start position inside the run re-scans to the '@' check — the
# pathological fixture's 2 MB unbroken token turned q73 into a
# never-finishing task), while RE2 (DuckDB) is linear by construction.
# The negative lookbehind restricts match ATTEMPTS to run starts (O(1)
# failure everywhere else) and the possessive ++ skips the pointless
# backtrack at a failed run.
#
# CONTRACT (round 11): the lookbehind makes the semantics RUN-START-ONLY,
# which is NOT the bare pattern's match set — on abutting emails like
# 'a@bb.cc1@dd.ee' the second candidate starts mid-run (preceded by the
# first match's TLD letter) and is suppressed, where the bare pattern
# would match '1@dd.ee'. Run-start-only is the defined contract: an
# email must begin at a token-run boundary (string start or a character
# outside the local-part class); mid-run fragments exposed by an earlier
# match's end are not independently redactable addresses. RE2 has no
# lookbehind, so the oracle reproduces the same contract with a CONSUMING
# prefix group ``(^|[^local-part])`` and a ``\1`` backreference in the
# replacement (EMAIL_ORACLE_PFX below); parity on abutting emails is
# pinned by tests/test_curation.py and a pathological-fixture row.
EMAIL_RE_JAVA = (
    r"(?<![A-Za-z0-9._%+-])[A-Za-z0-9._%+-]++@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
)
# DuckDB (RE2) form of the run-start-only contract. Group 2 is the email
# itself: count with regexp_extract_all(t, pat, 2); redact with
# regexp_replace(t, pfx_pat, '\1[EMAIL]', 'g') to keep the consumed
# boundary character.
EMAIL_ORACLE_PFX = r"(^|[^A-Za-z0-9._%+-])"
EMAIL_ORACLE_RE = EMAIL_ORACLE_PFX + "(" + EMAIL_RE + ")"


def redact_pii(col: F.Column) -> F.Column:
    """Replace emails then phone numbers with typed placeholder tokens.
    Order matters and is fixed: the email pattern can contain digit runs,
    so it is consumed first."""
    out = F.regexp_replace(col, EMAIL_RE_JAVA, "[EMAIL]")
    return F.regexp_replace(out, PHONE_RE, "[PHONE]")


# The synthetic documents table contains no PII, so q73 plants a
# deterministic email + phone per doc (pure doc_id arithmetic, identical on
# both engines) and then redacts them — the redaction regexes, counting, and
# aggregation are the operator under test; `redact_pii` itself is the
# reusable piece for real data.
_AUG_SQL = (
    "text || ' Contact u' || CAST(doc_id AS VARCHAR) || '@example.com or "
    "call 555-' || lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0') || '-' "
    "|| lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0') || '.'"
)


def _augmented_spark() -> F.Column:
    return F.concat(
        F.col("text"),
        F.lit(" Contact u"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or call 555-"),
        F.lpad((F.col("doc_id") * 7 % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") * 13 % 10000).cast("string"), 4, "0"),
        F.lit("."),
    )


@register(
    "q73_pii_redaction",
    oracle=rf"""
    WITH aug AS (
        SELECT doc_id, source, {_AUG_SQL} AS t FROM documents),
    red AS (
        SELECT source,
               len(regexp_extract_all(t, '{EMAIL_ORACLE_RE}', 2)) AS n_emails,
               len(regexp_extract_all(t, '{PHONE_RE}'))   AS n_phones,
               LENGTH(regexp_replace(regexp_replace(t, '{EMAIL_ORACLE_PFX}{EMAIL_RE}', '\1[EMAIL]', 'g'),
                                     '{PHONE_RE}', '[PHONE]', 'g')) AS red_len
        FROM aug)
    SELECT source,
           CAST(COUNT(*) AS BIGINT)      AS n_docs,
           CAST(SUM(n_emails) AS BIGINT) AS n_emails,
           CAST(SUM(n_phones) AS BIGINT) AS n_phones,
           CAST(SUM(red_len) AS BIGINT)  AS redacted_chars
    FROM red GROUP BY source
    """,
)
def q73_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: find-and-replace emails and phone numbers with typed
    placeholders, counting hits per source. Both engines implement the
    run-start-only email contract (see EMAIL_RE_JAVA/EMAIL_ORACLE_RE):
    Spark via a negative lookbehind (O(len) on token runs), DuckDB via a
    consuming boundary prefix with a backreference — identical match sets
    including on abutting emails."""
    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select("doc_id", "source", _augmented_spark().alias("t"))
    red = aug.select(
        "source",
        F.size(F.regexp_extract_all("t", F.lit(EMAIL_RE_JAVA), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(PHONE_RE), 0)).alias("n_phones"),
        F.length(redact_pii(F.col("t"))).alias("red_len"),
    )
    return red.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").cast("bigint").alias("n_emails"),
        F.sum("n_phones").cast("bigint").alias("n_phones"),
        F.sum("red_len").cast("bigint").alias("redacted_chars"),
    )


# Composite quality rules (C4/Gopher shape). Thresholds chosen to split the
# synthetic corpus, not to be linguistically meaningful.
MIN_TOKENS, MAX_TOKENS = 20, 10_000
MIN_CPT, MAX_CPT = 3.0, 10.0
MIN_STOPWORD_RATIO = 0.05
MAX_PUNCT_RATIO = 0.1

_STOP_IN = ",".join(repr(s) for s in STOPWORDS)


@register(
    "q74_quality_filter",
    oracle=rf"""
    WITH t AS (
        SELECT lang, LENGTH(text) AS n_chars,
               regexp_split_to_array(text, '\s+') AS toks,
               LENGTH(text) - LENGTH(regexp_replace(text, '[^\w\s]', '', 'g'))
                   AS n_punct
        FROM documents),
    r AS (
        SELECT lang,
               len(toks) BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}     AS ok_len,
               n_chars * 1.0 / len(toks) BETWEEN {MIN_CPT} AND {MAX_CPT}
                                                                   AS ok_cpt,
               len(list_filter(toks, x -> x IN ({_STOP_IN}))) * 1.0 / len(toks)
                   >= {MIN_STOPWORD_RATIO}                         AS ok_stop,
               n_punct * 1.0 / n_chars <= {MAX_PUNCT_RATIO}        AS ok_punct
        FROM t)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN ok_len AND ok_cpt AND ok_stop AND ok_punct
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
           CAST(SUM(CASE WHEN NOT ok_len THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_len,
           CAST(SUM(CASE WHEN NOT ok_cpt THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_cpt,
           CAST(SUM(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_stop,
           CAST(SUM(CASE WHEN NOT ok_punct THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fail_punct
    FROM r GROUP BY lang
    """,
)
def q74_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality filter: token-count bounds, chars-per-
    token bounds, minimum stopword ratio, maximum punctuation ratio — the
    keep decision is the conjunction, with per-rule failure counts for
    threshold tuning. Ratio boundaries are exact-integer divisions, so the
    comparisons are bit-identical across engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), TOKEN_SPLIT_RE)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_tokens = F.size(toks)
    n_chars = F.length("text")
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    r = docs.select(
        "lang",
        n_tokens.between(MIN_TOKENS, MAX_TOKENS).alias("ok_len"),
        (n_chars * 1.0 / n_tokens).between(MIN_CPT, MAX_CPT).alias("ok_cpt"),
        (n_stop * 1.0 / n_tokens >= MIN_STOPWORD_RATIO).alias("ok_stop"),
        (n_punct * 1.0 / n_chars <= MAX_PUNCT_RATIO).alias("ok_punct"),
    )
    keep = F.col("ok_len") & F.col("ok_cpt") & F.col("ok_stop") & F.col("ok_punct")

    def fails(c: str) -> F.Column:
        return F.sum(F.when(~F.col(c), 1).otherwise(0)).cast("bigint")

    return r.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(keep, 1).otherwise(0)).cast("bigint").alias("n_keep"),
        fails("ok_len").alias("n_fail_len"),
        fails("ok_cpt").alias("n_fail_cpt"),
        fails("ok_stop").alias("n_fail_stop"),
        fails("ok_punct").alias("n_fail_punct"),
    )


@register(
    "q77_low_content_source_filter",
    oracle="""
    WITH per_source AS (
        SELECT source, AVG(n_chars) AS avg_chars
        FROM documents GROUP BY source),
    blocked AS (
        SELECT source FROM per_source
        WHERE avg_chars < (SELECT AVG(n_chars) FROM documents))
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT)                 AS n_docs,
           CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_sources,
           CAST(SUM(d.n_chars) AS BIGINT)           AS total_chars
    FROM documents d
    WHERE d.source NOT IN (SELECT source FROM blocked)
    GROUP BY d.lang
    """,
)
def q77_low_content_source_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived source blocklist: drop every source whose mean document
    length is below the corpus mean, keep the rest.

    Two-phase scale shape: the per-source aggregate is one row per source
    (tiny), the corpus mean is a single-row aggregate broadcast onto it,
    and the blocklist re-joins the corpus as a **broadcast anti-join** — so
    the full-width document rows never shuffle. ``n_chars`` is integral, so
    both means are exact-integer-sum divisions and the below-mean boundary
    is bit-identical across engines."""
    docs = load_table(spark, sf_dir, "documents")
    # NOT fused: deriving the corpus mean from a checkpointed per-source
    # (sum, count) table was measured at 1.7 s vs 0.5 s — both means are
    # two-column pruned scans with map-side partials, re-run in parallel
    # for free, while the checkpoint adds a blocking prefix job
    per_source = docs.groupBy("source").agg(F.avg("n_chars").alias("avg_chars"))
    corpus_mean = docs.agg(F.avg("n_chars").alias("corpus_mean"))
    blocked = (
        per_source.join(F.broadcast(corpus_mean))
        .filter(F.col("avg_chars") < F.col("corpus_mean"))
        .select("source")
    )
    kept = docs.join(F.broadcast(blocked), "source", "left_anti")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# q79: model-based quality scoring — the fasttext/logreg-classifier stage,
# expressed as a fixed-weight linear model over native-expression features.
# All arithmetic is fixed-point BIGINT (ratios scaled by 1e6 and floored),
# so the score is bit-identical across engines and the keep boundary is
# exact — no transcendental sigmoid in the hot path (monotone in the
# logit, so thresholding the logit IS thresholding the probability).
#
# Weights are micro-scaled integers (weight * 1e6); plausible hand-set
# values standing in for a trained model's coefficients — the operator
# exhibits the inference shape (per-row score, no shuffle), not the fit.
QW_BIAS = -2_000_000  # -2.0
QW_AVG_TOK_LEN = 400_000  # +0.4 per char of mean token length
QW_STOP_RATIO = 3_000_000  # +3.0 * stopword ratio
QW_PUNCT_RATIO = -8_000_000  # -8.0 * punctuation ratio
QW_LONG_DOC = 500_000  # +0.5 if len >= 500 chars


#: DuckDB CTE chain producing (doc_id, source, logit_micro) — the shared
#: feature+score spec for q79 (global keep rule) and qx56 (per-source
#: adaptive cutoff).
_QUALITY_LOGIT_SQL = rf"""
    WITH feats AS (
        SELECT doc_id, source,
               length(text) AS n_chars,
               len(regexp_split_to_array(text, '\s+')) AS n_toks,
               len(list_filter(regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\s+'),
                               t -> list_contains(
                                   ['the','a','and','of','to','in'], t)))
                   AS n_stop,
               length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))
                   AS n_punct
        FROM documents),
    scored AS (
        SELECT doc_id, source,
               CAST({QW_BIAS}
                    + {QW_AVG_TOK_LEN} * (n_chars // n_toks)
                    + CAST(FLOOR({QW_STOP_RATIO} * n_stop / n_toks) AS BIGINT)
                    + CAST(FLOOR({QW_PUNCT_RATIO} * n_punct / n_chars) AS BIGINT)
                    + CASE WHEN n_chars >= 500 THEN {QW_LONG_DOC} ELSE 0 END
                 AS BIGINT) AS logit_micro
        FROM feats WHERE n_toks > 0 AND n_chars > 0)
"""


def quality_logits(docs: DataFrame) -> DataFrame:
    """(doc_id, source, logit_micro) — the fixed-weight linear quality
    model as per-row native expressions (the Spark twin of
    ``_QUALITY_LOGIT_SQL``)."""
    toks = F.split(F.col("text"), r"\s+")
    lower_toks = F.split(ascii_lower(F.col("text")), r"\s+")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_chars = F.length("text").cast("bigint")
    n_toks = F.size(toks).cast("bigint")
    n_stop = F.size(
        F.filter(lower_toks, lambda t: F.array_contains(stop_arr, t))
    ).cast("bigint")
    n_punct = (
        F.length("text") - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))
    ).cast("bigint")
    logit = (
        F.lit(QW_BIAS).cast("bigint")
        + F.lit(QW_AVG_TOK_LEN) * F.floor(n_chars / n_toks).cast("bigint")
        + F.floor(F.lit(QW_STOP_RATIO) * n_stop / n_toks).cast("bigint")
        + F.floor(F.lit(QW_PUNCT_RATIO) * n_punct / n_chars).cast("bigint")
        + F.when(n_chars >= 500, F.lit(QW_LONG_DOC)).otherwise(0)
    )
    return docs.filter((F.size(toks) > 0) & (F.length("text") > 0)).select(
        "doc_id", "source", logit.cast("bigint").alias("logit_micro")
    )


@register(
    "q79_quality_model_score",
    oracle=_QUALITY_LOGIT_SQL
    + """
    SELECT doc_id, logit_micro, logit_micro > 0 AS keep
    FROM scored
    """,
)
def q79_quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-weight linear quality model: per-document logit from token
    statistics, keep = logit > 0. Pure per-row native expressions (regex +
    integer arithmetic, whole-stage codegen) — the classifier-inference
    shape at 100 TB is a mapper, and this is that mapper with the model
    baked in as literals. A learned model swaps the weight constants (or a
    broadcast weights table for wide feature sets)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    lower_toks = F.split(ascii_lower(F.col("text")), r"\s+")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_chars = F.length("text").cast("bigint")
    n_toks = F.size(toks).cast("bigint")
    n_stop = F.size(
        F.filter(lower_toks, lambda t: F.array_contains(stop_arr, t))
    ).cast("bigint")
    n_punct = (
        F.length("text") - F.length(F.regexp_replace("text", r"[.,!?;:]", ""))
    ).cast("bigint")
    logit = (
        F.lit(QW_BIAS).cast("bigint")
        + F.lit(QW_AVG_TOK_LEN) * F.floor(n_chars / n_toks).cast("bigint")
        + F.floor(F.lit(QW_STOP_RATIO) * n_stop / n_toks).cast("bigint")
        + F.floor(F.lit(QW_PUNCT_RATIO) * n_punct / n_chars).cast("bigint")
        + F.when(n_chars >= 500, F.lit(QW_LONG_DOC)).otherwise(0)
    )
    return (
        docs.filter((F.size(toks) > 0) & (F.length("text") > 0))
        .select(
            "doc_id",
            logit.cast("bigint").alias("logit_micro"),
            (logit > 0).alias("keep"),
        )
    )


@register(
    "qx42_data_quality_audit",
    oracle="""
    SELECT * FROM (
      SELECT 'customer_pk_unique' AS check_name,
             CAST(COUNT(*) AS BIGINT) AS n_checked,
             CAST(COUNT(*) - COUNT(DISTINCT c_custkey) AS BIGINT) AS n_violations
      FROM customer
      UNION ALL
      SELECT 'orders_custkey_fk',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'lineitem_orderkey_fk',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'lineitem_qty_range',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                                OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'orders_price_nonneg',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'events_value_nonneg',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN value IS NULL OR value < 0 THEN 1 ELSE 0 END)
                  AS BIGINT)
      FROM events
      UNION ALL
      SELECT 'documents_text_complete',
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN text IS NULL OR length(text) = 0
                           THEN 1 ELSE 0 END) AS BIGINT)
      FROM documents
      UNION ALL
      SELECT 'events_event_id_unique',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
      FROM events
    ) WHERE TRUE
    """,
)
def qx42_data_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint audit (the Deequ/Great-
    Expectations shape): one row per check with rows examined and
    violation count — primary-key uniqueness, two referential-integrity
    checks, range constraints, and completeness, over five tables in one
    report. A training-data pipeline runs exactly this gate before a
    corpus snapshot is blessed.

    Plan: each single-table check is ONE aggregate (violations as a
    conditional sum fused into the same scan — checking three
    constraints on lineitem costs one pass, not three); uniqueness uses
    count-distinct inside the agg; FK checks are left joins against the
    broadcast parent key projection, counted in the same pass. The
    per-check results are literal 1-row DataFrames unioned at the end —
    the union is metadata-sized. At 100 TB each check remains one scan +
    map-side partials; the FK parent side (keys only) broadcasts or,
    when the parent is itself fact-sized, falls back to a shuffle join
    on the key — the plan Catalyst already picks by size."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")

    def one(name: str, agg_df: DataFrame) -> DataFrame:
        return agg_df.select(
            F.lit(name).alias("check_name"),
            F.col("n").cast("bigint").alias("n_checked"),
            F.col("v").cast("bigint").alias("n_violations"),
        )

    viol = lambda cond: F.sum(F.when(cond, 1).otherwise(0)).alias("v")  # noqa: E731
    n = F.count(F.lit(1)).alias("n")

    checks = [
        one(
            "customer_pk_unique",
            cust.agg(n, (F.count(F.lit(1)) - F.countDistinct("c_custkey")).alias("v")),
        ),
        one(
            "orders_custkey_fk",
            # customer scales with SF — no forced broadcast for an FK
            # probe side that can exceed the 8 GB cap at 100 TB
            orders.join(
                cust.select("c_custkey"),
                orders.o_custkey == cust.c_custkey,
                "left",
            ).agg(n, viol(F.col("c_custkey").isNull())),
        ),
        one(
            "lineitem_orderkey_fk",
            li.join(
                orders.select("o_orderkey"),
                li.l_orderkey == orders.o_orderkey,
                "left",
            ).agg(n, viol(F.col("o_orderkey").isNull())),
        ),
        one(
            "lineitem_qty_range",
            li.agg(
                n,
                viol(
                    F.col("l_quantity").isNull()
                    | (F.col("l_quantity") < 1)
                    | (F.col("l_quantity") > 50)
                ),
            ),
        ),
        one(
            "orders_price_nonneg",
            orders.agg(
                n, viol(F.col("o_totalprice").isNull() | (F.col("o_totalprice") < 0))
            ),
        ),
        # Both events checks are plain (join-free) aggregates over the
        # same scan, so they fuse into ONE pass whose single row explodes
        # into the two report rows — before, events was scanned twice
        # (guide §2.4: don't compute the same pass twice). The FK checks
        # canNOT be fused this way: their n_checked counts JOIN rows
        # (parent-key duplicates multiply), matching the oracle exactly.
        events.agg(
            n,
            viol(F.col("value").isNull() | (F.col("value") < 0)),
            (F.count(F.lit(1)) - F.countDistinct("event_id")).alias("v2"),
        ).select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("events_value_nonneg").alias("check_name"),
                        F.col("n").cast("bigint").alias("n_checked"),
                        F.col("v").cast("bigint").alias("n_violations"),
                    ),
                    F.struct(
                        F.lit("events_event_id_unique").alias("check_name"),
                        F.col("n").cast("bigint").alias("n_checked"),
                        F.col("v2").cast("bigint").alias("n_violations"),
                    ),
                )
            ).alias("r")
        ).select("r.*"),
        one(
            "documents_text_complete",
            docs.agg(n, viol(F.col("text").isNull() | (F.length("text") == 0))),
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


@register(
    "qx56_per_source_quality_cutoff",
    oracle=_QUALITY_LOGIT_SQL
    + """
    , cut AS (
        SELECT source,
               COUNT(*) AS n_docs,
               quantile_cont(logit_micro, 0.25) AS cutoff
        FROM scored GROUP BY source)
    SELECT s.source,
           CAST(c.n_docs AS BIGINT) AS n_docs,
           c.cutoff AS cutoff_micro,
           CAST(SUM(CASE WHEN s.logit_micro >= c.cutoff THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN s.logit_micro >= c.cutoff THEN 1 ELSE 0 END)
                * 1000000 // c.n_docs AS BIGINT) AS kept_e6
    FROM scored s JOIN cut c USING (source)
    GROUP BY s.source, c.n_docs, c.cutoff
    """,
)
def qx56_per_source_quality_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source ADAPTIVE quality floor: instead of one global logit
    threshold (q79's keep rule — which can wipe out an entire
    low-register source and silently skew the mixture), each source keeps
    its own top three quarters: cutoff = that source's exact P25 logit,
    keep = logit >= cutoff. The curation pattern behind per-domain
    retention quotas in corpus construction.

    Plan: the logit is a per-row codegen mapper (``quality_logits``);
    the per-source cutoff comes from ``exact_percentiles_by_rank``
    (operators/rankstats.py — two-pass range-partitioned rank, NO
    per-group value multiset even for a source holding half the corpus);
    cutoffs broadcast back (one row per source) and one hash-agg counts
    the keeps. Exactness: dyadic 1/4 over integer micro-logits
    interpolates to exact binary doubles (the qx30 argument), and the
    truncating-div kept ratio is integer."""
    from kafka2delta_spark.operators.rankstats import exact_percentiles_by_rank

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_logits(docs)
    cut = exact_percentiles_by_rank(
        scored, "logit_micro", [1], 4, keys=["source"], prefix="c"
    ).select(
        "source",
        F.col("__n").alias("n_docs"),
        F.col("c1").alias("cutoff_micro"),
    )
    kept = F.sum(
        (F.col("logit_micro") >= F.col("cutoff_micro")).cast("int")
    ).cast("bigint")
    return (
        scored.join(F.broadcast(cut), "source")
        .groupBy("source")
        .agg(
            F.max("n_docs").alias("n_docs"),
            F.max("cutoff_micro").alias("cutoff_micro"),
            kept.alias("n_kept"),
            F.expr(
                "cast(sum(cast(logit_micro >= cutoff_micro as int))"
                " * 1000000 div max(n_docs) as bigint)"
            ).alias("kept_e6"),
        )
    )


# ---------------------------------------------------------------------------
# qx63: chi-square independence audit of the source × lang contingency
# table — the dataset-bias check run before mixing corpora: a large
# statistic means language composition differs materially by source, so
# per-source sampling rates will shift the language mixture. Exact
# fixed-point arithmetic (the classic X² = Σ (o·N − r·c)² / (N·r·c) form
# cleared of fractions) so the oracle hash-matches bit-for-bit.
# ---------------------------------------------------------------------------

#: fixed-point scale for per-cell X² contributions (1e4 = 4 decimals).
#: Overflow bound: |o·N − r·c| <= N², so the decimal(38) numerator
#: (o·N − r·c)² · 1e4 requires N <= ~5·10^8 documents per audited
#: partition — beyond that, audit per corpus shard and sum the shards
#: (the statistic is additive over disjoint row groups of the table).
CHI2_SCALE = 10_000


@register(
    "qx63_chi2_source_lang",
    oracle=f"""
    WITH o AS (
        SELECT source, lang, COUNT(*) AS o
        FROM documents GROUP BY source, lang),
    r AS (SELECT source, SUM(o) AS r FROM o GROUP BY source),
    c AS (SELECT lang, SUM(o) AS c FROM o GROUP BY lang),
    n AS (SELECT SUM(o) AS n FROM o),
    x AS (
        SELECT o.source, o.lang, o.o, r.r, c.c, n.n,
               (o.o::HUGEINT * n.n - r.r::HUGEINT * c.c) AS d
        FROM o JOIN r USING (source) JOIN c USING (lang) CROSS JOIN n)
    SELECT source, lang,
           CAST(o AS BIGINT) AS o,
           CAST(r AS BIGINT) AS row_total,
           CAST(c AS BIGINT) AS col_total,
           CAST((r::HUGEINT * c) // n AS BIGINT)            AS expected,
           CAST((d * d * {CHI2_SCALE}) // (n::HUGEINT * r * c) AS BIGINT)
               AS chi2_contrib_e4
    FROM x
    """,
)
def qx63_chi2_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell chi-square decomposition of the source × lang table:
    observed count, marginals, integer expected count, and the cell's
    X² contribution at 1e4 fixed point — summing ``chi2_contrib_e4``
    gives the full statistic; the per-cell rows show WHERE the dependence
    lives (which source skews which language).

    All arithmetic is integer: contributions are
    (o·N − r·c)²·SCALE div (N·r·c), carried in decimal(38)/HUGEINT so
    both engines truncate identically (div and // both round toward
    zero — the qx29-verified identity).

    Plan: one hash-agg over (source, lang) — every downstream input
    (marginals, N) derives from those few-hundred cells, so after the
    first map-side-combined shuffle the query is metadata-sized at any
    corpus scale. Marginal joins broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    # pinned: all three marginals and the final join re-aggregate these
    # few-hundred cells — unpinned, docs was scanned 4x in one plan
    o = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("o"))
        .localCheckpoint(eager=False)
    )
    r = o.groupBy("source").agg(F.sum("o").alias("r"))
    c = o.groupBy("lang").agg(F.sum("o").alias("c"))
    n = o.agg(F.sum("o").alias("n"))
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    x = (
        o.join(F.broadcast(r), "source")
        .join(F.broadcast(c), "lang")
        .crossJoin(F.broadcast(n))
        .withColumn("d", dec("o") * dec("n") - dec("r") * dec("c"))
    )
    return x.select(
        "source",
        "lang",
        F.col("o").cast("bigint").alias("o"),
        F.col("r").cast("bigint").alias("row_total"),
        F.col("c").cast("bigint").alias("col_total"),
        F.expr("cast((cast(r as decimal(38,0)) * c) div n as bigint)").alias(
            "expected"
        ),
        F.expr(
            f"cast((d * d * {CHI2_SCALE})"
            " div (cast(n as decimal(38,0)) * r * c) as bigint)"
        ).alias("chi2_contrib_e4"),
    )


# ---------------------------------------------------------------------------
# qx72: within-source quantile normalization of quality scores — map each
# document's model logit to its percentile rank INSIDE its source, so
# quality is comparable across sources whose raw score distributions
# differ (the cross-source calibration step before a single global
# quality threshold makes sense). Ranks make ties explicit and integer
# arithmetic keeps the normalized value engine-exact.
# ---------------------------------------------------------------------------


@register(
    "qx72_quality_quantile_norm",
    oracle=_QUALITY_LOGIT_SQL
    + """
    , r AS (
        SELECT doc_id, source, logit_micro,
               RANK() OVER (PARTITION BY source ORDER BY logit_micro) AS rk,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM scored)
    SELECT doc_id, source, logit_micro,
           CAST(CASE WHEN n > 1 THEN (rk - 1) * 1000000 // (n - 1)
                     ELSE 0 END AS BIGINT) AS pct_rank_e6
    FROM r
    """,
)
def qx72_quality_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, logit_micro, pct_rank_e6): each doc's q79 quality
    logit and its within-source percentile rank at 1e6 fixed point
    ((rank-1)*1e6 div (n-1); RANK so exact ties normalize identically).

    Plan: the shared quality_logits mapper (pure codegen exprs) followed
    by one source-partitioned window — rank and the partition count ride
    the same window exchange. Source partitions can be corpus-sized at
    100 TB; if a single source dominates, the q33/rankstats two-pass
    range-partitioned rank shape computes the identical rank without a
    single-partition sort (documented trade; at the tested scales the
    window plan is the faster one)."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents")
    s = quality_logits(docs)
    part = W.partitionBy("source")
    r = s.select(
        "doc_id",
        "source",
        "logit_micro",
        F.rank().over(part.orderBy("logit_micro")).alias("rk"),
        F.count(F.lit(1)).over(part).alias("n"),
    )
    return r.select(
        "doc_id",
        "source",
        "logit_micro",
        F.when(
            F.col("n") > 1,
            F.expr("(rk - 1) * 1000000 div (n - 1)"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("pct_rank_e6"),
    )


# ---------------------------------------------------------------------------
# qx95: quality-model calibration against an independent outcome — does
# the q79 logit actually predict anything? The reliability-diagram query:
# rank-decile the logits (exact integer deciles over the total order
# (logit, doc_id)), and per decile measure the rate of an outcome the
# model never saw: membership in a q98 near-duplicate cluster (template /
# boilerplate docs duplicate far more than organic text — the curation
# folklore this query turns into a measured number). A score that is
# flat across deciles predicts nothing; a monotone dup-rate gradient
# justifies thresholding on it.
# ---------------------------------------------------------------------------


def _calibration_oracle() -> str:
    from kafka2delta_spark.functions.dedup import _JACCARD_PAIRS_SQL

    return (
        _QUALITY_LOGIT_SQL
        + f""",
    edges AS MATERIALIZED (SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS_SQL}) jp),
    dup AS (
        SELECT DISTINCT doc_id FROM (
            SELECT doc_a AS doc_id FROM edges
            UNION ALL SELECT doc_b FROM edges)),
    ranked AS (
        SELECT s.doc_id, s.logit_micro,
               CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
               ROW_NUMBER() OVER (ORDER BY s.logit_micro, s.doc_id) AS rk,
               COUNT(*) OVER () AS n
        FROM scored s LEFT JOIN dup ON dup.doc_id = s.doc_id)
    SELECT CAST((rk - 1) * 10 // n AS BIGINT)       AS decile,
           CAST(COUNT(*) AS BIGINT)                 AS n_docs,
           CAST(MIN(logit_micro) AS BIGINT)         AS logit_lo,
           CAST(MAX(logit_micro) AS BIGINT)         AS logit_hi,
           CAST(SUM(is_dup) AS BIGINT)              AS n_dup,
           CAST(SUM(is_dup) * 10000 // COUNT(*) AS BIGINT) AS dup_rate_e4
    FROM ranked GROUP BY (rk - 1) * 10 // n
    """
    )


@register("qx95_quality_calibration", oracle=_calibration_oracle())
def qx95_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the q79 quality logit against near-dup
    membership (an outcome the model's features never saw): one row per
    exact rank decile with the logit range and the duplicate rate (e4).
    See the section comment for why duplication is the right independent
    audit label.

    Plan: logits are per-row codegen; the dup label is two columns off
    the session-checkpointed q88 edge list; the global decile rank uses
    rankstats' ``global_ranks`` two-pass (range exchange + mid-offset —
    NO global window, so no single-task sort at any corpus size). All
    integers; decile edges are exact rk0·10 div n."""
    from kafka2delta_spark.functions.dedup import _jaccard_edges
    from kafka2delta_spark.operators.rankstats import global_ranks

    docs = load_table(spark, sf_dir, "documents")
    logits = quality_logits(docs)
    e = _jaccard_edges(spark, sf_dir)
    dup = (
        e.select(F.col("doc_a").alias("doc_id"))
        .unionByName(e.select(F.col("doc_b").alias("doc_id")))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    # dup is the near-dup doc set — worst case corpus cardinality, so no
    # forced broadcast (>8 GB hard cap at 100 TB); AQE broadcasts it at
    # runtime whenever it is actually small
    labeled = logits.join(dup, "doc_id", "left").withColumn(
        "is_dup", F.coalesce("is_dup", F.lit(0))
    )
    ranked = global_ranks(labeled, ["logit_micro", "doc_id"])
    return (
        ranked.groupBy(
            F.expr("cast(rk0 * 10 div __n as bigint)").alias("decile")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("logit_micro").cast("bigint").alias("logit_lo"),
            F.max("logit_micro").cast("bigint").alias("logit_hi"),
            F.sum("is_dup").cast("bigint").alias("n_dup"),
        )
        .withColumn(
            "dup_rate_e4",
            F.expr("cast(n_dup * 10000 div n_docs as bigint)"),
        )
    )
