"""Round-7 third wave (qz11..qz18): robust statistics & system evals.

Order-statistics-by-histogram applications (trimmed/winsorized means,
p99 tails), two-sample distribution drift (Kolmogorov-Smirnov), rank
correlation (Spearman via exact midranks, Kendall between retrieval
systems), a classifier eval (language-ID confusion → per-class F1), and
exact largest-remainder token apportionment for the q66 mixture, and
cluster-debiased sampling (qz18) — the
statistics layer a data-quality dashboard computes over a 100 TB corpus
without ever materializing a per-group multiset or a global window.

Exactness contract (repo-wide): hashed values are integers or fixed
point; floats appear only as identical single IEEE ops on identical
integer-derived inputs or as order-pinned folds; integer division
truncates identically on both engines for the non-negative operands
used here.

No reference counterpart: the reference engine (570 LoC, CDC only) has
none of these; they extend the mandated LLM-pipeline surface
(SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka2delta_spark.queryset import register
from kafka2delta_spark.functions.measure import ascii_lower
from kafka2delta_spark.functions.measure import finite as finite_m
from kafka2delta_spark.functions.measure import v1000 as v1000_m
from kafka2delta_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# qz11: trimmed + winsorized mean per event type — the two standard
# outlier-resistant means, computed from a value HISTOGRAM with
# cumulative counts AND cumulative sums, so the boundary order
# statistics and the partial sums between them come out of one
# domain-bounded pass (the qx53 closed form extended with a Σv·cnt
# column). Complements qx50 (median/MAD): same family, different
# estimator.
# ---------------------------------------------------------------------------

TRIM_PCT = 10  # drop (trimmed) or clamp (winsorized) lowest/highest 10%


@register(
    "qz11_trimmed_winsorized_mean",
    oracle=f"""
    WITH v AS (
        -- defined-key + defined-measurement contract (family rule shared
        -- with qx30/qx50): a NULL value row would sit at OPPOSITE ends
        -- of the two engines' cumulative windows (Spark sorts NULLs
        -- first, DuckDB last), shifting every boundary read
        SELECT event_type, (CASE WHEN isfinite(value) THEN CAST(FLOOR(value * 1000) AS BIGINT) END) AS v
        FROM events
        WHERE event_type IS NOT NULL
          AND value IS NOT NULL AND isfinite(value)),
    h AS (
        SELECT event_type, v, COUNT(*) AS cnt FROM v GROUP BY event_type, v),
    c AS (
        SELECT event_type, v, cnt,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY v
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(v * cnt) OVER (PARTITION BY event_type ORDER BY v
                                  ROWS UNBOUNDED PRECEDING) AS cums
        FROM h),
    t AS (
        SELECT event_type, SUM(cnt) AS n, SUM(v * cnt) AS s
        FROM h GROUP BY event_type),
    b AS (
        -- the boundary SUM expressions must be read AT the boundary row
        -- (smallest qualifying v): arg_min-by-v, never MIN of the
        -- expression (which scans every qualifying row's value)
        SELECT c.event_type, t.n, t.s, t.n * {TRIM_PCT} // 100 AS g,
               MIN(c.v) FILTER (WHERE c.cum > t.n * {TRIM_PCT} // 100)
                   AS v_lo,
               MIN(c.v) FILTER (WHERE c.cum > t.n - t.n * {TRIM_PCT} // 100 - 1)
                   AS v_hi,
               ARG_MIN(c.cums - (c.cum - t.n * {TRIM_PCT} // 100) * c.v, c.v)
                   FILTER (WHERE c.cum > t.n * {TRIM_PCT} // 100) AS low_sum,
               ARG_MIN(c.cums - (c.cum - (t.n - t.n * {TRIM_PCT} // 100)) * c.v,
                       c.v)
                   FILTER (WHERE c.cum > t.n - t.n * {TRIM_PCT} // 100 - 1)
                   AS keep_sum
        FROM c JOIN t USING (event_type)
        GROUP BY c.event_type, t.n, t.s)
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(g AS BIGINT) AS n_trimmed_each,
           CAST((keep_sum - low_sum) // (n - 2 * g) AS BIGINT)
               AS trimmed_mean_milli,
           CAST((keep_sum - low_sum + g * v_lo + g * v_hi) // n AS BIGINT)
               AS winsorized_mean_milli,
           CAST(s // n AS BIGINT) AS raw_mean_milli
    FROM b WHERE n - 2 * g > 0
    """,
)
def qz11_trimmed_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{TRIM_PCT}%-trimmed and winsorized means of event value (milli
    fixed point) per event type, next to the raw mean — the robust
    location estimates a telemetry dashboard should show when tails are
    fat (qz09's finding feeds this choice).

    Derivation, all integers: with g = ⌊n·{TRIM_PCT}/100⌋ and the
    histogram's cumulative count/sum, the sum of the g smallest values
    is cums(v_lo) − (cum(v_lo) − g)·v_lo where v_lo is the value whose
    cumulative count first exceeds g (the (g+1)-th order statistic, and
    the winsorize clamp); keep_sum is the same expression at n−g. The
    trimmed mean divides the middle mass by n−2g, the winsorized mean
    adds g copies of each clamp value back. Conditional MINs read both
    boundaries off the cumulative histogram without a second pass.

    Plan: one map-side-combined (type, value) histogram agg, a
    domain-bounded cumulative window, conditional-min hash-aggs — the
    qx53 envelope, never a multiset."""
    ev = load_table(spark, sf_dir, "events")
    # defined-key + defined-measurement contract (see oracle comment)
    v = ev.filter(
        F.col("event_type").isNotNull() & finite_m("value")
    ).select(
        "event_type",
        v1000_m("value").alias("v"),
    )
    h = v.groupBy("event_type", "v").agg(F.count(F.lit(1)).alias("cnt"))
    wc = (
        W.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    c = h.select(
        "event_type",
        "v",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum(F.col("v") * F.col("cnt")).over(wc).alias("cums"),
    )
    t = h.groupBy("event_type").agg(
        F.sum("cnt").alias("n"), F.sum(F.col("v") * F.col("cnt")).alias("s")
    )
    g = F.expr(f"n * {TRIM_PCT} div 100")
    j = c.join(t, "event_type")
    # boundary sums via min_by-on-v (FILTERed): the expression must be
    # evaluated AT the first qualifying row, not min'd across them
    gsql = f"n * {TRIM_PCT} div 100"
    b = j.groupBy("event_type", "n", "s").agg(
        F.min(F.when(F.col("cum") > g, F.col("v"))).alias("v_lo"),
        F.min(F.when(F.col("cum") > F.col("n") - g - 1, F.col("v"))).alias(
            "v_hi"
        ),
        F.expr(
            f"min_by(cums - (cum - ({gsql})) * v, v)"
            f" FILTER (WHERE cum > ({gsql}))"
        ).alias("low_sum"),
        F.expr(
            f"min_by(cums - (cum - (n - ({gsql}))) * v, v)"
            f" FILTER (WHERE cum > n - ({gsql}) - 1)"
        ).alias("keep_sum"),
    )
    gg = F.expr(f"n * {TRIM_PCT} div 100")
    return (
        b.filter(F.col("n") - 2 * gg > 0)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            gg.cast("bigint").alias("n_trimmed_each"),
            F.expr(
                f"cast((keep_sum - low_sum) div (n - 2 * (n * {TRIM_PCT} div 100))"
                " as bigint)"
            ).alias("trimmed_mean_milli"),
            F.expr(
                f"cast((keep_sum - low_sum + (n * {TRIM_PCT} div 100) * v_lo"
                f" + (n * {TRIM_PCT} div 100) * v_hi) div n as bigint)"
            ).alias("winsorized_mean_milli"),
            F.expr("cast(s div n as bigint)").alias("raw_mean_milli"),
        )
    )


# ---------------------------------------------------------------------------
# qz12: two-sample Kolmogorov-Smirnov statistic, each source vs the rest
# of the corpus, over document length — the nonparametric drift test
# that catches shape differences PSI's fixed buckets smooth over. The
# max of |F_s − F_rest| over a step function is attained at observed
# values, so the exact statistic reads off the (source × distinct
# value) cumulative grid — integer arithmetic throughout via the
# cross-multiplied numerator |cum_s·N_rest − cum_rest·N_s|.
# ---------------------------------------------------------------------------


@register(
    "qz12_ks_source_drift",
    oracle="""
    WITH d AS (SELECT source, n_chars AS v FROM documents),
    h AS (SELECT source, v, COUNT(*) AS cnt FROM d GROUP BY source, v),
    vals AS (SELECT DISTINCT v FROM d),
    srcs AS (SELECT source, SUM(cnt) AS ns FROM h GROUP BY source),
    tot AS (SELECT SUM(cnt) AS n FROM h),
    grid AS (
        SELECT s.source, s.ns, vals.v, COALESCE(h.cnt, 0) AS cnt
        FROM srcs s CROSS JOIN vals
        LEFT JOIN h ON h.source = s.source AND h.v = vals.v),
    cum AS (
        SELECT source, ns, v,
               SUM(cnt) OVER (PARTITION BY source ORDER BY v
                              ROWS UNBOUNDED PRECEDING) AS cs
        FROM grid),
    gcum AS (
        SELECT v, SUM(cnt) AS cnt FROM h GROUP BY v),
    gc AS (
        SELECT v, SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cg
        FROM gcum),
    ks AS (
        SELECT c.source, c.ns, t.n - c.ns AS nr,
               MAX(ABS(c.cs * (t.n - c.ns) - (gc.cg - c.cs) * c.ns)) AS dnum
        FROM cum c JOIN gc ON gc.v = c.v CROSS JOIN tot t
        GROUP BY c.source, c.ns, t.n)
    SELECT source,
           CAST(ns AS BIGINT) AS n_source,
           CAST(nr AS BIGINT) AS n_rest,
           CAST(dnum AS BIGINT) AS d_num,
           CAST(dnum * 1000000 // (ns * nr) AS BIGINT) AS ks_e6
    FROM ks
    """,
)
def qz12_ks_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic of document length, each source vs
    the rest of the corpus: D = max_v |F_source(v) − F_rest(v)|, with
    the max taken over every observed length (where a step function's
    sup lives). ks_e6 near 0 = the source is length-distributed like
    the corpus; the drift gate that needs no bucket tuning (vs qz02).

    Exactness: D's numerator is the cross-multiplied integer
    |cum_s·N_rest − cum_rest·N_s| (no division until the final e6), so
    the max comparison is integer-exact; cum_rest = cum_all − cum_s.

    Plan: one (source, length) histogram agg; the evaluation grid is
    |sources| × |distinct lengths| — value-domain-bounded, the qx53
    argument — with per-source cumulative windows partitioned by source
    (bounded strata). No per-document pairwise anything."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("source", F.col("n_chars").alias("v"))
    # ONE docs pass: the (source, length) histogram is pinned — every
    # downstream frame (value grid, per-source totals, grand total) is a
    # re-aggregation of it, and the distinct length set reads off it
    # too (every doc contributes a histogram row), so docs is scanned
    # once instead of 7x
    h = (
        d.groupBy("source", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)
    )
    vals = h.select("v").distinct()
    srcs = h.groupBy("source").agg(F.sum("cnt").alias("ns"))
    tot = h.agg(F.sum("cnt").alias("n"))
    grid = (
        srcs.crossJoin(vals)
        .join(h, ["source", "v"], "left")
        .select(
            "source", "ns", "v", F.coalesce("cnt", F.lit(0)).alias("cnt")
        )
    )
    wc = (
        W.partitionBy("source")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # pinned: consumed by the global-cumulative agg AND the KS join
    cum = grid.select(
        "source", "ns", "v", F.sum("cnt").over(wc).alias("cs")
    ).localCheckpoint(eager=False)
    # the GLOBAL cumulative at v is the per-source cumulatives summed
    # over the (complete) source grid — no unpartitioned window needed
    gc = cum.groupBy("v").agg(F.sum("cs").alias("cg"))
    ks = (
        cum.join(gc, "v")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "ns", "n")
        .agg(
            F.max(
                F.abs(
                    F.col("cs") * (F.col("n") - F.col("ns"))
                    - (F.col("cg") - F.col("cs")) * F.col("ns")
                )
            ).alias("dnum")
        )
    )
    return ks.select(
        "source",
        F.col("ns").cast("bigint").alias("n_source"),
        (F.col("n") - F.col("ns")).cast("bigint").alias("n_rest"),
        F.col("dnum").cast("bigint").alias("d_num"),
        F.expr("cast(dnum * 1000000 div (ns * (n - ns)) as bigint)").alias(
            "ks_e6"
        ),
    )


# ---------------------------------------------------------------------------
# qz13: language-ID classifier evaluation — q81 emits the confusion
# table; this turns it into the per-class precision/recall/F1 report
# plus macro-F1 (the numbers a model card actually prints). Reuses
# q81's exact prediction rule, so the eval and the classifier cannot
# drift apart.
# ---------------------------------------------------------------------------


def _langid_f1_oracle() -> str:
    from kafka2delta_spark.functions.text import _LANGS, _PRED_SQL, _lang_score_sql

    scores = ", ".join(
        f"{_lang_score_sql(lang)} AS s_{lang}" for lang in _LANGS
    )
    return f"""
    WITH t AS (
        SELECT doc_id, lang,
               regexp_split_to_array(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), '\\s+') AS toks
        FROM documents),
    scored AS (SELECT doc_id, lang, {scores} FROM t),
    conf AS (
        SELECT lang, {_PRED_SQL} AS predicted, COUNT(*) AS n
        FROM scored GROUP BY lang, predicted),
    cls AS (SELECT DISTINCT lang AS c FROM conf),
    tps AS (SELECT lang AS c, SUM(n) AS tp FROM conf
            WHERE lang = predicted GROUP BY lang),
    fps AS (SELECT predicted AS c, SUM(n) AS fp FROM conf
            WHERE lang <> predicted GROUP BY predicted),
    fns AS (SELECT lang AS c, SUM(n) AS fn FROM conf
            WHERE lang <> predicted GROUP BY lang),
    m AS (
        SELECT cls.c,
               COALESCE(tps.tp, 0) AS tp,
               COALESCE(fps.fp, 0) AS fp,
               COALESCE(fns.fn, 0) AS fn
        FROM cls
        LEFT JOIN tps USING (c)
        LEFT JOIN fps USING (c)
        LEFT JOIN fns USING (c)),
    f AS (
        SELECT c, tp, fp, fn,
               CASE WHEN tp + fp = 0 THEN 0
                    ELSE tp * 10000 // (tp + fp) END AS precision_e4,
               CASE WHEN tp + fn = 0 THEN 0
                    ELSE tp * 10000 // (tp + fn) END AS recall_e4,
               CASE WHEN 2 * tp + fp + fn = 0 THEN 0
                    ELSE 2 * tp * 10000 // (2 * tp + fp + fn) END AS f1_e4
        FROM m),
    macro AS (SELECT SUM(f1_e4) // COUNT(*) AS macro_f1_e4 FROM f)
    SELECT f.c AS lang,
           CAST(f.tp AS BIGINT) AS tp, CAST(f.fp AS BIGINT) AS fp,
           CAST(f.fn AS BIGINT) AS fn,
           CAST(f.precision_e4 AS BIGINT) AS precision_e4,
           CAST(f.recall_e4 AS BIGINT) AS recall_e4,
           CAST(f.f1_e4 AS BIGINT) AS f1_e4,
           CAST(macro.macro_f1_e4 AS BIGINT) AS macro_f1_e4
    FROM f CROSS JOIN macro
    """


@register("qz13_langid_f1_report", oracle=_langid_f1_oracle())
def qz13_langid_f1_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 (e4) of the q81 marker-word
    language classifier against the documents table's lang labels, plus
    macro-F1 repeated per row — q81's confusion table turned into the
    model-card numbers. Classes = observed TRUE labels (a predicted-only
    class would have recall undefined; the marker CASE can only emit
    known languages anyway).

    Exactness: TP/FP/FN are integer sums off the confusion table;
    precision = TP·10⁴ div (TP+FP), recall over TP+FN, F1 via the
    2TP/(2TP+FP+FN) identity — no float ever; macro-F1 is the integer
    mean of per-class F1s. Plan: q81's per-row scoring (codegen) → one
    confusion hash-agg → everything after is |classes|²-sized."""
    from kafka2delta_spark.functions.text import (
        _LANGS,
        _lang_score_spark,
        TOKEN_SPLIT_RE,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(ascii_lower(F.col("text")), TOKEN_SPLIT_RE)
    scored = docs.select(
        "lang",
        *[_lang_score_spark(toks, lang).alias(f"s_{lang}") for lang in _LANGS],
    )
    pred = None
    for lang in _LANGS:
        others = [F.col(f"s_{o}") for o in _LANGS if o != lang]
        cond = F.col(f"s_{lang}") >= F.greatest(*others)
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    conf = (
        scored.select("lang", pred.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    conf = conf.localCheckpoint(eager=False)  # |classes|^2 rows, 4 readers
    cls = conf.select(F.col("lang").alias("c")).distinct()
    tps = (
        conf.filter(F.col("lang") == F.col("predicted"))
        .groupBy(F.col("lang").alias("c"))
        .agg(F.sum("n").alias("tp"))
    )
    fps = (
        conf.filter(F.col("lang") != F.col("predicted"))
        .groupBy(F.col("predicted").alias("c"))
        .agg(F.sum("n").alias("fp"))
    )
    fns = (
        conf.filter(F.col("lang") != F.col("predicted"))
        .groupBy(F.col("lang").alias("c"))
        .agg(F.sum("n").alias("fn"))
    )
    m = (
        cls.join(tps, "c", "left")
        .join(fps, "c", "left")
        .join(fns, "c", "left")
        .select(
            "c",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("fp", F.lit(0)).alias("fp"),
            F.coalesce("fn", F.lit(0)).alias("fn"),
        )
    )
    f = m.select(
        "c",
        "tp",
        "fp",
        "fn",
        F.expr(
            "case when tp + fp = 0 then 0"
            " else tp * 10000 div (tp + fp) end"
        ).alias("precision_e4"),
        F.expr(
            "case when tp + fn = 0 then 0"
            " else tp * 10000 div (tp + fn) end"
        ).alias("recall_e4"),
        F.expr(
            "case when 2 * tp + fp + fn = 0 then 0"
            " else 2 * tp * 10000 div (2 * tp + fp + fn) end"
        ).alias("f1_e4"),
    )
    macro = f.agg(
        F.expr("cast(sum(f1_e4) div count(1) as bigint)").alias("macro_f1_e4")
    )
    return f.crossJoin(F.broadcast(macro)).select(
        F.col("c").alias("lang"),
        F.col("tp").cast("bigint"),
        F.col("fp").cast("bigint"),
        F.col("fn").cast("bigint"),
        F.col("precision_e4").cast("bigint"),
        F.col("recall_e4").cast("bigint"),
        F.col("f1_e4").cast("bigint"),
        F.col("macro_f1_e4").cast("bigint"),
    )


# ---------------------------------------------------------------------------
# qz14: exact Spearman rank correlation between document length and the
# q79 quality logit — "is the quality model just a length detector?"
# Spearman with ties is Pearson over MIDRANKS; doubled midranks
# (2r = 2·minrank + cnt − 1 per tie group, the qz01 trick) keep every
# moment sum an exact integer, and the final ρ is three IEEE ops on
# identical decimal-derived doubles.
# ---------------------------------------------------------------------------


def _spearman_oracle() -> str:
    from kafka2delta_spark.functions.curation import _QUALITY_LOGIT_SQL

    def midrank2(col: str) -> str:
        return f"""
        SELECT doc_id,
               2 * MIN(r1) OVER (PARTITION BY {col})
               + COUNT(*) OVER (PARTITION BY {col}) - 1 AS r2
        FROM (SELECT doc_id, {col},
                     ROW_NUMBER() OVER (ORDER BY {col}, doc_id) AS r1
              FROM base)"""

    return (
        _QUALITY_LOGIT_SQL
        + f""",
    base AS (
        SELECT s.doc_id, s.logit_micro, d.n_chars
        FROM scored s JOIN documents d USING (doc_id)),
    rx AS ({midrank2('n_chars')}),
    ry AS ({midrank2('logit_micro')}),
    xy AS (
        SELECT rx.r2::HUGEINT AS x, ry.r2::HUGEINT AS y
        FROM rx JOIN ry USING (doc_id)),
    mom AS (
        SELECT COUNT(*)::HUGEINT AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
        FROM xy)
    SELECT CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS BIGINT) AS cov_num,
           CAST(FLOOR((n * sxy - sx * sy)
                      / (sqrt((n * sxx - sx * sx)::DOUBLE)
                         * sqrt((n * syy - sy * sy)::DOUBLE)) * 1000000)
               AS BIGINT) AS spearman_e6
    FROM mom
    """
    )


@register("qz14_spearman_length_quality", oracle=_spearman_oracle())
def qz14_spearman_length_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rank correlation (midrank tie handling) between
    n_chars and the q79 quality logit — near ±1 means the "quality
    model" is just a length detector and its other features are dead
    weight; the feature-redundancy audit qx74 runs on raw values, done
    properly on ranks.

    Exactness: doubled midranks are integers (the qz01 identity), all
    five moment sums are exact decimal(38), and ρ = cov_num /
    (√varx·√vary) is two sqrts + one divide on doubles converted from
    identical exact integers — floor-e6 of identical doubles. Plan: two
    `global_ranks` two-passes (one per variable — range exchange, no
    global window), tie-group midranks via one hash-agg each, a doc_id
    join, one scalar moment aggregate."""
    from kafka2delta_spark.functions.curation import quality_logits
    from kafka2delta_spark.operators.rankstats import midrank_histogram

    docs = load_table(spark, sf_dir, "documents")
    base = (
        quality_logits(docs)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        # base feeds BOTH midrank maps and the per-doc (x, y) pairing;
        # without a checkpoint each consumer re-runs the regex-heavy
        # quality-logit scan (guide §7.2, duplicated subtrees). One
        # materialization, three consumers.
        .localCheckpoint(eager=False)
    )

    # Doubled midranks are per-DISTINCT-value facts (2·minrank + cnt − 1),
    # so each variable needs only its value histogram — midrank_histogram:
    # one map-side-combined agg each, replacing two global_ranks passes
    # (data-sized range exchange + eager checkpoint + rank join apiece).
    # Both domains are value-bounded (n_chars by document size, the logit
    # by its quantized micro-unit range), the qx53/qx30 rule. The tiny
    # value→midrank maps broadcast back onto the docs (grouped aggregates
    # over bounded domains — the broadcast-policy carve-out).
    def midrank_map(col: str, out: str) -> DataFrame:
        return midrank_histogram(base.select(col), col).select(
            col, (2 * F.col("__mn") + F.col("__cnt") - 1).alias(out)
        )

    dec = "decimal(38,0)"
    xy = (
        base.select("n_chars", "logit_micro")
        .join(F.broadcast(midrank_map("n_chars", "x")), "n_chars")
        .join(F.broadcast(midrank_map("logit_micro", "y")), "logit_micro")
        .select(F.col("x").cast(dec).alias("x"), F.col("y").cast(dec).alias("y"))
    )
    mom = xy.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return mom.select(
        F.col("n").cast("bigint").alias("n"),
        cov.cast("bigint").alias("cov_num"),
        F.floor(
            cov.cast("double")
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double")))
            * 1_000_000
        )
        .cast("bigint")
        .alias("spearman_e6"),
    )


# ---------------------------------------------------------------------------
# qz15: largest-remainder (Hamilton) apportionment of a training token
# budget across sources under q66's √-temperature mixture — the exact
# integer allocation step between "mixture weights" and "how many
# tokens do I actually draw from each source this epoch". Floor quotas
# first, then the leftover seats go to the largest fractional
# remainders (source-name tiebreak) — Σ allocated == budget EXACTLY,
# the property float rounding cannot give.
# ---------------------------------------------------------------------------

EPOCH_BUDGET = 1_000_000  # tokens allocated per epoch


@register(
    "qz15_token_apportionment",
    oracle=f"""
    WITH s AS (
        SELECT source,
               SUM(len(regexp_split_to_array(text, '\\s+'))) AS src_tokens
        FROM documents GROUP BY source),
    tot AS (
        SELECT list_reduce(
                   list_prepend(0.0::DOUBLE,
                       list_transform(list(struct_pack(source := source,
                                                       t := src_tokens)
                                           ORDER BY source),
                                      x -> sqrt(x.t))),
                   (a, b) -> a + b) AS st
        FROM s),
    q AS (
        SELECT s.source, s.src_tokens,
               {EPOCH_BUDGET} * sqrt(s.src_tokens) / tot.st AS quota
        FROM s CROSS JOIN tot),
    fl AS (
        SELECT source, src_tokens, quota,
               CAST(FLOOR(quota) AS BIGINT) AS base,
               quota - FLOOR(quota) AS rem
        FROM q),
    short AS (SELECT {EPOCH_BUDGET} - SUM(base) AS k FROM fl),
    rk AS (
        SELECT source, src_tokens, base, rem,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS r
        FROM fl)
    SELECT rk.source,
           CAST(rk.src_tokens AS BIGINT) AS src_tokens,
           CAST(rk.base AS BIGINT) AS floor_tokens,
           CAST(CASE WHEN rk.r <= short.k THEN 1 ELSE 0 END AS BIGINT)
               AS remainder_seat,
           CAST(rk.base + CASE WHEN rk.r <= short.k THEN 1 ELSE 0 END
               AS BIGINT) AS alloc_tokens
    FROM rk CROSS JOIN short
    """,
)
def qz15_token_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment of a {EPOCH_BUDGET}-token
    epoch across sources with q66's √-temperature weights: integer floor
    quotas plus one remainder seat each for the largest fractional
    parts — Σ alloc_tokens == {EPOCH_BUDGET} exactly, per construction.

    Determinism: the √-weight total is the qx90 order-pinned fold over
    the source-sorted list (NOT a SUM of doubles, whose order differs
    between engines), each quota is two IEEE ops on that identical
    total, remainders order by (rem DESC, source). Plan: one token-count
    scan; everything after is |sources|-sized."""
    docs = load_table(spark, sf_dir, "documents")
    # pinned: the |sources|-sized token totals feed the order-pinned
    # fold AND the quota frame (whose floor/remainder descendants fan
    # out three more ways) — unpinned, the token-count scan re-ran per
    # consumer (docs scanned 6x in one plan)
    s = (
        docs.groupBy("source")
        .agg(
            F.sum(F.size(F.split(F.col("text"), r"\s+"))).alias(
                "src_tokens"
            )
        )
        .localCheckpoint(eager=False)
    )
    tot = s.agg(
        F.expr(
            "aggregate(sort_array(collect_list(struct(source, src_tokens))), "
            "cast(0.0 as double), (a, x) -> a + sqrt(x.src_tokens))"
        ).alias("st")
    )
    q = s.crossJoin(F.broadcast(tot)).select(
        "source",
        "src_tokens",
        (F.lit(EPOCH_BUDGET) * F.sqrt("src_tokens") / F.col("st")).alias(
            "quota"
        ),
    )
    fl = q.select(
        "source",
        "src_tokens",
        F.floor("quota").cast("bigint").alias("base"),
        (F.col("quota") - F.floor("quota")).alias("rem"),
    ).localCheckpoint(eager=False)
    short = fl.agg((F.lit(EPOCH_BUDGET) - F.sum("base")).alias("k"))
    # remainder rank via the qx73 triangular-offset idiom over the
    # |sources|-sized frame — no unpartitioned window even here
    prior = fl.select(
        F.col("source").alias("source2"), F.col("rem").alias("rem2")
    )
    rk = (
        fl.join(
            F.broadcast(prior),
            (F.col("rem2") > F.col("rem"))
            | ((F.col("rem2") == F.col("rem")) & (F.col("source2") < F.col("source"))),
            "left",
        )
        .groupBy("source", "src_tokens", "base", "rem")
        .agg((F.count("source2") + 1).alias("r"))
    )
    return rk.crossJoin(F.broadcast(short)).select(
        "source",
        F.col("src_tokens").cast("bigint").alias("src_tokens"),
        F.col("base").cast("bigint").alias("floor_tokens"),
        F.when(F.col("r") <= F.col("k"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("remainder_seat"),
        (F.col("base") + F.when(F.col("r") <= F.col("k"), 1).otherwise(0))
        .cast("bigint")
        .alias("alloc_tokens"),
    )


# ---------------------------------------------------------------------------
# qz16: Kendall tau-b between the BM25 and query-likelihood rankings
# over the union of their top-10 sets — "do my two retrieval models
# actually disagree enough for RRF fusion (qz06) to matter?" Scores for
# every union member exist under both models, so the comparison is over
# full orderings; the pair expansion is bounded by C(20, 2).
# ---------------------------------------------------------------------------


def _kendall_oracle() -> str:
    from kafka2delta_spark.functions.corpuseval import _rrf_oracle

    # reuse qz06's fused CTE output: rk_bm25 / rk_qld over the union set,
    # NULL = beyond that model's top-10 (tied at "worse than every
    # ranked doc" — encode as rank 11 for both engines)
    return f"""
    WITH fused_rows AS ({_rrf_oracle()}),
    r AS (
        SELECT doc_id,
               COALESCE(rk_bm25, 11) AS ra,
               COALESCE(rk_qld, 11) AS rb
        FROM fused_rows),
    pairs AS (
        SELECT (CASE WHEN (a.ra - b.ra) * (a.rb - b.rb) > 0 THEN 1 ELSE 0 END)
                   AS conc,
               (CASE WHEN (a.ra - b.ra) * (a.rb - b.rb) < 0 THEN 1 ELSE 0 END)
                   AS disc,
               (CASE WHEN a.ra = b.ra AND a.rb <> b.rb THEN 1 ELSE 0 END)
                   AS tie_a,
               (CASE WHEN a.rb = b.rb AND a.ra <> b.ra THEN 1 ELSE 0 END)
                   AS tie_b
        FROM r a JOIN r b ON a.doc_id < b.doc_id),
    m AS (
        SELECT SUM(conc) AS c, SUM(disc) AS d,
               SUM(tie_a) AS ta, SUM(tie_b) AS tb, COUNT(*) AS np
        FROM pairs)
    SELECT CAST(np AS BIGINT) AS n_pairs,
           CAST(c AS BIGINT) AS concordant,
           CAST(d AS BIGINT) AS discordant,
           CAST(FLOOR((c - d) / (sqrt((np - ta)::DOUBLE)
                                 * sqrt((np - tb)::DOUBLE)) * 1000000)
               AS BIGINT) AS tau_b_e6
    FROM m
    """


@register("qz16_kendall_retrieval_agreement", oracle=_kendall_oracle())
def qz16_kendall_retrieval_agreement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Kendall tau-b between the BM25 and query-likelihood rankings over
    the union of their top-10 result sets (docs outside a model's top-10
    tie at rank 11): low agreement justifies fusing them (qz06), tau-b
    near 1 means the second scorer adds nothing.

    Exactness: concordant/discordant/tie counts are integer sums over
    the C(|union|, 2) ≤ 190 pair expansion; tau-b's denominator is two
    sqrts on exact integer operands — floor-e6 of identical doubles.
    Plan: reuses qz06's two rank lists verbatim (they are top-k
    bounded); the pair join is constant-sized at any corpus scale."""
    from kafka2delta_spark.functions.corpuseval import qz06_rrf_hybrid_fusion

    r = (
        qz06_rrf_hybrid_fusion(spark, sf_dir)
        .select(
            "doc_id",
            F.coalesce("rk_bm25", F.lit(11)).alias("ra"),
            F.coalesce("rk_qld", F.lit(11)).alias("rb"),
        )
        # The union set is ≤ 2·RRF_DEPTH rows, but the self-join below
        # would otherwise duplicate the ENTIRE qz06 scoring subtree —
        # measured: 20 parquet scans in the physical plan, two full
        # BM25+QLD corpus pipelines (guide §7.2, duplicated subtrees).
        # Checkpoint the tiny rank list once; the pair expansion then
        # runs on 20 cached rows and the corpus is scored exactly once.
        .localCheckpoint(eager=False)
    )
    a, b = r.alias("a"), r.alias("b")
    da = F.col("a.ra") - F.col("b.ra")
    db = F.col("a.rb") - F.col("b.rb")
    pairs = a.join(b, F.col("a.doc_id") < F.col("b.doc_id")).select(
        F.when(da * db > 0, 1).otherwise(0).alias("conc"),
        F.when(da * db < 0, 1).otherwise(0).alias("disc"),
        F.when((da == 0) & (db != 0), 1).otherwise(0).alias("tie_a"),
        F.when((db == 0) & (da != 0), 1).otherwise(0).alias("tie_b"),
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("np"),
        F.sum("conc").alias("c"),
        F.sum("disc").alias("d"),
        F.sum("tie_a").alias("ta"),
        F.sum("tie_b").alias("tb"),
    )
    return m.select(
        F.col("np").cast("bigint").alias("n_pairs"),
        F.col("c").cast("bigint").alias("concordant"),
        F.col("d").cast("bigint").alias("discordant"),
        F.floor(
            (F.col("c") - F.col("d")).cast("double")
            / (
                F.sqrt((F.col("np") - F.col("ta")).cast("double"))
                * F.sqrt((F.col("np") - F.col("tb")).cast("double"))
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("tau_b_e6"),
    )


# ---------------------------------------------------------------------------
# qz17: p99 inter-arrival tail per event type — the ops-metric
# completion of qx96's full histogram: the single tail number an SLO
# monitors, interpolated exactly in scaled integers off the same gap
# stream, via the q36 histogram bracket.
# ---------------------------------------------------------------------------


@register(
    "qz17_p99_interarrival",
    oracle="""
    WITH g AS (
        -- defined-type contract: the NULL event_type group is excluded
        -- explicitly (the bracket's JOIN USING (event_type) silently
        -- dropped it oracle-side while Spark's groupBy kept it — exposed
        -- by the compound fixture's NULL-type mass-tie rows, r13)
        SELECT event_type,
               (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id)) // 1000000 AS gap_s
        FROM events WHERE event_type IS NOT NULL),
    v AS (SELECT event_type, gap_s FROM g WHERE gap_s IS NOT NULL),
    h AS (SELECT event_type, gap_s, COUNT(*) AS cnt
          FROM v GROUP BY event_type, gap_s),
    c AS (
        SELECT event_type, gap_s, cnt,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY gap_s
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM h),
    t AS (SELECT event_type, SUM(cnt) AS n, MAX(gap_s) AS max_gap
          FROM h GROUP BY event_type),
    b AS (
        SELECT c.event_type, t.n, t.max_gap,
               MIN(CASE WHEN c.cum > 99 * (t.n - 1) // 100
                        THEN c.gap_s END) AS lo,
               MIN(CASE WHEN c.cum > 99 * (t.n - 1) // 100 + 1
                        THEN c.gap_s END) AS hi
        FROM c JOIN t USING (event_type)
        GROUP BY c.event_type, t.n, t.max_gap)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_gaps,
           CAST(max_gap AS BIGINT) AS max_gap_s,
           CAST(100 * lo + ((99 * (n - 1)) % 100)
                * (COALESCE(hi, lo) - lo) AS BIGINT) AS p99_gap_cs
    FROM b
    """,
)
def qz17_p99_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact type-7 p99 of same-type inter-arrival gaps per event type,
    in centi-seconds (100·q stays integer: 100·lo + (99(n−1) mod
    100)·(hi−lo)), plus the max — the SLO tail numbers next to qx96's
    full histogram, off the same gap stream.

    Plan: one user-partitioned lag window builds gaps, then the q36
    histogram bracket (map-side-combined (type, gap) histogram +
    domain-bounded cumulative window + conditional mins). p99 = 99/100
    is non-dyadic, so interpolation happens in scaled integers — the
    q36 discipline verbatim."""
    from kafka2delta_spark.operators.analytic import _histogram_rank_bracket

    # defined-type contract (see oracle): the NULL event_type group is
    # excluded on both engines explicitly — the oracle's JOIN USING
    # (event_type) never matched it, so Spark keeping the group diverged
    # on NULL-type fixtures
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    )
    wl = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    g = ev.select(
        "event_type",
        # integer div: exactly DuckDB's `// 1000000`, no float hop
        ((us - F.lag(us).over(wl)).cast("bigint")).alias("gap_us"),
    ).select(
        "event_type", F.expr("gap_us div 1000000").alias("gap_s")
    ).filter(F.col("gap_s").isNotNull())
    # max(gap_s) folds into the bracket's final histogram agg (the max
    # over distinct values IS the data max): before, the separate
    # groupBy max made g a multi-consumer subtree and the lag-window
    # gap build ran three times (guide §7.2, duplicated subtrees — the
    # helper's old groupBy+join total was the other two).
    br = _histogram_rank_bracket(
        g, "event_type", "gap_s", 99, 100,
        extra_aggs=[F.max("gap_s").alias("max_gap")],
    )
    return br.select(
        "event_type",
        F.col("__n").cast("bigint").alias("n_gaps"),
        F.col("max_gap").cast("bigint").alias("max_gap_s"),
        F.expr(
            "cast(100 * __lo + ((99 * (__n - 1)) % 100)"
            " * (coalesce(__hi, __lo) - __lo) as bigint)"
        ).alias("p99_gap_cs"),
    )


# ---------------------------------------------------------------------------
# qz18: cluster-debiased weighted sampling — the dedup-aware alternative
# to hard-dropping near-duplicates: every document stays eligible, but a
# doc's sampling weight is divided by its q98 near-dup cluster size, so
# a 40-copy boilerplate cluster gets ~one slot's worth of total
# probability instead of 40. Composes q98's exact components with
# qy07's deterministic A-ES sampler.
# ---------------------------------------------------------------------------

DEBIAS_K = 50  # sample size


def _debias_oracle() -> str:
    from kafka2delta_spark.functions.dedup import _JACCARD_PAIRS_SQL
    from kafka2delta_spark.operators.advanced import kmv_hash_duck

    return f"""
    WITH RECURSIVE edges AS (
        SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS_SQL}) jp),
    und AS (SELECT doc_a AS a, doc_b AS b FROM edges
            UNION ALL SELECT doc_b, doc_a FROM edges),
    reach AS (
        SELECT doc_id AS node, doc_id AS root FROM documents
        UNION
        SELECT u.b AS node, r.root FROM reach r JOIN und u ON u.a = r.node),
    cl AS (SELECT node, MIN(root) AS root FROM reach GROUP BY node),
    sz AS (SELECT root, COUNT(*) AS cluster_size FROM cl GROUP BY root),
    w AS (
        SELECT cl.node AS doc_id, sz.cluster_size,
               1000000 // sz.cluster_size AS weight
        FROM cl JOIN sz USING (root)),
    k AS (
        SELECT w.doc_id, d.source, w.cluster_size, w.weight,
               ln(({kmv_hash_duck('w.doc_id')}) / {float(1 << 52)}) / w.weight
                   AS key
        FROM w JOIN documents d ON d.doc_id = w.doc_id),
    t AS (
        SELECT doc_id, source, cluster_size, weight, key
        FROM k ORDER BY key DESC, doc_id LIMIT {DEBIAS_K})
    SELECT doc_id, source,
           CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(weight AS BIGINT) AS weight,
           CAST(FLOOR(key * 1000000000) AS BIGINT) AS key_e9,
           CAST(ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) AS BIGINT)
               AS rk
    FROM t
    """


@register("qz18_cluster_debiased_sample", oracle=_debias_oracle())
def qz18_cluster_debiased_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{DEBIAS_K} deterministic weighted sample with weight =
    10⁶ div near-dup-cluster-size (q98's exact components): duplicated
    content competes for ONE slot's worth of probability instead of one
    per copy — the soft alternative to canonical-only dedup, preserving
    intra-cluster diversity at de-duplicated rates.

    Determinism/exactness: the qy07 A-ES recipe verbatim (u from the
    portable md5 hash, key = ln(u)/w — one ln + one divide on identical
    doubles), integer weights, floor-e9 keys, (key DESC, doc_id)
    tiebreak. Plan: q98's session-checkpointed components (edge-sized
    iterations) + one doc-keyed join + a distributed top-k
    (TakeOrderedAndProject) — never a global sort; the final rank window
    runs on {DEBIAS_K} rows."""
    from kafka2delta_spark.functions.dedup import q98_neardup_clusters
    from kafka2delta_spark.operators.advanced import kmv_hash_spark

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    cl = q98_neardup_clusters(spark, sf_dir).select(
        "doc_id", "cluster_size"
    )
    w = cl.select(
        "doc_id",
        "cluster_size",
        F.expr("1000000 div cluster_size").alias("weight"),
    )
    k = w.join(docs, "doc_id").select(
        "doc_id",
        "source",
        "cluster_size",
        "weight",
        (
            F.log(F.expr(kmv_hash_spark("doc_id")) / F.lit(float(1 << 52)))
            / F.col("weight")
        ).alias("key"),
    )
    top = k.orderBy(F.desc("key"), F.asc("doc_id")).limit(DEBIAS_K)
    wr = W.orderBy(F.desc("key"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "source",
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        F.col("weight").cast("bigint").alias("weight"),
        F.floor(F.col("key") * 1_000_000_000).cast("bigint").alias("key_e9"),
        F.row_number().over(wr).cast("bigint").alias("rk"),
    )
