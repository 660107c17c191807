"""Behavioral / product-analytics operators over the event log (round 6).

Five operators the reference's query surface gestures at (filter/count
over behavioral streams) re-expressed as first-class scale-safe Spark
plans: activity streaks (gaps-and-islands), peak concurrent sessions
(interval sweep), Markov next-event prediction evaluation, seasonal
baseline anomaly flags, and per-user behavioral entropy. All arithmetic
is integer (or one final IEEE op + ROUND(4), the qx05 precedent), so
every query is hash-gated against its DuckDB oracle.

Scale notes are per-query; the common theme: every plan shuffles on
user_id or a calendar key exactly once, all second-level aggregates are
alphabet- or calendar-sized, and nothing holds a per-group multiset
beyond the user's own rows (the natural unit a behavioral feature is
defined over).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka2delta_spark.operators.analytic import sessionize_events
from kafka2delta_spark.queryset import register
from kafka2delta_spark.sources.tables import load_table

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# qx81: longest consecutive-day activity streak per user (gaps and islands)
# ---------------------------------------------------------------------------


@register(
    "qx81_activity_streaks",
    oracle="""
    WITH d AS (
        -- per-user streaks need a defined user: anonymous events would
        -- otherwise pool into one fake "user" (and the correlated
        -- longest-start subquery can never match a NULL key)
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        WHERE user_id IS NOT NULL),
    i AS (
        SELECT user_id, day,
               (day - DATE '1970-01-01')
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
        FROM d),
    s AS (
        SELECT user_id, grp, COUNT(*) AS len, MIN(day) AS start_day
        FROM i GROUP BY user_id, grp)
    SELECT user_id,
           CAST(SUM(len) AS BIGINT)   AS n_active_days,
           CAST(COUNT(*) AS BIGINT)   AS n_streaks,
           CAST(MAX(len) AS BIGINT)   AS longest_streak,
           strftime(MIN(start_day) FILTER (
               WHERE len = (SELECT MAX(s2.len) FROM s s2
                            WHERE s2.user_id = s.user_id)), '%Y-%m-%d')
               AS longest_start
    FROM s GROUP BY user_id
    """,
)
def qx81_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, the count of active days, the number
    of maximal consecutive-day runs, the longest run, and when it began
    (earliest start on ties) — the engagement-streak feature every
    growth dashboard and retention model wants, and the canonical
    "islands" idiom (day_number − row_number is constant within a run).

    Plan: distinct (user, day) — one hash-agg with map-side combine —
    then every window partitions by user_id over at most that user's
    DAY COUNT (bounded by calendar length, not event volume), then one
    more user-keyed agg. The event-volume-sized stage is only the first
    distinct; everything after is calendar-sized per user. Dates are
    emitted as strings (cross-engine DATE stringification rule)."""
    ev = load_table(spark, sf_dir, "events")
    # defined-user contract (see oracle comment)
    d = ev.filter(F.col("user_id").isNotNull()).select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    wu = W.partitionBy("user_id").orderBy("day")
    i = d.withColumn(
        "grp",
        F.datediff("day", F.lit("1970-01-01")) - F.row_number().over(wu),
    )
    s = i.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"), F.min("day").alias("start_day")
    )
    wl = W.partitionBy("user_id")
    return (
        s.withColumn("maxlen", F.max("len").over(wl))
        .groupBy("user_id")
        .agg(
            F.sum("len").cast("bigint").alias("n_active_days"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
            F.max("len").cast("bigint").alias("longest_streak"),
            F.date_format(
                F.min(F.when(F.col("len") == F.col("maxlen"), F.col("start_day"))),
                "yyyy-MM-dd",
            ).alias("longest_start"),
        )
    )


# ---------------------------------------------------------------------------
# qx82: peak concurrent sessions per day — the interval sweep (+1/−1)
# ---------------------------------------------------------------------------

#: shared session-interval CTE: gap-rule sessions reduced to
#: [s_us, e_us] micro-second intervals (inclusive), reusing the exact
#: SESSIONIZED_SQL gap rule via min/max per (user, session_seq).
from kafka2delta_spark.operators.analytic import SESSIONIZED_SQL  # noqa: E402
from kafka2delta_spark.session import local_rows  # noqa: E402


@register(
    "qx82_concurrent_sessions",
    oracle=f"""
    WITH {SESSIONIZED_SQL},
    iv AS (
        SELECT user_id, session_seq,
               MIN(epoch_us(ts)) AS s_us, MAX(epoch_us(ts)) AS e_us
        FROM s GROUP BY user_id, session_seq),
    seg AS (
        SELECT iv.*, t.day,
               (t.day - DATE '1970-01-01') * {DAY_US}::BIGINT AS day_us,
               GREATEST(s_us, (t.day - DATE '1970-01-01') * {DAY_US}::BIGINT)
                   AS a,
               LEAST(e_us, (t.day - DATE '1970-01-01') * {DAY_US}::BIGINT
                           + {DAY_US - 1}) AS b
        FROM iv, LATERAL (
            SELECT UNNEST(generate_series(
                CAST(to_timestamp(s_us / 1000000.0) AS DATE),
                CAST(to_timestamp(e_us / 1000000.0) AS DATE),
                INTERVAL 1 DAY))::DATE AS day) t),
    deltas AS (
        SELECT day, a AS us, 1 AS delta FROM seg
        UNION ALL
        SELECT day, b + 1 AS us, -1 AS delta FROM seg
        WHERE b + 1 <= day_us + {DAY_US - 1}),
    net AS (
        SELECT day, us, SUM(delta) AS net FROM deltas GROUP BY day, us),
    sweep AS (
        SELECT day, us,
               SUM(net) OVER (PARTITION BY day ORDER BY us
                              ROWS UNBOUNDED PRECEDING) AS conc
        FROM net)
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST((SELECT COUNT(*) FROM seg g WHERE g.day = sweep.day)
                AS BIGINT)          AS n_sessions,
           CAST(MAX(conc) AS BIGINT) AS peak_concurrency
    FROM sweep GROUP BY day
    """,
)
def qx82_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per calendar day — the capacity-planning
    statistic — by the classic interval sweep: sessions (the q57 gap
    rule, batch form) become [start, end] µs intervals, clamped to day
    boundaries (a midnight-spanning session counts toward both days),
    then +1/−1 boundary deltas are NETTED PER INSTANT and prefix-summed
    within each day. Netting per (day, us) first makes the sweep
    tie-order-insensitive: concurrency is evaluated on the step
    function's value after all deltas at an instant, identical on both
    engines by construction.

    Plan: sessionization is one user_id shuffle (shared window chain);
    the sweep operates on BOUNDARY rows — two per session-day segment,
    orders of magnitude fewer than events — partitioned by DAY, so the
    running sum never sees an unpartitioned window and each day's sweep
    is an independent task. At 100 TB the boundary table is
    session-count-sized; a single hot day still holds only that day's
    session boundaries. The −1 that would land exactly on the next
    midnight is dropped (the per-day max is always attained at a +1
    instant, so the step function's maximum is unaffected)."""
    s = sessionize_events(load_table(spark, sf_dir, "events"))
    iv = s.groupBy("user_id", "session_seq").agg(
        F.min(F.unix_micros("ts")).alias("s_us"),
        F.max(F.unix_micros("ts")).alias("e_us"),
    )
    return concurrency_from_intervals(iv)


def concurrency_from_intervals(iv: DataFrame) -> DataFrame:
    """qx82's day-clamped sweep over a (s_us, e_us) session-interval
    frame — shared with the streaming-maintained qx99, whose state table
    IS that interval set (gap-merge maintained, so the derived sweep
    equals the batch answer and qx82's oracle applies verbatim)."""
    seg = (
        iv.withColumn(
            "day",
            F.explode(
                F.sequence(
                    F.to_date(F.timestamp_micros("s_us")),
                    F.to_date(F.timestamp_micros("e_us")),
                )
            ),
        )
        .withColumn(
            "day_us",
            F.datediff("day", F.lit("1970-01-01")).cast("bigint")
            * F.lit(DAY_US).cast("bigint"),
        )
        .select(
            "day",
            "day_us",
            F.greatest("s_us", F.col("day_us")).alias("a"),
            F.least("e_us", F.col("day_us") + F.lit(DAY_US - 1)).alias("b"),
        )
        # pinned: the boundary segments (session-count-sized, far below
        # the event count) feed both delta branches AND the per-day
        # session counts — unpinned, the sessionize pipeline re-ran per
        # consumer (events scanned 3x in qx82's plan)
        .localCheckpoint(eager=False)
    )
    deltas = seg.select(
        "day", F.col("a").alias("us"), F.lit(1).alias("delta")
    ).unionByName(
        seg.filter(F.col("b") + 1 <= F.col("day_us") + F.lit(DAY_US - 1)).select(
            "day", (F.col("b") + 1).alias("us"), F.lit(-1).alias("delta")
        )
    )
    net = deltas.groupBy("day", "us").agg(F.sum("delta").alias("net"))
    sweep = net.withColumn(
        "conc",
        F.sum("net").over(
            W.partitionBy("day").orderBy("us").rowsBetween(
                W.unboundedPreceding, 0
            )
        ),
    )
    n_per_day = seg.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    return (
        sweep.groupBy("day")
        .agg(F.max("conc").cast("bigint").alias("peak_concurrency"))
        .join(n_per_day, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_sessions",
            "peak_concurrency",
        )
    )


# ---------------------------------------------------------------------------
# qx86: Markov next-event prediction — train + evaluate inside the engine
# ---------------------------------------------------------------------------


@register(
    "qx86_markov_prediction_eval",
    oracle="""
    WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events),
    t AS (
        SELECT from_type, to_type, COUNT(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type),
    pred AS (
        SELECT from_type, to_type AS predicted FROM t
        QUALIFY ROW_NUMBER() OVER (PARTITION BY from_type
                                   ORDER BY n DESC, to_type) = 1)
    SELECT t.from_type, p.predicted,
           CAST(SUM(t.n) AS BIGINT) AS n_total,
           CAST(COALESCE(SUM(t.n) FILTER (WHERE t.to_type = p.predicted), 0)
                AS BIGINT) AS n_hits,
           CAST(COALESCE(SUM(t.n) FILTER (WHERE t.to_type = p.predicted), 0)
                * 10000 // SUM(t.n) AS BIGINT) AS hit_rate_e4
    FROM t JOIN pred p USING (from_type)
    GROUP BY t.from_type, p.predicted
    """,
)
def qx86_markov_prediction_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a first-order Markov next-event predictor (argmax of qx25's
    transition counts, alphabetical tiebreak) and evaluate its top-1 hit
    rate per source state, entirely inside the engine — the
    model-eval-as-a-query pattern (train = eval corpus, documented:
    this measures the ceiling of a memorizing baseline, the number a
    real sequence model must beat).

    Plan: one user_id shuffle for the LEAD pairs, then every aggregate
    is |event-type alphabet|²-sized — the transition matrix, the argmax
    window, and the final join all operate on metadata. Exact integers;
    the hit rate is integer-e4 (div truncation identical on both
    engines)."""
    ev = load_table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(wu).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    # pinned: the alphabet²-sized transition matrix feeds the argmax
    # window AND the evaluation join — unpinned, the LEAD-window pass
    # re-ran per consumer (events scanned 2x in one plan)
    t = (
        seq.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    wp = W.partitionBy("from_type").orderBy(F.desc("n"), F.asc("to_type"))
    pred = (
        t.withColumn("rk", F.row_number().over(wp))
        .filter(F.col("rk") == 1)
        .select("from_type", F.col("to_type").alias("predicted"))
    )
    hits = F.coalesce(
        F.sum(F.when(F.col("to_type") == F.col("predicted"), F.col("n"))),
        F.lit(0),
    )
    return (
        t.join(F.broadcast(pred), "from_type")
        .groupBy("from_type", "predicted")
        .agg(
            F.sum("n").cast("bigint").alias("n_total"),
            hits.cast("bigint").alias("n_hits"),
        )
        .select(
            "from_type",
            "predicted",
            "n_total",
            "n_hits",
            F.expr("cast(n_hits * 10000 div n_total as bigint)").alias(
                "hit_rate_e4"
            ),
        )
    )


# ---------------------------------------------------------------------------
# qx89: day-of-week seasonal baseline + deviation flags
# ---------------------------------------------------------------------------

#: per-type triage depth: the K most-above- and K most-below-baseline days
SEASONAL_TOP_K = 3


@register(
    "qx89_seasonal_anomaly_days",
    oracle=f"""
    WITH dates AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    dd AS (SELECT day, dayofweek(day) AS dow FROM dates),
    types AS (SELECT DISTINCT event_type FROM events),
    cnt AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
    grid AS (
        SELECT t.event_type, d.day, d.dow, COALESCE(c.n, 0) AS n
        FROM types t CROSS JOIN dd d
        LEFT JOIN cnt c ON c.event_type = t.event_type AND c.day = d.day),
    base AS (
        SELECT event_type, dow, SUM(n) AS tot, COUNT(*) AS den
        FROM grid GROUP BY event_type, dow),
    scored AS (
        SELECT g.event_type, g.day, g.n, b.tot, b.den,
               g.n * b.den * 10000 // b.tot AS ratio_e4,
               ROW_NUMBER() OVER (PARTITION BY g.event_type
                                  ORDER BY g.n * b.den * 10000 // b.tot DESC,
                                           g.day) AS rk_hi,
               ROW_NUMBER() OVER (PARTITION BY g.event_type
                                  ORDER BY g.n * b.den * 10000 // b.tot ASC,
                                           g.day) AS rk_lo
        FROM grid g JOIN base b
          ON b.event_type = g.event_type AND b.dow = g.dow
        WHERE b.tot > 0)
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(n AS BIGINT)        AS n,
           CAST(tot AS BIGINT)      AS dow_total,
           CAST(den AS BIGINT)      AS n_dow_dates,
           CAST(ratio_e4 AS BIGINT) AS ratio_e4,
           CASE WHEN rk_hi <= {SEASONAL_TOP_K} THEN 'high' ELSE 'low' END
               AS direction,
           CAST(CASE WHEN rk_hi <= {SEASONAL_TOP_K} THEN rk_hi ELSE rk_lo END
                AS BIGINT) AS rk
    FROM scored
    WHERE rk_hi <= {SEASONAL_TOP_K} OR rk_lo <= {SEASONAL_TOP_K}
    """,
)
def qx89_seasonal_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal deviation triage: each (event_type, date)
    daily count is compared to that type's SAME-DOW average across the
    corpus (the seasonality-aware version of qx38's rolling z-score —
    a Monday is judged against Mondays), and the {SEASONAL_TOP_K} days
    farthest ABOVE and BELOW baseline per type are emitted, rank-based
    rather than fixed-threshold (a threshold that fires on a small
    corpus is silent at 100× the data as daily counts concentrate —
    measured here across sf0.001→sf0.1; the triage list is
    scale-invariant). Zero-count days are materialized via the
    (types × dates) grid so silent outages — the anomaly that matters
    most — rank at the very top of 'low'.

    Plan: one event-volume-sized hash-agg to daily counts with map-side
    combine; the grid, baselines, ratios, and rank windows are all
    (|types| × |dates|)-sized — calendar metadata, broadcast-joined.
    The ratio is exact integer cross-multiplication (n·den·1e4 div tot)
    — no float baseline ever exists to diverge; ranking tiebreak is the
    date, total on both engines."""
    ev = load_table(spark, sf_dir, "events")
    # one events pass: day/type distincts read off the (type, day)
    # count table (every event contributes a count row, so they are
    # identical sets), and the grid is pinned before its two consumers
    # (baseline agg + scored join) — events scanned once, not six
    # times (guide §2.4/§7.2)
    cnt = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    dd = cnt.select("day").distinct().select(
        "day", F.dayofweek("day").alias("dow")
    )
    types = cnt.select("event_type").distinct()
    grid = (
        types.crossJoin(dd)
        .join(cnt, ["event_type", "day"], "left")
        .select(
            "event_type", "day", "dow", F.coalesce("n", F.lit(0)).alias("n")
        )
        .localCheckpoint(eager=False)
    )
    base = grid.groupBy("event_type", "dow").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("den")
    )
    ratio = F.expr("cast(n * den * 10000 div tot as bigint)")
    scored = (
        grid.join(F.broadcast(base), ["event_type", "dow"])
        .filter(F.col("tot") > 0)
        .withColumn("ratio_e4", ratio)
        .withColumn(
            "rk_hi",
            F.row_number().over(
                W.partitionBy("event_type").orderBy(
                    F.desc("ratio_e4"), F.asc("day")
                )
            ),
        )
        .withColumn(
            "rk_lo",
            F.row_number().over(
                W.partitionBy("event_type").orderBy(
                    F.asc("ratio_e4"), F.asc("day")
                )
            ),
        )
    )
    k = SEASONAL_TOP_K
    return scored.filter(
        (F.col("rk_hi") <= k) | (F.col("rk_lo") <= k)
    ).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("bigint").alias("n"),
        F.col("tot").cast("bigint").alias("dow_total"),
        F.col("den").cast("bigint").alias("n_dow_dates"),
        "ratio_e4",
        F.when(F.col("rk_hi") <= k, "high").otherwise("low").alias("direction"),
        F.when(F.col("rk_hi") <= k, F.col("rk_hi"))
        .otherwise(F.col("rk_lo"))
        .cast("bigint")
        .alias("rk"),
    )


# ---------------------------------------------------------------------------
# qx90: per-user behavioral entropy (event-type distribution)
# ---------------------------------------------------------------------------


@register(
    "qx90_user_type_entropy",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS k
        FROM events GROUP BY user_id, event_type),
    u AS (
        SELECT user_id,
               SUM(k)                    AS n,
               COUNT(*)                  AS n_types,
               -- left-fold the ln terms in event_type order (0.0 seed):
               -- matches Spark's aggregate() over the sorted struct list
               -- addition-for-addition, so the float sum is bit-identical
               list_reduce(
                   list_prepend(0.0::DOUBLE,
                       list_transform(list(k ORDER BY event_type),
                                      x -> x::DOUBLE * ln(x))),
                   (a, b) -> a + b)      AS sxlx
        FROM c GROUP BY user_id)
    SELECT user_id,
           CAST(n AS BIGINT)       AS n_events,
           CAST(n_types AS BIGINT) AS n_types,
           ROUND(ln(n) - sxlx / n, 4) AS entropy
    FROM u
    """,
)
def qx90_user_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type distribution — the
    behavioral-diversity signal (near-zero entropy = single-action bots
    / scripted traffic; high entropy = organic engagement), the same
    curation role qx05's KL plays for corpus mixtures. Closed form
    H = ln(n) − (Σ kᵢ·ln kᵢ)/n keeps all inputs exact integers. The
    per-term ln is one IEEE op on identical integer inputs (the
    qx05/qx65 precedent), but the SUM of those ln terms is float — and
    float addition is order-sensitive, so a partial-aggregation order
    difference between engines could flip the 4th decimal on boundary
    values. The fold is therefore made order-DETERMINISTIC on both
    sides: collect the per-user (type, k) list, sort it by event_type
    (unique within a user), and left-fold acc + k·ln(k) from a 0.0 seed
    — Spark's ``aggregate`` over ``sort_array(collect_list(struct))``
    and DuckDB's ``list_reduce`` over ``list(... ORDER BY event_type)``
    perform the same additions in the same order, so the sum is
    bit-identical, not just close. The list is per-user ≤ |type
    alphabet| (bounded), so no unbounded aggregation buffer appears.

    Plan: one hash-agg to (user, type) counts with map-side combine —
    user-alphabet-sized output — then a user-keyed reagg of ≤|types|
    rows each. Nothing beyond the first agg is event-volume-sized."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("k"))
    u = c.groupBy("user_id").agg(
        F.sum("k").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.expr(
            "aggregate(sort_array(collect_list(struct(event_type, k))), "
            "cast(0.0 as double), (acc, s) -> acc + s.k * ln(s.k))"
        ).alias("sxlx"),
    )
    return u.select(
        "user_id",
        F.col("n").alias("n_events"),
        "n_types",
        F.round(F.log(F.col("n")) - F.col("sxlx") / F.col("n"), 4).alias(
            "entropy"
        ),
    )


# ---------------------------------------------------------------------------
# qx96: inter-arrival time distribution per event type — exact log2
# histograms of the gaps between a user's consecutive events of the same
# type. The operational-health fingerprint of a stream: bot traffic
# shows up as mass in the lowest buckets, batch backfills as a spike at
# one bucket, organic traffic as a smooth heavy tail. Bucketing is a
# fixed integer CASE ladder (bucket k ⟺ gap_s ∈ [2^(k−1), 2^k), bucket
# 0 = sub-second) — no log() call anywhere, so there is no float
# boundary to diverge between engines.
# ---------------------------------------------------------------------------

INTERARRIVAL_MAX_BUCKET = 21  # gaps >= 2^20 s (~12 days) collapse here


def _log2_bucket_sql(col: str) -> str:
    """Portable CASE ladder: 0 for gap 0, k for [2^(k-1), 2^k)."""
    branches = [f"WHEN {col} < 1 THEN 0"]
    for k in range(1, INTERARRIVAL_MAX_BUCKET):
        branches.append(f"WHEN {col} < {1 << k} THEN {k}")
    return (
        "CASE " + " ".join(branches) + f" ELSE {INTERARRIVAL_MAX_BUCKET} END"
    )


@register(
    "qx96_interarrival_histogram",
    oracle=f"""
    WITH g AS (
        -- defined-user contract: gaps derive from a per-USER ordering;
        -- pooling anonymous events as one pseudo-user would measure gaps
        -- between different real people (and the streaming sibling
        -- qy10's keyed ledger cannot address a NULL key)
        SELECT event_type,
               (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id)) // 1000000 AS gap_s
        FROM events WHERE user_id IS NOT NULL),
    b AS (
        SELECT event_type, gap_s, {_log2_bucket_sql('gap_s')} AS bucket
        FROM g WHERE gap_s IS NOT NULL),
    t AS (SELECT event_type, COUNT(*) AS tot FROM b GROUP BY event_type)
    SELECT b.event_type, CAST(b.bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT)  AS n,
           CAST(MIN(b.gap_s) AS BIGINT) AS min_gap_s,
           CAST(MAX(b.gap_s) AS BIGINT) AS max_gap_s,
           CAST(COUNT(*) * 10000 // t.tot AS BIGINT) AS share_e4
    FROM b JOIN t ON t.event_type = b.event_type
    GROUP BY b.event_type, b.bucket, t.tot
    """,
)
def qx96_interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact log₂ histogram of same-type inter-arrival gaps per event
    type (whole seconds; bucket k covers [2^(k−1), 2^k) s, 0 =
    sub-second, {INTERARRIVAL_MAX_BUCKET} = ≥2^{INTERARRIVAL_MAX_BUCKET - 1} s)
    with per-bucket min/max gaps and integer share — see the section
    comment for what the shape diagnoses.

    Plan: one shuffle on (user, type) for the lag window (total order
    via the unique event_id), then hash-aggs on the
    (|types| × {INTERARRIVAL_MAX_BUCKET + 1})-sized bucket alphabet; the
    per-type totals broadcast back. The bucket expression is a constant
    integer CASE ladder — whole-stage codegen, engine-identical, no
    floats."""
    # defined-user contract (see oracle comment)
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
    )
    wu = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu))
            / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    b = g.select(
        "event_type",
        "gap_s",
        F.expr(_log2_bucket_sql("gap_s")).cast("int").alias("bucket"),
    )
    # ONE events pass: the per-type total is the sum of the bucket
    # counts (every gap lands in exactly one bucket), so it reads off
    # the pinned alphabet-sized bucket aggregate instead of re-running
    # the lag-window pipeline a second time (events scanned 2x before)
    hist = (
        b.groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("gap_s").cast("bigint").alias("min_gap_s"),
            F.max("gap_s").cast("bigint").alias("max_gap_s"),
        )
        .localCheckpoint(eager=False)
    )
    t = hist.groupBy("event_type").agg(F.sum("n").alias("tot"))
    return (
        hist
        .join(F.broadcast(t), "event_type")
        .select(
            "event_type",
            "bucket",
            "n",
            "min_gap_s",
            "max_gap_s",
            F.expr("cast(n * 10000 div tot as bigint)").alias("share_e4"),
        )
    )


# ---------------------------------------------------------------------------
# qx98: autocorrelation of the daily count series per event type — the
# statistical companion to qx64 (CUSUM level shifts) and qx89 (seasonal
# triage): ACF at lag 1/2 measures short-term momentum, lag 7 confirms
# (or refutes) weekly seasonality with a number instead of a rank list.
# Series are evaluated on the DENSE calendar grid (zero-count days
# materialized), since missing days silently misalign lagged pairs.
# Exactness: all sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are
# exact integers; Pearson r is one IEEE sqrt/divide + ROUND(4) at the
# end (the qx74 contract).
# ---------------------------------------------------------------------------

ACF_LAGS = (1, 2, 7)


def _acf_oracle() -> str:
    lags = ", ".join(str(lag) for lag in ACF_LAGS)
    return f"""
    WITH dates AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    cnt AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
    grid AS (
        SELECT t.event_type, d.day, COALESCE(c.n, 0) AS n
        FROM types t CROSS JOIN dates d
        LEFT JOIN cnt c ON c.event_type = t.event_type AND c.day = d.day),
    pairs AS (
        SELECT a.event_type, l.lag, a.n AS x, b.n AS y
        FROM grid a
        CROSS JOIN (SELECT UNNEST([{lags}]) AS lag) l
        JOIN grid b ON b.event_type = a.event_type
                   AND b.day = a.day + CAST(l.lag AS INT)),
    s AS (
        SELECT event_type, lag,
               COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM pairs GROUP BY event_type, lag)
    SELECT event_type, CAST(lag AS INT) AS lag,
           CAST(k AS BIGINT) AS n_pairs,
           CAST(k * sxy - sx * sy AS BIGINT) AS cov_num,
           CASE WHEN (k * sxx - sx * sx) > 0 AND (k * syy - sy * sy) > 0
                THEN ROUND((k * sxy - sx * sy) /
                           (SQRT(CAST(k * sxx - sx * sx AS DOUBLE))
                            * SQRT(CAST(k * syy - sy * sy AS DOUBLE))), 4)
                ELSE NULL END AS acf
    FROM s
    """


@register("qx98_daily_count_acf", oracle=_acf_oracle())
def qx98_daily_count_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of each event type's daily count series at lags
    {ACF_LAGS} over the dense calendar grid — see the section comment
    for the monitoring role and the exactness contract (integer
    sufficient statistics, one IEEE sqrt/divide, ROUND(4); zero-variance
    series yield NULL instead of dividing by zero).

    Plan: ONE event-volume hash-agg to (type, day) counts — the
    distinct day and type sets read off that count table (every event
    row contributes a count row, so the distincts are identical), not
    off their own event scans, and the dense grid is pinned before its
    lagged self-join so events are scanned once, not six times (guide
    §2.4/§7.2; the scan-dup audit counted 6). The grid, the lagged
    self-join (keyed on (type, day) — calendar metadata), and the
    sufficient-statistic aggregate are all (|types| × |dates|)-sized.
    Lagged pairs come from a join rather than a window so the plan
    stays declarative over the grid; at any scale this stage is
    calendar-bounded."""
    ev = load_table(spark, sf_dir, "events")
    cnt = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    dates = cnt.select("day").distinct()
    types = cnt.select("event_type").distinct()
    grid = (
        types.crossJoin(dates)
        .join(cnt, ["event_type", "day"], "left")
        .select("event_type", "day", F.coalesce("n", F.lit(0)).alias("n"))
        .localCheckpoint(eager=False)
    )
    lags = local_rows(spark, [(lag,) for lag in ACF_LAGS], "lag int")
    a = grid.crossJoin(F.broadcast(lags))
    b = grid.select(
        F.col("event_type").alias("event_type_b"),
        F.col("day").alias("day_b"),
        F.col("n").alias("y"),
    )
    pairs = a.join(
        b,
        (F.col("event_type_b") == F.col("event_type"))
        & (F.col("day_b") == F.date_add(F.col("day"), F.col("lag"))),
    ).select("event_type", "lag", F.col("n").alias("x"), "y")
    s = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    dx = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("k") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("k").cast("bigint").alias("n_pairs"),
        num.cast("bigint").alias("cov_num"),
        F.when(
            (dx > 0) & (dy > 0),
            F.round(
                num / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))),
                4,
            ),
        ).alias("acf"),
    )


#: the q57/qx39 sessionization gap, in microseconds (30 min)
GAP_US = 30 * 60 * 1_000_000


def merge_gap_intervals(iv: DataFrame) -> DataFrame:
    """Gap-tolerant interval union per user: merge (user_id, s_us, e_us)
    intervals whose gap is ≤ the session GAP rule (next.s − prev.e ≤
    {GAP_US} µs, i.e. NOT a session break, matching SESSIONIZED_SQL's
    strict ``> gap`` split). This is a CLOSURE operation on interval
    sets: merging in stages over any partition of the events (degenerate
    per-event intervals, per-batch pre-merged intervals, prior state)
    yields the same final intervals as sessionizing all events at once —
    an interval's interior never contains a >gap hole by construction,
    so cross-stage merges depend only on the boundary times that are
    preserved. That closure property is what makes qx99's maintenance
    IDEMPOTENT (set union + re-merge), the qx92 replay contract.

    Plan: one shuffle on user_id; the running boundary max and the
    group numbering are windows over each user's own intervals."""
    w = W.partitionBy("user_id").orderBy("s_us", "e_us")
    cummax_prev_e = F.max("e_us").over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = iv.withColumn(
        "__new",
        F.when(
            cummax_prev_e.isNull()
            | (F.col("s_us") > cummax_prev_e + GAP_US),
            1,
        ).otherwise(0),
    )
    grp = F.sum("__new").over(w.rowsBetween(W.unboundedPreceding, 0))
    return (
        flagged.withColumn("__grp", grp)
        .groupBy("user_id", "__grp")
        .agg(
            F.min("s_us").alias("s_us"),
            F.max("e_us").alias("e_us"),
        )
        .drop("__grp")
    )
