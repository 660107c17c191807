"""As-of and range joins.

Spark has no native ASOF JOIN (SURVEY §2.2 gap). Two scale-conscious
implementations:

  * :func:`asof_join` — the union + last-value-window technique: tag both
    sides, union by (key, ts), one window pass carrying the right side's
    values forward with ``last(..., ignorenulls=True)``. Cost: ONE shuffle +
    sort on the key — identical asymptotics to a window aggregate. Never
    builds the (left × right-history) intermediate a naive inequality join
    would (which at 100 TB is the difference between a sort and an
    explosion).
  * range join — expressed as an equi-join on the key with the range
    predicate in the join condition; Spark executes the equi-part as a
    hash/sort-merge join and applies the range as a join filter. For
    key-less range joins, bucketize the range key first (not needed here —
    all our ranges are keyed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka2delta_spark.queryset import register
from kafka2delta_spark.sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right-side values —
    ``direction="backward"`` (default): latest right row with
    ``right.ts <= left.ts``; ``direction="forward"``: earliest right row
    with ``right.ts >= left.ts``. Equal timestamps match in both modes.
    Same single-shuffle union+window shape either way (forward just flips
    the tiebreak order and the window frame).

    Output: all left columns + one ``<value><suffix>`` column per value col
    (NULL when no right row exists in the given direction).

    NULL join keys follow SQL ASOF JOIN semantics: a NULL key never
    matches (NULL = NULL is not true), so left rows with a NULL key come
    back with NULL as-of values. The window implementation would silently
    do the OPPOSITE — ``partitionBy`` groups all NULL keys into ONE
    partition, "matching" anonymous rows to each other — so the right
    side drops NULL-key rows before the union (the null-key left rows
    then share a partition containing no right rows, which yields exactly
    the LEFT JOIN NULL).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")
    for k in on:
        right = right.filter(F.col(k).isNotNull())
    left_cols = left.columns
    tagged_left = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_cols if c not in on and c != left_ts],
        F.col(left_ts),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in value_cols],
    )
    tagged_right = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left_cols
            if c not in on and c != left_ts
        ],
        F.lit(None).cast(dict(left.dtypes)[left_ts]).alias(left_ts),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    if direction == "backward":
        # right rows (__is_left=0) sort before left rows at equal ts →
        # ties match; carry the last right value seen so far forward
        w = (
            W.partitionBy(*on)
            .orderBy("__ts", "__is_left")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        pick = F.last
    else:
        # forward: left rows sort before right rows at equal ts → a tied
        # right row is inside the following frame; take the first ahead
        w = (
            W.partitionBy(*on)
            .orderBy("__ts", F.desc("__is_left"))
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        pick = F.first
    carried = unioned.select(
        *unioned.columns,
        *[
            pick(f"__r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("__is_left") == 1).select(
        *left_cols, *[f"{c}{suffix}" for c in value_cols]
    )


@register(
    "q60_asof_last_view_before_purchase",
    oracle="""
    WITH purchases AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
         views     AS (SELECT user_id, ts, event_id FROM events
                       WHERE event_type = 'view')
    SELECT p.event_id, p.user_id,
           CAST(date_diff('second', v.ts, p.ts) AS BIGINT) AS secs_since_view
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
)
def q60_asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each purchase gets the latest preceding view.
    Output is the gap in seconds (NULL when the user never viewed before
    buying) — avoids comparing raw nullable timestamps across engines."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    joined = asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts", value_cols=["ts"]
    )
    return joined.select(
        "event_id",
        "user_id",
        (F.unix_timestamp("ts") - F.unix_timestamp("ts_asof"))
        .cast("bigint")
        .alias("secs_since_view"),
    )


@register(
    "q61_range_join_clicks_before_purchase",
    oracle="""
    WITH purchases AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
         clicks    AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id,
           COUNT(c.ts) AS n_clicks_1h
    FROM purchases p
    LEFT JOIN clicks c
      ON c.user_id = p.user_id
     AND c.ts >  p.ts - INTERVAL 1 HOUR
     AND c.ts <= p.ts
    GROUP BY p.event_id
    """,
)
def q61_range_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed range join: clicks within the hour before each purchase.
    Catalyst executes the user_id equi-part as the join key and the time
    range as a join filter — no cross product."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    return (
        purchases.join(
            clicks,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("c_ts") > F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") <= F.col("p_ts")),
            "left",
        )
        .groupBy("event_id")
        .agg(F.count("c_ts").alias("n_clicks_1h"))
    )


@register(
    "qx09_asof_next_view_after_purchase",
    oracle="""
    WITH purchases AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
         views     AS (SELECT user_id, ts FROM events
                       WHERE event_type = 'view')
    SELECT p.event_id, p.user_id,
           CAST(date_diff('second', p.ts, v.ts) AS BIGINT) AS secs_to_next_view
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND v.ts >= p.ts
    """,
)
def qx09_asof_next_view_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — the other half of the as-of pair (q60 is
    backward): each purchase gets the EARLIEST view at-or-after it, the
    shape of did-the-user-come-back / time-to-next-touch attribution.
    Same single-shuffle union+window plan as q60 with the frame flipped;
    DuckDB's native ASOF with ``v.ts >= p.ts`` is the oracle."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    joined = asof_join(
        purchases, views, on=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["ts"], direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        (F.unix_timestamp("ts_asof") - F.unix_timestamp("ts"))
        .cast("bigint")
        .alias("secs_to_next_view"),
    )
