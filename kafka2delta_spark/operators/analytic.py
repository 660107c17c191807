"""Window functions, pivot/unpivot, statistics, and scalar-function surface.

The reference uses exactly one window function (``row_number`` for dedup,
ref stream/stream.py:92-96); this module supplies the full ranking/analytic
set SURVEY §2.2 requires. Every ordering inside a window includes a unique
tie-breaker column so results are deterministic (a window frame over a
non-unique ordering is nondeterministic by definition — both engines would
be free to disagree).

Scale: window functions shuffle once on the partition key then sort within
partitions. Partition keys here (custkey / suppkey / user_id) are
high-cardinality, so partitions stay small; a single low-cardinality
partition key (e.g. a global ORDER BY rank) would serialize on one task and
is avoided except in the explicitly-global q33.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka2delta_spark.operators.rankstats import exact_percentiles_by_rank
from kafka2delta_spark.queryset import register
from kafka2delta_spark.functions.measure import ascii_lower
from kafka2delta_spark.functions.measure import finite as finite_m
from kafka2delta_spark.functions.measure import v1000 as v1000_m
from kafka2delta_spark.sources.tables import load_table


@register(
    "q30_running_order_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w, 2)
                AS DOUBLE)                     AS running_total,
           ROW_NUMBER() OVER w                 AS order_seq,
           ROUND(LAG(o_totalprice) OVER w, 2)  AS prev_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q30_running_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + row_number + lag in one window pass (one shuffle on
    o_custkey, shared by all three functions)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wo = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w), 2)
        .cast("double").alias("running_total"),
        F.row_number().over(wo).alias("order_seq"),
        F.round(F.lag("o_totalprice").over(wo), 2).alias("prev_price"),
    )


@register(
    "q31_topk_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, ROUND(o_totalprice, 2) AS price, rk
    FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                 RANK() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders)
    WHERE rk <= 3
    """,
)
def q31_topk_orders_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ranking window + filter — the canonical Spark
    top-k-per-group (scan stays pruned to 3 columns)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.rank().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@register(
    "q32_moving_avg_quantity",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           ROUND(AVG(l_quantity) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mavg_qty
    FROM lineitem
    WHERE l_suppkey <= 5
    """,
)
def q32_moving_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame (moving average)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 5)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-3, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.avg("l_quantity").over(w), 4).alias("mavg_qty"),
    )


@register(
    "q33_customer_percentiles",
    oracle="""
    SELECT c_custkey,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6)    AS cume,
           NTILE(10) OVER w                AS decile
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def q33_customer_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global percentile analytics WITHOUT the global window.

    A naive ``W.orderBy(...)`` (no partition key) sends every row to ONE
    WindowExec task — fine at sf0.1, serialized at 100×. Scale-safe
    two-pass global rank instead:

      1. ``repartitionByRange`` on the sort key → range partition i holds
         strictly smaller keys than partition i+1; per-partition
         ``row_number`` needs only a local sort (parallel).
      2. Per-partition row counts (tiny — one row per partition) → prefix
         offsets via a window over that metadata-sized side, broadcast back.
         global_rank = offset + local row_number.

    The sort key (c_acctbal, c_custkey) is unique, so rank == row_number and
    percent_rank/cume_dist/ntile reduce to exact arithmetic on the global
    rank — results are bit-identical to the single-window plan (same oracle).
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    wp = W.partitionBy("__pid").orderBy("c_acctbal", "c_custkey")
    # NOT pinned: measured — checkpointing this for its two consumers
    # (per-partition counts + final join) ran 0.9 s -> 4.7 s; the
    # duplicate subtree is one range exchange + local-sort window whose
    # parallel re-run is far cheaper than a full-width row
    # materialization barrier
    ranked = (
        cust.repartitionByRange(n_parts, "c_acctbal", "c_custkey")
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__rn", F.row_number().over(wp))
    )
    counts = ranked.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    # prefix-sum over per-partition counts via a broadcast triangular
    # self-join — counts is metadata-sized (== n_parts rows), so the O(p²)
    # pairing is trivial and avoids any unpartitioned window entirely
    prior = counts.select(
        F.col("__pid").alias("__pid2"), F.col("__cnt").alias("__cnt2")
    )
    offsets = (
        counts.join(F.broadcast(prior), F.col("__pid2") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__cnt2"), F.lit(0)).alias("__off"))
    )
    totals = counts.agg(F.sum("__cnt").alias("__n"))

    rk = F.col("__rn") + F.col("__off")
    n = F.col("__n")
    # NTILE(10) arithmetic: first (n % 10) buckets get floor(n/10)+1 rows
    q, r = F.floor(n / 10), n % 10
    boundary = r * (q + 1)
    decile = F.when(rk <= boundary, F.floor((rk - 1) / (q + 1)) + 1).otherwise(
        r + F.floor((rk - 1 - boundary) / F.greatest(q, F.lit(1))) + 1
    )
    return (
        ranked.join(F.broadcast(offsets), "__pid")
        .crossJoin(F.broadcast(totals))
        .select(
            "c_custkey",
            F.round((rk - 1) / F.greatest(n - 1, F.lit(1)), 6).alias("pct_rank"),
            F.round(rk / n, 6).alias("cume"),
            decile.cast("int").alias("decile"),
        )
    )


@register(
    "q34_event_gaps",
    oracle="""
    SELECT user_id, event_id,
           CAST(date_diff('second', LAG(ts) OVER w, ts) AS BIGINT) AS gap_s,
           LEAD(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q34_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag over an event stream — the batch form of stream
    sessionization's gap computation."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_timestamp TRUNCATES fractional seconds toward zero — exactly
    # DuckDB date_diff('second')'s per-endpoint semantics (probed on
    # pre-1970 fractional timestamps: date_diff(-0.5s, +0.7s) = 0, not
    # the floor-diff 1), so the pair stays engine-exact on skewed clocks
    return ev.select(
        "user_id",
        "event_id",
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
        .cast("bigint")
        .alias("gap_s"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q35_first_last_per_nation",
    oracle="""
    WITH ranked AS (
        SELECT c_nationkey, c_name, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal, c_custkey)       AS rn_asc,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey DESC) AS rn_desc
        FROM customer)
    SELECT c_nationkey,
           MIN(c_acctbal)                                  AS min_bal,
           MAX(c_acctbal)                                  AS max_bal,
           MAX(CASE WHEN rn_asc  = 1 THEN c_name END)      AS poorest,
           MAX(CASE WHEN rn_desc = 1 THEN c_name END)      AS richest
    FROM ranked
    GROUP BY c_nationkey
    """,
)
def q35_first_last_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (arg-min/arg-max) — hash-agg, no window sort. The
    struct ordering tie-breaks on c_custkey deterministically."""
    cust = load_table(spark, sf_dir, "customer")
    key = F.struct(F.col("c_acctbal"), F.col("c_custkey"))
    return cust.groupBy("c_nationkey").agg(
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        F.min_by("c_name", key).alias("poorest"),
        F.max_by("c_name", key).alias("richest"),
    )


def _histogram_rank_bracket(
    df: DataFrame, key: str, col: str, num: int, den: int,
    extra_aggs: Sequence = (),
) -> DataFrame:
    """Per-``key`` type-7 rank bracket at p = num/den from a VALUE
    HISTOGRAM (the qx53 closed form): collapse to (key, value) → count
    first, run the cumulative window over the histogram (bounded by the
    value DOMAIN, not the row count), and read the bracket off it with
    two conditional mins. Returns (key, __n, __lo, __hi) exactly like
    ``exact_rank_bracket`` — same integers in, same integers out — for
    ~3x less wall: ONE data-sized shuffle (the map-side-combined
    histogram agg) instead of the two-pass range exchange. Right when
    the value domain is materially smaller than the data; for
    near-unique domains prefer ``exact_rank_bracket``.

    The per-key total ``__n`` is a SECOND WINDOW over the same
    partitioning, not a groupBy+join: the join form made the histogram a
    two-consumer subtree that Catalyst planned twice from the source —
    q36 paid five lineitem scans for its three stat legs (guide §7.2,
    duplicated subtrees). Both window frames share one exchange + sort
    (the unbounded frame adds a chained WindowExec, no new shuffle), so
    the source now feeds exactly one scan per bracket. ``extra_aggs``
    lets a caller fold additional histogram-derivable aggregates (e.g.
    qz17's ``max(col)``) into the final tiny agg instead of re-scanning
    the source for them."""
    h = df.groupBy(key, col).agg(F.count(F.lit(1)).alias("__cnt"))
    wc = (
        W.partitionBy(key)
        .orderBy(col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = W.partitionBy(key).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    j = h.select(
        key,
        col,
        F.sum("__cnt").over(wc).alias("__cum"),
        F.sum("__cnt").over(wn).alias("__n"),
    )
    k = F.expr(f"{num} * (__n - 1) div {den}")
    return j.groupBy(key, "__n").agg(
        F.min(F.when(F.col("__cum") > k, F.col(col))).alias("__lo"),
        F.min(F.when(F.col("__cum") > k + 1, F.col(col))).alias("__hi"),
        *extra_aggs,
    )


def _brackets_from_counts(
    h: DataFrame, key: str, col: str, numerators: Sequence[int], den: int,
    extra_aggs: Sequence = (),
) -> DataFrame:
    """Multi-quantile generalization of ``_histogram_rank_bracket`` over a
    PRE-BUILT value histogram ``h`` = (key, col, __cnt). Taking the
    histogram as input (instead of raw rows) lets a caller derive several
    quantile targets — and even DERIVED histograms, e.g. qx50's
    |v − median| fold — from ONE data-sized pass; everything here is
    bounded by the value domain. Returns (key, __n,
    __lo{num}, __hi{num} per numerator, *extra_aggs); interpolate with
    ``_type7_interp``. Same bracket semantics as
    ``exact_percentiles_by_rank`` (0-indexed type-7 ranks), proven
    equivalent by the shared oracles of q36/qx53/qz17."""
    wc = (
        W.partitionBy(key)
        .orderBy(col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wn = W.partitionBy(key).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    j = h.select(
        key,
        col,
        F.sum("__cnt").over(wc).alias("__cum"),
        F.sum("__cnt").over(wn).alias("__n"),
    )
    aggs = []
    for num in numerators:
        k = F.expr(f"{num} * (__n - 1) div {den}")
        aggs.append(
            F.min(F.when(F.col("__cum") > k, F.col(col))).alias(f"__lo{num}")
        )
        aggs.append(
            F.min(F.when(F.col("__cum") > k + 1, F.col(col))).alias(f"__hi{num}")
        )
    return j.groupBy(key, "__n").agg(*aggs, *extra_aggs)


def _type7_interp(num: int, den: int):
    """Type-7 interpolated quantile from a ``_brackets_from_counts`` row —
    the exact double formula of ``exact_percentiles_by_rank`` (lo + (hi −
    lo)·frac over double-cast brackets), so swapping the rank pass for the
    histogram pass is bit-identical."""
    frac = (
        F.expr(f"({num} * (__n - 1)) % {den}").cast("double")
        / F.lit(float(den))
    )
    lo = F.col(f"__lo{num}").cast("double")
    hi = F.coalesce(F.col(f"__hi{num}"), F.col(f"__lo{num}")).cast("double")
    return lo + (hi - lo) * frac


@register(
    "q36_stats_by_returnflag",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               ROUND(STDDEV_SAMP(l_quantity), 4)            AS sd_qty,
               ROUND(VAR_SAMP(l_extendedprice), 2)          AS var_price,
               ROUND(CORR(l_quantity, l_extendedprice), 6)  AS corr_qty_price,
               ROUND(COVAR_SAMP(l_quantity, l_discount), 6) AS cov_qty_disc,
               ROUND(MEDIAN(l_quantity), 2)                 AS med_qty
        FROM lineitem GROUP BY l_returnflag),
    c AS (
        SELECT l_returnflag,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem),
    r AS (
        SELECT l_returnflag, cents,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY cents)
                   - 1 AS rk,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM c),
    p AS (
        SELECT l_returnflag,
               MAX(n) AS n,
               MAX(CASE WHEN rk = (9 * (n - 1)) // 10 THEN cents END) AS lo,
               MAX(CASE WHEN rk = (9 * (n - 1)) // 10 + 1 THEN cents END) AS hi
        FROM r
        WHERE rk IN ((9 * (n - 1)) // 10, (9 * (n - 1)) // 10 + 1)
        GROUP BY l_returnflag)
    SELECT s.*,
           ((10 * p.lo
             + ((9 * (p.n - 1)) % 10) * (COALESCE(p.hi, p.lo) - p.lo)
             + 5) // 10) / 100.0 AS p90_price
    FROM s JOIN p USING (l_returnflag)
    """,
)
def q36_stats_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates incl. exact median / interpolated p90 —
    both multiset-FREE: no ``percentile`` aggregate (which buffers each
    group's whole value multiset in one ObjectHashAggregate state, O(n)
    in a single task for a hot group at 100 TB) appears anywhere.

    Both percentile legs use the value-HISTOGRAM closed form
    (``_histogram_rank_bracket`` — the qx53 idiom): quantities have a
    ~50-value domain and prices collapse to distinct cents, so each leg
    is one map-side-combined hash-agg plus a domain-bounded cumulative
    window (this replaced two two-pass range exchanges and took the
    query from 6.6 s to ~2.5 s at sf0.1 with bit-identical output).

    NOT fused: a shared composite (flag, qty, cents) histogram pass
    feeding both percentile legs (lineitem 3 scans -> 2) was built and
    measured in round 12 at 1.89 -> 2.49 s minimum / 2.19 -> 3.06 s
    median (9-run back-to-back A/B, oracle-green) and REVERTED: at
    sf0.1 the composite cell grid is ~row-sized (prices are near-unique
    per qty), so the lazy-checkpoint pin materializes nearly the whole
    projected table and its barrier serializes the percentile legs.
    Round-13 re-ran the A/B at ~sf0.3 (tools/build_scale_fixture.py x3
    replica, 1.8M lineitem rows; oracle-equal rows): current 1.74 s vs
    fused 2.15 s median of 5 — STILL a loss, because the grid only stops
    tracking row count once rows >> the ~18M-cell domain bound
    (3 flags x 50 qty x ~120k retail cents), i.e. ~sf30+; below that the
    fusion materializes ~every projected row behind a barrier. Scale
    threshold recorded: revisit only when lineitem rows per flag exceed
    the cent-domain (~120k x 50) by an order of magnitude.

    The median (0.5 is dyadic over integer quantities) interpolates in
    floats bit-exactly across engines (the qx30 argument). p90 = 9/10 is
    NOT dyadic, so it interpolates in SCALED INTEGERS: prices become
    exact cents (c = round(price·100)) and 10·q = 10·c[k] +
    (t mod 10)·(c[k+1]−c[k]) with t = 9·(n−1) is pure int64 arithmetic.
    The final ROUND(…,2) happens in integer space too —
    (10·q + 5) div 10 half-up over tenth-cents — then ONE shared IEEE
    division by 100.0 renders dollars, so both engines emit the
    identical double and the driver hash matches bit-for-bit. The
    DuckDB oracle spells out the same scaled-integer formula (its
    QUANTILE_CONT would interpolate in floats and can land a hair's
    width on the other side of the .xx5 rounding boundary)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_discount"), 6).alias("cov_qty_disc"),
    )
    med = _histogram_rank_bracket(
        li.select("l_returnflag", "l_quantity"), "l_returnflag",
        "l_quantity", 1, 2,
    ).select(
        "l_returnflag",
        # type-7 fraction at p=1/2 is ((n-1) mod 2)/2: 0 for odd n (the
        # median IS x[k]), exactly 0.5 for even n — both exact doubles
        F.round(
            F.col("__lo")
            + F.expr("((__n - 1) % 2) * 0.5")
            * (F.coalesce("__hi", "__lo") - F.col("__lo")),
            2,
        ).alias("med_qty"),
    )
    cents = li.select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    p90 = _histogram_rank_bracket(
        cents, "l_returnflag", "cents", 9, 10
    ).select(
        "l_returnflag",
        (
            F.expr(
                "(10 * __lo + ((9 * (__n - 1)) % 10)"
                " * (coalesce(__hi, __lo) - __lo) + 5) div 10"
            )
            / F.lit(100.0)
        ).alias("p90_price"),
    )
    # 3-row sides keyed by the bounded returnflag alphabet
    return base.join(med, "l_returnflag").join(p90, "l_returnflag")


@register(
    "q37_pivot_event_types",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
    FROM events
    GROUP BY user_id
    """,
)
def q37_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra distinct-discovery job —
    at scale always pass the values). Output columns carry an ``n_`` prefix:
    bare ``view``/``error`` are reserved-ish words on some engines."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    piv = ev.groupBy("user_id").pivot("event_type", kinds).count()
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(k), F.lit(0)).alias(f"n_{k}") for k in kinds],
    )


@register(
    "q38_unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
    """,
)
def q38_unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — wide→long without N scans."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey", F.col("p_size").cast("double"), F.col("p_retailprice")
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")


# ---------------------------------------------------------------------------
# scalar-function surface
# ---------------------------------------------------------------------------
@register(
    "q40_string_functions",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand)                                   AS brand_up,
           LOWER(p_type)                                    AS type_lo,
           LENGTH(p_name)                                   AS name_len,
           SUBSTRING(p_name, 1, 8)                          AS name_head,
           REPLACE(p_brand, '#', '-')                       AS brand_dash,
           CONCAT(p_brand, ':', p_type)                     AS brand_type,
           TRIM(CONCAT('  ', p_brand, '  '))                AS trimmed,
           LPAD(CAST(p_size AS VARCHAR), 4, '0')            AS size_pad,
           string_split(p_type, ' ')[1]                     AS type_first,
           regexp_extract(p_name, '([0-9]+)', 1)            AS first_num,
           starts_with(p_name, 'a')                         AS starts_a,
           contains(p_name, 'green')                        AS has_green
    FROM part
    """,
)
def q40_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions — all JVM-codegen'd, no Python."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        ascii_lower("p_type").alias("type_lo"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_head"),
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("-")).alias("brand_dash"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.element_at(F.split("p_type", " "), 1).alias("type_first"),
        F.regexp_extract("p_name", r"([0-9]+)", 1).alias("first_num"),
        F.col("p_name").startswith("a").alias("starts_a"),
        F.col("p_name").contains("green").alias("has_green"),
    )


@register(
    "q41_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT)                       AS yr,
           CAST(MONTH(o_orderdate) AS INT)                      AS mo,
           CAST(DAY(o_orderdate) AS INT)                        AS dom,
           CAST(QUARTER(o_orderdate) AS INT)                    AS qtr,
           date_trunc('month', o_orderdate)                     AS month_start,
           strftime(o_orderdate, '%Y-%m-%d')                    AS odate,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(date_diff('day', o_orderdate,
                TIMESTAMP '1999-01-01 00:00:00') AS INT)        AS days_to_1999
    FROM orders WHERE o_orderkey <= 1000
    """,
)
def q41_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar functions."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias(
            "month_end"
        ),
        F.datediff(
            F.lit("1999-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_1999"),
    )


@register(
    "q42_math_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(ABS(CAST(l_discount AS DECIMAL(12,6))
                          - CAST(0.05 AS DECIMAL(12,6))), 4) AS DOUBLE) AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT)              AS qty_ceil,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k,
           CAST(ROUND(CAST(SQRT(l_extendedprice) AS DECIMAL(28,10)), 4)
                AS DOUBLE)                               AS price_sqrt,
           CAST(ROUND(CAST(LN(l_extendedprice + 1) AS DECIMAL(28,10)), 6)
                AS DOUBLE)                               AS price_ln,
           CAST(ROUND((1 + CAST(l_tax AS DECIMAL(12,6)))
                      * (1 + CAST(l_tax AS DECIMAL(12,6))), 6)
                AS DOUBLE)                               AS tax_sq,
           CASE WHEN l_quantity > 25 THEN 'bulk'
                WHEN l_quantity > 10 THEN 'mid'
                ELSE 'small' END                         AS qty_class,
           GREATEST(l_discount, l_tax)                   AS max_rate,
           LEAST(l_discount, l_tax)                      AS min_rate,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none')   AS flag_or_none
    FROM lineitem WHERE l_orderkey <= 400
    """,
)
def q42_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional expression surface.

    Every rounded float routes through a DECIMAL cast before ROUND (and the
    oracle does the same): ROUND on raw doubles resolves near-tie values
    differently across engines (Spark rounds the full binary expansion
    HALF_UP, DuckDB rounds the scaled double), while decimal ROUND is exact
    HALF_UP everywhere. Casting the rounded decimal back to DOUBLE yields
    bit-identical floats on both engines. tax_sq uses exact decimal
    multiplication instead of POW for the same reason.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    disc_dec = F.col("l_discount").cast("decimal(12,6)")
    tax1 = F.lit(1) + F.col("l_tax").cast("decimal(12,6)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(disc_dec - F.lit(0.05).cast("decimal(12,6)")), 4)
        .cast("double")
        .alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.round(F.sqrt("l_extendedprice").cast("decimal(28,10)"), 4)
        .cast("double")
        .alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1).cast("decimal(28,10)"), 6)
        .cast("double")
        .alias("price_ln"),
        F.round(tax1 * tax1, 6).cast("double").alias("tax_sq"),
        F.when(F.col("l_quantity") > 25, "bulk")
        .when(F.col("l_quantity") > 10, "mid")
        .otherwise("small")
        .alias("qty_class"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias(
            "flag_or_none"
        ),
    )


@register(
    "q43_json_extraction",
    oracle="""
    SELECT event_type,
           COUNT(*)                                               AS n,
           COUNT(json_extract_string(props, '$.k'))               AS n_with_k,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 4) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def q43_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction over the events.props column (native
    get_json_object — no Python json parsing)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(k).alias("n_with_k"),
        F.round(F.avg(k.cast("double")), 4).alias("avg_k"),
    )


@register(
    "q44_array_functions",
    oracle="""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tokens
        FROM documents
    )
    SELECT doc_id,
           len(tokens)                       AS n_tokens,
           len(list_distinct(tokens))        AS n_unique,
           len(list_filter(tokens, t -> LENGTH(t) > 5)) AS n_long
    FROM toks
    """,
)
def q44_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array construction + higher-order functions (transform/filter) on a
    derived token array — all native, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long"),
    )


@register(
    "q29_trailing_hour_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT)  AS n_1h,
           CAST(SUM((CASE WHEN isfinite(value) THEN CAST(FLOOR(value * 1000) AS BIGINT) END)) OVER w AS BIGINT)
                                            AS v1000_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def q29_trailing_hour_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per user, count and sum of events in
    the trailing hour (inclusive), evaluated at every event.

    Spark's RANGE frames need a numeric ORDER BY, so the timestamp is
    truncated to epoch seconds on both engines. Truncation must be
    explicit in the oracle too: DuckDB's CAST(epoch(ts) AS BIGINT)
    *rounds* fractional seconds while Spark's cast("long") *floors*, and
    the two conventions produce different frames for sub-second
    timestamps (observed: 2 divergent rows at sf0.1) — hence
    FLOOR(epoch(ts)) on the DuckDB side.
    Ties within one second share a frame, which RANGE
    semantics make order-insensitive. The summed measure is exact
    fixed-point (floor(value*1000) as BIGINT) — float-summation order
    inside a frame differs across engines, integer sums do not.

    Scale: partitioned by user_id, so WindowExec parallelism is the user
    cardinality; a bounded trailing frame keeps per-row cost O(frame), and
    the single sort-shuffle on (user_id, ts) is the whole data movement."""
    events = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-3600, W.currentRow)
    )
    return events.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.sum(v1000_m("value"))
        .over(w)
        .cast("bigint")
        .alias("v1000_1h"),
    )


# q39: mergeable histogram quantiles — the scale path q36's docstring
# points at. Exact percentile (q36) needs the full value multiset per
# group; a fixed-width histogram needs only per-bin counts, which merge
# associatively (map-side partial agg shuffles at most |bins| rows per
# task, regardless of row count) — the same contract sketches like
# t-digest/KLL satisfy, here with deterministic integer arithmetic so the
# oracle hashes exactly. Resolution = BIN_WIDTH on the value axis.
BIN_WIDTH = 100  # l_extendedprice units per bin


@register(
    "q39_histogram_quantiles",
    oracle=f"""
    WITH hist AS (
        SELECT l_returnflag AS flag,
               CAST(FLOOR(l_extendedprice / {BIN_WIDTH}) AS BIGINT) AS bin,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY 1, 2),
    cum AS (
        SELECT flag, bin, cnt,
               SUM(cnt) OVER (PARTITION BY flag ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(cnt) OVER (PARTITION BY flag) AS n
        FROM hist)
    SELECT flag AS l_returnflag,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bin END)
                * {BIN_WIDTH} AS BIGINT) AS p50_edge,
           CAST(MIN(CASE WHEN cum >= (n * 90 + 99) // 100 THEN bin END)
                * {BIN_WIDTH} AS BIGINT) AS p90_edge,
           CAST(MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bin END)
                * {BIN_WIDTH} AS BIGINT) AS p99_edge
    FROM cum GROUP BY flag
    """,
)
def q39_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of l_extendedprice per return flag from a mergeable
    fixed-width histogram: one hash-agg reduces the fact table to
    (flag, bin) counts; everything after runs on the histogram (≤ ~1k bins
    per flag — metadata-sized, so its windows are trivially cheap). The
    quantile is the lower edge of the first bin whose cumulative count
    reaches ceil(q·n) — pure integer arithmetic on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") / BIN_WIDTH).cast("bigint").alias("bin"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    wc = (
        W.partitionBy("flag")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(wc)).withColumn(
        "n", F.sum("cnt").over(W.partitionBy("flag"))
    )

    def edge(q: int):
        thr = F.floor((F.col("n") * q + 99) / 100)
        return (
            F.min(F.when(F.col("cum") >= thr, F.col("bin"))) * BIN_WIDTH
        ).cast("bigint")

    return cum.groupBy(F.col("flag").alias("l_returnflag")).agg(
        F.max("n").cast("bigint").alias("n_rows"),
        edge(50).alias("p50_edge"),
        edge(90).alias("p90_edge"),
        edge(99).alias("p99_edge"),
    )


# q47: time-series regularization — hourly resample + forward fill, the
# feature-engineering step between an event stream and a fixed-step model
# input. Grid density is bounded by the time span, not the event count.
RESAMPLE_USER_MOD = 50  # exhibit subset: user_id % 50 == 0


@register(
    "q47_resample_ffill",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hr,
               (CASE WHEN isfinite(value) THEN CAST(FLOOR(value * 1000) AS BIGINT) END) AS v1000, event_type,
               ts, event_id
        FROM events WHERE user_id % {RESAMPLE_USER_MOD} = 0),
    hourly AS (
        SELECT user_id, hr, v1000, event_type FROM ev
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, hr
                                   ORDER BY ts DESC, event_id DESC) = 1),
    grid AS (
        SELECT user_id, unnest(range(min_hr, max_hr + 1)) AS hr
        FROM (SELECT user_id, MIN(hr) AS min_hr, MAX(hr) AS max_hr
              FROM ev GROUP BY user_id)),
    joined AS (
        SELECT g.user_id, g.hr, h.v1000, h.event_type
        FROM grid g LEFT JOIN hourly h
          ON h.user_id = g.user_id AND h.hr = g.hr)
    SELECT user_id, hr,
           LAST_VALUE(v1000 IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY hr
                     ROWS UNBOUNDED PRECEDING) AS v1000_ff,
           LAST_VALUE(event_type IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY hr
                     ROWS UNBOUNDED PRECEDING) AS type_ff,
           v1000 IS NOT NULL AS observed
    FROM joined
    """,
)
def q47_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly grid per user (span-bounded ``sequence`` + explode) left-
    joined with the last observation per hour (``max_by`` hash-agg, no
    window over raw events), then forward-filled with
    ``last(ignorenulls)`` per user. The first grid hour is an observed
    hour by construction, so the fill is total. Partitioned by user —
    embarrassingly parallel; fixed-point values keep the fill
    engine-exact."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % RESAMPLE_USER_MOD == 0)
        .select(
            "user_id",
            # µs-exact floor bucketing: unix_timestamp TRUNCATES toward
            # zero (-0.5 s -> 0), so pre-1970 fractional seconds would
            # land one hour high vs the oracle's floor (timeskew fixture)
            F.floor(F.unix_micros("ts") / F.lit(3_600_000_000))
            .cast("bigint")
            .alias("hr"),
            v1000_m("value").alias("v1000"),
            "event_type",
            "ts",
            "event_id",
        )
    )
    # NOT pinned: deriving bounds from a checkpointed hourly table was
    # measured at 3.4 s vs 0.6 s — the duplicate subtree is one
    # user-mod-pruned scan + hash-agg, re-run in parallel for free,
    # while the checkpoint materializes the full hourly rows first
    hourly = ev.groupBy("user_id", "hr").agg(
        F.max_by(
            F.struct("v1000", "event_type"), F.struct("ts", "event_id")
        ).alias("__last")
    ).select("user_id", "hr", "__last.v1000", "__last.event_type")
    bounds = ev.groupBy("user_id").agg(
        F.min("hr").alias("min_hr"), F.max("hr").alias("max_hr")
    )
    grid = bounds.select(
        "user_id",
        F.explode(F.sequence("min_hr", "max_hr")).alias("hr"),
    )
    joined = grid.join(hourly, ["user_id", "hr"], "left")
    wf = (
        W.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "hr",
        F.last("v1000", ignorenulls=True).over(wf).alias("v1000_ff"),
        F.last("event_type", ignorenulls=True).over(wf).alias("type_ff"),
        F.col("v1000").isNotNull().alias("observed"),
    )


# Exponentially-weighted rolling aggregate in exact fixed-point: value
# scaled x1000 to BIGINT, binary decay (weight 2^position within the
# frame, most recent highest). max |value|*1000 ~ 1e6, * 2^19 * 20 terms
# < 2^53 — exact on both engines, so the oracle gate hashes clean where
# float EWMA's order-dependent accumulation could not.
EWMA_SPAN = 20


@register(
    "qx10_ewm_rolling_value",
    oracle=f"""
    WITH x AS (
        -- EWM over the OBSERVED series: NULL measurements are absent
        -- rows, not zero-weight frame slots (Spark collect_list skips
        -- NULLs while DuckDB list() keeps them — filtering is the only
        -- frame definition both engines express identically)
        SELECT user_id, ts, event_id,
               CAST(floor(value * 1000) AS BIGINT) AS v1000
        FROM events WHERE value IS NOT NULL AND isfinite(value)),
    framed AS (
        SELECT user_id, event_id,
               list(v1000) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {EWMA_SPAN - 1} PRECEDING AND CURRENT ROW
               ) AS l
        FROM x)
    SELECT user_id, event_id,
           CAST(list_sum([l[i] * CAST(pow(2, i - 1) AS BIGINT)
                          for i in range(1, len(l) + 1)]) AS BIGINT) AS ewm1000
    FROM framed
    """,
)
def qx10_ewm_rolling_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted rolling value per user — the time-series
    smoothing step monitoring pipelines run over event streams — with the
    decay folded into EXACT integer arithmetic (binary weights on x1000
    fixed-point values), so both engines agree bit-for-bit; a float EWMA's
    recursive accumulation is order-dependent and cannot be hash-gated.

    Plan shape: the frame's values are collected per row by an ordinary
    ROWS window (one shuffle+sort on the user key, bounded {EWMA_SPAN}-row
    state) and the position-weighted sum runs as a codegen'd HOF over the
    tiny array — the general recipe for ANY custom positional window
    aggregate Spark lacks natively: collect the bounded frame, fold with
    transform+aggregate."""
    ev = load_table(spark, sf_dir, "events")
    # observed-series contract (see oracle comment): NULL values are
    # absent rows, keeping the frame positions identical on both engines
    x = ev.filter(finite_m("value")).select(
        "user_id",
        "ts",
        "event_id",
        v1000_m("value").alias("v1000"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_SPAN - 1), W.currentRow)
    )
    framed = x.select(
        "user_id", "event_id", F.collect_list("v1000").over(w).alias("l")
    )
    weighted = F.aggregate(
        F.transform(
            F.col("l"),
            lambda v, i: v * F.pow(F.lit(2), i).cast("bigint"),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, z: acc + z,
    )
    return framed.select("user_id", "event_id", weighted.alias("ewm1000"))


@register(
    "qx18_funnel_stages",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
               MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p
        FROM events GROUP BY user_id),
    staged AS (
        SELECT user_id,
               CASE WHEN v IS NULL THEN 0
                    WHEN c IS NULL OR c < v THEN 1
                    WHEN p IS NULL OR p < c THEN 2
                    ELSE 3 END AS stage
        FROM firsts)
    SELECT stage,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(user_id) AS BIGINT) AS min_user
    FROM staged GROUP BY stage
    """,
)
def qx18_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-funnel analysis: how far each user progressed through
    the ORDERED chain view -> click -> purchase (a later stage only
    counts if its first occurrence follows the previous stage's first
    occurrence — the sequential-pattern constraint that separates a
    funnel from three independent counts). One hash-agg computes every
    user's first timestamp per stage as conditional MINs — no joins, no
    window, no per-stage passes — and the stage classification is pure
    per-row logic; the final rollup is |stages| rows. The canonical
    product-analytics query, and the shape a 100 TB event store wants:
    a single shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")

    def first_of(t):
        return F.min(F.when(F.col("event_type") == t, us))

    firsts = ev.groupBy("user_id").agg(
        first_of("view").alias("v"),
        first_of("click").alias("c"),
        first_of("purchase").alias("p"),
    )
    stage = (
        F.when(F.col("v").isNull(), 0)
        .when(F.col("c").isNull() | (F.col("c") < F.col("v")), 1)
        .when(F.col("p").isNull() | (F.col("p") < F.col("c")), 2)
        .otherwise(3)
    )
    return (
        firsts.select("user_id", stage.alias("stage"))
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.min("user_id").cast("bigint").alias("min_user"),
        )
    )


@register(
    "qx25_session_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT event_type AS from_type,
               LEAD(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        FROM events),
    t AS (
        SELECT from_type, to_type, COUNT(*) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type)
    SELECT from_type, to_type, CAST(n AS BIGINT) AS n_transitions,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY from_type), 4)
               AS transition_prob
    FROM t
    """,
)
def qx25_session_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's
    time-ordered event stream: for every (from, to) event-type pair, the
    transition count and the row-normalized probability. The behavioral
    counterpart of qx21's BPE pair counting — sequence statistics a
    session-model or curriculum builder consumes; qx18's funnel is the
    special case of one fixed target path.

    Plan: one shuffle on user_id for the lead window (tie-broken by the
    unique event_id so ordering is total and cross-engine identical),
    then a hash-agg on the tiny (from, to) key space — the final window
    normalization runs over at most |event types|² rows. At 100 TB the
    user partition count is the parallelism; no global ordering
    anywhere."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
    wn = W.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.round(
            F.col("n_transitions") / F.sum("n_transitions").over(wn), 4
        ).alias("transition_prob"),
    )


WEEK_US = 7 * 86400 * 1_000_000


@register(
    "qx26_retention_cohorts",
    oracle=f"""
    WITH uw AS (
        -- retention is per USER: anonymous (NULL user_id) events are
        -- excluded (defined-user contract; the streaming sibling qx92's
        -- keyed presence state cannot address a NULL key)
        SELECT DISTINCT user_id, epoch_us(ts) // {WEEK_US} AS week
        FROM events WHERE user_id IS NOT NULL),
    c AS (
        SELECT user_id, week,
               MIN(week) OVER (PARTITION BY user_id) AS cohort_week
        FROM uw),
    m AS (
        SELECT cohort_week, week - cohort_week AS week_offset,
               COUNT(*) AS n_active
        FROM c GROUP BY cohort_week, week - cohort_week)
    SELECT cohort_week, week_offset, CAST(n_active AS BIGINT) AS n_active,
           ROUND(n_active * 1.0 / MAX(CASE WHEN week_offset = 0
                                           THEN n_active END)
                 OVER (PARTITION BY cohort_week), 4) AS retention_pct
    FROM m
    """,
)
def qx26_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohort matrix: users grouped by first-active
    week; for each (cohort, week offset) the count of still-active users
    and the share of the cohort they represent. Weeks are epoch-based
    integer indices (epoch_us div 7 days) — deterministic and
    calendar-convention-free, so both engines bin identically.

    Plan: distinct (user, week) then a user-partitioned min window (one
    shuffle on user_id — the same exchange serves both the distinct and
    the window), hash-agg on the tiny (cohort, offset) key space, and a
    cohort-partitioned window over at most cohorts x offsets rows for
    the denominator. At 100 TB: parallelism is the user-hash space;
    nothing global."""
    events = load_table(spark, sf_dir, "events")
    # defined-user contract (see oracle comment)
    uw = events.filter(F.col("user_id").isNotNull()).select(
        "user_id",
        F.expr(f"unix_micros(ts) div {WEEK_US}").alias("week"),
    ).distinct()
    return retention_matrix(uw)


def retention_matrix(uw: DataFrame) -> DataFrame:
    """qx26's cohort matrix from a distinct (user_id, week) presence
    frame — shared with the streaming-maintained qx92, whose state table
    IS that presence frame (set-union maintained, so the derived matrix
    equals the batch answer and qx26's oracle applies verbatim)."""
    wu = W.partitionBy("user_id")
    c = uw.select(
        "user_id", "week", F.min("week").over(wu).alias("cohort_week")
    )
    m = (
        c.select("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    wc = W.partitionBy("cohort_week")
    denom = F.max(
        F.when(F.col("week_offset") == 0, F.col("n_active"))
    ).over(wc)
    return m.select(
        "cohort_week",
        "week_offset",
        "n_active",
        F.round(F.col("n_active") / denom, 4).alias("retention_pct"),
    )


HOUR_US = 3600 * 1_000_000
TREND_SCALE = 1_000_000


@register(
    "qx29_user_value_trend",
    oracle=f"""
    WITH base AS (
        SELECT user_id,
               (epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY user_id))
                   // {HOUR_US} AS t,
               (CASE WHEN isfinite(value) THEN CAST(FLOOR(value * 1000) AS BIGINT) END) AS v
        FROM events),
    agg AS (
        SELECT user_id,
               COUNT(*)  AS n,
               SUM(t)    AS st,  SUM(v)   AS sv,
               SUM(t*t)  AS stt, SUM(t*v) AS stv,
               COUNT(DISTINCT t) AS nt
        FROM base GROUP BY user_id)
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           CAST(n * stv - st * sv AS BIGINT)  AS slope_num,
           CAST(n * stt - st * st AS BIGINT)  AS slope_den,
           CAST(({TREND_SCALE} * (n * stv - st * sv)) // (n * stt - st * st)
                AS BIGINT)                    AS slope_e6,
           CASE WHEN n * stv - st * sv > 0 THEN 'up'
                WHEN n * stv - st * sv < 0 THEN 'down'
                ELSE 'flat' END               AS trend
    FROM agg WHERE nt >= 2
    """,
)
def qx29_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend of event value over time: the least-squares
    slope of v (milli-units) against hours since the user's first event,
    kept EXACT end to end — numerator and denominator as integers, the
    reported slope as micro-units/hour by integer division. DuckDB's //
    and Spark's div BOTH truncate toward zero (verified on negative
    numerators: -7//2 = -3 in each engine, and about half the corpus'
    slopes are negative), and the scale multiply precedes the divide.
    The moment arithmetic runs in DECIMAL(38,0) on Spark because DuckDB
    integer SUMs are HUGEINT (int128) implicitly: with clock-skewed data
    (timeskew fixture: a user spanning 1944..2124 has t up to ~1.6e6
    hours) the TREND_SCALE*num product exceeds int64 and ANSI Spark threw
    ARITHMETIC_OVERFLOW where the oracle silently widened. The exported
    slope_num/slope_den stay bigint (they fit; only intermediates widen).
    Users observed in a single hour have no slope (denominator 0) and
    are excluded via the distinct-t count.

    Plan: one shuffle on user_id serves the min-window AND the final
    hash-agg (same key); everything else is per-row codegen. At 100 TB:
    grouped-regression-as-aggregate — no iteration, no global state."""
    events = load_table(spark, sf_dir, "events")
    wu = W.partitionBy("user_id")
    base = events.select(
        "user_id",
        F.expr(
            f"(unix_micros(ts) - min(unix_micros(ts)) over"
            f" (partition by user_id)) div {HOUR_US}"
        ).alias("t"),
        v1000_m("value").alias("v"),
    )
    dec = "decimal(38,0)"
    t_d = F.col("t").cast(dec)
    agg = base.groupBy("user_id").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(t_d).alias("st"),
        F.sum(F.col("v").cast(dec)).alias("sv"),
        F.sum(t_d * F.col("t")).alias("stt"),
        F.sum(t_d * F.col("v")).alias("stv"),
        F.countDistinct("t").alias("nt"),
    )
    num = (F.col("n") * F.col("stv") - F.col("st") * F.col("sv")).cast(dec)
    den = (F.col("n") * F.col("stt") - F.col("st") * F.col("st")).cast(dec)
    return (
        agg.filter(F.col("nt") >= 2)
        .select(
            "user_id",
            F.col("n").cast("bigint").alias("n_events"),
            num.alias("__num"),
            den.alias("__den"),
        )
        .select(
            "user_id",
            "n_events",
            F.col("__num").cast("bigint").alias("slope_num"),
            F.col("__den").cast("bigint").alias("slope_den"),
            F.expr(f"cast((cast({TREND_SCALE} as {dec}) * __num)"
                   f" div __den as bigint)").alias("slope_e6"),
            F.when(F.col("__num") > 0, "up")
            .when(F.col("__num") < 0, "down")
            .otherwise("flat")
            .alias("trend"),
        )
    )


@register(
    "qx30_exact_grouped_quantiles",
    oracle="""
    WITH v AS (
        -- defined-key + defined-measurement contract: quantile_cont
        -- ignores NULL values anyway, and the rank machinery requires
        -- pre-filtered NULLs (rankstats.exact_percentiles_by_rank)
        SELECT event_type, (CASE WHEN isfinite(value) THEN CAST(FLOOR(value * 1000) AS BIGINT) END) AS v1000
        FROM events
        WHERE event_type IS NOT NULL
          AND value IS NOT NULL AND isfinite(value))
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)    AS n,
           quantile_cont(v1000, 0.25)  AS p25,
           quantile_cont(v1000, 0.5)   AS p50,
           quantile_cont(v1000, 0.75)  AS p75,
           quantile_cont(v1000, 0.75) - quantile_cont(v1000, 0.25) AS iqr
    FROM v GROUP BY event_type
    """,
)
def qx30_exact_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT grouped quantiles (p25/median/p75 + IQR), matching DuckDB's
    ``quantile_cont`` — type-7 linear interpolation computed by rank
    (see Plan below; no ``percentile`` multiset aggregate anywhere).
    Restricted to DYADIC percentiles on integer
    inputs, where every intermediate ((n-1)*p index, interpolation
    weight, weighted sum) is exactly representable in binary doubles, so
    the values hash-match across engines; 0.95 would not (the weight
    itself rounds). Complements the mergeable-sketch family: q39's
    fixed-bin histogram is the 100 TB approximation, this is the exact
    answer you reconcile it against, at the cost of a per-group sort
    inside the aggregate.

    Plan: the q36/qx53 value-HISTOGRAM closed form
    (``_brackets_from_counts``): ONE map-side-combined (event_type,
    v1000) histogram agg — the only data-sized exchange — then all three
    quantile brackets read off the SAME domain-bounded cumulative window
    in one final tiny agg. Still no ObjectHashAggregate holding a
    per-group value multiset anywhere (per-task state is one histogram
    cell), and unlike the former two-pass range-partitioned rank
    (``exact_percentiles_by_rank``, kept for near-unique domains like
    qx52's timestamps) the quantile count is free: one pass serves p25,
    p50 and p75. Measured at sf0.1 (noop sink, median of 3): 2.46 s /
    12 jobs (rank, two data-sized exchanges) → 1.14 s / 4 jobs;
    interpolation uses ``_type7_interp`` — the
    rank helper's exact double formula — so values are bit-identical."""
    events = load_table(spark, sf_dir, "events")
    # defined-key + defined-measurement contract (mirrored in the oracle):
    # the bracket ranks NULLs, so they must be pre-filtered
    v = events.filter(
        F.col("event_type").isNotNull() & finite_m("value")
    ).select(
        "event_type", v1000_m("value").alias("v1000")
    )
    h = v.groupBy("event_type", "v1000").agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    b = _brackets_from_counts(h, "event_type", "v1000", [1, 2, 3], 4)
    return b.select(
        "event_type",
        F.col("__n").alias("n"),
        _type7_interp(1, 4).alias("p25"),
        _type7_interp(2, 4).alias("p50"),
        _type7_interp(3, 4).alias("p75"),
        (_type7_interp(3, 4) - _type7_interp(1, 4)).alias("iqr"),
    )


@register(
    "qx32_user_feature_vector",
    oracle=f"""
    WITH base AS (
        SELECT user_id, event_type, value,
               epoch_us(ts) AS us,
               epoch_us(ts) // {WEEK_US} AS week,
               (CASE WHEN isfinite(value) THEN CAST(FLOOR(value * 1000) AS BIGINT) END) AS v1000
        FROM events),
    tc AS (
        SELECT user_id, event_type, COUNT(*) AS n
        FROM base GROUP BY user_id, event_type),
    fav AS (
        SELECT user_id, event_type AS top_type
        FROM (SELECT user_id, event_type,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY n DESC, event_type) AS rk
              FROM tc) WHERE rk = 1),
    agg AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT)              AS n_events,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(COUNT(DISTINCT week) AS BIGINT)  AS n_active_weeks,
               CAST(MAX(us) AS BIGINT)               AS last_seen_us,
               CAST(SUM(v1000) AS BIGINT)            AS total_v1000,
               CAST(MAX(v1000) AS BIGINT)            AS max_v1000
        FROM base GROUP BY user_id)
    SELECT a.*, f.top_type
    FROM agg a JOIN fav f USING (user_id)
    """,
)
def qx32_user_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral feature vector — the feature-store
    materialization shape: activity counts, type diversity, active-week
    span, recency, exact fixed-point value totals, and the modal event
    type (deterministic tie-break by name) assembled in one pass.
    Downstream this is the training-table side of qx15's similarity
    search and the input a ranking model would join against.

    Plan: ONE shuffle on user_id feeds both the main hash-agg and the
    (user, type) count for the mode (same key prefix — the second agg is
    a narrower regroup of the first exchange); the mode's rank window
    partitions by user over at most |types| rows each. Exact integers
    everywhere; no floats to diverge."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.expr(f"unix_micros(ts) div {WEEK_US}").alias("week"),
        v1000_m("value").alias("v1000"),
    )
    agg = base.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
        F.countDistinct("week").cast("bigint").alias("n_active_weeks"),
        F.max("us").cast("bigint").alias("last_seen_us"),
        F.sum("v1000").cast("bigint").alias("total_v1000"),
        F.max("v1000").cast("bigint").alias("max_v1000"),
    )
    tc = base.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    wf = W.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    fav = (
        tc.select("user_id", "event_type", F.row_number().over(wf).alias("rk"))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("top_type"))
    )
    return agg.join(fav, "user_id")


@register(
    "qx33_user_event_sequences",
    oracle="""
    WITH g AS (
        SELECT user_id, list(event_type ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id)
    SELECT user_id,
           array_to_string(seq, '|')    AS seq,
           CAST(len(seq) AS BIGINT) AS seq_len,
           seq[1]                   AS first_type,
           seq[-1]                  AS last_type
    FROM g
    """,
)
def qx33_user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-ordered event-type sequence — the training-sample
    assembly step (multi-turn construction, session replay, sequence
    models) that turns an event log into one row per example. Ordering
    is total (ts, then the unique event_id), so the sequence is
    gate-hashed element-for-element, not just counted. The sequence is
    emitted as a ``'|'``-joined string (not an array) so the driver's
    pandas row canonicalizer — which cannot sort list-valued columns —
    hashes it; value content is identical.

    Plan: one hash-agg on user_id; order is imposed INSIDE the aggregate
    (sort_array over (ts, id, type) structs, then a projection strips
    the keys) — no window, no per-group shuffle beyond the one agg
    exchange. Per-group state is the user's own events, the natural unit
    a sequence example must hold anyway; a pathological hot key would
    cap/chunk via q78's chunker downstream."""
    events = load_table(spark, sf_dir, "events")
    packed = F.sort_array(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("us"),
                F.col("event_id").alias("eid"),
                F.col("event_type").alias("t"),
            )
        )
    )
    return (
        events.groupBy("user_id")
        .agg(packed.alias("p"))
        .select(
            "user_id",
            F.array_join(
                F.transform("p", lambda s: s["t"]), "|"
            ).alias("seq"),
            F.size("p").cast("bigint").alias("seq_len"),
            F.element_at("p", 1)["t"].alias("first_type"),
            F.element_at("p", -1)["t"].alias("last_type"),
        )
    )


# qx38: rolling z-score anomaly detection, EXACT. |x - mean| > z*std over
# the trailing window is algebraically (n*x - sum)^2 > z^2*(n*sumsq - sum^2)
# — every term an int64 on milli-unit values, so no float mean/stddev ever
# exists to diverge between engines. Magnitude check: v1000 <= ~2e7,
# window n <= 10 -> (n*x - sum)^2 <= (4e8)^2 = 1.6e17; z^2 * (n*sumsq -
# sum^2) <= 9 * 10 * 10 * (2e7)^2 = 3.6e17 — both far inside int64.
ANOM_WINDOW = 10
ANOM_MIN_N = 5
ANOM_Z2 = 9  # z = 3

ANOM_ORACLE = f"""
    WITH v AS (
        -- per-USER trailing frames: anonymous (NULL user_id) events are
        -- excluded (defined-user contract; the streaming sibling qx46's
        -- keyed tail state cannot address a NULL key)
        SELECT user_id, event_id, ts,
               (CASE WHEN isfinite(value) THEN CAST(FLOOR(value * 1000) AS BIGINT) END) AS v1000
        FROM events WHERE user_id IS NOT NULL),
    w AS (
        SELECT user_id, event_id, v1000,
               COUNT(*)      OVER fr AS n,
               SUM(v1000)    OVER fr AS s,
               SUM(v1000 * v1000) OVER fr AS ss
        FROM v
        WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN {ANOM_WINDOW} PRECEDING AND 1 PRECEDING))
    SELECT user_id, event_id, v1000,
           CAST(n AS BIGINT)                    AS n_window,
           CAST(n * v1000 - s AS BIGINT)        AS dev_num,
           CASE WHEN n * v1000 - s > 0 THEN 'high' ELSE 'low' END AS direction
    FROM w
    WHERE n >= {ANOM_MIN_N}
      AND (n * v1000 - s) * (n * v1000 - s) > {ANOM_Z2} * (n * ss - s * s)
    """


def flag_rolling_anomalies(v: DataFrame) -> DataFrame:
    """Trailing-frame z-score flags over (user_id, event_id, ts, v1000)
    rows — the integer-exact core shared by qx38 (whole-table batch) and
    qx46 (per-micro-batch maintenance over prior-tail ∪ batch). Extra
    input columns (e.g. the maintenance path's ``is_new`` marker) pass
    through untouched so the caller can scope emission."""
    fr = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOM_WINDOW, -1)
    )
    extra = [c for c in v.columns if c not in ("user_id", "event_id", "ts", "v1000")]
    w = v.select(
        "user_id", "event_id", "v1000", *extra,
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum("v1000").over(fr).alias("s"),
        F.sum(F.col("v1000") * F.col("v1000")).over(fr).alias("ss"),
    )
    dev = F.col("n") * F.col("v1000") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return (
        w.filter((F.col("n") >= ANOM_MIN_N) & (dev * dev > ANOM_Z2 * var_n2))
        .select(
            "user_id", "event_id", "v1000", *extra,
            F.col("n").cast("bigint").alias("n_window"),
            dev.cast("bigint").alias("dev_num"),
            F.when(dev > 0, "high").otherwise("low").alias("direction"),
        )
    )


@register("qx38_rolling_zscore_anomalies", oracle=ANOM_ORACLE)
def qx38_rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: an event is anomalous when its
    value deviates from the mean of the user's trailing ``ANOM_WINDOW``
    events by more than 3 trailing standard deviations — the standard
    streaming-metrics outlier rule, kept EXACT by clearing denominators:
    ``|x - s/n| > z*sqrt((n*ss - s^2)/n^2)`` is squared into
    ``(n*x - s)^2 > z^2*(n*ss - s^2)``, all int64 terms (bounds in the
    header comment), so both engines compare identical integers — no
    float mean, stddev, or sqrt anywhere.

    Plan: one shuffle on user_id; count/sum/sum-of-squares come from a
    single window pass over the trailing ROWS frame (the frame excludes
    the current row, so an event is judged against its past only), then
    per-row codegen arithmetic. Total order (ts, event_id) makes the
    frame deterministic. At 100 TB this is the q30 shape: per-user state
    is one frame of 10 values, no global sort, no iteration."""
    events = load_table(spark, sf_dir, "events")
    # defined-user contract (see ANOM_ORACLE comment)
    v = events.filter(F.col("user_id").isNotNull()).select(
        "user_id", "event_id", "ts",
        v1000_m("value").alias("v1000"),
    )
    return flag_rolling_anomalies(v)


#: session gap for batch attribution, matching the streaming sessionizer
#: (streaming/stateful.py SESSION_GAP_MIN).
ATTR_GAP_MIN = 30

#: shared sessionized-events CTE body (``e`` -> ``s`` with session_seq),
#: used verbatim by the qx39 and qx48 oracles so both engines sessionize
#: identically.
SESSIONIZED_SQL = f"""e AS (
        -- sessionization requires a defined user: anonymous (NULL
        -- user_id) events would pool into one fake per-NULL "session
        -- stream" (and the streaming sessionizer's keyed state cannot
        -- address a NULL key at all)
        SELECT user_id, event_id, ts, event_type,
               (CASE WHEN isfinite(value) THEN CAST(FLOOR(value * 1000) AS BIGINT) END) AS v1000,
               CASE WHEN LAG(epoch_us(ts))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         IS NULL
                      OR epoch_us(ts)
                         - LAG(epoch_us(ts))
                           OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > {ATTR_GAP_MIN} * 60 * 1000000
                    THEN 1 ELSE 0 END AS is_start
        FROM events WHERE user_id IS NOT NULL),
    s AS (
        SELECT *, SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM e)"""


def sessionize_events(events: DataFrame) -> DataFrame:
    """Gap-rule sessionization shared by qx39 and qx48: split each user's
    event log at ``ATTR_GAP_MIN``-minute inactivity gaps (the q57
    streaming sessionizer's rule, batch form). Adds ``v1000`` and
    ``session_seq``; one shuffle on user_id serves both window passes.
    Anonymous (NULL user_id) events are excluded — the defined-user
    contract shared with SESSIONIZED_SQL above."""
    events = events.filter(F.col("user_id").isNotNull())
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = ATTR_GAP_MIN * 60 * 1_000_000
    e = events.select(
        "user_id", "event_id", "ts", "event_type",
        v1000_m("value").alias("v1000"),
        F.when(
            F.lag(F.unix_micros("ts")).over(wu).isNull()
            | (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(wu) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("is_start"),
    )
    return e.withColumn(
        "session_seq",
        F.sum("is_start").over(wu.rowsBetween(W.unboundedPreceding, 0)),
    ).drop("is_start")


@register(
    "qx39_session_attribution",
    oracle=f"""
    WITH {SESSIONIZED_SQL},
    f AS (
        SELECT *, FIRST_VALUE(event_type)
                      OVER (PARTITION BY user_id, session_seq
                            ORDER BY ts, event_id) AS first_touch
        FROM s)
    SELECT first_touch,
           CAST(COUNT(*) AS BIGINT)      AS n_purchases,
           CAST(SUM(v1000) AS BIGINT)    AS revenue_1000,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM f WHERE event_type = 'purchase'
    GROUP BY first_touch
    """,
)
def qx39_session_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: split each user's event log into sessions
    at {ATTR_GAP_MIN}-minute inactivity gaps (the same gap rule as the
    streaming sessionizer q57), attribute every purchase to the FIRST
    event type of its session, and aggregate purchase count / revenue
    (milli-units, exact) / distinct purchasers per entry channel — the
    batch form of marketing attribution over a behavioral log.

    Plan: one shuffle on user_id serves all three window passes (gap
    detection via lag, session numbering via running sum, first-touch
    via first_value — Spark executes them in a single Window stage
    chain on the same partitioning), then a hash-agg on the tiny
    channel key. A NULL lag (the user's first event) is always a
    session start; ordering (ts, event_id) is total. At
    100 TB: per-user sessionization never crosses the user partition,
    the final agg is alphabet-sized."""
    s = sessionize_events(load_table(spark, sf_dir, "events"))
    f = s.withColumn(
        "first_touch",
        F.first("event_type").over(
            W.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
        ),
    )
    return (
        f.filter(F.col("event_type") == "purchase")
        .groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum("v1000").cast("bigint").alias("revenue_1000"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )


#: minimum sessions containing both types for a pair to be reported.
AFFINITY_MIN_SUPPORT = 3


@register(
    "qx48_session_type_affinity",
    oracle=f"""
    WITH {SESSIONIZED_SQL},
    pres AS (
        SELECT DISTINCT user_id, session_seq, event_type FROM s),
    tot AS (
        SELECT COUNT(*) AS n_sessions
        FROM (SELECT DISTINCT user_id, session_seq FROM s)),
    tn AS (SELECT event_type, COUNT(*) AS n FROM pres GROUP BY event_type),
    pn AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_both
        FROM pres a JOIN pres b
          ON a.user_id = b.user_id AND a.session_seq = b.session_seq
         AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type)
    SELECT type_a, type_b,
           CAST(n_both AS BIGINT)       AS n_both,
           CAST(na.n AS BIGINT)         AS n_a,
           CAST(nb.n AS BIGINT)         AS n_b,
           CAST(tot.n_sessions AS BIGINT) AS n_sessions,
           ROUND(n_both * tot.n_sessions * 1.0 / (na.n * nb.n), 4) AS lift
    FROM pn
    JOIN tn na ON na.event_type = type_a
    JOIN tn nb ON nb.event_type = type_b
    CROSS JOIN tot
    WHERE n_both >= {AFFINITY_MIN_SUPPORT}
    """,
)
def qx48_session_type_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level event-type affinity: for each unordered pair of
    event types, in how many sessions they co-occur, with lift against
    independence — qx36's market-basket analysis transplanted from order
    baskets to BEHAVIORAL sessions (the composition is the point: the
    gap-rule sessionizer shared with qx39 feeds presence sets, then the
    bounded in-group pair expansion). 'error co-occurs with purchase at
    lift 1.4' is the kind of signal this surfaces.

    Plan: sessionize (one user_id shuffle), distinct presence per
    (session, type) — a hash-agg on the session key; pair expansion via
    ``collect_set`` + nested ``transform`` inside each session (set size
    bounded by the event-type alphabet, so the blowup is C(5,2) here and
    alphabet-bounded generally); one hash-agg on the tiny pair key; type
    totals and the session count broadcast back. All counts exact int64,
    one rounded double division per output row."""
    s = sessionize_events(load_table(spark, sf_dir, "events"))
    sets = s.groupBy("user_id", "session_seq").agg(
        F.sort_array(F.collect_set("event_type")).alias("types")
    )
    # pair counts, per-type presence counts and the session total all
    # reduce the same session-set table — one kind-tagged explode
    # computes all three in a single sessionize pass (the subtree was
    # planned 3x before: events scanned 4x in one plan; the qx36 move).
    # Output is alphabet-bounded, pinned for its three tiny consumers.
    combo = F.expr(
        "concat("
        " flatten(transform(types, (x, i) ->"
        "  transform(slice(types, i + 2, size(types) - i - 1),"
        "   y -> struct('p' AS kind, x AS ka, y AS kb)))),"
        " transform(types, x ->"
        "  struct('t' AS kind, x AS ka, cast(null as string) AS kb)),"
        " array(struct('s' AS kind, cast(null as string) AS ka,"
        "  cast(null as string) AS kb)))"
    )
    counts = (
        sets.select(F.explode(combo).alias("e"))
        .groupBy("e.kind", "e.ka", "e.kb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    pair_n = counts.filter(F.col("kind") == "p").select(
        F.col("ka").alias("type_a"),
        F.col("kb").alias("type_b"),
        F.col("c").alias("n_both"),
    )
    tn = counts.filter(F.col("kind") == "t").select(
        F.col("ka").alias("event_type"), F.col("c").alias("n")
    )
    tot = counts.filter(F.col("kind") == "s").select(
        F.col("c").alias("n_sessions")
    )
    na = tn.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    nb = tn.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pair_n.filter(F.col("n_both") >= AFFINITY_MIN_SUPPORT)
        .join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a", "type_b", "n_both", "n_a", "n_b", "n_sessions",
            F.round(
                (F.col("n_both") * F.col("n_sessions"))
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )


@register(
    "qx50_robust_dispersion",
    oracle="""
    WITH v AS (
        -- defined-key + defined-measurement contract (see qx30)
        SELECT event_type, (CASE WHEN isfinite(value) THEN CAST(FLOOR(value * 1000) AS BIGINT) END) AS v1000
        FROM events
        WHERE event_type IS NOT NULL
          AND value IS NOT NULL AND isfinite(value)),
    med AS (
        SELECT event_type, quantile_cont(v1000, 0.5) AS med
        FROM v GROUP BY event_type),
    dev AS (
        SELECT v.event_type, v.v1000, med.med,
               ABS(v.v1000 - med.med) AS adev
        FROM v JOIN med USING (event_type))
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT)       AS n,
           ANY_VALUE(med)                 AS median_v1000,
           quantile_cont(adev, 0.5)       AS mad_v1000,
           CAST(SUM(CASE WHEN adev > 3 * (SELECT quantile_cont(d2.adev, 0.5)
                                          FROM dev d2
                                          WHERE d2.event_type = dev.event_type)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_beyond_3mad
    FROM dev GROUP BY event_type
    """,
)
def qx50_robust_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per event type: exact median, exact median
    absolute deviation (MAD — the outlier-resistant scale estimate), and
    the count of events beyond 3 MAD. Exactness carries through both
    percentile passes: milli-unit integers interpolate at the dyadic 0.5
    to values with at-worst .5 fractions (exact binary doubles), the
    absolute deviations are again exact, and their median interpolates
    to at-worst .25 fractions — every comparison in both engines is on
    identical doubles (the qx30 dyadic argument, applied twice).

    Plan: ONE pass over events builds the (event_type, v1000) value
    histogram (map-side-combined — the query's only data-sized
    exchange); everything downstream is bounded by the value DOMAIN,
    not the row count. The median reads off the histogram's cumulative
    window (the q36/qx53 closed form); the |v − median| histogram is a
    FOLD of that same histogram (join the per-type median, re-group by
    the folded value — histogram-sized, no second scan); the MAD reads
    off the folded histogram's window; and the 3-MAD exceedance count
    is a conditional SUM OF HISTOGRAM COUNTS, not a third pass over
    rows. Still no per-group value multiset in any aggregate buffer
    (per-task state is one histogram cell, the q36 argument), and vs
    the former two ``exact_percentiles_by_rank`` passes (two scans +
    four data-sized range exchanges + a data-sized checkpoint):
    measured at sf0.1 (noop sink, median of 3) 6.58 s / 36 jobs →
    1.65 s / 14 jobs. Interpolation uses
    ``_type7_interp`` — the rank helper's exact double formula — so
    every emitted value is bit-identical; |v1000 − med| folds distinct
    values to doubles with at-worst .5 fractions (exact), so histogram
    cells merge exactly like dev rows did. q39's mergeable histogram
    remains the cheaper approximation when exactness is not required."""
    events = load_table(spark, sf_dir, "events")
    # defined-key + defined-measurement contract (see qx30)
    v = events.filter(
        F.col("event_type").isNotNull() & finite_m("value")
    ).select(
        "event_type", v1000_m("value").alias("v1000")
    )
    # consumed twice (median bracket + the |v − med| fold) — pin one
    # materialization; histogram-sized, unlike the dev rows it replaces
    h = (
        v.groupBy("event_type", "v1000")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .localCheckpoint(eager=False)
    )
    med = _brackets_from_counts(h, "event_type", "v1000", [1], 2).select(
        "event_type", _type7_interp(1, 2).alias("med")
    )
    # fold: value histogram → absolute-deviation histogram (tiny)
    h2 = (
        h.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.abs(F.col("v1000") - F.col("med")).alias("adev"),
            "__cnt",
        )
        .groupBy("event_type", "adev")
        .agg(F.sum("__cnt").alias("__cnt"))
        .localCheckpoint(eager=False)  # consumed twice: MAD + exceedance
    )
    mad = (
        _brackets_from_counts(h2, "event_type", "adev", [1], 2)
        .join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.col("__n").alias("n"),
            F.col("med").alias("median_v1000"),
            _type7_interp(1, 2).alias("mad_v1000"),
        )
    )
    return (
        h2.join(F.broadcast(mad.select("event_type", "mad_v1000")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad_v1000"), F.col("__cnt"))
                .otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_beyond_3mad")
        )
        .join(F.broadcast(mad), "event_type")
        .select(
            "event_type", "n", "median_v1000", "mad_v1000", "n_beyond_3mad"
        )
    )


@register(
    "qx53_weighted_median_by_rank",
    oracle="""
    WITH v AS (
        SELECT l_returnflag AS flag,
               CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
               CAST(l_quantity AS BIGINT) AS w
        FROM lineitem),
    c AS (
        SELECT flag, cents, w,
               SUM(w) OVER (PARTITION BY flag ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS cumw
        FROM v),
    t AS (SELECT flag, SUM(w) AS tw, COUNT(*) AS n FROM v GROUP BY flag)
    SELECT c.flag AS l_returnflag,
           CAST(t.n AS BIGINT)  AS n,
           CAST(t.tw AS BIGINT) AS total_qty,
           CAST(MIN(CASE WHEN 2 * c.cumw >= t.tw THEN c.cents END) AS BIGINT)
               AS wmedian_cents
    FROM c JOIN t USING (flag)
    GROUP BY c.flag, t.n, t.tw
    """,
)
def qx53_weighted_median_by_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (price in cents weighted by quantity, per return
    flag) — the robust 'typical unit price' statistic — via the
    value-HISTOGRAM closed form (the qx73 tie-run idiom): the weighted
    median only depends on per-value weight totals, so collapse the data
    to a (flag, cents) → Σw histogram FIRST, then find the smallest
    value whose cumulative weight reaches half the group total
    (2*cumw >= W in exact integers — no halving rounding).

    Plan: ONE data-sized shuffle total — the map-side-combined hash-agg
    that builds the histogram (round 5's range-exchange + __pid-window
    draft paid that exchange AND a second full-data hash exchange,
    because Window.partitionBy(__pid, flag) does not satisfy range
    partitioning; this round removes both). The cumulative-weight window
    then runs over the histogram, whose size is bounded by the VALUE
    DOMAIN (distinct cents × |flags|), not the row count — at 100 TB of
    lineitem the histogram is still ~1e6 rows. One task per flag over
    histogram rows is the documented ceiling; for a genuinely unbounded
    value domain, fall back to rankstats' range-partitioned two-pass.
    Tie-insensitive by construction: equal values share one histogram
    cell. The oracle's single-window form is the semantics spec, not
    the plan."""
    li = load_table(spark, sf_dir, "lineitem")
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("w"),
    )
    hist = v.groupBy("flag", "cents").agg(
        F.sum("w").alias("hw"),
        F.count(F.lit(1)).alias("hn"),
    )
    # Group totals come from a second (unbounded) window frame over the
    # SAME partitioning — not a groupBy+join, which made hist a
    # two-consumer subtree that Catalyst planned twice from the lineitem
    # scan (guide §7.2, duplicated subtrees; same fix as
    # _histogram_rank_bracket). The chained WindowExec shares the one
    # exchange+sort; no new shuffle.
    wn = W.partitionBy("flag").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = hist.select(
        "flag",
        "cents",
        F.sum("hw")
        .over(
            W.partitionBy("flag")
            .orderBy("cents")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("__cumw"),
        F.sum("hw").over(wn).cast("bigint").alias("__tw"),
        F.sum("hn").over(wn).cast("bigint").alias("__n"),
    )
    return (
        cum.groupBy(F.col("flag").alias("l_returnflag"))
        .agg(
            F.max("__n").alias("n"),
            F.max("__tw").alias("total_qty"),
            F.min(
                F.when(2 * F.col("__cumw") >= F.col("__tw"), F.col("cents"))
            )
            .cast("bigint")
            .alias("wmedian_cents"),
        )
    )


# ---------------------------------------------------------------------------
# qx78: frequent event-sequence motifs — consecutive in-session
# event-type trigrams with support counts. The sequential-pattern-mining
# primitive (the bounded-window core of SPAM/PrefixSpan) behavior
# analytics runs to find funnels nobody designed: a high-support
# "view > error > view" says retry loops; "search > view > purchase"
# validates the intended funnel.
# ---------------------------------------------------------------------------

MOTIF_MIN_SUPPORT = 1


@register(
    "qx78_sequence_motifs",
    oracle=f"""
    WITH {SESSIONIZED_SQL},
    tri AS (
        SELECT event_type AS t1,
               LEAD(event_type, 1) OVER w AS t2,
               LEAD(event_type, 2) OVER w AS t3,
               user_id
        FROM s
        WINDOW w AS (PARTITION BY user_id, session_seq
                     ORDER BY ts, event_id))
    SELECT t1, t2, t3,
           CAST(COUNT(*) AS BIGINT)                 AS support,
           CAST(COUNT(DISTINCT user_id) AS BIGINT)  AS n_users
    FROM tri WHERE t3 IS NOT NULL
    GROUP BY t1, t2, t3
    HAVING COUNT(*) >= {MOTIF_MIN_SUPPORT}
    """,
)
def qx78_sequence_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t1, t2, t3, support, n_users) for every consecutive in-session
    event-type trigram (support floor MOTIF_MIN_SUPPORT; output is
    bounded by the |types|^3 motif alphabet regardless) — session
    boundaries cut the sequence, so a motif never spans the 30-minute
    inactivity gap.

    Plan: the shared sessionizer's user_id shuffle also serves the
    lead windows (session partitions are sub-partitions of user
    partitions, no second exchange); trigram expansion is two leads —
    one output row per event, never a self-join; the final hash-agg
    keys on the |types|³-bounded motif alphabet. At 100 TB this is one
    user-keyed exchange plus an alphabet-sized agg."""
    s = sessionize_events(load_table(spark, sf_dir, "events"))
    w = W.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    tri = s.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
        "user_id",
    ).filter(F.col("t3").isNotNull())
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("support"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
        .filter(F.col("support") >= MOTIF_MIN_SUPPORT)
    )


# ---------------------------------------------------------------------------
# qx79: LINEAR multi-touch attribution — qx39 gives the first touch all
# the credit; here every event preceding a purchase in its session gets
# an equal share (1e6 div k micro-credits for a purchase with k prior
# touches), aggregated per channel. Exact integer credits: the truncating
# division is applied per purchase identically in both engines, so the
# totals hash-match.
# ---------------------------------------------------------------------------


@register(
    "qx79_linear_attribution",
    oracle=f"""
    WITH {SESSIONIZED_SQL},
    r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                                     ORDER BY ts, event_id) AS rn
        FROM s),
    p AS (
        SELECT user_id, session_seq, ts, event_id, v1000, rn - 1 AS k
        FROM r WHERE event_type = 'purchase' AND rn > 1),
    touch AS (
        SELECT t.event_type, p.k, p.v1000
        FROM r t JOIN p
          ON t.user_id = p.user_id AND t.session_seq = p.session_seq
         AND (t.ts < p.ts OR (t.ts = p.ts AND t.event_id < p.event_id)))
    SELECT event_type,
           CAST(SUM(1000000 // k) AS BIGINT)          AS credit_e6,
           CAST(COUNT(*) AS BIGINT)                   AS n_touches,
           CAST(SUM(v1000 // k) AS BIGINT)            AS revenue_1000_share
    FROM touch GROUP BY event_type
    """,
)
def qx79_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, credit_e6, n_touches, revenue_1000_share): every
    event strictly before a purchase in the same session earns
    1e6 div k micro-credits and v1000 div k milli-revenue, k = the
    purchase's prior-touch count (its session row_number - 1).
    Purchases opening a session (k = 0) attribute nothing.

    Plan: the sessionizer's user shuffle serves the row_number window
    too; the prior-touch join is session-bounded (purchases join only
    their OWN session's earlier rows — quadratic in session length, the
    same bounded-basket argument as qx36/qx48, never cross-user), and
    the final agg keys on the channel alphabet. Integer divisions
    truncate identically cross-engine per the qx29 identity."""
    s = sessionize_events(load_table(spark, sf_dir, "events"))
    w = W.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    r = s.withColumn("rn", F.row_number().over(w))
    p = (
        r.filter((F.col("event_type") == "purchase") & (F.col("rn") > 1))
        .select(
            "user_id",
            "session_seq",
            F.col("ts").alias("pts"),
            F.col("event_id").alias("pid"),
            F.col("v1000").alias("pv"),
            (F.col("rn") - 1).alias("k"),
        )
    )
    touch = r.join(p, ["user_id", "session_seq"]).filter(
        (F.col("ts") < F.col("pts"))
        | ((F.col("ts") == F.col("pts")) & (F.col("event_id") < F.col("pid")))
    )
    return touch.groupBy("event_type").agg(
        F.sum(F.expr("1000000 div k")).cast("bigint").alias("credit_e6"),
        F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        F.sum(F.expr("pv div k")).cast("bigint").alias("revenue_1000_share"),
    )
