"""Core relational surface: scans, filters, joins, aggregations, sorts.

The reference exercises only scans/filters/projections/distinct (SURVEY
§2.1) — this module provides the general surface SURVEY §2.2 mandates.
Every query is declarative DataFrame code: Catalyst handles predicate
pushdown, column pruning, and join selection; dimension joins are
explicitly broadcast where a dimension is small by construction.

Scale notes are per-query docstrings; the common posture:
  * joins on the fact table shuffle on the join key — dimension sides are
    broadcast so the fact table never shuffles for them;
  * aggregations are hash-aggs with map-side partial combine;
  * top-k uses sort-limit (Spark's TakeOrderedAndProject — no full sort).

Monetary aggregates are rounded to 2 decimals on both Spark and oracle
sides so double summation-order differences can't flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka2delta_spark.queryset import register
from kafka2delta_spark.sources.tables import load_table
from kafka2delta_spark.operators.hints import dim_broadcast


# ---------------------------------------------------------------------------
# Q1 — pricing summary (TPC-H Q1 shape): scan + filter + 8-agg groupBy
# ---------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                   AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
                AS DOUBLE)                                             AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,4))), 2) AS DOUBLE)        AS sum_disc_price,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                              AS DECIMAL(18,6))), 2) AS DOUBLE)        AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                   AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(l_extendedprice), 4)                          AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                 / COUNT(l_discount), 4)                               AS avg_disc,
           COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter pushed to the parquet scan; single hash-agg with partial
    combine — at 100 TB this is one shuffle of ~6 grouped rows per mapper.

    Monetary sums/averages accumulate as per-row DECIMAL casts (the
    q09/q46 idiom, both engines): exact and order-independent, where a
    double SUM rounds to a different cent depending on row order — caught
    at the grand-total magnitude by the factor-8 scale-parity sweep
    (q20's class; quantity is integer-valued so its double sum is already
    exact). The decimal scale must make the cast EXACT, not a rounding
    step: 2dp money and 4dp two-factor products fit DECIMAL(18,4), but
    sum_charge's three-factor product (2dp × 2dp × 2dp) is a 6dp-exact
    rational, so it casts to DECIMAL(18,6) — at 18,4 the forced midpoint
    rounding of a 6dp value diverges between engines (BigDecimal's exact
    binary expansion vs scaled-double nearbyint). Averages are pinned as
    exact-sum / count — engine-internal AVG(decimal) result scales
    differ between engines."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))

    def _dec(col):
        return col.cast("decimal(18,4)")

    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(_dec(F.col("l_extendedprice"))), 2)
            .cast("double").alias("sum_base_price"),
            F.round(F.sum(_dec(disc_price)), 2).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum((disc_price * (1 + F.col("l_tax"))).cast("decimal(18,6)")), 2
            ).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(
                F.sum(_dec(F.col("l_extendedprice"))).cast("double")
                / F.count("l_extendedprice"), 4,
            ).alias("avg_price"),
            F.round(
                F.sum(_dec(F.col("l_discount"))).cast("double")
                / F.count("l_discount"), 4,
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3 — shipping priority: 3-way join + agg + top-k
# ---------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer is a dimension → broadcast; lineitem⋈orders shuffles on the
    order key. Top-k runs as TakeOrderedAndProject (no global sort).
    Deterministic tie-break on l_orderkey."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(18,4)")
                ), 2,
            ).cast("double").alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume: 6-way join, dims broadcast
# ---------------------------------------------------------------------------
@register(
    "q05_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region/nation/supplier/customer all broadcast (small by construction);
    the only shuffle joins lineitem⋈orders on the order key. Join order is
    declared fact-first so Catalyst keeps the fact table un-shuffled for
    every broadcast side."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim_broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            dim_broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (cust.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(18,4)")
                ), 2,
            ).cast("double").alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# join types: semi / anti
# ---------------------------------------------------------------------------
@register(
    "q10_customers_without_orders",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
)
def q10_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders since 1997.
    The orders side is filtered and reduced to its join key before the
    anti-join → minimal shuffle payload."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q11_parts_with_lineitems",
    oracle="""
    SELECT p_brand, COUNT(*) AS n_parts
    FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    GROUP BY p_brand
    """,
)
def q11_parts_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ---------------------------------------------------------------------------
# outer joins
# ---------------------------------------------------------------------------
@register(
    "q12_order_counts_left_join",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q12_order_counts_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders; COUNT(col)
    skips the NULLs from non-matches."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "q13_full_outer_nation_activity",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp
                FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def q13_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides — aggregate-before-join
    keeps the shuffle to distinct keys, not raw rows."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cust.join(supp, cust.nk_c == supp.nk_s, "full_outer").select(
        F.coalesce("nk_c", "nk_s").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# ---------------------------------------------------------------------------
# grouping sets / rollup / cube
# ---------------------------------------------------------------------------
@register(
    "q20_rollup_order_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q20_rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — Spark expands to a single Expand+hash-agg (one pass).

    The grand-total cell sums the WHOLE table, so the money sum runs as
    per-row DECIMAL(18,4) (exact, order-independent): the double form
    flipped its last cent at 1.2M rows in the factor-8 scale-parity
    sweep (…68.49 vs …68.48) — the q46 accumulation-order class, just
    needing the rollup's largest group to surface."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
        .cast("double").alias("total"),
    )


@register(
    "q21_cube_returnflag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q21_cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over the two lineitem status dims."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


@register(
    "q22_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def q22_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (same Catalyst plan as the
    DataFrame form; SQL is clearer for non-hierarchical sets)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


# ---------------------------------------------------------------------------
# lateral join
# ---------------------------------------------------------------------------
@register(
    "q24_lateral_topn_per_nation",
    oracle="""
    SELECT n.n_name, c.c_name, c.c_acctbal
    FROM nation n,
    LATERAL (SELECT c_name, c_acctbal FROM customer
             WHERE c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_name LIMIT 2) c
    """,
)
def q24_lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the SQL
    form of per-group top-k (top-2 customers by balance per nation).
    Catalyst decorrelates it into the same ranked-window shape as q31's
    DataFrame version, so there is no per-nation re-execution: one shuffle
    on the correlation key, no matter how many outer rows. Deterministic
    tie-break on (c_acctbal DESC, c_name) keeps both engines' LIMIT
    identical."""
    for t in ("nation", "customer"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM v_nation n,
        LATERAL (SELECT c_name, c_acctbal FROM v_customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        """
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------
@register(
    "q25_set_ops_active_custkeys",
    oracle="""
    WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'),
         y97 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
                   AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    SELECT 'both'      AS cohort, COUNT(*) AS n FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
    UNION ALL
    SELECT 'only_1996' AS cohort, COUNT(*) AS n FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
    UNION ALL
    SELECT 'only_1997' AS cohort, COUNT(*) AS n FROM (SELECT * FROM y97 EXCEPT SELECT * FROM y96)
    """,
)
def q25_set_ops_active_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect / exceptAll / union over distinct yearly customer cohorts.

    Kept on the literal set-op plan: a one-pass per-custkey flag
    aggregate (pinned for its three count consumers) was measured at
    2.0 s vs 1.0 s here — each cohort is a date-pruned scan + distinct,
    and the six pruned scans run in parallel, cheaper than one
    materialization barrier."""
    orders = load_table(spark, sf_dir, "orders")

    def cohort(y0: str, y1: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(f"{y0}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y1}-01-01 00:00:00").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y96, y97 = cohort("1996", "1997"), cohort("1997", "1998")
    both = y96.intersect(y97).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("cohort"), "n"
    )
    only96 = y96.exceptAll(y97).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_1996").alias("cohort"), "n"
    )
    only97 = y97.exceptAll(y96).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_1997").alias("cohort"), "n"
    )
    return both.unionByName(only96).unionByName(only97)


# ---------------------------------------------------------------------------
# distinct counting
# ---------------------------------------------------------------------------
@register(
    "q26_distinct_counts",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q26_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expands to a two-phase agg). The
    approximate variant is q27 — a portable KMV sketch with a full
    value-hash oracle (HLL estimates would differ across engines)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count_distinct(F.col("o_custkey")).alias("n_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def _q27_oracle() -> str:
    from kafka2delta_spark.operators.advanced import kmv_grouped_oracle_cte

    parts = kmv_grouped_oracle_cte("l_returnflag", "l_partkey", "lineitem")
    orders = kmv_grouped_oracle_cte("l_returnflag", "l_orderkey", "lineitem")
    return f"""
    WITH ep AS ({parts}), eo AS ({orders})
    SELECT ep.l_returnflag,
           ep.est AS approx_parts,
           eo.est AS approx_orders
    FROM ep JOIN eo USING (l_returnflag)
    """


@register("q27_approx_distinct", oracle=_q27_oracle())
def q27_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx distinct at scale — sketch merge instead of key shuffle.
    Implemented with the portable KMV (k-minimum-values) sketch rather
    than ``approx_count_distinct``: Spark's HLL++ registers are
    engine-private, so an HLL answer can only ever be rows-only checked,
    while the KMV estimate (qx19, Bar-Yossef et al. 2002) is integer
    arithmetic over md5 prefixes — bit-identical on any engine, so this
    query carries a full value-hash oracle. Same mergeability story as
    HLL: per-partition bottom-K partials combine associatively (see
    ``kmv_merge``); state is K values per (group, bucket) regardless of
    data size. HLL remains available via ``approx_count_distinct`` when
    portability doesn't matter; a cross-engine pipeline standardizes on
    the sketch both ends can replay.

    Kept as two columnar passes: a kind-tagged single-explode fusion
    (both hashes emitted per row, kind in the grouping key) was measured
    at 6.1 s vs 1.8 s here — the generator doubles the pre-aggregation
    row stream and defeats whole-stage codegen on the md5 projection,
    while the two plain passes each stream one narrow column through a
    map-side bottom-K."""
    from kafka2delta_spark.operators.advanced import kmv_grouped_estimate

    li = load_table(spark, sf_dir, "lineitem")
    parts = kmv_grouped_estimate(li, "l_returnflag", "l_partkey", "approx_parts")
    orders = kmv_grouped_estimate(
        li, "l_returnflag", "l_orderkey", "approx_orders"
    )
    return parts.join(F.broadcast(orders), "l_returnflag")
