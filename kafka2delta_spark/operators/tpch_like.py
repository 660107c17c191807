"""Classic TPC-H query shapes adapted to the synthetic star schema.

The reference exercises no joins/subqueries at all (SURVEY §2.1 — the only
join-like op is the MERGE's internal join); this module supplies the decision
-support shapes SURVEY §2.2 mandates that aren't yet covered by
``operators/relational.py``: correlated scalar subqueries, EXISTS /
NOT-EXISTS semi/anti joins, IN / NOT-IN subqueries, HAVING, scalar-aggregate
subqueries, and disjunctive multi-table predicates.

The schema has no ``partsupp`` table and no comment/date columns, so each
query keeps the *plan shape* of its TPC-H namesake while substituting
available columns (e.g. Q2's supply cost becomes the observed per-supplier
unit price from ``lineitem``).

Scale posture (100 TB): correlated subqueries are decorrelated by hand into
aggregate-then-join form (the same rewrite Catalyst's subquery decorrelation
performs) so nothing executes per-row; every dimension side (part, supplier,
nation, region — small by construction) is broadcast so the lineitem fact
table shuffles only on true fact-fact joins (orderkey); scalar aggregates
(max revenue, global average) are single-row broadcasts, never driver
round-trips.

Monetary sums are rounded to 2dp and ratios to 4dp on both engines so
double summation order can't flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka2delta_spark.queryset import register
from kafka2delta_spark.sources.tables import load_table
from kafka2delta_spark.operators.hints import dim_broadcast


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


def _revenue() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _revenue_dec() -> F.Column:
    """Per-row DECIMAL(18,4) revenue for SUM accumulation (the q09/q46
    idiom): the double product is IEEE-identical on both engines, the
    4dp cast makes the subsequent SUM exact and order-independent. A
    double SUM rounds to a different cent depending on row order — the
    factor-8 scale-parity sweep flipped q20's grand total exactly so."""
    return _revenue().cast("decimal(18,4)")


# ---------------------------------------------------------------------------
# Q2 shape — min-cost supplier per part (aggregate + argmin join-back)
# ---------------------------------------------------------------------------
@register(
    "q02_min_price_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               CAST((2 * SUM(CAST(floor(l_extendedprice / l_quantity * 100000)
                                  AS BIGINT)) + 1000 * COUNT(*))
                    // (2000 * COUNT(*)) AS BIGINT) AS unit_price_cents
        FROM lineitem GROUP BY 1, 2),
    m AS (SELECT partkey, MIN(unit_price_cents) AS min_price FROM ps GROUP BY 1)
    SELECT p.p_partkey, p.p_brand, s.s_name AS supplier_name,
           ps.unit_price_cents
    FROM ps
    JOIN m        ON ps.partkey = m.partkey AND ps.unit_price_cents = m.min_price
    JOIN part p   ON p.p_partkey = ps.partkey
    JOIN supplier s ON s.s_suppkey = ps.suppkey
    WHERE p.p_size <= 5
    """,
)
def q02_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape without partsupp: cheapest observed supplier per part.

    The selective dim filter (p_size <= 5) broadcast-joins against the
    fact BEFORE the aggregation, so the big shuffle carries only matching
    parts — at 100 TB this is the difference between aggregating the whole
    fact and ~a tenth of it. The correlated MIN decorrelates into one
    window min over the agg output (ties kept, like the SQL): two shuffles
    total — the (partkey, suppkey) agg and the partkey window — instead of
    agg + min-agg + self-join.

    Monetary math: the per-row unit price is floored to 5dp fixed-point
    (the double division is IEEE-identical on both engines; the floor
    makes it integer), the group mean runs as exact integer arithmetic,
    and the half-up round to CENTS is integer division — at sf0.1 three
    groups sit exactly on a half-cent, where ROUND(AVG(double), 2)
    diverged between engines (Spark rounds the shortest decimal repr,
    DuckDB the scaled binary value)."""
    li = load_table(spark, sf_dir, "lineitem")
    part5 = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 5)
        .select("p_partkey", "p_brand")
    )
    supp = load_table(spark, sf_dir, "supplier")
    r5 = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * 100000
    ).cast("bigint")
    ps = (
        li.join(dim_broadcast(part5), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("__r5", r5)
        .groupBy("p_partkey", "p_brand", F.col("l_suppkey").alias("suppkey"))
        .agg(
            F.expr(
                "(2 * sum(__r5) + 1000 * count(*)) div (2000 * count(*))"
            ).alias("unit_price_cents")
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.withColumn("min_price", F.min("unit_price_cents").over(w))
        .filter(F.col("unit_price_cents") == F.col("min_price"))
        .join(dim_broadcast(supp), F.col("suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_brand",
            F.col("s_name").alias("supplier_name"),
            "unit_price_cents",
        )
    )


# ---------------------------------------------------------------------------
# Q4 shape — order priority with EXISTS (left-semi join, mixed condition)
# ---------------------------------------------------------------------------
@register(
    "q04_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left-semi join with a condition spanning both sides
    (shipdate > orderdate + 60d). The semi join shuffles both inputs on the
    order key and short-circuits per match — never materializing the
    multiplicity of lineitem matches."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-07-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q6 shape — forecast revenue (pure scan-filter-agg; pushdown showcase)
# ---------------------------------------------------------------------------
@register(
    "q06_forecast_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount
                               AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three predicates push to the parquet scan (min/max row-group
    skipping on shipdate); single global agg — the whole query is one
    codegen'd scan stage plus a 1-row reduce."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount"))
                    .cast("decimal(18,4)")
                ), 2,
            ).cast("double").alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q7 shape — volume shipping between two nations, by year
# ---------------------------------------------------------------------------
@register(
    "q07_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS INT) AS l_year,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON n1.n_nationkey = s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nation-pair disjunction is applied after both dimension joins;
    supplier/customer/nation are broadcast so lineitem⋈orders (orderkey) is
    the only shuffle. Catalyst pushes the pair filter into the broadcast
    sides where possible."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(dim_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.round(F.sum(_revenue_dec()), 2).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 shape — market share of one supplier nation within a customer region
# ---------------------------------------------------------------------------
@register(
    "q08_market_share",
    oracle="""
    WITH all_nations AS (
        SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n1.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n2.n_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
    SELECT o_year,
           ROUND(CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_3'
                                    THEN volume ELSE 0 END
                               AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE), 4)
               AS mkt_share
    FROM all_nations GROUP BY o_year
    """,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate ratio over a 7-table join; every dimension is
    broadcast, so the only shuffle is lineitem⋈orders plus the tiny o_year
    agg. The CASE lives inside the aggregate — one pass, no self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_rkey")
    )
    volume = _revenue().alias("volume")
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(dim_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(dim_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("n2_rkey") == F.col("r_regionkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"), volume, "supp_nation"
        )
    )
    national = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
        .otherwise(0.0)
        .cast("decimal(18,4)")
    ).cast("double")
    return base.groupBy("o_year").agg(
        F.round(
            national / F.sum(F.col("volume").cast("decimal(18,4)")).cast("double"), 4
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9 shape — product-line profit by nation and year
# ---------------------------------------------------------------------------
@register(
    "q09_product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.1 * p_retailprice * l_quantity AS DECIMAL(18,4)))
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 with supply cost modeled as 10% of retail price (no
    partsupp table). The LIKE filter prunes part before the broadcast;
    profit is computed per row then hash-aggregated by (nation, year).
    Amounts are summed as DECIMAL(18,4) — exact, order-independent
    arithmetic — so the multi-million-row summation can't flip the final
    cent between engines the way double accumulation order does."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    profit = (
        _revenue() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(dim_broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q14 shape — promotion revenue ratio (conditional agg, month window)
# ---------------------------------------------------------------------------
@register(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                                            THEN l_extendedprice * (1 - l_discount)
                                            ELSE 0 END
                                       AS DECIMAL(18,4))) AS DOUBLE)
                 / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                 AS DECIMAL(18,4))) AS DOUBLE), 4)
               AS promo_revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One month of lineitem (scan-pruned) ⋈ broadcast part; the promo/total
    ratio is a single conditional aggregate — no second pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-10-01 00:00:00"))
    )
    part = load_table(spark, sf_dir, "part")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _revenue())
        .otherwise(0.0)
        .cast("decimal(18,4)")
    ).cast("double")
    return (
        li.join(dim_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * promo / F.sum(_revenue_dec()).cast("double"), 4
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape — top supplier (scalar MAX subquery)
# ---------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey AS suppkey,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                  AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
        GROUP BY 1)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-aggregate subquery: the 1-row MAX is cross-broadcast against
    the per-supplier revenue agg (ties kept). No driver collect — the max
    flows through the plan as a broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    # NOT pinned: measured — checkpointing the per-supplier agg for its
    # two consumers (scalar MAX + tie filter) ran 1.0 s -> 2.3 s; the
    # duplicate subtree is one shipdate-pruned scan + hash-agg, cheaper
    # re-run in parallel than materialized through a barrier
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.round(F.sum(_revenue_dec()), 2).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(dim_broadcast(supp), F.col("suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16 shape — supplier count by part attrs (NOT-IN anti-join)
# ---------------------------------------------------------------------------
@register(
    "q16_parts_supplier_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN → broadcast left-anti join against the (tiny) excluded
    supplier set; distinct-count shuffles on the group keys with the suppkey
    carried for the distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(dim_broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(dim_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17 shape — small-quantity revenue (correlated AVG subquery)
# ---------------------------------------------------------------------------
@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar AVG decorrelated into a per-part aggregate joined
    back on partkey (Catalyst's own rewrite, done explicitly): the fact
    table is scanned twice but both passes are scan→agg/join with pushdown,
    never a per-row subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        li.join(dim_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_q, F.col("l_partkey") == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                .cast("double") / 7.0, 2,
            ).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q18 shape — large-volume orders (HAVING via agg-filter + join back)
# ---------------------------------------------------------------------------
@register(
    "q18_large_orders",
    oracle="""
    SELECT c_name, o_orderkey, o_orderdate,
           ROUND(o_totalprice, 2) AS total_price,
           ROUND(SUM(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(l_quantity) > 150
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter. The quantity agg happens on
    (orderkey) BEFORE joining customer/orders detail, so the filter shrinks
    the join input from every order to the rare heavy ones — the idiomatic
    version of TPC-H Q18's IN-subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    heavy = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        heavy.join(orders, heavy.l_orderkey == orders.o_orderkey)
        .join(dim_broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("total_price"),
            "total_qty",
        )
    )


# ---------------------------------------------------------------------------
# Q19 shape — disjunctive multi-table predicates
# ---------------------------------------------------------------------------
@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-conjuncts across both join sides. Catalyst extracts the
    common single-table residuals (brand IN (...), quantity <= 30) and
    pushes them below the join; the full disjunction evaluates post-join
    in one codegen stage."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")

    def arm(brand: str, max_size: int, qlo: float, qhi: float) -> F.Column:
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, max_size)
            & F.col("l_quantity").between(qlo, qhi)
        )

    pred = (
        arm("Brand#12", 15, 1, 11) | arm("Brand#23", 25, 10, 20) | arm("Brand#34", 35, 20, 30)
    )
    return (
        li.join(dim_broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(pred)
        .agg(F.round(F.sum(_revenue_dec()), 2).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q22 shape — rich customers with no orders (scalar avg + NOT EXISTS)
# ---------------------------------------------------------------------------
@register(
    "q23_rich_inactive_customers",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4)))
                                   AS DOUBLE) / COUNT(*)
                       FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q23_rich_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar AVG subquery (1-row broadcast) + NOT EXISTS
    (left-anti on the urgent-orders custkey set — every customer here has
    some order, so plain no-orders would be empty). The anti join shuffles on
    custkey; at scale the distinct-custkey side is far smaller than orders
    and AQE converts it to broadcast when it fits."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.filter(F.col("o_orderpriority") == "1-URGENT"),
            cust.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 2)
            .cast("double").alias("totacctbal"),
        )
    )


# -- Q21 shape: waiting suppliers (double-correlated EXISTS/NOT EXISTS) -----


@register(
    "q28_waiting_suppliers",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s, lineitem l1, orders o
    WHERE s.s_suppkey = l1.l_suppkey
      AND o.o_orderkey = l1.l_orderkey
      AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def q28_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the *sole* late shipper on a
    finalized multi-supplier order (late = shipped >60 days after the order
    date; the dataset has no commit/receipt dates).

    Decorrelated Spark-first plan instead of the literal double
    subquery: per-order supplier counts (one hash-agg over lineitem) and
    per-order *late*-supplier counts (hash-agg over the late slice) replace
    the EXISTS / NOT EXISTS pair —

      * EXISTS another supplier       ⟺  n_supp  >= 2
      * NOT EXISTS other late one    ⟺  n_late_supp == 1 (l1 itself is late)

    TWO CHAINED aggregates on one lineitem pass compute everything: the
    (orderkey, suppkey) level counts each supplier's late rows, and the
    orderkey level re-aggregates those rows into n_supp, n_late_supp,
    the late-row total, and (since n_late_supp == 1 survivors have
    exactly one late supplier) that supplier's key. The second agg
    reuses the first's partitioning (same key prefix — no new
    exchange), and neither agg holds more than one distinct expression,
    so Catalyst never plans an Expand (the multi-distinct cost cliff a
    single fused agg with two count_distincts measured: 6.2 s vs 2.1 s
    for the old three-scan plan; this form is one scan AND no Expand).
    Restricting to finalized orders is value-identical: an orderkey has
    one status, and only finalized orders can survive the late filter.
    NULL suppkeys count nowhere, exactly like the original plan, whose
    supplier join dropped them. The final supplier join broadcasts
    (suppliers are tiny vs lineitem). Deterministic LIMIT:
    (numwait DESC, s_name) is a total order because s_name is the
    grouping key."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")

    fin = li.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        orders.filter(F.col("o_orderstatus") == "F").select(
            "o_orderkey", "o_orderdate"
        ),
        li.l_orderkey == F.col("o_orderkey"),
    )
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    per_supp = fin.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(is_late, F.lit(1))).alias("late_rows")
    )
    nn = F.col("l_suppkey").isNotNull()
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count("l_suppkey").alias("n_supp"),
        F.count(
            F.when(nn & (F.col("late_rows") > 0), F.lit(1))
        ).alias("n_late_supp"),
        F.sum(F.when(nn, F.col("late_rows"))).alias("n_late_rows"),
        F.max(
            F.when(F.col("late_rows") > 0, F.col("l_suppkey"))
        ).alias("late_suppkey"),
    )
    sole_late = per_order.filter(
        (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)
    )
    return (
        sole_late.join(
            dim_broadcast(supplier),
            sole_late.late_suppkey == supplier.s_suppkey,
        )
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
