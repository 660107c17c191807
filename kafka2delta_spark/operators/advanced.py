"""Map-typed columns, explicit scale patterns, and the SQL entry point.

Three gaps this module closes:

  * **MapType + map higher-order functions** (SURVEY §2.2 lists map
    constructors/HOFs; the reference has no ArrayType/MapType anywhere) —
    q45 builds maps from columns and pushes them through
    ``transform_values`` / ``map_filter`` / ``map_concat`` / ``explode``,
    oracle-checked by replaying the same semantics as plain SQL unions.

  * **Salted two-phase aggregation** (the standard skew-defeating shape) —
    q62 aggregates a pathologically skewed key (5 event types over the
    whole table) by first aggregating on (key, salt) so every core gets
    work, then combining the 32 partials per key. Identical result to the
    direct groupBy, which is what the oracle computes.

  * **``spark.sql`` front end** — q46 runs one SQL text (CTE, joins with
    BROADCAST hints, window RANK) over temp views, proving both front ends
    share the same Catalyst path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kafka2delta_spark.operators.rankstats import exact_percentiles_by_rank
from kafka2delta_spark.queryset import register
from kafka2delta_spark.functions.measure import finite as finite_m
from kafka2delta_spark.sources.tables import load_table
from kafka2delta_spark.session import local_rows

N_SALTS = 32


@register(
    "q45_map_functions",
    oracle="""
    WITH src AS (
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax
        FROM lineitem WHERE l_orderkey < 100)
    SELECT l_orderkey, l_linenumber, 'qty' AS key,
           l_quantity * 2 AS value
    FROM src WHERE l_quantity * 2 >= 10
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'price', l_extendedprice
    FROM src WHERE l_extendedprice >= 10
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'disc', l_discount * 100
    FROM src WHERE l_discount * 100 >= 10
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax * 100
    FROM src WHERE l_tax * 100 >= 10
    """,
)
def q45_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType end-to-end: build a metric map per lineitem, double the qty
    entry with ``transform_values``, merge a tax entry with ``map_concat``,
    drop small values with ``map_filter``, and explode entries back to
    rows. The oracle replays the identical arithmetic as four plain SQL
    branches — checking map semantics, not just map plumbing. All map ops
    are native expressions (no shuffle: one scan, one projection)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    m = F.create_map(
        F.lit("qty"), F.col("l_quantity"),
        F.lit("price"), F.col("l_extendedprice"),
        F.lit("disc"), F.col("l_discount") * 100,
    )
    doubled = F.transform_values(
        m, lambda k, v: F.when(k == "qty", v * 2).otherwise(v)
    )
    merged = F.map_concat(doubled, F.create_map(F.lit("tax"), F.col("l_tax") * 100))
    kept = F.map_filter(merged, lambda k, v: v >= 10)
    return li.select(
        "l_orderkey", "l_linenumber", F.explode(kept).alias("key", "value")
    )


@register(
    "q62_salted_heavy_hitters",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS total_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def q62_salted_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for a pathologically skewed key: only
    5 event types exist, so a direct groupBy funnels the whole table into
    5 reducers. Phase 1 aggregates on (event_type, hash(event_id) % 32) —
    32x the parallelism, map-side combine still applies; phase 2 merges
    the 32 partials per key (160 rows — trivial). COUNT(DISTINCT user_id)
    composes across salts as a set union: phase 1 collects per-salt
    distinct sets, phase 2 merges with array_distinct(flatten(...)). The
    oracle computes the plain single-phase groupBy — results must be
    identical."""
    ev = load_table(spark, sf_dir, "events")
    salt = F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS)).alias("salt")
    phase1 = ev.groupBy("event_type", salt).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("value").alias("pv"),
        F.collect_set("user_id").alias("pu"),
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n"),
            F.round(F.sum("pv"), 2).alias("total_value"),
            F.size(F.array_distinct(F.flatten(F.collect_list("pu")))).alias("n_users"),
        )
        .withColumn("n_users", F.col("n_users").cast("long"))
    )


@register(
    "q46_sql_api_revenue_rank",
    oracle="""
    WITH rev AS (
        -- DECIMAL(18,4) per-row cast before SUM: exact, order-independent
        -- accumulation (the q09 pattern) — a double SUM rounds to a
        -- different cent depending on row order (caught by the timeskew
        -- fixture's hash-shuffled physical order)
        SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
               CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation   ON n_nationkey = c_nationkey
        GROUP BY 1, 2)
    SELECT nation, o_year, revenue,
           CAST(RANK() OVER (PARTITION BY o_year ORDER BY revenue DESC) AS INT)
               AS rev_rank
    FROM rev
    QUALIFY rev_rank <= 3
    """,
)
def q46_sql_api_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same engine through the ``spark.sql`` entry point: temp views +
    one SQL text (CTE, 4-way join, window RANK, per-year top-3). Catalyst
    compiles it to the identical physical plan the DataFrame API would get
    — proving both front ends share the full optimizer path. Views are
    per-table and idempotent; BROADCAST hints mark the dimension sides."""
    for t in ("lineitem", "orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        WITH rev AS (
            SELECT /*+ BROADCAST(v_customer, v_nation) */
                   n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
                   CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                       AS DECIMAL(18,4))), 2)
                        AS DOUBLE) AS revenue
            FROM v_lineitem
            JOIN v_orders   ON o_orderkey = l_orderkey
            JOIN v_customer ON c_custkey = o_custkey
            JOIN v_nation   ON n_nationkey = c_nationkey
            GROUP BY 1, 2)
        SELECT nation, o_year, revenue, rev_rank FROM (
            SELECT nation, o_year, revenue,
                   CAST(RANK() OVER (PARTITION BY o_year
                                     ORDER BY revenue DESC) AS INT) AS rev_rank
            FROM rev)
        WHERE rev_rank <= 3
        """
    )


# -- Bloom-filter semi-join reduction ---------------------------------------
#
# Spark itself injects bloom runtime filters under AQE
# (spark.sql.optimizer.runtime.bloomFilter.enabled), but only for shuffle
# joins it can see through; q69 demonstrates the explicit form for when the
# build side is a computed key set. Parameters sized so the false-positive
# rate stays < 1% at the build cardinality (m/n ≈ 21 bits/key, k = 3).
BLOOM_BITS = 1 << 16
BLOOM_HASHES = 3
_WORD = 64


def _bloom_positions(key: F.Column) -> list[F.Column]:
    """k bit positions for a key — pmod (never abs: abs(LONG_MIN)
    overflows) of independently-seeded xxhash64."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(BLOOM_BITS))
        for i in range(BLOOM_HASHES)
    ]


def bloom_bitmap(keys: DataFrame, key_col: str) -> DataFrame:
    """Aggregate a key column into a single-row ``map<long, long>`` bloom
    bitmap (word index → 64-bit word). Distributed build: explode bit
    positions, two-level ``bit_or`` hash-agg (map-side partials), one
    metadata-sized row out — the same shape Spark's own
    InjectRuntimeFilter produces driver-side."""
    pos = keys.select(
        F.explode(F.array(*_bloom_positions(F.col(key_col)))).alias("pos")
    )
    words = pos.select(
        F.shiftright(F.col("pos"), 6).alias("word"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("pos") % _WORD).cast("int")
        ).alias("mask"),
    )
    return (
        words.groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
        .agg(
            F.map_from_arrays(
                F.collect_list("word"), F.collect_list("mask")
            ).alias("bloom")
        )
    )


def bloom_might_contain(key: F.Column, bloom_col: str = "bloom") -> F.Column:
    """Membership test against :func:`bloom_bitmap`'s map column: every one
    of the k bits must be set. Pure codegen expressions (element_at +
    bitwiseAND) — no UDF, no driver round-trip."""
    cond = F.lit(True)
    for p in _bloom_positions(key):
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % _WORD).cast("int")
        )
        word = F.coalesce(
            F.element_at(F.col(bloom_col), F.shiftright(p, 6)), F.lit(0).cast("long")
        )
        cond = cond & (word.bitwiseAND(mask) == mask)
    return cond


@register(
    "q69_bloom_semi_join",
    oracle="""
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT)                          AS n_items,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(18,4))), 2) AS DOUBLE)
                                                             AS urgent_revenue
    FROM lineitem l
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_orderkey = l.l_orderkey
                    AND o.o_orderpriority = '1-URGENT')
    GROUP BY l.l_returnflag
    """,
)
def q69_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi-join: revenue of lineitems on urgent orders.

    Scale pattern: before shuffling the (huge) probe side into the exact
    semi-join, drop rows that cannot match using a broadcast bloom bitmap
    built from the key set. The filter runs map-side, before any exchange,
    so at 100 TB the shuffle carries only ~|matches| + FPR·|probe| rows
    instead of the whole fact table. False positives are removed by the exact semi-join
    that follows, so the result is identical to the plain semi-join — which
    is exactly what the oracle computes (EXISTS). The bloom hash function
    therefore needs no cross-engine parity.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    bitmap = bloom_bitmap(urgent, "o_orderkey")
    prefiltered = (
        lineitem.join(F.broadcast(bitmap))
        .filter(bloom_might_contain(F.col("l_orderkey")))
        .drop("bloom")
    )
    exact = prefiltered.join(
        urgent, prefiltered["l_orderkey"] == urgent["o_orderkey"], "left_semi"
    )
    return exact.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
                .cast("decimal(18,4)")
            ), 2,
        ).cast("double").alias("urgent_revenue"),
    )


# q48: Z-order (Morton) layout keys — the data-layout op behind
# OPTIMIZE ... ZORDER BY: interleave the bits of two scan dimensions so
# files written in z-value order have tight min-max ranges on BOTH
# columns, letting the reader's zone-map pruning skip files for either
# predicate. Pure per-row bit arithmetic (whole-stage codegen); the write
# path would repartitionByRange(z) before writing.
Z_BITS = 12  # per-dimension bits; 24-bit z-values


def _z_interleave(x, y):
    """Morton-interleave two Z_BITS-wide non-negative ints: bit b of x
    lands at position 2b, bit b of y at 2b+1."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("bigint")
    for b in range(Z_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
            + F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return z


def _z_sql(xcol: str, ycol: str) -> str:
    terms = []
    for b in range(Z_BITS):
        terms.append(f"((({xcol} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({ycol} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


@register(
    "q48_zorder_layout",
    oracle=f"""
    WITH dims AS (
        SELECT event_id,
               CAST(user_id % 4096 AS BIGINT) AS zx,
               (CASE WHEN isfinite(value) THEN
                   CAST(abs(CAST(floor(value * 100) AS BIGINT)) % 4096 AS BIGINT)
                END) AS zy
        FROM events),
    z AS (SELECT event_id, zx, zy,
                 CAST({_z_sql("zx", "zy")} AS BIGINT) AS zval
          FROM dims)
    SELECT CAST(zval >> 18 AS BIGINT) AS zfile,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(zx) AS BIGINT) AS min_x, CAST(MAX(zx) AS BIGINT) AS max_x,
           CAST(MIN(zy) AS BIGINT) AS min_y, CAST(MAX(zy) AS BIGINT) AS max_y
    FROM z GROUP BY zfile
    """,
)
def q48_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout preview: bucket events by the top 6 bits of the
    24-bit Morton key over (user_id, value) and report each bucket's
    min/max on both dimensions — exactly the zone-map stats a reader would
    prune on. The narrow per-file ranges on BOTH columns (vs a linear sort,
    which is tight on one and full-range on the other) are the point of
    the encoding. At 100 TB this is the shuffle key for the layout
    rewrite: ``repartitionByRange("zval")`` + write."""
    ev = load_table(spark, sf_dir, "events")
    zx = (F.col("user_id") % 4096).cast("bigint")
    # a non-finite value has no zone coordinate: NULL zy/zval (the ANSI
    # bigint cast would otherwise kill the layout job on one corrupt row)
    zy = F.when(
        finite_m("value"),
        F.abs(F.floor(F.col("value") * 100).cast("bigint")) % 4096,
    ).cast("bigint")
    dims = ev.select(
        "event_id", zx.alias("zx"), zy.alias("zy")
    ).withColumn("zval", _z_interleave(F.col("zx"), F.col("zy")))
    return (
        dims.groupBy(F.shiftright("zval", 18).cast("bigint").alias("zfile"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zx").cast("bigint").alias("min_x"),
            F.max("zx").cast("bigint").alias("max_x"),
            F.min("zy").cast("bigint").alias("min_y"),
            F.max("zy").cast("bigint").alias("max_y"),
        )
    )


# Count-min sketch: D hash rows x W columns of counters. Deterministic
# md5-derived hash functions (identical literals both engines) keep the
# sketch — and therefore the oracle hash — exact. Estimates never
# undercount (min over D rows >= true count); error is bounded by
# N * e/W with probability 1 - e^-D.
CM_DEPTH = 4
CM_WIDTH = 64


def _cm_hash_spark(d: int, key):
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{d}:"), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % CM_WIDTH
    )


def _cm_hash_sql(d: int, key_expr: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{d}:' || CAST({key_expr} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {CM_WIDTH}"
    )


def countmin_cells(df, key_col: str):
    """Build the D x W sketch: one row per (d, col) cell with its count.
    A hash-agg over D*|input| exploded rows into at most D*W cells —
    partial (map-side) aggregation makes the shuffle metadata-sized, and
    two sketches merge by adding cells, so per-partition/per-batch
    sketches compose (the property that makes CM the standard streaming
    frequency summary)."""
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cm_hash_spark(d, F.col(key_col)).alias("col"),
                    )
                    for d in range(CM_DEPTH)
                ]
            )
        ).alias("c")
    ).select("c.d", "c.col")
    return rows.groupBy("d", "col").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def _cm_oracle() -> str:
    cells_union = " UNION ALL ".join(
        f"SELECT {d} AS d, {_cm_hash_sql(d, 'user_id')} AS col FROM events"
        for d in range(CM_DEPTH)
    )
    key_hashes = " UNION ALL ".join(
        f"SELECT user_id, {d} AS d, {_cm_hash_sql(d, 'user_id')} AS col "
        f"FROM (SELECT DISTINCT user_id FROM events)"
        for d in range(CM_DEPTH)
    )
    return f"""
    WITH cells AS (
        SELECT d, col, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ({cells_union}) GROUP BY d, col),
    kh AS ({key_hashes}),
    est AS (
        SELECT kh.user_id, MIN(cells.cnt) AS cm_est
        FROM kh JOIN cells ON cells.d = kh.d AND cells.col = kh.col
        GROUP BY kh.user_id),
    exact AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt
              FROM events GROUP BY user_id)
    SELECT e.user_id, CAST(est.cm_est AS BIGINT) AS cm_est, e.true_cnt, rk
    FROM (
        SELECT est.user_id, est.cm_est,
               ROW_NUMBER() OVER (ORDER BY est.cm_est DESC, est.user_id) AS rk
        FROM est) est
    JOIN exact e ON e.user_id = est.user_id
    WHERE rk <= 10
    """


@register("qx11_countmin_heavy_hitters", oracle=_cm_oracle())
def qx11_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch, exact-vs-estimate side by
    side. The sketch is {CM_DEPTH}x{CM_WIDTH} counters regardless of key
    cardinality — the bounded-memory alternative to q62's exact salted
    aggregation when the key space itself is too large to hold. Both the
    sketch build and the point queries are hash-aggs + a broadcast join
    against the 256-cell table; sketches over partitions/batches merge by
    cell-wise addition (tested). Estimates are deterministic (md5-derived
    hash rows baked identically into both engines), so even this
    approximate operator is value-hash-gated, and cm_est >= true_cnt by
    construction."""
    ev = load_table(spark, sf_dir, "events")
    return countmin_report(countmin_cells(ev, "user_id"), ev)


def countmin_report(cells: DataFrame, ev: DataFrame) -> DataFrame:
    """qx11's reporting tail over any (d, col, cnt) cell table: point-query
    every distinct key against the sketch, rank the top 10 estimates,
    attach exact counts. Shared with the streaming-maintained sketch
    (qx31), whose cells must equal the batch cells cell-for-cell."""
    # ONE events pass yields both the exact counts and the distinct key
    # set (every key appears in its own count row); pinned because the
    # final report joins exact again after the top-10 (guide §2.4 — the
    # audit counted events scanned 5x in this query: keys, exact, and
    # the est subtree twice through the unpinned top-10)
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_cnt"))
        .localCheckpoint(eager=False)
    )
    keys = exact.select("user_id")
    kh = keys.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cm_hash_spark(d, F.col("user_id")).alias("col"),
                    )
                    for d in range(CM_DEPTH)
                ]
            )
        ).alias("c"),
    ).select("user_id", "c.d", "c.col")
    est = (
        kh.join(F.broadcast(cells), ["d", "col"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cm_est"))
    )
    # distributed top-10 (TakeOrderedAndProject) instead of a global
    # row_number window that would single-task-sort all estimated keys.
    # The rank over the 10 survivors is a broadcast triangular self-join
    # (rk = 1 + count of strictly-better rows) — exact on the unique
    # (cm_est, user_id) order and free of WindowExec entirely, so the
    # no-unpartitioned-window invariant holds even for the K-row tail.
    # 10 rows, two consumers — pinned so the sketch pipeline plans once.
    top = (
        est.orderBy(F.desc("cm_est"), F.asc("user_id"))
        .limit(10)
        .localCheckpoint(eager=False)
    )
    other = top.select(
        F.col("cm_est").alias("e2"), F.col("user_id").alias("u2")
    )
    better = (F.col("e2") > F.col("cm_est")) | (
        (F.col("e2") == F.col("cm_est")) & (F.col("u2") < F.col("user_id"))
    )
    ranked = (
        top.join(F.broadcast(other), better, "left")
        .groupBy("user_id", "cm_est")
        .agg((F.count("u2") + 1).cast("int").alias("rk"))
    )
    return (
        ranked.join(exact, "user_id")
        .select("user_id", F.col("cm_est").cast("bigint"), "true_cnt", "rk")
    )


# ---------------------------------------------------------------------------
# qx19: KMV (k-minimum-values) distinct sketch — a MERGEABLE approx-distinct
# whose estimate is bit-identical across engines, unlike HLL (q27 stays
# rows-only because Spark's HLL++ registers are engine-private; this is the
# portable alternative a cross-engine pipeline would standardize on).
# Public algorithm: Bar-Yossef et al., "Counting distinct elements in a
# data stream" (RANDOM 2002).
# ---------------------------------------------------------------------------

KMV_K = 64
# 13 hex chars of md5 = 52 uniform bits; (K-1) * 2^52 stays < 2^63 so the
# integer-division estimate never overflows BIGINT in either engine.
KMV_SPACE = 1 << 52
def kmv_hash_spark(col: str) -> str:
    """52-bit md5-prefix hash of a column, Spark SQL (engine-portable)."""
    return f"cast(conv(substr(md5(cast({col} as string)),1,13),16,10) as bigint)"


def kmv_hash_duck(col: str) -> str:
    """The identical hash in DuckDB SQL (md5 text matches across engines)."""
    return f"('0x' || substr(md5({col}::VARCHAR), 1, 13))::BIGINT"


_KMV_HASH = kmv_hash_spark("user_id")
_KMV_HASH_DUCK = kmv_hash_duck("user_id")


def _kmv_oracle() -> str:
    est = (
        f"CASE WHEN COUNT(*) < {KMV_K} THEN COUNT(*) "
        f"ELSE ({KMV_K - 1} * {KMV_SPACE}::BIGINT) "
        f"// MAX(CASE WHEN rk = {KMV_K} THEN hv END) END"
    )
    return f"""
    WITH h AS (SELECT DISTINCT event_type, {_KMV_HASH_DUCK} AS hv FROM events
               WHERE user_id IS NOT NULL),
    r AS (SELECT event_type, hv,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rk
          FROM h),
    per_type AS (
        SELECT event_type AS scope,
               CAST(LEAST(COUNT(*), {KMV_K}) AS INT) AS sketch_size,
               CAST({est} AS BIGINT) AS est_distinct
        FROM r GROUP BY event_type),
    -- merged sketch: union the per-type k-min sets (NOT the raw table),
    -- dedup, re-rank — exactly what Spark's merge of sketches computes
    merged_h AS (SELECT DISTINCT hv FROM r WHERE rk <= {KMV_K}),
    mr AS (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rk FROM merged_h),
    merged AS (
        SELECT 'ALL' AS scope,
               CAST(LEAST(COUNT(*), {KMV_K}) AS INT) AS sketch_size,
               CAST({est} AS BIGINT) AS est_distinct
        FROM mr)
    SELECT * FROM per_type UNION ALL SELECT * FROM merged
    """


@register("qx19_kmv_distinct_sketch", oracle=_kmv_oracle())
def qx19_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approx distinct users per event type via a portable KMV sketch,
    plus an 'ALL' row computed by MERGING the per-type sketches — the
    merge property is what makes the sketch usable as a partial aggregate
    at 100 TB (combine per-partition sketches instead of shuffling raw
    keys).

    Estimate: keep the K smallest 52-bit hashes; if fewer than K distinct
    values exist the sketch is exact, else est = (K-1)*2^52 div h_K. All
    arithmetic is integer so the oracle hash-matches bit-for-bit.

    Plan: distinct (type, hash) → two-level bottom-K (first within
    (type, hash mod 16) subgroups — the map-side-combine shape, bounding
    any single aggregation state — then across subgroups). The merged
    'ALL' sketch consumes only the per-type K-min arrays (≤ K·n_types
    values), never the raw key space. The reference has no sketches at
    all; q27/qx11 cover HLL and count-min."""
    events = load_table(spark, sf_dir, "events")
    # pinned: kmv_estimates consumes the types x K sketch table twice
    # (per-type rows + the merged ALL row) — unpinned, the sketch build
    # re-ran per consumer (events scanned 2x in one plan)
    return kmv_estimates(
        kmv_sketch_by_type(events).localCheckpoint(eager=False)
    )


def _bottom_k_set():
    # built lazily: Column construction needs a live SparkContext
    return F.slice(F.array_sort(F.collect_set("hv")), 1, KMV_K)


def kmv_sketch_by_type(events: DataFrame) -> DataFrame:
    """(event_type, kmins) sketch rows for an events-shaped frame.

    No .distinct() before the groupBy: collect_set dedups inside each
    (type, bucket) group with a map-side partial, so a separate distinct
    would only add a second full-width shuffle of the raw rows.

    Anonymous events (NULL user_id) are excluded: a distinct-USER sketch
    counts users, and the NULL hash would otherwise sit at opposite ends
    of the two engines' sketch sort orders."""
    h = events.filter(F.col("user_id").isNotNull()).select(
        "event_type", F.expr(_KMV_HASH).alias("hv")
    )
    l1 = (
        h.groupBy("event_type", F.pmod("hv", F.lit(16)).alias("bucket"))
        .agg(_bottom_k_set().alias("mins"))
    )
    return l1.groupBy("event_type").agg(
        F.slice(
            F.array_sort(F.flatten(F.collect_list("mins"))), 1, KMV_K
        ).alias("kmins")
    )


def kmv_merge(prior: DataFrame, partial: DataFrame) -> DataFrame:
    """Combine two sketch tables — union the k-min sets per type, dedup
    (the same hash can sit in both sketches), keep the K smallest.
    Associative, commutative AND idempotent (set union), so any merge
    order — including a replayed micro-batch — yields the same table."""
    return (
        prior.unionByName(partial)
        .groupBy("event_type")
        .agg(
            F.slice(
                F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmins")))),
                1,
                KMV_K,
            ).alias("kmins")
        )
    )


def kmv_estimates(sketches: DataFrame) -> DataFrame:
    """Per-type estimate rows plus the merged-'ALL' row from a
    (event_type, kmins) sketch table."""

    def estimate(df: DataFrame, scope_col) -> DataFrame:
        n = F.size("kmins")
        est = F.when(n < KMV_K, n.cast("bigint")).otherwise(
            F.expr(f"{KMV_K - 1} * cast({KMV_SPACE} as bigint) div element_at(kmins, {KMV_K})")
        )
        return df.select(
            scope_col.alias("scope"),
            n.cast("int").alias("sketch_size"),
            est.cast("bigint").alias("est_distinct"),
        )

    per_type = estimate(sketches, F.col("event_type"))
    merged = (
        sketches.select(F.explode("kmins").alias("hv"))
        .distinct()
        .agg(_bottom_k_set().alias("kmins"))
    )
    return per_type.unionByName(estimate(merged, F.lit("ALL")))


def kmv_grouped_estimate(
    df: DataFrame, group_col: str, key_col: str, out_name: str
) -> DataFrame:
    """(group, estimate) KMV approx-distinct of ``key_col`` per group —
    the portable, hash-gateable substitute for ``approx_count_distinct``
    (whose HLL++ registers are engine-private). Same two-level bottom-K
    shape as qx19: hashes partial-aggregate inside (group, hash mod 16)
    subgroups first, so no single aggregation state exceeds K values per
    bucket regardless of group size. Identical hv never spans buckets
    (the bucket IS hv mod 16), so the flattened merge needs no dedup."""
    h = df.select(group_col, F.expr(kmv_hash_spark(key_col)).alias("hv"))
    l1 = h.groupBy(group_col, F.pmod("hv", F.lit(16)).alias("bucket")).agg(
        _bottom_k_set().alias("mins")
    )
    sk = l1.groupBy(group_col).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("mins"))), 1, KMV_K)
        .alias("kmins")
    )
    n = F.size("kmins")
    est = F.when(n < KMV_K, n.cast("bigint")).otherwise(
        F.expr(
            f"{KMV_K - 1} * cast({KMV_SPACE} as bigint)"
            f" div element_at(kmins, {KMV_K})"
        )
    )
    return sk.select(group_col, est.cast("bigint").alias(out_name))


def kmv_grouped_oracle_cte(group_col: str, key_col: str, table: str) -> str:
    """DuckDB SELECT computing the same grouped KMV estimate."""
    est = (
        f"CASE WHEN COUNT(*) < {KMV_K} THEN COUNT(*) "
        f"ELSE ({KMV_K - 1} * {KMV_SPACE}::BIGINT) "
        f"// MAX(CASE WHEN rk = {KMV_K} THEN hv END) END"
    )
    return f"""
    SELECT {group_col}, CAST({est} AS BIGINT) AS est FROM (
        SELECT {group_col}, hv,
               ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY hv) AS rk
        FROM (SELECT DISTINCT {group_col}, {kmv_hash_duck(key_col)} AS hv
              FROM {table}))
    GROUP BY {group_col}"""


# ---------------------------------------------------------------------------
# qx28: zone-map pruning selectivity — the measurable payoff of q48's
# Z-order layout. Same rows, two file layouts (Morton vs linear-by-x),
# three probe boxes; count files/rows a zone-map reader must touch.
# ---------------------------------------------------------------------------

#: (probe id, x_lo, x_hi, y_lo, y_hi) over the 4096x4096 key space
PRUNE_PROBES = [
    ("x_slice", 100, 200, 0, 4095),
    ("y_slice", 0, 4095, 100, 200),
    ("box", 0, 512, 0, 512),
]


def _probes_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT '{p}' AS probe, {xl} AS x_lo, {xh} AS x_hi,"
        f" {yl} AS y_lo, {yh} AS y_hi"
        for p, xl, xh, yl, yh in PRUNE_PROBES
    )


@register(
    "qx28_zone_map_pruning",
    oracle=f"""
    WITH dims AS (
        SELECT CAST((epoch_us(ts) // 1000000) % 4096 AS BIGINT) AS zx,
               (CASE WHEN isfinite(value) THEN
                   CAST(abs(CAST(floor(value * 100) AS BIGINT)) % 4096 AS BIGINT)
                END) AS zy
        FROM events),
    z AS (SELECT zx, zy, CAST({_z_sql("zx", "zy")} AS BIGINT) AS zval
          FROM dims),
    zones AS (
        SELECT 'zorder' AS layout, zval >> 18 AS f, COUNT(*) AS n_rows,
               MIN(zx) AS min_x, MAX(zx) AS max_x,
               MIN(zy) AS min_y, MAX(zy) AS max_y
        FROM z GROUP BY zval >> 18
        UNION ALL
        SELECT 'linear' AS layout, zx // 64 AS f, COUNT(*) AS n_rows,
               MIN(zx) AS min_x, MAX(zx) AS max_x,
               MIN(zy) AS min_y, MAX(zy) AS max_y
        FROM z GROUP BY zx // 64),
    probes AS ({_probes_sql()}),
    hits AS (
        SELECT z.layout, p.probe, z.n_rows,
               CASE WHEN z.max_x >= p.x_lo AND z.min_x <= p.x_hi
                     AND z.max_y >= p.y_lo AND z.min_y <= p.y_hi
                    THEN 1 ELSE 0 END AS touched
        FROM zones z CROSS JOIN probes p)
    SELECT layout, probe,
           CAST(COUNT(*) AS BIGINT)                        AS n_files,
           CAST(SUM(touched) AS BIGINT)                    AS files_touched,
           CAST(SUM(CASE WHEN touched = 1 THEN n_rows ELSE 0 END) AS BIGINT)
                                                           AS rows_touched,
           ROUND(1.0 - SUM(touched) * 1.0 / COUNT(*), 4)   AS files_pruned_pct
    FROM hits GROUP BY layout, probe
    """,
)
def qx28_zone_map_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping effectiveness: Morton layout vs a linear-by-x
    layout of the SAME rows into the same 64-file key space, measured as
    the files (and rows) each probe predicate must touch given only
    per-file min/max zone maps. Dimensions are second-of-epoch mod 4096
    and cents mod 4096 — both cover the full key space, so the layouts
    differ only in ORDER. Z-order stays selective on BOTH dimensions
    (~1/8 of files per single-dim slice, ~1/16 per quarter box); the
    linear layout prunes x-slices perfectly and y-slices not at all —
    the quantified reason a 100 TB table Z-orders its two hottest filter
    columns rather than sorting by one.

    Plan: ONE composite-cell hash-agg over the events scan — grouped by
    (zorder file, linear file), a grid bounded by 64x64 cells — then each
    layout's zone maps RE-AGGREGATE the tiny cell frame (count is a sum
    of cell counts, min/max are min-of-mins/max-of-maxes, all exact and
    NULL-transparent). The old form ran the two layout aggs as siblings
    of the same union, so Catalyst planned the dims subtree twice = two
    full events scans (guide §2.4/§7.2); the cell frame is pinned with a
    lazy localCheckpoint so both layouts and the probe join read the one
    materialized grid. Probes are a 3-row broadcast; the overlap join
    output is n_files x n_probes rows."""
    ev = load_table(spark, sf_dir, "events")
    zx = (F.expr("unix_micros(ts) div 1000000") % 4096).cast("bigint")
    # a non-finite value has no zone coordinate: NULL zy/zval (the ANSI
    # bigint cast would otherwise kill the layout job on one corrupt row)
    zy = F.when(
        finite_m("value"),
        F.abs(F.floor(F.col("value") * 100).cast("bigint")) % 4096,
    ).cast("bigint")
    dims = ev.select(zx.alias("zx"), zy.alias("zy")).withColumn(
        "zval", _z_interleave(F.col("zx"), F.col("zy"))
    )

    cells = (
        dims.groupBy(
            F.shiftright("zval", 18).alias("fz"),
            F.expr("zx div 64").alias("fl"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zx").alias("min_x"),
            F.max("zx").alias("max_x"),
            F.min("zy").alias("min_y"),
            F.max("zy").alias("max_y"),
        )
        .localCheckpoint(eager=False)
    )

    def zones(file_col: str, layout: str) -> DataFrame:
        return cells.groupBy(F.col(file_col).alias("f")).agg(
            F.sum("n_rows").alias("n_rows"),
            F.min("min_x").alias("min_x"),
            F.max("max_x").alias("max_x"),
            F.min("min_y").alias("min_y"),
            F.max("max_y").alias("max_y"),
        ).withColumn("layout", F.lit(layout))
    zz = zones("fz", "zorder").unionByName(zones("fl", "linear"))
    probes = local_rows(
        spark, PRUNE_PROBES, "probe string, x_lo long, x_hi long, y_lo long, y_hi long"
    )
    touched = (
        (F.col("max_x") >= F.col("x_lo"))
        & (F.col("min_x") <= F.col("x_hi"))
        & (F.col("max_y") >= F.col("y_lo"))
        & (F.col("min_y") <= F.col("y_hi"))
    ).cast("int")
    hits = zz.crossJoin(F.broadcast(probes)).select(
        "layout", "probe", "n_rows", touched.alias("touched")
    )
    return hits.groupBy("layout", "probe").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("touched").cast("bigint").alias("files_touched"),
        F.sum(F.when(F.col("touched") == 1, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_touched"),
        F.round(1.0 - F.sum("touched") / F.count(F.lit(1)), 4).alias(
            "files_pruned_pct"
        ),
    )


#: number of heavy-hitter keys the skew profile reports individually.
SKEW_TOP_KEYS = 5


@register(
    "qx44_join_key_skew_profile",
    oracle=f"""
    WITH c AS (SELECT user_id AS key, COUNT(*) AS cnt FROM events GROUP BY user_id),
    s AS (SELECT CAST(COUNT(*) AS BIGINT)   AS n_keys,
                 CAST(SUM(cnt) AS BIGINT)   AS n_rows,
                 CAST(MAX(cnt) AS BIGINT)   AS max_cnt,
                 CAST(MIN(cnt) AS BIGINT)   AS min_cnt,
                 CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq
          FROM c),
    top AS (
        SELECT key, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rk
        FROM c)
    SELECT 'n_keys' AS metric, CAST(NULL AS BIGINT) AS key, n_keys AS value FROM s
    UNION ALL SELECT 'n_rows', NULL, n_rows FROM s
    UNION ALL SELECT 'max_key_rows', NULL, max_cnt FROM s
    UNION ALL SELECT 'min_key_rows', NULL, min_cnt FROM s
    UNION ALL SELECT 'sum_sq_rows', NULL, sum_sq FROM s
    UNION ALL SELECT 'skew_ratio_e6', NULL,
                     CAST(CAST(max_cnt AS HUGEINT) * 1000000 * n_keys
                          // n_rows AS BIGINT) FROM s
    UNION ALL SELECT 'collision_factor_e6', NULL,
                     CAST(CAST(sum_sq AS HUGEINT) * 1000000
                          // n_rows AS BIGINT) FROM s
    UNION ALL
    SELECT 'top_key', key, CAST(cnt AS BIGINT)
    FROM top WHERE rk <= {SKEW_TOP_KEYS}
    """,
)
def qx44_join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile — the pre-flight a planner (or an engineer)
    runs before shuffling 100 TB on a key: per-key cardinality extremes,
    the exact sum-of-squared-counts (the collision mass that predicts
    shuffle-join work and hot-partition size), ``skew_ratio_e6``
    (max-key rows over mean-key rows, scaled 1e6 — the salting factor
    you'd need to level the hot key), and the ``SKEW_TOP_KEYS`` heaviest
    keys individually. Everything integer-exact; ratios via the
    truncating integer division both engines share (qx29).

    Plan: one hash-agg on the key (map-side partials), then a
    metadata-sized summary agg and a TakeOrderedAndProject for the
    heavy hitters (per-partition heads + K-row merge — no global sort,
    no unpartitioned window; the q33/qx01 rule). The per-key count
    table is the only data-sized intermediate, and it is the profile's
    natural output anyway."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy(F.col("user_id").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    s = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.min("cnt").cast("bigint").alias("min_cnt"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sum_sq"),
    ).localCheckpoint(eager=True)

    def srow(metric: str, col) -> DataFrame:
        return s.select(
            F.lit(metric).alias("metric"),
            F.lit(None).cast("bigint").alias("key"),
            col.cast("bigint").alias("value"),
        )

    summary = (
        srow("n_keys", F.col("n_keys"))
        .unionByName(srow("n_rows", F.col("n_rows")))
        .unionByName(srow("max_key_rows", F.col("max_cnt")))
        .unionByName(srow("min_key_rows", F.col("min_cnt")))
        .unionByName(srow("sum_sq_rows", F.col("sum_sq")))
        .unionByName(
            # the product runs in DECIMAL(38,0): max_cnt*1e6*n_keys in
            # int64 would wrap silently in Spark (non-ANSI) while DuckDB
            # raises on BIGINT overflow — decimal makes overflow
            # impossible for any key cardinality that fits the profile
            srow(
                "skew_ratio_e6",
                F.expr(
                    "cast(cast(max_cnt as decimal(38,0)) * 1000000 * n_keys"
                    " div n_rows as bigint)"
                ),
            )
        )
        .unionByName(
            srow(
                "collision_factor_e6",
                F.expr(
                    "cast(cast(sum_sq as decimal(38,0)) * 1000000"
                    " div n_rows as bigint)"
                ),
            )
        )
    )
    top = (
        c.orderBy(F.desc("cnt"), F.asc("key"))
        .limit(SKEW_TOP_KEYS)
        .select(
            F.lit("top_key").alias("metric"),
            F.col("key").cast("bigint").alias("key"),
            F.col("cnt").cast("bigint").alias("value"),
        )
    )
    return summary.unionByName(top)


#: columns profiled by the stats collector; chosen to cover int keys,
#: low-cardinality flags, continuous values, and timestamps.
STATS_COLUMNS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
    "l_returnflag", "l_linestatus", "l_shipdate",
]


@register(
    "qx45_table_stats_collect",
    oracle="""
    SELECT * FROM (
    """
    + "\n    UNION ALL\n    ".join(
        f"""SELECT '{c}' AS column_name,
               CAST(COUNT(*) AS BIGINT)                AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT)   AS n_null,
               CAST(COUNT(DISTINCT {c}) AS BIGINT)     AS ndv
        FROM lineitem"""
        for c in STATS_COLUMNS
    )
    + """
    ) WHERE TRUE
    """,
)
def qx45_table_stats_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-TABLE statistics collection: row count, null count, and
    EXACT distinct-value count for each profiled lineitem column — the
    inputs a cost-based optimizer feeds join reordering and broadcast
    decisions (SURVEY §4: the reference leaves all planning to Spark;
    this is the operator that feeds that planner).

    Plan: ONE scan computes every column's n/n_null (conditional counts
    fuse into a single agg); exact NDVs run as one hash-agg per column
    over its projected values (each a two-column shuffle of the
    column's distinct stream). Exact multi-column NDV in a single agg
    would force Catalyst's Expand (row duplication x columns — the
    documented cost cliff); at 100 TB you flip EXACT_NDV to the HLL
    sketch (q27/approx_count_distinct, mergeable partials, one pass,
    no Expand) and accept ±2%: the knob and tradeoff are the point.
    The unioned result is metadata-sized (one row per column)."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *[
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"null_{c}")
            for c in STATS_COLUMNS
        ],
    ).localCheckpoint(eager=True)
    out = None
    for c in STATS_COLUMNS:
        # NULL is excluded before the distinct: COUNT(DISTINCT c) ignores
        # NULLs on both engines, while distinct().count() would count the
        # null group as one extra "value" the moment a profiled column
        # acquires NULLs.
        ndv = (
            li.select(c)
            .where(F.col(c).isNotNull())
            .distinct()
            .agg(F.count(F.lit(1)).cast("bigint").alias("ndv"))
        )
        row = base.crossJoin(F.broadcast(ndv)).select(
            F.lit(c).alias("column_name"),
            "n_rows",
            F.col(f"null_{c}").alias("n_null"),
            "ndv",
        )
        out = row if out is None else out.unionByName(row)
    return out


def _fp_digest_sql(canon: str) -> str:
    """First 13 md5 hex digits of the canonical row string as a BIGINT
    (the md5 text is identical across engines; 13 hex digits = 52 bits
    fit int64 exactly — the q27/KMV trick)."""
    return f"('0x' || substr(md5({canon}), 1, 13))::BIGINT"


@register(
    "qx47_snapshot_fingerprint",
    oracle=f"""
    SELECT * FROM (
      SELECT 'documents' AS table_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(d) AS HUGEINT)::VARCHAR AS fingerprint
      FROM (SELECT {_fp_digest_sql(
          "concat_ws('|', doc_id::VARCHAR, lang, source,"
          " n_chars::VARCHAR, md5(text))")} AS d FROM documents)
      UNION ALL
      SELECT 'events', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(d) AS HUGEINT)::VARCHAR
      FROM (SELECT {_fp_digest_sql(
          "concat_ws('|', event_id::VARCHAR, user_id::VARCHAR, event_type,"
          " (CASE WHEN isfinite(value) THEN CAST(FLOOR(value * 1000) AS BIGINT) END)::VARCHAR,"
          " epoch_us(ts)::VARCHAR)")} AS d FROM events)
      UNION ALL
      SELECT 'orders', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(d) AS HUGEINT)::VARCHAR
      FROM (SELECT {_fp_digest_sql(
          "concat_ws('|', o_orderkey::VARCHAR, o_custkey::VARCHAR,"
          " o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)::VARCHAR,"
          " epoch_us(o_orderdate)::VARCHAR)")} AS d FROM orders)
    ) WHERE TRUE
    """,
)
def qx47_snapshot_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressable snapshot manifest: an ORDER-FREE exact
    fingerprint per table (sum of per-row 52-bit md5 digests over a
    canonical row serialization, carried in decimal so it never
    overflows) plus row count — the artifact that lets two
    independently-produced copies of a 100 TB snapshot (a backfill vs
    the incremental path, a migration vs its source) be compared with
    one scan each and no sort, shuffle, or row alignment. Any changed,
    added, or dropped row moves the sum; commutativity means partition
    order, file order, and parallelism cannot.

    Canonicalization pins every cross-engine hazard: timestamps as
    epoch-micros integers, doubles as fixed-point integers, text by its
    md5 (so '|' inside values cannot alias field boundaries for any
    realistic corpus). Plan: per-table one scan -> per-row codegen md5
    -> single 1-row hash-agg of decimal partials; the three tables scan
    independently and the final union is metadata-sized."""
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")

    def digest(canon) -> F.Column:
        return F.expr(
            f"cast(conv(substr(md5({canon}), 1, 13), 16, 10) as bigint)"
        )

    def fp(df: DataFrame, name: str, canon: str) -> DataFrame:
        return df.select(digest(canon).alias("d")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("d").cast("decimal(38,0)")).cast("string").alias(
                "fingerprint"
            ),
        ).select(F.lit(name).alias("table_name"), "n_rows", "fingerprint")

    return (
        fp(
            docs, "documents",
            "concat_ws('|', cast(doc_id as string), lang, source,"
            " cast(n_chars as string), md5(text))",
        )
        .unionByName(
            fp(
                ev, "events",
                "concat_ws('|', cast(event_id as string),"
                " cast(user_id as string), event_type,"
                " cast((case when value is not null and not isnan(value) and abs(value) != double('Infinity') then cast(floor(value * 1000) as bigint) end) as string),"
                " cast(unix_micros(ts) as string))",
            )
        )
        .unionByName(
            fp(
                orders, "orders",
                "concat_ws('|', cast(o_orderkey as string),"
                " cast(o_custkey as string), o_orderstatus,"
                " cast(cast(floor(o_totalprice * 100) as bigint) as string),"
                " cast(unix_micros(cast(o_orderdate as timestamp)) as string))",
            )
        )
    )


#: number of range partitions the planner proposes boundaries for.
RANGE_BUCKETS = 8


@register(
    "qx52_range_partition_planner",
    oracle=f"""
    WITH v AS (SELECT epoch_us(ts) AS us FROM events),
    b AS (
        SELECT {", ".join(
            f"quantile_cont(us, {i}/{RANGE_BUCKETS}.0) AS b{i}"
            for i in range(1, RANGE_BUCKETS)
        )}
        FROM v),
    assigned AS (
        SELECT ({" + ".join(
            f"(CASE WHEN v.us > b.b{i} THEN 1 ELSE 0 END)"
            for i in range(1, RANGE_BUCKETS)
        )}) AS bucket
        FROM v, b),
    counts AS (SELECT bucket, COUNT(*) AS n_rows FROM assigned GROUP BY bucket),
    tot AS (SELECT COUNT(*) AS total FROM v)
    SELECT CAST(c.bucket AS INT)      AS bucket,
           CAST(c.n_rows AS BIGINT)   AS n_rows,
           CAST(tot.total AS BIGINT)  AS total_rows,
           CAST(c.n_rows * 1000000 * {RANGE_BUCKETS} // tot.total AS BIGINT)
               AS balance_e6
    FROM counts c CROSS JOIN tot
    """,
)
def qx52_range_partition_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioner planning: derive {RANGE_BUCKETS}-way boundary
    values from exact dyadic quantiles of the sort key (event-time
    micros) and report the realized per-bucket row counts plus a
    balance factor (1e6 = perfectly even) — the explicit version of
    what Spark's RangePartitioner does by sampling, run exactly. A
    balance_e6 far from 1e6 on a proposed layout key is the signal to
    pick different boundaries (or a different key) BEFORE rewriting
    100 TB into a sorted layout (q48's Z-order companion for the
    1-dimensional case).

    Exactness: boundaries interpolate at i/8 of (n-1) — eighths are
    exact binary doubles over integer micros (the qx30 dyadic
    argument), bucket assignment compares those exact doubles, counts
    and the truncating-div balance are integers. Plan: the boundaries
    come from ``exact_percentiles_by_rank`` (two-pass range-partitioned
    rank, the q33 shape) — NOT a global ``percentile()`` aggregate,
    whose single reducer would hold the entire column's value multiset
    at 100 TB. Here no task ever buffers more than its own sorted range
    partition; the 7 boundary values broadcast back (1 row), then one
    conditional-sum bucket assignment + hash-agg on the bucket id."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(F.unix_micros("ts").alias("us"))
    b = exact_percentiles_by_rank(
        v, "us", list(range(1, RANGE_BUCKETS)), RANGE_BUCKETS, prefix="b"
    ).drop("__n")
    bucket = None
    for i in range(1, RANGE_BUCKETS):
        term = F.when(F.col("us") > F.col(f"b{i}"), 1).otherwise(0)
        bucket = term if bucket is None else bucket + term
    counts = (
        v.crossJoin(F.broadcast(b))
        .select(bucket.cast("int").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    # NOT folded: deriving total_rows as SUM(n_rows) over the 8-row
    # counts frame (dropping the tot leg) was built and measured in
    # round 12 (oracle-green, 3 A/Bs) and REVERTED: the "third scan" it
    # removes is an empty-projection count (`ReadSchema: struct<>` in
    # the committed plan, row-group metadata only — near-free at any
    # scale) whose job overlaps the main chain, while the window puts an
    # extra stage on the critical path; min-statistic deltas were
    # consistently ~+0.1-0.15 s. The pass-7 rule: a pruned duplicate
    # scan beats restructuring.
    tot = v.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        "n_rows",
        F.col("total").alias("total_rows"),
        F.expr(f"cast(n_rows * 1000000 * {RANGE_BUCKETS} div total as bigint)").alias(
            "balance_e6"
        ),
    )


# ---------------------------------------------------------------------------
# qx59: rolling-window distinct users via KMV sketch MERGE — the
# sliding-window COUNT(DISTINCT) problem solved the only way it scales:
# one mergeable sketch per tumbling window, rolling estimates from
# merging the last W sketches — raw keys are never recounted per window.
# ---------------------------------------------------------------------------

ROLL_WINDOWS = 3  # rolling span in hours (current + 2 prior)


def _qx59_oracle() -> str:
    est = (
        f"CASE WHEN COUNT(*) < {KMV_K} THEN COUNT(*) "
        f"ELSE ({KMV_K - 1} * {KMV_SPACE}::BIGINT) "
        f"// MAX(CASE WHEN rk = {KMV_K} THEN hv END) END"
    )
    return f"""
    WITH h AS (
        SELECT DISTINCT epoch_us(ts) // 3600000000 AS hour,
               {kmv_hash_duck('user_id')} AS hv
        FROM events WHERE user_id IS NOT NULL),
    r AS (SELECT hour, hv,
                 ROW_NUMBER() OVER (PARTITION BY hour ORDER BY hv) AS rk
          FROM h),
    sk AS (SELECT hour, hv, rk FROM r WHERE rk <= {KMV_K}),
    per_hour AS (
        SELECT hour, CAST({est} AS BIGINT) AS est_1h
        FROM sk GROUP BY hour),
    hours AS (SELECT DISTINCT hour FROM sk),
    roll_h AS (
        SELECT DISTINCT w.hour, s.hv
        FROM hours w JOIN sk s
          ON s.hour BETWEEN w.hour - {ROLL_WINDOWS - 1} AND w.hour),
    roll_r AS (
        SELECT hour, hv,
               ROW_NUMBER() OVER (PARTITION BY hour ORDER BY hv) AS rk
        FROM roll_h),
    rolling AS (
        SELECT hour, CAST({est} AS BIGINT) AS est_roll
        FROM roll_r WHERE rk <= {KMV_K} GROUP BY hour)
    SELECT p.hour AS hour, p.est_1h AS est_1h, r.est_roll AS est_roll_3h
    FROM per_hour p JOIN rolling r USING (hour)
    """


@register("qx59_rolling_kmv_distinct", oracle=_qx59_oracle())
def qx59_rolling_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per hour AND per rolling 3-hour span, both from KMV
    sketches: the per-hour sketch is a bottom-K over 52-bit hashes (K
    values of state per hour, whatever the traffic), and the rolling
    estimate MERGES the last {3} hourly sketches — set-union + re-rank,
    the associative/idempotent merge qx19 proves — instead of recounting
    raw keys per overlapping window. That replaces the classic
    O(span x traffic) sliding COUNT(DISTINCT) with O(span x K) per
    window; at 100 TB the hourly sketches are a tiny materialized table
    any rolling span can be served from.

    Plan: one distinct (hour, hash) shuffle builds all hourly sketches;
    the rolling merge joins each hour to its {3}-hour sketch slice
    (sketch rows only — bounded by hours x K) and re-ranks. Integer
    arithmetic end-to-end, so estimates hash-match the oracle."""
    ev = load_table(spark, sf_dir, "events")
    # distinct-USER sketch: anonymous events excluded (kmv_sketch_by_type)
    h = ev.filter(F.col("user_id").isNotNull()).select(
        F.expr("unix_micros(ts) div 3600000000").alias("hour"),
        F.expr(kmv_hash_spark("user_id")).alias("hv"),
    )
    # pinned: the hours x K sketch table feeds the per-hour estimate AND
    # the rolling 3-hour merge — unpinned, the sketch build re-ran per
    # consumer (events scanned 3x in one plan)
    sk = (
        h.groupBy("hour", F.pmod("hv", F.lit(16)).alias("bucket"))
        .agg(_bottom_k_set().alias("mins"))
        .groupBy("hour")
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("mins"))), 1, KMV_K
            ).alias("kmins")
        )
        .localCheckpoint(eager=False)
    )

    def estimate(df: DataFrame, out: str) -> DataFrame:
        n = F.size("kmins")
        est = F.when(n < KMV_K, n.cast("bigint")).otherwise(
            F.expr(
                f"{KMV_K - 1} * cast({KMV_SPACE} as bigint)"
                f" div element_at(kmins, {KMV_K})"
            )
        )
        return df.select("hour", est.cast("bigint").alias(out))

    per_hour = estimate(sk, "est_1h")
    slices = sk.select(F.col("hour").alias("src_hour"), "kmins")
    rolled = (
        sk.select("hour")
        .join(
            slices,
            F.col("src_hour").between(
                F.col("hour") - (ROLL_WINDOWS - 1), F.col("hour")
            ),
        )
        .select("hour", F.explode("kmins").alias("hv"))
        .distinct()
        .groupBy("hour")
        .agg(_bottom_k_set().alias("kmins"))
    )
    rolling = estimate(rolled, "est_roll_3h")
    return per_hour.join(rolling, "hour")


# ---------------------------------------------------------------------------
# qx61: sketch-based set-overlap estimation between event types — the
# join-cardinality / audience-overlap planner primitive. KMV sketches are
# mergeable (qx19), so |A ∪ B| is estimated from the UNION of two bottom-K
# sketches and |A ∩ B| follows by inclusion–exclusion — no raw-key shuffle
# between the two sides, ever. Beyer et al., "On Synopses for Distinct-
# Value Estimation Under Multiset Operations" (SIGMOD 2007).
# ---------------------------------------------------------------------------


def _qx61_oracle() -> str:
    est_r = (
        f"CASE WHEN COUNT(*) < {KMV_K} THEN COUNT(*) "
        f"ELSE ({KMV_K - 1} * {KMV_SPACE}::BIGINT) "
        f"// MAX(CASE WHEN rk = {KMV_K} THEN hv END) END"
    )
    return f"""
    WITH h AS (SELECT DISTINCT event_type, {kmv_hash_duck('user_id')} AS hv
               FROM events WHERE user_id IS NOT NULL),
    r AS (SELECT event_type, hv,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rk
          FROM h),
    sk AS (SELECT event_type, hv FROM r WHERE rk <= {KMV_K}),
    est AS (SELECT event_type, CAST({est_r} AS BIGINT) AS est
            FROM r GROUP BY event_type),
    p AS (SELECT a.event_type AS ta, b.event_type AS tb
          FROM est a JOIN est b ON a.event_type < b.event_type),
    u AS (SELECT p.ta, p.tb, s.hv
          FROM p JOIN sk s ON s.event_type IN (p.ta, p.tb)
          GROUP BY p.ta, p.tb, s.hv),
    ur AS (SELECT ta, tb, hv,
                  ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY hv) AS rk
           FROM u),
    ue AS (SELECT ta, tb, CAST({est_r} AS BIGINT) AS est_u
           FROM ur GROUP BY ta, tb)
    SELECT ue.ta AS type_a, ue.tb AS type_b,
           ea.est AS est_a, eb.est AS est_b, ue.est_u AS est_union,
           GREATEST(0, ea.est + eb.est - ue.est_u) AS est_inter
    FROM ue
    JOIN est ea ON ea.event_type = ue.ta
    JOIN est eb ON eb.event_type = ue.tb
    """


@register("qx61_kmv_set_overlap", oracle=_qx61_oracle())
def qx61_kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated distinct-user overlap for every pair of event types from
    KMV sketches alone: est(|A|), est(|B|), est(|A∪B|) from the merged
    bottom-K sketch, and est(|A∩B|) = max(0, est_a + est_b - est_union).
    This is how a planner prices a join or an audience-overlap query
    without touching raw keys — the sketches are the only thing shuffled.

    All arithmetic is integer (52-bit md5-prefix hashes, integer-division
    estimator), so the result hash-matches DuckDB bit-for-bit.

    Plan: one pass builds per-type sketches (two-level bottom-K, qx19's
    shape); the pairwise stage joins K-element arrays for n_types rows —
    metadata-sized regardless of corpus scale, broadcast by AQE. The
    union sketch is slice(sort(distinct(concat)), K): set union then
    re-truncate, the lossless KMV merge."""
    events = load_table(spark, sf_dir, "events")
    # pinned: both sides of the pairwise stage read the same types x K
    # sketch table — unpinned, the sketch build re-ran per side
    sk = kmv_sketch_by_type(events).localCheckpoint(eager=False)
    a = sk.select(F.col("event_type").alias("type_a"), F.col("kmins").alias("ka"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("kmins").alias("kb"))
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat("ka", "kb"))), 1, KMV_K
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b")).withColumn(
        "ku", merged
    )
    est_a = F.expr(
        f"case when size(ka) < {KMV_K} then cast(size(ka) as bigint) "
        f"else {KMV_K - 1} * cast({KMV_SPACE} as bigint) div element_at(ka, {KMV_K}) end"
    )
    est_b = F.expr(
        f"case when size(kb) < {KMV_K} then cast(size(kb) as bigint) "
        f"else {KMV_K - 1} * cast({KMV_SPACE} as bigint) div element_at(kb, {KMV_K}) end"
    )
    est_u = F.expr(
        f"case when size(ku) < {KMV_K} then cast(size(ku) as bigint) "
        f"else {KMV_K - 1} * cast({KMV_SPACE} as bigint) div element_at(ku, {KMV_K}) end"
    )
    return pairs.select(
        "type_a",
        "type_b",
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_u.alias("est_union"),
        F.greatest(
            F.lit(0).cast("bigint"),
            (est_a + est_b - est_u).cast("bigint"),
        ).alias("est_inter"),
    )


# ---------------------------------------------------------------------------
# qx62: grouped MODE — the ordered-set aggregate SQL engines expose as
# mode() but leave tie-handling undefined; here the tiebreak is pinned
# (highest count, then lexicographically smallest value) so the result is
# deterministic and cross-engine identical.
# ---------------------------------------------------------------------------


@register(
    "qx62_grouped_mode",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS cnt
        FROM events GROUP BY user_id, event_type),
    r AS (
        SELECT user_id, event_type, cnt,
               SUM(cnt)  OVER (PARTITION BY user_id) AS n_events,
               COUNT(*)  OVER (PARTITION BY user_id) AS n_types,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id
                   ORDER BY cnt DESC, event_type ASC) AS rk
        FROM c)
    SELECT user_id, event_type AS mode_type,
           CAST(cnt AS BIGINT)      AS mode_cnt,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(n_types AS BIGINT)  AS n_types
    FROM r WHERE rk = 1
    """,
)
def qx62_grouped_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user modal event type with a DETERMINISTIC tiebreak (max count,
    then smallest type string), plus the user's total event and distinct
    type counts — the profile row a personalization feature store keys on.

    Plan: hash-agg to (user, type) counts first — the window then runs
    over at most |users| × |types| rows, each partition bounded by the
    type alphabet, never by event volume. One shuffle for the agg, one
    for the user-partitioned window; the totals ride the same window
    spec, avoiding a self-join back."""
    from pyspark.sql.window import Window as W

    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    part = W.partitionBy("user_id")
    w = part.orderBy(F.desc("cnt"), F.asc("event_type"))
    return (
        c.select(
            "user_id",
            "event_type",
            "cnt",
            F.sum("cnt").over(part).alias("n_events"),
            F.count(F.lit(1)).over(part).alias("n_types"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_type"),
            F.col("cnt").cast("bigint").alias("mode_cnt"),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("n_types").cast("bigint").alias("n_types"),
        )
    )


# ---------------------------------------------------------------------------
# qx64: CUSUM change-point detection over daily event volumes. The
# textbook one-sided CUSUM recursion s_i = max(0, s_{i-1} + x_i - mu - k)
# looks inherently sequential, but it has an exact window-function closed
# form: with d_i = x_i - mu - k and prefix sums P_i, s_i = P_i - min(0,
# min_{j<=i} P_j). (Page 1954's scheme; the prefix-min identity is the
# standard parallel-scan reduction.) Everything is integer arithmetic.
# ---------------------------------------------------------------------------

#: slack, as a fraction of the mean (k = mean div CUSUM_SLACK_DIV): drifts
#: smaller than ~5% of the baseline are absorbed, not accumulated.
CUSUM_SLACK_DIV = 20


@register(
    "qx64_cusum_changepoints",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS cnt
        FROM events GROUP BY event_type, CAST(ts AS DATE)),
    m AS (
        SELECT event_type, day, cnt,
               SUM(cnt) OVER (PARTITION BY event_type)
                 // COUNT(*) OVER (PARTITION BY event_type) AS mu
        FROM daily),
    d AS (
        SELECT event_type, day, cnt, mu,
               cnt - mu - mu // {CUSUM_SLACK_DIV} AS diff
        FROM m),
    p AS (
        SELECT event_type, day, cnt, mu,
               SUM(diff) OVER (PARTITION BY event_type ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS pf
        FROM d),
    s AS (
        SELECT event_type, day, cnt, mu,
               pf - LEAST(0, MIN(pf) OVER (PARTITION BY event_type
                                           ORDER BY day
                                           ROWS UNBOUNDED PRECEDING)) AS cusum
        FROM p)
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
           CAST(cnt AS BIGINT)   AS cnt,
           CAST(mu AS BIGINT)    AS mu,
           CAST(cusum AS BIGINT) AS cusum,
           CAST(CASE WHEN cusum > mu THEN 1 ELSE 0 END AS INT) AS alarm
    FROM s
    """,
)
def qx64_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type daily CUSUM drift statistic and alarm flags: the
    monitoring primitive that catches a sustained upward shift in event
    volume (ingest regression, bot surge) that per-day thresholds miss.
    mu is the per-type mean daily count (integer division), slack
    k = mu/{CUSUM_SLACK_DIV}, alarm when the accumulated excess exceeds mu.

    The recursion s_i = max(0, s_(i-1) + cnt_i - mu - k) is rewritten to
    its closed form s_i = P_i - min(0, min_(j<=i) P_j) over prefix sums
    P — an ordinary cumulative window, so Spark parallelizes it instead
    of running a sequential fold.

    Plan: the only data-sized operation is the (type, day) hash-agg with
    map-side partials; windows run over |types| × |days| pre-aggregated
    rows — bounded by the calendar, not the corpus. All integers: the
    oracle hash-matches exactly."""
    from pyspark.sql.window import Window as W

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return cusum_from_daily(daily)


def cusum_from_daily(daily: DataFrame) -> DataFrame:
    """CUSUM statistic/alarms from a (event_type, day, cnt) daily-count
    table — the shared tail of qx64 (batch) and qx70 (the same counts
    maintained incrementally under the streaming replay ledger)."""
    from pyspark.sql.window import Window as W

    part = W.partitionBy("event_type")
    cum = part.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    m = daily.withColumn(
        "mu",
        F.expr(
            "sum(cnt) over (partition by event_type)"
            " div count(*) over (partition by event_type)"
        ),
    )
    d = m.withColumn(
        "diff", F.expr(f"cnt - mu - mu div {CUSUM_SLACK_DIV}")
    )
    p = d.withColumn("pf", F.sum("diff").over(cum))
    s = p.withColumn(
        "cusum",
        F.col("pf") - F.least(F.lit(0).cast("bigint"), F.min("pf").over(cum)),
    )
    return s.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("mu").cast("bigint").alias("mu"),
        F.col("cusum").cast("bigint").alias("cusum"),
        F.when(F.col("cusum") > F.col("mu"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("alarm"),
    )


# ---------------------------------------------------------------------------
# qx73: event-concentration audit — the Lorenz curve (per decile of
# users, what share of total events the bottom d/10 of users generate)
# and the Gini coefficient, both EXACT. The inequality audit run on
# training corpora and traffic alike: a Gini near 1 means a handful of
# power users (or template mills) dominate the data and per-user
# capping/reweighting is warranted.
#
# Scale trick: no per-row global rank. Group users BY their count value
# v into a histogram (v, m); within a run of tied values every ordering
# gives the same rank-weighted sum, so Σ i·x_i collapses to the closed
# form Σ v·(m·C_prev + m(m+1)/2) over the histogram, and Lorenz decile
# points interpolate inside the containing run. The histogram is
# bounded by max events-per-user, so all prefix sums run on
# metadata-sized data — prefixes via the qx73 triangular broadcast join,
# never a single-partition window.
# ---------------------------------------------------------------------------


@register(
    "qx73_event_concentration_gini",
    oracle="""
    WITH c AS (SELECT user_id, COUNT(*) AS v FROM events GROUP BY user_id),
    h AS (SELECT v, COUNT(*) AS m FROM c GROUP BY v),
    p AS (
        SELECT v, m, v * m AS mass,
               COALESCE(SUM(m) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS c_prev,
               COALESCE(SUM(v * m) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS m_prev
        FROM h),
    t AS (
        SELECT SUM(m)::HUGEINT AS n, SUM(mass)::HUGEINT AS sx,
               SUM(v::HUGEINT * (m * c_prev + m * (m + 1) // 2)) AS sixi
        FROM p),
    d AS (SELECT unnest(generate_series(1, 10)) AS decile),
    r AS (SELECT d.decile, (d.decile * t.n) // 10 AS rk
          FROM d CROSS JOIN t),
    l AS (
        SELECT r.decile, r.rk,
               p.m_prev + p.v * (r.rk - p.c_prev) AS cum_mass
        FROM r JOIN p ON p.c_prev < r.rk AND r.rk <= p.c_prev + p.m)
    SELECT CAST(l.decile AS INT)    AS decile,
           CAST(l.rk AS BIGINT)     AS rank_at,
           CAST(l.cum_mass AS BIGINT) AS cum_events,
           CAST(l.cum_mass * 1000000 // t.sx AS BIGINT) AS lorenz_e6,
           CAST((2 * t.sixi - (t.n + 1) * t.sx) * 1000000
                // (t.n * t.sx) AS BIGINT) AS gini_e6
    FROM l CROSS JOIN t
    """,
)
def qx73_event_concentration_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten Lorenz-curve points (decile, rank, cumulative events, share at
    1e6 fixed point) plus the exact Gini coefficient over per-user event
    counts.

    Plan: one data-sized hash-agg (user → count), one histogram agg
    (count value → multiplicity, bounded by max events/user), then the
    triangular broadcast join computes histogram prefix sums — the q75
    offset idiom, so NOTHING funnels through a single-partition window.
    Rank-weighted sums use the tie-run closed form (order within a run
    of equal values cannot change Σ i·x_i), carried in decimal(38)/
    HUGEINT; the decile lookup is a 10-row broadcast range join into the
    histogram. Every output value is integer-exact."""
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("v"))
    # pinned: h feeds the triangular prior join AND pref, and pref feeds
    # the totals and the decile lookup — unpinned, the two data-sized
    # aggregates re-run per consumer (events scanned 4x in one plan)
    h = (
        c.groupBy("v")
        .agg(F.count(F.lit(1)).alias("m"))
        .localCheckpoint(eager=False)
    )
    prior = h.select(
        F.col("v").alias("v2"),
        F.col("m").alias("m2"),
        (F.col("v") * F.col("m")).alias("mass2"),
    )
    pref = (
        h.join(F.broadcast(prior), F.col("v2") < F.col("v"), "left")
        .groupBy("v", "m")
        .agg(
            F.coalesce(F.sum("m2"), F.lit(0)).alias("c_prev"),
            F.coalesce(F.sum("mass2"), F.lit(0)).alias("m_prev"),
        )
        .localCheckpoint(eager=False)
    )
    dec = lambda c_: F.col(c_).cast("decimal(38,0)")  # noqa: E731
    t = pref.agg(
        F.sum("m").cast("decimal(38,0)").alias("n"),
        F.sum(F.col("v") * F.col("m")).cast("decimal(38,0)").alias("sx"),
        F.sum(
            dec("v")
            * (
                F.col("m") * F.col("c_prev")
                + F.expr("m * (m + 1) div 2")
            )
        )
        .cast("decimal(38,0)")
        .alias("sixi"),
    )
    deciles = spark.range(1, 11, 1, 1).select(F.col("id").cast("int").alias("decile"))
    r = deciles.crossJoin(F.broadcast(t)).withColumn(
        "rk", F.expr("cast((decile * n) div 10 as bigint)")
    )
    l = r.join(
        F.broadcast(pref),
        (F.col("c_prev") < F.col("rk"))
        & (F.col("rk") <= F.col("c_prev") + F.col("m")),
    ).withColumn(
        "cum_mass", F.col("m_prev") + F.col("v") * (F.col("rk") - F.col("c_prev"))
    )
    return l.select(
        "decile",
        F.col("rk").cast("bigint").alias("rank_at"),
        F.col("cum_mass").cast("bigint").alias("cum_events"),
        F.expr("cast(cum_mass * 1000000 div sx as bigint)").alias("lorenz_e6"),
        F.expr(
            "cast((2 * sixi - (n + 1) * sx) * 1000000"
            " div (n * sx) as bigint)"
        ).alias("gini_e6"),
    )


# ---------------------------------------------------------------------------
# qx74: grouped feature-correlation audit — pairwise Pearson correlation
# between the candidate features (event value, hour-of-day, day-of-week)
# per event type. The pre-training redundancy check: two features with
# |r| near 1 carry one feature's worth of signal; a target uncorrelated
# with everything needs new features, not more rows. Numerators and
# variance terms are exact integers (the qx41/qx29 n·Σxy − ΣxΣy shape in
# decimal(38)/HUGEINT, compared as strings); r itself converts the three
# exact integers to double and applies only IEEE correctly-rounded ops
# (multiply, sqrt, divide — the qx65 argument), then rounds to 4 dp.
# ---------------------------------------------------------------------------

_QX74_FEATS = [
    ("value_e3", "(CASE WHEN isfinite(value) THEN CAST(FLOOR(value * 1000) AS BIGINT) END)",
     "case when value is not null and not isnan(value) and abs(value) != double('Infinity') then cast(floor(value * 1000) as bigint) end"),
    ("hod", "CAST(EXTRACT(hour FROM ts) AS BIGINT)", "hour(ts)"),
    ("dow", "CAST(EXTRACT(isodow FROM ts) AS BIGINT)", "weekday(ts) + 1"),
]


def _qx74_oracle() -> str:
    pairs = [(0, 1), (0, 2), (1, 2)]
    sums = ",\n               ".join(
        [f"COUNT(*)::HUGEINT AS n"]
        + [f"SUM({name})::HUGEINT AS s_{name}" for name, _, _ in _QX74_FEATS]
        + [
            f"SUM({name}::HUGEINT * {name})::HUGEINT AS ss_{name}"
            for name, _, _ in _QX74_FEATS
        ]
        + [
            f"SUM({_QX74_FEATS[i][0]}::HUGEINT * {_QX74_FEATS[j][0]})::HUGEINT"
            f" AS sp_{i}{j}"
            for i, j in pairs
        ]
    )
    rows = []
    for i, j in pairs:
        a, b = _QX74_FEATS[i][0], _QX74_FEATS[j][0]
        num = f"(n * sp_{i}{j} - s_{a} * s_{b})"
        da = f"(n * ss_{a} - s_{a} * s_{a})"
        db = f"(n * ss_{b} - s_{b} * s_{b})"
        # zero-variance contract (shared with the Spark side): a constant
        # feature has no defined correlation — r is NULL, not 0/0. The
        # compound fixture hits this for real (its NULL event_type group
        # is ALSO the pinned-timestamp group, so hod/dow are constant
        # there), and Spark's ANSI mode rejects the raw 0/0 outright.
        rows.append(
            f"""SELECT event_type, '{a}' AS feat_a, '{b}' AS feat_b,
               CAST(n AS BIGINT) AS n,
               {num}::VARCHAR AS cov_num,
               CASE WHEN {da} > 0 AND {db} > 0 THEN
                 ROUND({num}::DOUBLE / sqrt({da}::DOUBLE * {db}::DOUBLE), 4)
               END AS pearson_r
            FROM agg"""
        )
    feats = ", ".join(f"{expr} AS {name}" for name, expr, _ in _QX74_FEATS)
    union = "\n        UNION ALL ".join(rows)
    return f"""
    WITH f AS (SELECT event_type, {feats} FROM events),
    agg AS (
        SELECT event_type,
               {sums}
        FROM f GROUP BY event_type)
    {union}
    """


@register("qx74_feature_correlation_audit", oracle=_qx74_oracle())
def qx74_feature_correlation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, feat_a, feat_b, n, exact covariance numerator,
    pearson_r) for the three feature pairs over (value_e3, hour-of-day,
    ISO day-of-week).

    Plan: one pass, one hash-agg per event type computing all ten
    sufficient statistics (n, 3 sums, 3 sums of squares, 3 cross
    products) with map-side partials — the classic sufficient-statistics
    reduction, so the correlation matrix costs ONE shuffle of 10-cell
    rows at any corpus size. The three output rows per group are
    projections of the same aggregate row, not re-scans."""
    events = load_table(spark, sf_dir, "events")
    f = events.select(
        "event_type",
        *[
            F.expr(spark_expr).cast("bigint").alias(name)
            for name, _, spark_expr in _QX74_FEATS
        ],
    )
    names = [name for name, _, _ in _QX74_FEATS]
    pairs = [(0, 1), (0, 2), (1, 2)]
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = f.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        *[F.sum(n_).cast("decimal(38,0)").alias(f"s_{n_}") for n_ in names],
        *[
            F.sum(dec(n_) * F.col(n_)).cast("decimal(38,0)").alias(f"ss_{n_}")
            for n_ in names
        ],
        *[
            F.sum(dec(names[i]) * F.col(names[j]))
            .cast("decimal(38,0)")
            .alias(f"sp_{i}{j}")
            for i, j in pairs
        ],
    ).localCheckpoint(eager=False)
    # pinned: the three per-pair outputs are projections of this one
    # |types|-row aggregate — unpinned, each union branch re-planned the
    # whole sufficient-statistics pass (events scanned 3x in one plan)
    outs = []
    for i, j in pairs:
        a, b = names[i], names[j]
        num = F.expr(f"n * sp_{i}{j} - s_{a} * s_{b}").cast("decimal(38,0)")
        da = F.expr(f"n * ss_{a} - s_{a} * s_{a}").cast("decimal(38,0)")
        db = F.expr(f"n * ss_{b} - s_{b} * s_{b}").cast("decimal(38,0)")
        outs.append(
            agg.select(
                "event_type",
                F.lit(a).alias("feat_a"),
                F.lit(b).alias("feat_b"),
                F.col("n").cast("bigint").alias("n"),
                num.cast("string").alias("cov_num"),
                # zero-variance -> NULL (see the oracle note); the guard
                # also keeps ANSI mode from throwing DIVIDE_BY_ZERO
                F.when(
                    (da > F.lit(0)) & (db > F.lit(0)),
                    F.round(
                        num.cast("double")
                        / F.sqrt(da.cast("double") * db.cast("double")),
                        4,
                    ),
                ).alias("pearson_r"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# ---------------------------------------------------------------------------
# qx83: the KMV rollup cube — sketch re-aggregation up a grouping lattice
# ---------------------------------------------------------------------------
# The OLAP-cube move applied to sketches: build distinct-user KMV sketches
# ONCE at the finest grain (event_type x day-of-week) and derive every
# coarser grouping — per type, per dow, grand total — by MERGING leaf
# sketches, never rescanning raw data. The merge is provably lossless for
# bottom-K sketches over sub-unions: any hash in the true bottom-K of a
# union ranks within the bottom-K of whichever leaf contains it, so the
# merged sketch EQUALS the direct sketch — which is exactly what the
# oracle computes directly, making the identity hash-gated rather than
# asserted. True distincts and integer error (e4) ride along per cell.


def _kmv_cube_oracle() -> str:
    # dow aligned to Spark's dayofweek (Sunday=1): duckdb dayofweek + 1
    est = (
        f"CASE WHEN COUNT(*) < {KMV_K} THEN COUNT(*) "
        f"ELSE ({KMV_K - 1} * {KMV_SPACE}::BIGINT) "
        f"// MAX(CASE WHEN rk = {KMV_K} THEN hv END) END"
    )

    def level(label, keys, type_out, dow_out):
        key_list = ", ".join(keys) if keys else "1"
        part = f"PARTITION BY {key_list}" if keys else ""
        group = f"GROUP BY {key_list}" if keys else ""
        join_cond = (
            " AND ".join(f"t.{k} = e.{k}" for k in keys) if keys else "1 = 1"
        )
        return f"""
        SELECT '{label}' AS level, {type_out} AS event_type,
               CAST({dow_out} AS INT) AS dow,
               CAST(LEAST(e.n_hv, {KMV_K}) AS INT) AS sketch_size,
               CAST(e.est AS BIGINT)  AS est_distinct,
               CAST(t.tru AS BIGINT)  AS true_distinct,
               CAST(ABS(e.est - t.tru) * 10000 // t.tru AS BIGINT) AS err_e4
        FROM (
            SELECT {key_list + ',' if keys else ''} COUNT(*) AS n_hv,
                   {est} AS est
            FROM (SELECT {key_list + ',' if keys else ''} hv,
                         ROW_NUMBER() OVER ({part} ORDER BY hv) AS rk
                  FROM (SELECT DISTINCT {key_list + ',' if keys else ''} hv
                        FROM d))
            {group}) e
        JOIN (
            SELECT {key_list + ',' if keys else ''}
                   COUNT(DISTINCT user_id) AS tru
            FROM d {group}) t ON {join_cond}"""

    blocks = [
        level("type_dow", ["event_type", "dow"], "e.event_type", "e.dow"),
        level("type", ["event_type"], "e.event_type", "-1"),
        level("dow", ["dow"], "'ALL'", "e.dow"),
        level("all", [], "'ALL'", "-1"),
    ]
    union = " UNION ALL ".join(blocks)
    return f"""
    WITH d AS MATERIALIZED (
        SELECT DISTINCT event_type,
               dayofweek(CAST(ts AS DATE)) + 1 AS dow,
               user_id, {kmv_hash_duck('user_id')} AS hv
        FROM events WHERE user_id IS NOT NULL)
    {union}
    """


@register("qx83_kmv_rollup_cube", oracle=_kmv_cube_oracle())
def qx83_kmv_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user estimates for every cell of the
    (event_type × day-of-week) grouping lattice — leaf cells sketched
    once, every coarser level derived purely by merging leaf sketches
    (explode + dedup + bottom-K: the associative/commutative/idempotent
    kmv_merge), with exact distincts and integer e4 error per cell.

    This is the planner primitive behind sketch-backed cubes: at 100 TB
    the raw-data scan happens once for the finest grain; rollups touch
    only K·|leaf| hashes (metadata). The oracle computes every level
    DIRECTLY from the distinct hash sets — the hash-gate therefore
    PROVES the merge-equals-direct identity on real data, not just in
    a unit test. dow is Spark's dayofweek numbering (Sunday=1; the
    oracle shifts DuckDB's Sunday=0 to match)."""
    events = load_table(spark, sf_dir, "events")
    # distinct-USER sketch: anonymous events excluded (kmv_sketch_by_type)
    h = events.filter(F.col("user_id").isNotNull()).select(
        "event_type",
        F.dayofweek(F.to_date("ts")).cast("int").alias("dow"),
        "user_id",
        F.expr(_KMV_HASH).alias("hv"),
    )
    leaf = (
        h.groupBy("event_type", "dow", F.pmod("hv", F.lit(16)).alias("bucket"))
        .agg(_bottom_k_set().alias("mins"))
        .groupBy("event_type", "dow")
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("mins"))), 1, KMV_K
            ).alias("kmins")
        )
        .localCheckpoint(eager=False)
    )
    exploded = leaf.select(
        "event_type", "dow", F.explode("kmins").alias("hv")
    )
    # consumed by all four lattice levels' exact-distinct sides — pin
    # so events are scanned once for it, not once per level (the
    # audit counted events x4 in this query; the oracle's MATERIALIZED
    # d is the same move on the DuckDB side)
    du = (
        events.select(
            "event_type",
            F.dayofweek(F.to_date("ts")).cast("int").alias("dow"),
            "user_id",
        )
        .distinct()
        .localCheckpoint(eager=False)
    )

    def est_cols():
        n = F.size("kmins")
        est = F.when(n < KMV_K, n.cast("bigint")).otherwise(
            F.expr(
                f"{KMV_K - 1} * cast({KMV_SPACE} as bigint)"
                f" div element_at(kmins, {KMV_K})"
            )
        )
        return n.cast("int").alias("sketch_size"), est.cast("bigint").alias(
            "est_distinct"
        )

    def level(label, keys, type_out, dow_out):
        if keys:
            sk = exploded.groupBy(*keys).agg(
                F.slice(
                    F.array_sort(F.array_distinct(F.collect_list("hv"))),
                    1,
                    KMV_K,
                ).alias("kmins")
            )
            tru = du.groupBy(*keys).agg(
                F.countDistinct("user_id").cast("bigint").alias("true_distinct")
            )
            j = sk.join(tru, keys)
        else:
            sk = exploded.select("hv").distinct().agg(
                F.slice(F.array_sort(F.collect_list("hv")), 1, KMV_K).alias(
                    "kmins"
                )
            )
            tru = du.agg(
                F.countDistinct("user_id").cast("bigint").alias("true_distinct")
            )
            j = sk.crossJoin(tru)
        n_col, est_col = est_cols()
        return j.select(
            F.lit(label).alias("level"),
            type_out.alias("event_type"),
            dow_out.cast("int").alias("dow"),
            n_col,
            est_col,
            "true_distinct",
        )

    out = (
        level("type_dow", ["event_type", "dow"], F.col("event_type"), F.col("dow"))
        .unionByName(
            level("type", ["event_type"], F.col("event_type"), F.lit(-1))
        )
        .unionByName(level("dow", ["dow"], F.lit("ALL"), F.col("dow")))
        .unionByName(level("all", [], F.lit("ALL"), F.lit(-1)))
    )
    return out.withColumn(
        "err_e4",
        # the "all" row exists even over an empty corpus, where a 0
        # true-distinct makes the relative error undefined -> NULL
        F.expr(
            "cast(case when true_distinct = 0 then null"
            " else abs(est_distinct - true_distinct) * 10000"
            " div true_distinct end as bigint)"
        ),
    )
