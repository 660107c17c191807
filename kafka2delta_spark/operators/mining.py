"""Pattern- and graph-mining operators.

Frequent-pair (market-basket) mining over the order/part star schema and
triangle/clustering-coefficient analysis over the near-duplicate document
graph. Both are classic distributed-mining shapes the reference engine's
domain (CDC ingest; ref stream/stream.py) never needed, mandated by the
gap map (SURVEY §2.2/§2.3): bounded pair expansion inside groups, and
ordered-edge triangle enumeration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka2delta_spark.queryset import register
from kafka2delta_spark.sources.tables import load_table
from kafka2delta_spark.operators.hints import dim_broadcast

#: minimum number of co-occurrences for a brand pair to be reported —
#: the classic min-support cut that bounds output (and downstream rule
#: generation) no matter how large the order corpus grows.
PAIR_MIN_SUPPORT = 20


@register(
    "qx36_brand_cooccurrence",
    oracle=f"""
    WITH basket AS (
        SELECT DISTINCT l.l_orderkey, p.p_brand
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM basket),
    brand_n AS (
        SELECT p_brand, COUNT(*) AS n FROM basket GROUP BY p_brand),
    pair_n AS (
        SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
               COUNT(*) AS n_both
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
        GROUP BY a.p_brand, b.p_brand)
    SELECT brand_a, brand_b,
           CAST(n_both AS BIGINT)               AS n_both,
           CAST(na.n AS BIGINT)                 AS n_a,
           CAST(nb.n AS BIGINT)                 AS n_b,
           CAST(tot.n_orders AS BIGINT)         AS n_orders,
           ROUND(n_both * tot.n_orders * 1.0 / (na.n * nb.n), 4) AS lift
    FROM pair_n
    JOIN brand_n na ON na.p_brand = brand_a
    JOIN brand_n nb ON nb.p_brand = brand_b
    CROSS JOIN tot
    WHERE n_both >= {PAIR_MIN_SUPPORT}
    """,
)
def qx36_brand_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: for every unordered pair of part brands
    co-occurring in at least ``PAIR_MIN_SUPPORT`` orders, the exact
    co-occurrence count, per-brand order counts, and lift
    (``P(a,b) / (P(a)P(b))``) — the support/lift core of association-rule
    mining, run over the order→part star join.

    Plan: lineitem joins the 2-column (partkey, brand) projection of part
    broadcast; baskets (distinct (order, brand)) come from one hash-agg
    keyed by order. Pair expansion happens INSIDE each order via
    ``collect_set`` + a native nested ``transform`` (no self-join shuffle:
    the quadratic blowup is bounded by basket size ≤ distinct brands per
    order, single digits here, and by the brand alphabet generally —
    C(25,2) = 300 possible output rows regardless of corpus size). One
    final hash-agg on the pair key; per-brand counts and the order total
    are metadata-sized and broadcast back. All counts stay integer; the
    single double division happens once per output row after rounding
    both operands are exact int64 products. At 100 TB the only
    data-sized shuffle is the basket hash-agg on l_orderkey."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    basket = (
        li.join(dim_broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
    )
    # pair counts, per-brand counts and the order total all reduce the
    # same basket table — one kind-tagged explode computes all three in
    # a single pass (the audit counted the lineitem join+agg planned 3x
    # for them; guide §2.4). Output is alphabet-bounded (<=C(25,2)+25+1
    # rows), pinned for its three tiny consumers.
    combo = F.expr(
        "concat("
        " flatten(transform(brands, (x, i) ->"
        "  transform(slice(brands, i + 2, size(brands) - i - 1),"
        "   y -> struct('p' AS kind, x AS ka, y AS kb)))),"
        " transform(brands, x ->"
        "  struct('b' AS kind, x AS ka, cast(null as string) AS kb)),"
        " array(struct('t' AS kind, cast(null as string) AS ka,"
        "  cast(null as string) AS kb)))"
    )
    counts = (
        basket.select(F.explode(combo).alias("e"))
        .groupBy("e.kind", "e.ka", "e.kb")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    pair_n = counts.filter(F.col("kind") == "p").select(
        F.col("ka").alias("brand_a"),
        F.col("kb").alias("brand_b"),
        F.col("c").alias("n_both"),
    )
    brand_n = counts.filter(F.col("kind") == "b").select(
        F.col("ka").alias("p_brand"), F.col("c").alias("n")
    )
    tot = counts.filter(F.col("kind") == "t").select(
        F.col("c").alias("n_orders")
    )
    na = brand_n.select(
        F.col("p_brand").alias("brand_a"), F.col("n").alias("n_a")
    )
    nb = brand_n.select(
        F.col("p_brand").alias("brand_b"), F.col("n").alias("n_b")
    )
    return (
        pair_n.filter(F.col("n_both") >= PAIR_MIN_SUPPORT)
        .join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a", "brand_b", "n_both", "n_a", "n_b", "n_orders",
            F.round(
                (F.col("n_both") * F.col("n_orders"))
                / (F.col("n_a") * F.col("n_b")),
                4,
            ).alias("lift"),
        )
    )


def _triangle_oracle() -> str:
    from kafka2delta_spark.functions.dedup import _JACCARD_PAIRS_SQL

    return f"""
    WITH e AS (SELECT doc_a AS a, doc_b AS b FROM ({_JACCARD_PAIRS_SQL})),
    tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
    tri_nodes AS (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri),
    tri_n AS (SELECT node, COUNT(*) AS n_tri FROM tri_nodes GROUP BY node),
    und AS (SELECT a AS node, b AS nbr FROM e UNION ALL SELECT b, a FROM e),
    deg AS (SELECT node, COUNT(*) AS degree FROM und GROUP BY node)
    SELECT d.node AS doc_id,
           CAST(d.degree AS BIGINT)               AS degree,
           CAST(COALESCE(t.n_tri, 0) AS BIGINT)   AS n_triangles,
           CASE WHEN d.degree >= 2 THEN
             ROUND(2.0 * COALESCE(t.n_tri, 0) / (d.degree * (d.degree - 1)), 4)
           ELSE 0.0 END                           AS clustering_coeff
    FROM deg d LEFT JOIN tri_n t ON t.node = d.node
    """


def node_degrees(e: DataFrame) -> DataFrame:
    """(node, degree) from a canonical (a < b) undirected edge list."""
    und = e.select(F.col("a").alias("node")).unionByName(
        e.select(F.col("b").alias("node"))
    )
    return und.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )


def orient_by_degree(e: DataFrame, deg: DataFrame) -> DataFrame:
    """Direct each undirected edge from its lower-(degree, id) endpoint
    to the higher one: (src, dst, src_deg→, dst_deg) with
    (deg(src), src) < (deg(dst), dst) under the total order.

    This is the standard wedge-join skew guard (Suri & Vassilvitskii,
    "Counting Triangles and the Curse of the Last Reducer", WWW 2011):
    out-degree under this orientation is O(sqrt(m)) for ANY graph, so
    per-source wedge counts — the quadratic term — are bounded by the
    graph itself, not by any upstream cap. A hub of degree d contributes
    ZERO wedges (every edge points INTO it)."""
    da = deg.select(F.col("node").alias("a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("degree").alias("deg_b"))
    j = e.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    return j.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias(
            "dst_deg"
        ),
    )


def triangle_counts(e: DataFrame, deg: DataFrame) -> DataFrame:
    """(node, n_tri) per-vertex triangle counts via degree-ordered wedge
    enumeration. Each triangle has a unique minimal-(degree, id) vertex;
    both its triangle edges point out of that vertex, and the closing
    edge's orientation between the two out-neighbors follows the same
    total order — so the wedge (u→v, u→w with k(v) < k(w)) closed by the
    directed edge (v→w) produces every triangle exactly once."""
    d = orient_by_degree(e, deg)
    w1 = d.select("src", F.col("dst").alias("v"), F.col("dst_deg").alias("deg_v"))
    w2 = d.select("src", F.col("dst").alias("w"), F.col("dst_deg").alias("deg_w"))
    v_first = (F.col("deg_v") < F.col("deg_w")) | (
        (F.col("deg_v") == F.col("deg_w")) & (F.col("v") < F.col("w"))
    )
    wedges = w1.join(w2, "src").where(v_first)
    closing = d.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"])
    tri_nodes = (
        tri.select(F.col("src").alias("node"))
        .unionByName(tri.select(F.col("v").alias("node")))
        .unionByName(tri.select(F.col("w").alias("node")))
    )
    return tri_nodes.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tri")
    )


@register("qx37_neardup_triangles", oracle=_triangle_oracle())
def qx37_neardup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle count and local clustering coefficient over
    the near-duplicate similarity graph — the density diagnostic behind
    dedup policy: high-coefficient neighborhoods are template families
    (cluster-and-keep-one is safe), low-coefficient stars are hub pages
    incidentally similar to many others (transitive dedup would
    over-delete).

    Plan: degree-ordered wedge enumeration (``triangle_counts``) — edges
    are oriented from the lower-(degree, id) endpoint before the wedge
    join, so per-source wedge expansion is O(sqrt(m))-bounded by the
    graph structure itself. This replaces the earlier id-ordered
    enumeration, whose safety silently depended on SHINGLE_DF_CAP (a
    constant in functions/dedup.py) keeping hub degrees low: a hub doc
    with a small id would have expanded C(deg, 2) wedges. The edge list
    is the SAME per-session checkpointed artifact q98/qx06/qx22/qx34
    consume (near-dup pairs — tiny relative to the corpus), so the
    joins broadcast here; at 100 TB the same plan shuffles on the wedge
    source vertex with the sqrt(m) bound intact."""
    from kafka2delta_spark.functions.dedup import _jaccard_edges

    e = _jaccard_edges(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    deg = node_degrees(e)
    tri_n = triangle_counts(e, deg)
    return (
        deg.join(tri_n, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            "degree",
            F.coalesce("n_tri", F.lit(0)).cast("bigint").alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    2.0
                    * F.coalesce("n_tri", F.lit(0))
                    / (F.col("degree") * (F.col("degree") - 1)),
                    4,
                ),
            )
            .otherwise(0.0)
            .alias("clustering_coeff"),
        )
    )


# ---------------------------------------------------------------------------
# qx66: k-core decomposition of the near-duplicate graph — the density
# peel that separates template FAMILIES (every member supported by >= k
# near-dup neighbors) from incidental pairwise matches. A curation pass
# that collapses k-cores but keeps sub-core matches for human review
# over-deletes far less than naive transitive dedup. Algorithm: Jacobi
# (simultaneous-removal) peeling, Matula & Beck 1983 / the synchronous
# variant used by distributed engines. The rounds are UNROLLED — the
# defined semantics is "KCORE_ROUNDS simultaneous peels", identical in
# both engines (tests assert the fixpoint is reached well before the
# cap; each peel round removes at least one vertex until stable, and the
# near-dup graph's components are SHINGLE_DF_CAP-bounded, so the cap is
# generous).
# ---------------------------------------------------------------------------

KCORE_K = 2
KCORE_ROUNDS = 6


def _kcore_oracle() -> str:
    from kafka2delta_spark.functions.dedup import _JACCARD_PAIRS_SQL

    rounds = []
    prev = "a0"
    for i in range(1, KCORE_ROUNDS + 1):
        rounds.append(
            f"""a{i} AS MATERIALIZED (
        SELECT u.a AS node FROM und u
        JOIN {prev} x ON x.node = u.a
        JOIN {prev} y ON y.node = u.b
        GROUP BY u.a HAVING COUNT(*) >= {KCORE_K})"""
        )
        prev = f"a{i}"
    return f"""
    WITH jp AS MATERIALIZED ({_JACCARD_PAIRS_SQL}),
    und AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM jp
            UNION ALL SELECT doc_b, doc_a FROM jp),
    deg AS MATERIALIZED (SELECT a AS node, COUNT(*) AS deg_full FROM und GROUP BY a),
    a0 AS MATERIALIZED (SELECT node FROM deg),
    {",".join(rounds)},
    core_deg AS (
        SELECT u.a AS node, COUNT(*) AS deg_core FROM und u
        JOIN {prev} x ON x.node = u.a
        JOIN {prev} y ON y.node = u.b
        GROUP BY u.a)
    SELECT d.node AS doc_id,
           CAST(CASE WHEN c.node IS NOT NULL THEN 1 ELSE 0 END AS INT)
               AS in_core,
           CAST(d.deg_full AS BIGINT) AS deg_full,
           CAST(COALESCE(cd.deg_core, 0) AS BIGINT) AS deg_core
    FROM deg d
    LEFT JOIN {prev} c ON c.node = d.node
    LEFT JOIN core_deg cd ON cd.node = d.node
    """


@register("qx66_kcore_decomposition", oracle=_kcore_oracle())
def qx66_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core membership over the near-dup Jaccard graph: every
    graph node with its full degree, whether it survives KCORE_ROUNDS
    simultaneous peels of vertices with remaining degree < KCORE_K, and
    its within-core degree.

    Plan: consumes the SAME session-checkpointed edge list as
    q98/qx06/qx22/qx37 (one materialization feeds every graph consumer).
    Each peel round is one small-side hash semi-join of the edge list
    against the surviving vertex set followed by a degree hash-agg —
    edge-list-sized work per round, vertex sets only ever shrink. At
    100 TB the edge list is the near-dup candidate output (bounded by
    the banding caps), orders of magnitude smaller than the corpus; the
    alive-set join keys are doc ids, so AQE broadcasts the shrinking
    side after the first round."""
    from kafka2delta_spark.functions.dedup import _jaccard_edges

    e = _jaccard_edges(spark, sf_dir)
    und = e.select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).unionAll(e.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
    und = und.localCheckpoint(eager=True)
    deg = und.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).alias("deg_full")
    )
    alive = deg.select("node")
    # Scale-adaptive loop width (dedup._loop_partitions; r13 core study:
    # qx66 ANTI-scaled 0.27x from 8 to 32 cores because every peel round
    # re-scanned the cores-wide checkpointed edge RDD and shuffled at
    # cores-wide partitions for a cap-bounded graph). One upfront count
    # of the materialized edge list sizes both: the edge frame is
    # narrowed with a (narrow, no-shuffle) coalesce and the rounds'
    # shuffles run at the same width; alive only ever shrinks, so the
    # width never needs to grow. min(default, ...) keeps full cluster
    # width whenever the graph is actually large.
    from kafka2delta_spark.functions.dedup import _loop_partitions

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = _loop_partitions(spark, und.count(), int(prev_parts))
    und_loop = und.coalesce(loop_parts)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
        for _ in range(KCORE_ROUNDS):
            alive = (
                und_loop.join(
                    alive.withColumnRenamed("node", "a"), "a", "left_semi"
                )
                .join(alive.withColumnRenamed("node", "b"), "b", "left_semi")
                .groupBy(F.col("a").alias("node"))
                .agg(F.count(F.lit(1)).alias("d"))
                .filter(F.col("d") >= KCORE_K)
                .select("node")
                .localCheckpoint(eager=True)
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    core_deg = (
        und.join(alive.withColumnRenamed("node", "a"), "a", "left_semi")
        .join(alive.withColumnRenamed("node", "b"), "b", "left_semi")
        .groupBy(F.col("a").alias("node"))
        .agg(F.count(F.lit(1)).alias("deg_core"))
    )
    return (
        deg.join(alive.withColumn("in_core", F.lit(1)), "node", "left")
        .join(core_deg, "node", "left")
        .select(
            F.col("node").alias("doc_id"),
            F.coalesce("in_core", F.lit(0)).cast("int").alias("in_core"),
            F.col("deg_full").cast("bigint").alias("deg_full"),
            F.coalesce("deg_core", F.lit(0)).cast("bigint").alias("deg_core"),
        )
    )


# ---------------------------------------------------------------------------
# qx91: modularity of the near-dup graph under the SOURCE partition —
# "do near-duplicates concentrate within sources, or leak across them?"
# Newman modularity Q = Σ_s [ e_s/m − (d_s/2m)² ] over source groups s,
# computed EXACTLY: per-group numerator q_num = 4m·e_s − d_s² is integer,
# and Q·4m² = Σ q_num, so the statistic is hash-gated with no float
# accumulation anywhere. High Q ⇒ near-dup mining can shard by source
# (the co-duplication matrix qx34's planner question, answered with one
# graph-level number); Q ≈ 0 ⇒ cross-source dedup is unavoidable.
# ---------------------------------------------------------------------------


def _modularity_oracle() -> str:
    from kafka2delta_spark.functions.dedup import _JACCARD_PAIRS_SQL

    return f"""
    WITH jp AS MATERIALIZED (
        SELECT doc_a, doc_b FROM ({_JACCARD_PAIRS_SQL})),
    src AS (SELECT doc_id, source FROM documents),
    lab AS (
        SELECT jp.doc_a, jp.doc_b, sa.source AS s_a, sb.source AS s_b
        FROM jp JOIN src sa ON sa.doc_id = jp.doc_a
                JOIN src sb ON sb.doc_id = jp.doc_b),
    m AS (SELECT COUNT(*) AS m FROM jp),
    deg AS (
        SELECT source, COUNT(*) AS d FROM (
            SELECT s_a AS source FROM lab
            UNION ALL SELECT s_b FROM lab) GROUP BY source),
    intra AS (
        SELECT s_a AS source, COUNT(*) AS e
        FROM lab WHERE s_a = s_b GROUP BY s_a),
    nd AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    per AS (
        SELECT nd.source, nd.n_docs,
               COALESCE(intra.e, 0) AS intra_edges,
               COALESCE(deg.d, 0)   AS degree_sum,
               4 * m.m * COALESCE(intra.e, 0)
                   - COALESCE(deg.d, 0) * COALESCE(deg.d, 0) AS q_num
        FROM nd CROSS JOIN m
        LEFT JOIN intra ON intra.source = nd.source
        LEFT JOIN deg   ON deg.source   = nd.source)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(intra_edges AS BIGINT) AS intra_edges,
           CAST(degree_sum AS BIGINT)  AS degree_sum,
           CAST(q_num AS BIGINT)       AS q_num,
           CAST(CASE WHEN m.m = 0 THEN 0
                     ELSE q_num * 1000000 // (4 * m.m * m.m) END AS BIGINT)
               AS modularity_e6
    FROM per CROSS JOIN m
    UNION ALL
    SELECT 'ALL', CAST(SUM(n_docs) AS BIGINT), CAST(SUM(intra_edges) AS BIGINT),
           CAST(SUM(degree_sum) AS BIGINT), CAST(SUM(q_num) AS BIGINT),
           CAST(CASE WHEN m.m = 0 THEN 0
                     ELSE SUM(q_num) * 1000000 // (4 * m.m * m.m) END AS BIGINT)
    FROM per CROSS JOIN m GROUP BY m.m
    """


@register("qx91_source_modularity", oracle=_modularity_oracle())
def qx91_source_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Newman modularity of the q88 near-dup graph under the
    source partition, per source plus an 'ALL' summary row (whose
    modularity_e6 is the corpus answer). See the module comment for the
    integer factorization; ties to qx34 (which lists cross-source pair
    mass) and qx68 (per-source yield) as the one-number roll-up.

    Plan: the edge list is the session-checkpointed q88
    materialization shared with q98/qx34/qx37/qx54/qx68 — this query
    shuffle-joins it twice onto the 2-column doc→source projection
    (corpus-sized, so never force-broadcast; the tiny edge side is what
    AQE broadcasts at runtime — at 100 TB source labels would ride WITH
    the edge list, built once at pair time) and finishes with
    source-alphabet-sized aggregates. Every number is an exact integer;
    an empty graph (m = 0) short-circuits modularity to 0 on both
    engines instead of dividing by zero."""
    from kafka2delta_spark.functions.dedup import _jaccard_edges

    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("doc_id", "source")
    e = _jaccard_edges(spark, sf_dir)
    lab = (
        e.join(
            src.select(F.col("doc_id").alias("doc_a"),
                       F.col("source").alias("s_a")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"),
                       F.col("source").alias("s_b")),
            "doc_b",
        )
        .localCheckpoint(eager=False)
    )
    m = lab.count()
    deg = (
        lab.select(F.col("s_a").alias("source"))
        .unionByName(lab.select(F.col("s_b").alias("source")))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    intra = (
        lab.filter(F.col("s_a") == F.col("s_b"))
        .groupBy(F.col("s_a").alias("source"))
        .agg(F.count(F.lit(1)).alias("e"))
    )
    nd = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    per = (
        nd.join(F.broadcast(intra), "source", "left")
        .join(F.broadcast(deg), "source", "left")
        .select(
            "source",
            F.col("n_docs").cast("bigint"),
            F.coalesce("e", F.lit(0)).cast("bigint").alias("intra_edges"),
            F.coalesce("d", F.lit(0)).cast("bigint").alias("degree_sum"),
            (
                4 * F.lit(m) * F.coalesce("e", F.lit(0))
                - F.coalesce("d", F.lit(0)) * F.coalesce("d", F.lit(0))
            )
            .cast("bigint")
            .alias("q_num"),
        )
    )
    # m is a driver-side scalar: an empty graph (m = 0) short-circuits
    # modularity to 0 — DuckDB's // raises on a zero divisor while
    # Spark's div yields NULL, so without the guard an empty-graph corpus
    # turns the gate row into an oracle error instead of a comparison
    denom = 4 * m * m
    mod_expr = (
        f"cast(q_num * 1000000 div {denom} as bigint)"
        if m
        else "cast(0 as bigint)"
    )
    mod_sum_expr = (
        f"cast(sum(q_num) * 1000000 div {denom} as bigint)"
        if m
        else "cast(0 as bigint)"
    )
    per = per.withColumn("modularity_e6", F.expr(mod_expr))
    total = per.agg(
        F.lit("ALL").alias("source"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("intra_edges").cast("bigint").alias("intra_edges"),
        F.sum("degree_sum").cast("bigint").alias("degree_sum"),
        F.sum("q_num").cast("bigint").alias("q_num"),
        F.expr(mod_sum_expr).alias("modularity_e6"),
    )
    return per.unionByName(total)
