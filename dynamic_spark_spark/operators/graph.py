"""Graph analytics over relational data: edge-list construction, degree
statistics, triangle counting, and PageRank — the graph workloads a
data-platform user runs without leaving the engine (entity linking, influence
ranking, dedup-cluster analysis).

The fixture graph is the nation-to-nation trade network: an edge (src, dst)
exists when a customer nation buys from a supplier nation, weighted by
revenue. Built once as a DataFrame (``_trade_edges``), it feeds three query
keys. The construction itself is the heavy part at scale — a
lineitem⋈orders⋈customer⋈supplier star join whose dims are broadcast — and
the graph algorithms then run on the aggregated edge table, which is orders
of magnitude smaller than the fact table (25×25 here; ~domain² generally).

PageRank follows the same iterative discipline as ``llmops/dedup.py``'s
connected components: localCheckpoint per round to truncate lineage (plan
size would otherwise double each iteration), driver reads nothing but the
loop counter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamic_spark_spark.registry import query
from dynamic_spark_spark.sources.readers import load_table

_EDGES_SQL = """
SELECT cn.n_name AS src, sn.n_name AS dst,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2)
            AS DOUBLE) AS weight,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
GROUP BY cn.n_name, sn.n_name
"""


#: (applicationId, sf_dir) -> checkpointed edge table. Six graph keys share
#: the same relational→graph construction; the edge table is domain²-bounded
#: (25×25 here) so pinning the materialized result is model-sized, and the
#: fact-table star join runs once per session instead of once per key.
#: Keyed on the Spark applicationId (unique per context, never reused the way
#: a GC'd session object's ``id()`` can be) and pruned on every insert so a
#: stopped context's checkpoints are dropped instead of accumulating.
_EDGES_CACHE: dict[tuple[str, str], DataFrame] = {}


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted nation→nation trade edges. Dims (customer/supplier/nation)
    broadcast against the lineitem fact; one fact-sized shuffle for the
    group-by, emitting a domain²-bounded edge table. Memoized per session —
    callers get the checkpointed result."""
    app_id = spark.sparkContext.applicationId
    ck = (app_id, sf_dir)
    cached = _EDGES_CACHE.get(ck)
    if cached is not None:
        return cached
    for stale in [k for k in _EDGES_CACHE if k[0] != app_id]:
        del _EDGES_CACHE[stale]
    edges = _build_trade_edges(spark, sf_dir).localCheckpoint()
    _EDGES_CACHE[ck] = edges
    return edges


def _build_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The uncached star-join plan (plan-hygiene tests audit THIS — the
    memoized entry point returns a checkpoint scan once warm)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("src")
    )
    sn = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("dst")
    )
    edges = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy("src", "dst")
        .agg(
            # Exact decimal accumulation: double sums are order-dependent and
            # Spark's partial aggregation vs DuckDB's single pass can land on
            # opposite sides of a .005 rounding boundary. Decimal sums are
            # associative/exact, so ROUND then is deterministic on both
            # engines; cast back to double for a stable compared dtype.
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,4)")
                    * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
                ),
                2,
            )
            .cast("double")
            .alias("weight"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    return edges


@query("graph_trade_edges", _EDGES_SQL, tag="graph")
def graph_trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-list construction: the star join + aggregate described in
    :func:`_trade_edges`, exposed as its own key so the expensive relational
    → graph step is oracle-checked independently of the algorithms."""
    return _trade_edges(spark, sf_dir)


_DEGREE_SQL = f"""
WITH edges AS ({_EDGES_SQL})
SELECT n_name AS node,
       CAST(COALESCE(o.out_deg, 0) AS INT) AS out_deg,
       CAST(COALESCE(i.in_deg, 0) AS INT) AS in_deg,
       CAST(ROUND(COALESCE(o.out_w, 0), 2) AS DOUBLE) AS out_weight,
       CAST(ROUND(COALESCE(i.in_w, 0), 2) AS DOUBLE) AS in_weight
FROM nation
LEFT JOIN (SELECT src, COUNT(*) AS out_deg,
                  SUM(CAST(weight AS DECIMAL(18,2))) AS out_w
           FROM edges GROUP BY src) o ON n_name = o.src
LEFT JOIN (SELECT dst, COUNT(*) AS in_deg,
                  SUM(CAST(weight AS DECIMAL(18,2))) AS in_w
           FROM edges GROUP BY dst) i ON n_name = i.dst
"""


@query("graph_degree_stats", _DEGREE_SQL, tag="graph")
def graph_degree_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node degree/strength table (out/in degree and summed edge
    weight), left-joined onto the node dimension so isolated nodes appear
    with zeros. Runs entirely on the aggregated edge table."""
    edges = _trade_edges(spark, sf_dir)
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("node")
    )
    # Strength sums accumulate in decimal (weights are exact 2-dp values) so
    # Spark's shuffle-order-dependent double addition can't drift across a
    # rounding boundary relative to the oracle.
    out_d = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("int").alias("out_deg"),
        F.sum(F.col("weight").cast("decimal(18,2)")).alias("out_w"),
    )
    in_d = edges.groupBy("dst").agg(
        F.count(F.lit(1)).cast("int").alias("in_deg"),
        F.sum(F.col("weight").cast("decimal(18,2)")).alias("in_w"),
    )
    return (
        nodes.join(out_d, nodes.node == out_d.src, "left")
        .join(in_d, nodes.node == in_d.dst, "left")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.round(F.coalesce("out_w", F.lit(0.0)), 2).cast("double").alias("out_weight"),
            F.round(F.coalesce("in_w", F.lit(0.0)), 2).cast("double").alias("in_weight"),
        )
    )


#: minimum edge revenue for the undirected triangle graph (prunes the
#: near-complete trade graph into something with structure)
TRIANGLE_MIN_WEIGHT = 500_000.0

_TRIANGLE_SQL = f"""
WITH edges AS ({_EDGES_SQL}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM edges WHERE weight >= {TRIANGLE_MIN_WEIGHT} AND src <> dst
)
SELECT e1.a AS x, e1.b AS y, e2.b AS z
FROM und e1 JOIN und e2 ON e1.b = e2.a
JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
"""


@query("graph_triangle_count", _TRIANGLE_SQL, tag="graph")
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration on the thresholded undirected trade graph via
    the oriented-edge algorithm: every undirected edge is stored once as
    (min, max), so each triangle x<y<z is found exactly once by joining
    x→y with y→z and closing x→z.

    Scale shape: orientation is THE standard trick that makes distributed
    triangle counting tractable — each wedge is generated once (not six
    times), and the wedge join's fan-out is bounded by out-degree under the
    total order, which degree-ordered orientation keeps near-uniform even
    on skewed graphs. Both joins are equi-joins on edge endpoints."""
    edges = _trade_edges(spark, sf_dir).where(
        (F.col("weight") >= TRIANGLE_MIN_WEIGHT) & (F.col("src") != F.col("dst"))
    )
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    return (
        e1.join(e2, F.col("y") == F.col("y2"))
        .join(e3, (F.col("x") == F.col("x3")) & (F.col("z") == F.col("z3")))
        .select("x", "y", "z")
    )


#: 6 as of r8 (was 8 in r3-r7, 15 in r1-r2): each synchronous round is one
#: join+agg job, so rounds ARE the key's verify cost; the mass-conservation
#: and determinism pins are iteration-count-invariant and the ledger in
#: scripts/coverage_report.py records the change.
PAGERANK_ITERS = 6
PAGERANK_DAMPING = 0.85


@query("graph_pagerank", tag="graph")  # rows-only: iterative fixpoint
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank on the trade graph: ``PAGERANK_ITERS`` synchronous
    iterations, damping 0.85, contributions proportional to edge weight. Output is
    (node, rank_fp) with fixed-point micro-unit ranks for deterministic
    comparison. Rows-only: an iterative fixpoint has no single-statement SQL
    oracle (pytest pins mass conservation + convergence instead).

    Scale shape: per round one join (ranks ⋈ edges on src) + one groupBy
    (dst) — both shuffle on node id; out-strength is precomputed once;
    ``localCheckpoint`` truncates lineage per round (see module docstring);
    the driver loop is a fixed counter, reading no data. Dangling-node mass
    (no out-edges) is redistributed uniformly each round through a broadcast
    one-row aggregate INSIDE the plan — no per-iteration driver collect, so
    each round is exactly one job — keeping total rank mass at |V|, the
    standard correction."""
    from dynamic_spark_spark.session import scoped_conf

    edges = _trade_edges(spark, sf_dir).select("src", "dst", "weight")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("out_w"))
    # contribution fraction per edge: weight / out-strength of src
    frac = edges.join(out_w, "src").select(
        "src", "dst", (F.col("weight") / F.col("out_w")).alias("frac")
    ).localCheckpoint()
    d = PAGERANK_DAMPING
    ranks = nodes.select("node", F.lit(1.0).alias("rank"))
    # The working set is the domain²-bounded edge table — shuffle width is
    # pure scheduler overhead per round, so size it to the graph. A billion-
    # node deployment sizes this to |E|/partition-budget instead.
    with scoped_conf(spark, spark_sql_shuffle_partitions="8"):
        for _ in range(PAGERANK_ITERS):
            contrib = (
                frac.join(ranks, frac.src == ranks.node)
                .groupBy("dst")
                .agg(F.sum(F.col("rank") * F.col("frac")).alias("recv"))
            )
            # mass parked on dangling nodes — one-row aggregate, broadcast
            dangling = ranks.join(
                out_w, ranks.node == out_w.src, "left_anti"
            ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass"))
            ranks = (
                nodes.join(contrib, nodes.node == contrib.dst, "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    (
                        F.lit(1.0 - d)
                        + F.lit(d) * F.col("dangling_mass") / F.lit(float(n_nodes))
                        + F.lit(d) * F.coalesce("recv", F.lit(0.0))
                    ).alias("rank"),
                )
                .localCheckpoint()
            )
    return ranks.select(
        "node", F.floor(F.col("rank") * 1_000_000 + 0.5).cast("long").alias("rank_fp")
    ).orderBy("node")


#: BFS geometry: per-node out-degree cap (scale-free sparsifier), source,
#: and a hop ceiling bounding both the Spark loop and the oracle recursion
BFS_TOP_OUT = 3
BFS_SOURCE = "NATION_2"
BFS_MAX_HOPS = 6

_BFS_SPARSE = f"""SELECT src, dst FROM (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY n_lines DESC, dst) AS rk
  FROM ({_EDGES_SQL}) WHERE src <> dst) WHERE rk <= {BFS_TOP_OUT}"""

_BFS_ORACLE = f"""
WITH RECURSIVE e AS ({_BFS_SPARSE}),
walk AS (
  SELECT '{BFS_SOURCE}' AS node, 0 AS hops
  UNION ALL
  SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.hops < {BFS_MAX_HOPS})
SELECT node, CAST(MIN(hops) AS INT) AS hops FROM walk GROUP BY node
"""


@query("graph_bfs_hops", _BFS_ORACLE, tag="graph")
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS shortest-hop counts over the sparsified trade
    graph (each node keeps its top-{BFS_TOP_OUT} outgoing edges by volume —
    a SCALE-FREE sparsifier, unlike a fixed weight threshold whose meaning
    changes with the data volume). Frontier-expansion BFS: each round joins
    the current frontier to the edge table, anti-joins already-visited
    nodes, and ``localCheckpoint``s the visited set to truncate lineage —
    the same iterative discipline as PageRank and the dedup connected
    components; the driver reads only the per-round frontier SIZE.

    The oracle replays it as a recursive CTE with the same hop ceiling
    (path enumeration bounded by out-degree^hops on the sparsified graph;
    MIN(hops) collapses cycles). At 100 TB scale the edge table is still
    domain²-bounded, so every BFS round is a small-table join."""
    from dynamic_spark_spark.session import scoped_conf

    edges = _trade_edges(spark, sf_dir).where(F.col("src") != F.col("dst"))
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(F.col("n_lines").desc(), "dst")
    e = (
        edges.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= BFS_TOP_OUT)
        .select("src", "dst")
        .persist()
    )
    # JVM-literal seed: createDataFrame over a Python list builds a
    # pickled-row RDD sliced defaultParallelism ways, and every scan of it
    # (three in the first round) spawned a full width of Python workers
    # just to unpickle one row — measured as 32-task stages of ~0.3-2.5 s
    # pure wait. A SQL literal is a driver-local Project, no Python at all.
    dist = spark.sql(
        f"SELECT '{BFS_SOURCE}' AS node, CAST(0 AS INT) AS hops"
    )
    frontier = dist
    # domain²-bounded frontier: size the per-hop shuffle to the graph
    with scoped_conf(spark, spark_sql_shuffle_partitions="8"):
        for k in range(1, BFS_MAX_HOPS + 1):
            # materialize the frontier ONCE per round: it feeds the emptiness
            # probe, the visited-set union, and the next round's join — left
            # lazy, the same join+distinct+anti-join plan would execute three
            # times per hop
            nxt = (
                frontier.join(e, frontier["node"] == e["src"])
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(dist, "node", "left_anti")
                .select("node", F.lit(k).cast("int").alias("hops"))
                .localCheckpoint()
            )
            if not nxt.take(1):
                break
            # NO checkpoint on the union: dist is a UnionByName over the seed
            # literal and per-hop frames that are each ALREADY checkpointed,
            # so its lineage is flat by construction (≤ BFS_MAX_HOPS scans) —
            # re-materializing it per hop only paid one extra job per round
            dist = dist.unionByName(nxt)
            frontier = nxt
    return dist
