"""Graph-analytic operators over relationship graphs DERIVED from the
relational tables (the reference has none — SURVEY §2.12 extensions):
PageRank centrality over the part co-purchase network.

Connected components (the other canonical iterative graph op) lives
with its consumers in dedup_text.py (min-label propagation + the
alternating-star variant); this module holds the eigenvector-style
iterations.

Scale notes: the edge list shuffles on the join key when built, then
every power iteration is one (broadcast rank) join + one dst-keyed
aggregate over the EDGE table — the rank vector is |V| rows (tiny next
to |E|) and ships as a broadcast, so iterations never reshuffle the
graph. Per-iteration rank quantization (round 9dp) makes the float
fixpoint hash-identical across engines and partitionings — drift from
summation order (~1e-18) is healed every round, the same discipline
the CC checksum fixpoints use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from claim_analysis_engine_spark.registry import OpRegistry
from claim_analysis_engine_spark.tables import load

REG = OpRegistry()

PR_MIN_COOCCUR = 2   # co-purchase count that makes an edge
PR_DAMPING = 0.85
PR_ITERS = 10
PR_QUANT = 9         # per-iteration rank quantization (decimal places)


@REG.op(
    "graph_pagerank",
    oracle=f"""
    WITH RECURSIVE
    items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pair AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= {PR_MIN_COOCCUR}
    ),
    edges AS (
        SELECT pa AS src, pb AS dst FROM pair
        UNION ALL SELECT pb, pa FROM pair
    ),
    deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
    nn AS (SELECT count(*) AS n FROM deg),
    pr(iter, node, r) AS (
        SELECT 0, node, 1.0 / (SELECT n FROM nn) FROM deg
        UNION ALL
        SELECT pr.iter + 1, e.dst,
               round((1 - {PR_DAMPING}) / (SELECT n FROM nn)
                     + {PR_DAMPING} * sum(pr.r / d.deg), {PR_QUANT})
        FROM pr
        JOIN edges e ON e.src = pr.node
        JOIN deg d ON d.node = pr.node
        WHERE pr.iter < {PR_ITERS}
        GROUP BY pr.iter + 1, e.dst
    )
    SELECT p.node AS l_partkey, CAST(d.deg AS BIGINT) AS degree,
           round(p.r, 6) AS pagerank
    FROM pr p JOIN deg d ON d.node = p.node
    WHERE p.iter = {PR_ITERS}
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality of the part co-purchase network: parts are
    nodes, an edge links parts bought together in ≥ {PR_MIN_COOCCUR}
    orders (the agg_basket_pairs graph); {PR_ITERS} damped power
    iterations rank the parts a recommender should anchor on — the
    eigenvector upgrade of raw degree (a part tied to other WELL-TIED
    parts outranks one with the same degree on the periphery).

    The undirected-symmetric construction means every node has both
    out- and in-edges, so no dangling-mass term is needed and the
    rank total is conserved up to quantization. Fixed iteration count
    + per-round quantization (round {PR_QUANT}dp, see module note)
    make the result a deterministic value the DuckDB recursive-CTE
    oracle reproduces bit-for-bit — an ORACLE-CHECKED iterative graph
    algorithm, like dedup_cluster_cc.

    Scale: the rank vector (|V|) broadcasts into the edge join each
    round; only the dst-keyed partial-sum aggregate shuffles, and it
    map-side combines. |V| beyond broadcast size → swap the broadcast
    for a co-partitioned (src ↔ node) join, same loop."""
    items = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    b = items.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb"))
    pair = (
        a.join(b, "k")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= PR_MIN_COOCCUR)
    )
    edges = (
        pair.select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .union(pair.select(F.col("pb").alias("src"), F.col("pa").alias("dst")))
    )
    # tiny iterative frames: low partition count (the CC lesson), cache
    # the loop-invariant edge+degree table once
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = edges.join(deg, "src").repartition(8, "dst").cache()
    n_nodes = deg.count()  # |V|: model-state scalar, like the IVF centroids
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(1.0 / n_nodes).alias("r")
    )
    base = (1.0 - PR_DAMPING) / n_nodes
    for _ in range(PR_ITERS):
        contrib = (
            ed.join(F.broadcast(ranks), ed.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("deg")).alias("c"))
        )
        ranks = contrib.select(
            F.col("dst").alias("node"),
            F.round(F.lit(base) + PR_DAMPING * F.col("c"), PR_QUANT).alias("r"),
        )
    return (
        ranks.join(
            F.broadcast(deg.select(F.col("src").alias("node"), "deg")), "node"
        )
        .select(
            F.col("node").alias("l_partkey"),
            F.col("deg").alias("degree"),
            F.round("r", 6).alias("pagerank"),
        )
    )
