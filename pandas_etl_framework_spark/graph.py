"""Iterative graph algorithms on DataFrames.

PageRank over the customer–supplier purchase graph: the canonical
driver-side-loop iterative pattern (each iteration = one join + one
aggregate; no RDDs, no collect). Ranks are QUANTIZED: held as integers
scaled by 10^12, with every division an integer floor-div — so the
fixed-iteration result is bit-identical across engines and partitionings,
and the DuckDB oracle is simply the 3 iterations unrolled as CTEs.

Damping 0.85 is the rational 17/20: rank' = (3*S)//(20*N) + (17*contrib)//20
with S = 10^12. Overflow headroom: rank_q ≤ 10^12, edge weight ≤ 10^6 →
products ≤ 10^18 < 2^63.

Scale: each iteration shuffles the contribution sums once (groupBy dst);
the loop-invariant relations (out-weighted edges, node set) are
localCheckpointed once so no iteration re-reads or re-shuffles the input,
and each iteration's ranks are lazily checkpointed so lineage (and with it
planning time and the unrolled Exchange/FileScan cascade) stays flat in
the iteration count. At 100 TB pre-partition edges on src so the
per-iteration join reuses the partitioning.

Related llmops operator: connected components (llmops/dedup.py) uses the
same iterate-until-fixpoint join shape for near-dup clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000_000  # 10^12


def pagerank_quantized(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """(node, rank_q) after ``iterations`` damped rounds over ``edges``
    (src, dst, w). All arithmetic integer; deterministic by construction."""
    # Materialize the loop invariants once. The edge relation is often
    # itself a join/aggregate pipeline (purchase_edges is orders x lineitem),
    # and it feeds the node set, the out-weight join, and every iteration —
    # without truncation the unrolled plan re-derives it once per reference
    # (the r01 audit measured Exchange x81 / FileScan x56 for 3 iterations).
    # Checkpointing also keeps the per-iteration plan size constant, so
    # planning cost doesn't grow with iteration depth.
    edges = edges.localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = edges.join(out_w, "src").localCheckpoint(eager=True)
    n_df = nodes.agg(F.count("*").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", F.expr(f"div({PR_SCALE}, n)").alias("rank_q")
    )
    for _ in range(iterations):
        # ranks is one row per node — orders of magnitude smaller than the
        # edge relation. Broadcasting it keeps `e` in place all rounds (no
        # per-iteration shuffle of the big side); same for the sums side of
        # the rank update. For node sets too large to broadcast (~beyond
        # 10^8), swap to e pre-partitioned by src + ranks repartitioned by
        # node: then only the small rank relation moves per round.
        contrib = e.join(F.broadcast(ranks), e.src == ranks.node).select(
            F.col("dst").alias("node"),
            F.expr("div(rank_q * w, out_w)").alias("c"),
        )
        sums = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(F.broadcast(sums), "node", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                (
                    F.expr(f"div(3 * {PR_SCALE}, 20 * n)")
                    + F.expr("div(17 * coalesce(s, 0), 20)")
                ).alias("rank_q"),
            )
            # lazy: materializes with the next iteration's first action, so
            # lineage never accumulates across rounds
            .localCheckpoint(eager=False)
        )
    return ranks


def purchase_edges(spark, sf_dir: str) -> DataFrame:
    """Symmetric bipartite edges c<->s weighted by lineitem count.

    Node ids are packed longs (customer 2k, supplier 2k+1) so the edge
    aggregation and every downstream shuffle move 8-byte keys; the display
    form ('c123' / 's45') is decoded only at the top-50 output."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .agg(F.count("*").alias("w"))
    )
    return pairs.selectExpr("c AS src", "s AS dst", "w").unionByName(
        pairs.selectExpr("s AS src", "c AS dst", "w")
    )


def decode_node(col: F.Column) -> F.Column:
    """Packed long -> display id ('c<custkey>' / 's<suppkey>')."""
    return F.when(
        col % 2 == 0, F.concat(F.lit("c"), (col / 2).cast("long").cast("string"))
    ).otherwise(
        F.concat(F.lit("s"), ((col - 1) / 2).cast("long").cast("string"))
    )


def q_graph_pagerank(spark, sf_dir):
    """Top-50 nodes of the purchase graph by 3-iteration PageRank. The
    decode + display-order sort happen on the 50-row result, after the
    integer-keyed iterations."""
    ranks = pagerank_quantized(purchase_edges(spark, sf_dir), iterations=3)
    return (
        ranks.select(
            decode_node(F.col("node")).alias("node"),
            (F.col("rank_q").cast("double") / PR_SCALE).alias("rank"),
        )
        .orderBy(F.col("rank").desc(), "node")
        .limit(50)
    )


def _sql_pagerank(iterations: int = 3) -> str:
    head = f"""
WITH pairs AS (
    SELECT 'c' || CAST(o_custkey AS VARCHAR) AS c,
           's' || CAST(l_suppkey AS VARCHAR) AS s,
           COUNT(*) AS w
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1, 2
),
edges AS (
    SELECT c AS src, s AS dst, w FROM pairs
    UNION ALL
    SELECT s AS src, c AS dst, w FROM pairs
),
nodes AS (
    SELECT DISTINCT src AS node FROM edges
    UNION
    SELECT DISTINCT dst AS node FROM edges
),
outw AS (SELECT src, SUM(w) AS out_w FROM edges GROUP BY src),
e AS (SELECT edges.src, edges.dst, edges.w, outw.out_w
      FROM edges JOIN outw ON edges.src = outw.src),
nn AS (SELECT COUNT(*) AS n FROM nodes),
r0 AS (SELECT node, {PR_SCALE} // n AS rank_q FROM nodes CROSS JOIN nn)"""
    steps = []
    for k in range(1, iterations + 1):
        steps.append(f""",
c{k} AS (
    SELECT dst AS node, SUM((rank_q * w) // out_w) AS s
    FROM e JOIN r{k - 1} ON e.src = r{k - 1}.node
    GROUP BY dst
),
r{k} AS (
    SELECT nodes.node,
           (3 * {PR_SCALE}) // (20 * nn.n)
           + (17 * COALESCE(c{k}.s, 0)) // 20 AS rank_q
    FROM nodes CROSS JOIN nn
    LEFT JOIN c{k} ON nodes.node = c{k}.node
)""")
    tail = f"""
SELECT node, CAST(rank_q AS DOUBLE) / {PR_SCALE} AS rank
FROM r{iterations}
ORDER BY rank DESC, node LIMIT 50
"""
    return head + "".join(steps) + tail


SQL_GRAPH_PAGERANK = _sql_pagerank(3)


QUERIES = {
    "graph_pagerank": (q_graph_pagerank, SQL_GRAPH_PAGERANK),
}


def register_all() -> None:
    from . import harness

    for name, (fn, sql) in QUERIES.items():
        harness.register(name, fn, sql)
