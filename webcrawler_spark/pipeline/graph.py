"""Link-graph analytics: PageRank for frontier prioritization.

The reference README declares "deduplication and prioritization" for its
frontier (/root/reference/README.md:20) and carries a priority field in the
frontier key (BASELINE.json); host-level PageRank over the harvested link
graph is the standard way a production crawler derives that priority
(OPIC/PageRank-ordered frontiers). No reference implementation exists — this
is the Spark-native realization.

Scale shape: each power iteration is one equi-join of edges against the
current rank vector on ``src`` plus one groupBy on ``dst`` — two shuffles,
both keyed by node id, so co-partitioning is reused between them; the rank
vector is node-cardinality (tiny next to the edge list) and is pinned per
iteration with localCheckpoint to stop plan growth. Dangling mass (nodes
with no out-links — at web scale, most leaf pages) is one scalar aggregate
per iteration, redistributed uniformly. Fixed iteration count keeps the
whole computation deterministic and SQL-expressible (the DuckDB oracle
unrolls the same iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """(node, pr) after ``n_iters`` power iterations with uniform start
    1/N, damping ``d``: pr' = (1-d)/N + d·(Σ_in pr/outdeg + dangling/N).

    ``edges``: directed pair list; self-loops and duplicate edges are
    removed (a crawler's harvested link multiset becomes a simple graph).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))

    pr = nodes.withColumn("pr", F.lit(1.0 / n))
    for _ in range(n_iters):
        with_deg = pr.join(deg, pr["node"] == deg["src"], "left").select(
            "node", "pr", "outdeg"
        )
        # dangling mass stays in-plan: a 1-row aggregate broadcast into the
        # update expression (no driver collect per iteration)
        dang = (
            with_deg.filter(F.col("outdeg").isNull())
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dang"))
        )
        contrib = (
            e.join(with_deg.filter(F.col("outdeg").isNotNull()),
                   e["src"] == F.col("node"))
            .select(F.col("dst").alias("node"), (F.col("pr") / F.col("outdeg")).alias("w"))
            .groupBy("node")
            .agg(F.sum("w").alias("contrib"))
        )
        pr = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("_dang") / F.lit(float(n))
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return pr
