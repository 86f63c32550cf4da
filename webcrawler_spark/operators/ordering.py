"""Scalable global total-order assignment (the §2.2 crawl-order theorem).

The reference gets global FIFO order for free from a single-threaded queue
(crawler/InMemoryLinkQueue.java:48-52). Distributed, a naive
``row_number() OVER (ORDER BY ...)`` collapses everything into ONE partition —
a non-starter at 10^10 rows. ``global_rank`` instead does the classic
two-phase ranking:

1. range-repartition by the sort key (parallel shuffle),
2. per-partition local row_number (parallel window),
3. tiny driver-side prefix-sum of per-partition counts, broadcast back.

Wall-clock stays O(n/p log n/p) per executor; the driver handles only
``#partitions`` integers. Order is total and deterministic as long as
``sort_cols`` form a unique key (callers guarantee this — e.g. the round's
enqueue events are unique on (parent_rank, link_pos)).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    sort_cols: Sequence[str],
    out_col: str = "rank",
    offset: int = 0,
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Adds ``out_col`` = 0-based dense global position of each row under
    ``ORDER BY sort_cols`` without a single-partition sort."""
    if num_partitions is None:
        num_partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    cols: List[Column] = [F.col(c) for c in sort_cols]
    # RangePartitioner runs a separate sampling job over the input before the
    # shuffle job — without a persist the whole upstream chain (anti-joins,
    # window dedups) evaluates twice per call
    df = df.persist()
    rp = df.repartitionByRange(num_partitions, *cols)
    # Materialize the partitioned layout ONCE: the counts job and the ranking
    # job below must see the *same* physical partitioning, but two separate
    # evaluations of a range shuffle need not agree (AQE re-planning, sampled
    # range boundaries). Without this the prefix offsets can be computed
    # against a layout the final job doesn't have → duplicate/skipped ranks.
    part = rp.withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    df.unpersist()

    counts = part.groupBy("_pid").count().collect()  # ≤ num_partitions rows
    counts_map = {r["_pid"]: r["count"] for r in counts}
    offsets = {}
    acc = offset
    for pid in sorted(counts_map):
        offsets[pid] = acc
        acc += counts_map[pid]

    # branchless map lookup via a literal MAP expression (tiny, broadcast in plan)
    if offsets:
        kv = []
        for pid, off in offsets.items():
            kv.extend([F.lit(pid), F.lit(off)])
        offset_expr = F.element_at(F.create_map(*kv), F.col("_pid"))
    else:
        offset_expr = F.lit(offset)

    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        part.withColumn(out_col, (F.row_number().over(w) - 1 + offset_expr).cast("long"))
        .drop("_pid")
    )


def first_occurrence(
    df: DataFrame,
    key: str,
    order_cols: Sequence[str],
) -> DataFrame:
    """Keep, per ``key``, the row with the minimal (order_cols) tuple —
    distributed first-occurrence dedup (the visited.add / seen.add gate,
    CrawlerService.java:144-146 + InMemoryLinkQueue.java:40-41).

    Map-side partial aggregation applies (min over a struct), so this is a
    single shuffle on ``key`` with combiners — no window, no skew pile-up.
    """
    other_cols = [c for c in df.columns if c != key]
    packed = df.select(
        F.col(key),
        F.struct(*[F.col(c) for c in order_cols],
                 *[F.col(c) for c in other_cols if c not in order_cols]).alias("_o"),
    )
    return (
        packed.groupBy(key)
        .agg(F.min("_o").alias("_o"))
        .select(key, *[F.col(f"_o.{c}").alias(c) for c in other_cols])
    )
