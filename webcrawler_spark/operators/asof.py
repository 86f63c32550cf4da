"""Time-series joins Spark lacks as built-ins: as-of join and range join.

A crawl corpus is a time series twice over — every fetch has a timestamp,
and the per-host state it depends on (robots.txt snapshot, crawl-delay
config, circuit-breaker state) is a slowly-changing dimension. Joining
"each fetch to the newest state row at fetch time" is an AS-OF join;
joining "events to the bounded windows containing them" (maintenance
windows, recrawl intervals, session spans) is a RANGE join. Neither exists
in the DataFrame API (SPARK-22947 open since 2017); a naive theta join
(`l.ts >= r.ts`) compiles to BroadcastNestedLoopJoin or a cartesian — dead
at corpus scale. These implement both with shuffle-bounded plans.

Reference tie-in: the reference caches robots decisions per host at fetch
time (`README.md:145-147` designed semantics); replaying a crawl log against
versioned robots snapshots is exactly ``asof_join(fetches, robots_versions,
on=['host'])``.

Scale shapes:
- ``asof_join``: ONE shuffle — union both sides tagged, one window over
  (key) ordered by (ts, side) carrying the last-seen right payload forward
  (the sort-merge formulation every native engine uses). Cost = sort of
  |L|+|R| within key partitions; no per-key loop, no repeated scans. Skewed
  keys concentrate in a partition like any key-partitioned sort — for a
  single pathological key, pre-split by time range and stitch (not needed
  for host-keyed crawl state, where |R per host| is tiny).
- ``range_join``: intervals are exploded into fixed-width time buckets and
  equi-joined on (key, bucket) before the exact containment filter — the
  standard bucketized range join (what Databricks' range-join hints do under
  the hood). Join fan-out is bounded by interval_length/bucket_width per
  interval; each (event, interval) match lands in exactly ONE bucket (the
  event's own), so no post-join dedup is needed.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _micros(c: Column) -> Column:
    """Epoch micros of a timestamp column; tolerates TIMESTAMP_NTZ inputs
    (testdata parquet reads as NTZ) via a cast — both join sides shift by
    the same session-timezone offset, so bucket alignment and staleness
    deltas are unaffected."""
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Optional[Sequence[str]] = None,
    suffix: str = "_asof",
    tolerance_s: Optional[float] = None,
) -> DataFrame:
    """Backward as-of left join: every left row is paired with the LATEST
    right row of the same key whose ``right_ts`` <= ``left_ts`` (DuckDB
    `ASOF LEFT JOIN` / pandas `merge_asof` semantics); left rows with no
    earlier right row keep nulls.

    ``right_cols`` picks the right payload (default: everything except the
    key and timestamp); each arrives as ``<name><suffix>`` when the name
    collides with a left column, bare otherwise, plus ``<right_ts><suffix>``
    for the matched timestamp. ``tolerance_s`` nulls the match when it is
    staler than the given seconds (pandas ``tolerance``).

    Plan: tag both sides, union (missing columns null-filled), ONE window
    over the key ordered by (ts, side) — right rows sort before left rows at
    equal ts, so "<=" is exact — carrying the last non-null right payload
    forward, then keep the left rows. One shuffle on the key, one sort.
    """
    key = list(on)
    rp = [c for c in (right_cols or right.columns) if c not in key and c != right_ts]
    out_names = {c: (c + suffix if c in left.columns else c) for c in rp}
    matched_ts = right_ts + suffix

    lt = (
        left.withColumn("_ats", F.col(left_ts))
        .withColumn("_side", F.lit(1))
    )
    # Null-ts right rows would sort nulls-first in the window and be carried
    # forward as spurious matches; DuckDB ASOF JOIN / pandas merge_asof never
    # match them (ADVICE r3), so drop them before the union.
    rt = right.filter(F.col(right_ts).isNotNull()).select(
        *key,
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(right_ts).alias(matched_ts),
            *[F.col(c).alias(out_names[c]) for c in rp],
        ).alias("_rp"),
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key)
        .orderBy("_ats", "_side", "_rp")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.withColumn("_m", F.last("_rp", ignorenulls=True).over(w))
    res = carried.filter(F.col("_side") == 1)
    if tolerance_s is not None:
        fresh = (
            _micros(F.col("_ats")) - _micros(F.col(f"_m.{matched_ts}"))
        ) <= F.lit(int(tolerance_s * 1_000_000))
        res = res.withColumn("_m", F.when(fresh, F.col("_m")))
    return res.select(
        *left.columns,
        F.col(f"_m.{matched_ts}").alias(matched_ts),
        *[F.col(f"_m.{out_names[c]}").alias(out_names[c]) for c in rp],
    )


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_s: int = 3600,
) -> DataFrame:
    """Inner range join: (event, interval) pairs of the same key with
    ``start <= ts <= end`` — without the cartesian/BNLJ plan a raw theta
    join produces.

    Bucketize: an interval covers ``floor(start/w) .. floor(end/w)`` buckets
    (w = ``bucket_s`` seconds); an event lives in exactly one bucket. The
    equi-join on (key, bucket) bounds candidate pairs to same-bucket ones;
    the exact BETWEEN filter runs after. Every true match shares exactly one
    bucket (the event's), so no duplicates and no dedup pass. Pick
    ``bucket_s`` near the typical interval length: fan-out per interval is
    ceil(len/w)+1 rows, candidate precision falls as w grows.
    """
    key = list(on)
    ev = events.withColumn(
        "_b", F.floor(_micros(F.col(ts_col)) / (bucket_s * 1_000_000))
    )
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(_micros(F.col(start_col)) / (bucket_s * 1_000_000)),
                F.floor(_micros(F.col(end_col)) / (bucket_s * 1_000_000)),
            )
        ),
    )
    return (
        ev.join(iv, key + ["_b"])
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_b")
    )
