"""Per-host politeness admission + explicit hot-host salting.

The reference *designs* politeness (maxConcurrentPerDomain: 2, globalQps: 5,
politenessDelayMs: 2000 — README.md:55-57) but never implements it; the
north_rule requires it. In batch-round form, politeness per round becomes a
**per-host admission budget**: of a host's pending frontier rows, admit the
first ``budget`` under the frontier ordering key (priority, warc_ts, rank);
the rest carry over to the next round unchanged.

    admitted = row_number() OVER (PARTITION BY host_hash
                                  ORDER BY priority, warc_ts, rank) <= budget

Skew: one giant host would serialize its window into one task. ``salted_admit``
splits hosts whose pending count exceeds ``salt_threshold`` into ``n_salts``
salt subpartitions (deterministic salt = rank % n_salts) and divides the
budget across salts (ceil split, preserving the budget *sum* — SURVEY §7 risk
#4). Ordering inside a salt is still (priority, warc_ts, rank); the global
per-host order contract weakens to per-salt order only for hot hosts, which is
exactly the documented trade the north_star makes ("explicit salting to tame
hot-host skew").
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_ORDER = ("priority", "warc_ts", "rank")


def admit(
    frontier: DataFrame,
    per_host_budget: Optional[int],
    order_cols: Sequence[str] = DEFAULT_ORDER,
    host_col: str = "host_hash",
) -> Tuple[DataFrame, DataFrame]:
    """Returns (admitted, deferred). ``per_host_budget=None`` admits all."""
    if per_host_budget is None:
        return frontier, frontier.limit(0)
    cols = [c for c in order_cols if c in frontier.columns]
    w = Window.partitionBy(host_col).orderBy(*[F.col(c) for c in cols])
    ranked = frontier.withColumn("_adm", F.row_number().over(w))
    admitted = ranked.filter(F.col("_adm") <= per_host_budget).drop("_adm")
    deferred = ranked.filter(F.col("_adm") > per_host_budget).drop("_adm")
    return admitted, deferred


def salted_admit(
    frontier: DataFrame,
    per_host_budget: Optional[int],
    order_cols: Sequence[str] = DEFAULT_ORDER,
    host_col: str = "host_hash",
    salt_threshold: int = 100_000,
    n_salts: int = 16,
) -> Tuple[DataFrame, DataFrame]:
    """Skew-aware admission. Hosts with pending count > salt_threshold get
    split across n_salts subpartitions; per-salt budget = ceil(budget/n_salts)
    (sum across salts >= budget, per-salt order preserved)."""
    if per_host_budget is None:
        return frontier, frontier.limit(0)
    cols = [c for c in order_cols if c in frontier.columns]

    counts = frontier.groupBy(host_col).count()
    hot = counts.filter(F.col("count") > salt_threshold).select(host_col)
    tagged = frontier.join(F.broadcast(hot.withColumn("_hot", F.lit(1))), host_col, "left")

    salt_expr = F.when(
        F.col("_hot").isNotNull(),
        (F.coalesce(F.col("rank"), F.xxhash64(F.col("url"))) % n_salts).cast("int"),
    ).otherwise(F.lit(0))
    salted = tagged.withColumn("_salt", F.abs(salt_expr))

    per_salt_budget = F.when(
        F.col("_hot").isNotNull(), F.lit(-(-per_host_budget // n_salts))
    ).otherwise(F.lit(per_host_budget))

    w = Window.partitionBy(host_col, "_salt").orderBy(*[F.col(c) for c in cols])
    ranked = salted.withColumn("_adm", F.row_number().over(w)).withColumn(
        "_budget", per_salt_budget
    )
    admitted = ranked.filter(F.col("_adm") <= F.col("_budget"))
    deferred = ranked.filter(F.col("_adm") > F.col("_budget"))
    drop = ["_adm", "_budget", "_hot", "_salt"]
    return admitted.drop(*drop), deferred.drop(*drop)


def apply_robots(
    frontier: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> Tuple[DataFrame, DataFrame]:
    """Split frontier into (allowed, skipped_robots) by the per-host disallow
    prefix list (reference README.md:145-147 design; CrawlStatus.SKIPPED_ROBOTS
    model/CrawlStatus.java:10-11). Robots is small (one row per host) and
    broadcast; prefix match on URL path."""
    path = F.parse_url(F.col(url_col), F.lit("PATH"))
    r = robots.select(
        F.col("host").alias("_rhost"), F.col("disallow").alias("_disallow")
    )
    joined = frontier.withColumn("_host", F.parse_url(F.col(url_col), F.lit("HOST"))).join(
        F.broadcast(r), F.col("_host") == F.col("_rhost"), "left"
    )
    blocked = F.exists(
        F.coalesce(F.col("_disallow"), F.array()),
        lambda p: path.startswith(p),
    )
    allowed = joined.filter(~blocked).drop("_host", "_rhost", "_disallow")
    skipped = joined.filter(blocked).drop("_host", "_rhost", "_disallow")
    return allowed, skipped
