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


def _min_cap(*caps: Optional[int]) -> Optional[int]:
    """min over the non-None caps; None when every cap is None (= admit all)."""
    vals = [c for c in caps if c is not None]
    return min(vals) if vals else None


def admit(
    frontier: DataFrame,
    per_host_budget: Optional[int],
    order_cols: Sequence[str] = DEFAULT_ORDER,
    host_col: str = "host_hash",
    max_concurrent: Optional[int] = None,
) -> Tuple[DataFrame, DataFrame]:
    """Returns (admitted, deferred). ``per_host_budget=None`` admits all.

    ``max_concurrent`` is the maxConcurrentPerDomain cap (README.md:55-57):
    in the batch-round model a fetch occupies its slot for the whole round
    window, so at most ``max_concurrent`` URLs per host may be in flight per
    round — an additional per-host admission cap, min'd with the budget."""
    cap = _min_cap(per_host_budget, max_concurrent)
    if cap is None:
        return frontier, frontier.limit(0)
    cols = [c for c in order_cols if c in frontier.columns]
    w = Window.partitionBy(host_col).orderBy(*[F.col(c) for c in cols])
    ranked = frontier.withColumn("_adm", F.row_number().over(w))
    admitted = ranked.filter(F.col("_adm") <= cap).drop("_adm")
    deferred = ranked.filter(F.col("_adm") > cap).drop("_adm")
    return admitted, deferred


def global_cap_admit(
    admitted: DataFrame,
    deferred: DataFrame,
    global_cap: Optional[int],
    order_cols: Sequence[str] = ("grank",),
    key: str = "url",
) -> Tuple[DataFrame, DataFrame]:
    """Apply the round's GLOBAL admission budget (globalQps × window — README
    .md:55-57) on top of per-host admission: keep the first ``global_cap``
    admitted rows in global discovery order, defer the overflow.

    Because per-host admission picks each host's first-k by the same order,
    a global-order cut keeps a PREFIX of every host's admitted list — the
    per-host politeness ordering contract survives. The cut itself is a
    TakeOrderedAndProject (per-partition top-G then merge): global_cap is
    small by construction (qps × seconds), so no global sort materializes."""
    if global_cap is None:
        return admitted, deferred
    cols = [F.col(c) for c in order_cols if c in admitted.columns]
    take = admitted.orderBy(*cols).limit(global_cap)
    overflow = admitted.join(take.select(key), key, "left_anti")
    return take, deferred.unionByName(overflow)


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


def timed_admit(
    frontier: DataFrame,
    per_host_budget: Optional[int],
    delays: DataFrame,
    host_state: DataFrame,
    window_ms: int,
    rnd: int,
    order_cols: Sequence[str] = ("grank",),
    host_col: str = "host",
    max_concurrent: Optional[int] = None,
    global_cap: Optional[int] = None,
) -> Tuple[DataFrame, DataFrame, DataFrame]:
    r"""Per-host admission with REAL inter-round politeness timing
    (README.md:55-57: politenessDelayMs 2000 ≈ 5 fetches per 10 s window).

    Deterministic virtual-time model: round ``rnd`` spans
    [rnd·W, (rnd+1)·W) ms. Each host carries ``next_allowed_ts`` between
    rounds (the frontier-table politeness window of the north_star). A host
    with crawl delay d serving from t0 = max(next_allowed_ts, rnd·W) may admit

        k = min(budget, ceil(((rnd+1)·W − t0) / d))       (d > 0)
        k = budget                                         (d ≤ 0 / no delay)

    URLs this round — every fetch STARTING before the round's end counts, so
    k = #\{i ≥ 0 : t0 + i·d < (rnd+1)·W\} — and its clock advances to
    t0 + served·d. A delay longer than the window admits one URL roughly
    every d/W rounds, which is state the round counter alone cannot express.

    ``delays``: (host, crawl_delay_ms) — small, broadcast.
    ``host_state``: (host, next_allowed_ts) — one row per host EVER served
    (missing host ⇒ 0). Returns (admitted, deferred, new_host_state); the
    caller owns materializing new_host_state between rounds.

    ``max_concurrent`` (maxConcurrentPerDomain) min's into the per-host k;
    ``global_cap`` (globalQps × window) cuts the FINAL admitted set to the
    first ``global_cap`` rows in global order — applied INSIDE this op so the
    per-host clock advance counts only URLs actually served after the cut.
    """
    cols = [c for c in order_cols if c in frontier.columns]
    d = F.broadcast(
        delays.select(F.col("host").alias("_dh"), F.col("crawl_delay_ms").alias("_delay"))
    )
    s = host_state.select(
        F.col("host").alias("_sh"), F.col("next_allowed_ts").alias("_nat")
    )
    fr = (
        frontier.join(d, F.col(host_col) == F.col("_dh"), "left")
        .join(F.broadcast(s), F.col(host_col) == F.col("_sh"), "left")
        .withColumn("_delay", F.coalesce(F.col("_delay"), F.lit(0)))
        .withColumn("_t0", F.greatest(F.coalesce(F.col("_nat"), F.lit(0)),
                                      F.lit(rnd * window_ms).cast("long")))
    )
    budget_lit = F.lit(per_host_budget) if per_host_budget is not None else F.lit(None)
    k = F.when(
        F.col("_delay") > 0,
        F.ceil((F.lit((rnd + 1) * window_ms) - F.col("_t0")) / F.col("_delay")),
    ).otherwise(F.lit(2**62))
    k = F.greatest(F.lit(0).cast("long"), k.cast("long"))
    if per_host_budget is not None:
        k = F.least(k, budget_lit.cast("long"))
    if max_concurrent is not None:
        k = F.least(k, F.lit(max_concurrent).cast("long"))
    w = Window.partitionBy(host_col).orderBy(*[F.col(c) for c in cols])
    ranked = fr.withColumn("_adm", F.row_number().over(w)).withColumn("_k", k)
    admitted = ranked.filter(F.col("_adm") <= F.col("_k"))
    deferred = ranked.filter(F.col("_adm") > F.col("_k"))
    if global_cap is not None:
        # keep the first global_cap by global order; overflow defers. A host's
        # final admitted set stays a prefix of its per-host order, and the
        # clock math below sees only what was actually served.
        take = admitted.orderBy(*[F.col(c) for c in cols]).limit(global_cap)
        overflow = admitted.join(take.select("url"), "url", "left_anti")
        admitted = take
        deferred = deferred.unionByName(overflow)
    # clock update: hosts serving c URLs advance to t0 + c·delay; untouched
    # hosts keep their old clock (anti-join + union keeps one row per host)
    served = admitted.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").alias("_served"),
        F.max("_t0").alias("_t0"),
        F.max("_delay").alias("_delay"),
    )
    updated = served.select(
        "host",
        (F.col("_t0") + F.col("_served") * F.col("_delay")).cast("long").alias(
            "next_allowed_ts"
        ),
    )
    kept = host_state.join(updated.select("host"), "host", "left_anti")
    new_state = kept.unionByName(updated)
    drop = ["_dh", "_delay", "_sh", "_nat", "_t0", "_adm", "_k"]
    return admitted.drop(*drop), deferred.drop(*drop), new_state


def apply_robots(
    frontier: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
) -> Tuple[DataFrame, DataFrame]:
    """Split frontier into (allowed, skipped_robots) by the per-host disallow
    prefix list (reference README.md:145-147 design; CrawlStatus.SKIPPED_ROBOTS
    model/CrawlStatus.java:10-11). Robots is small (one row per host) and
    broadcast; prefix match on everything after the authority — path PLUS
    '?query' — so disallow rules containing '?' (e.g. '/search?q=') work,
    matching oracle._robots_blocked exactly."""
    path = F.concat(
        F.parse_url(F.col(url_col), F.lit("PATH")),
        F.coalesce(
            F.concat(F.lit("?"), F.parse_url(F.col(url_col), F.lit("QUERY"))),
            F.lit(""),
        ),
    )
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


def apply_robots_rfc(
    frontier: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
) -> Tuple[DataFrame, DataFrame]:
    """RFC 9309 §2.2.2 gate: Allow AND Disallow with longest-match
    precedence — the most specific matching rule wins; at equal length the
    LEAST restrictive (Allow) wins; no matching rule means allowed.

    ``apply_robots`` above keeps the reference-parity disallow-only prefix
    semantics the crawl path and sequential oracle share; this variant is
    the standards-complete gate for robots files that use Allow carve-outs
    (e.g. ``Disallow: /private`` + ``Allow: /private/press``). Same plan
    shape: broadcast one row per host, pure column algebra.
    """
    path = F.concat(
        F.parse_url(F.col(url_col), F.lit("PATH")),
        F.coalesce(
            F.concat(F.lit("?"), F.parse_url(F.col(url_col), F.lit("QUERY"))),
            F.lit(""),
        ),
    )
    r = robots.select(
        F.col("host").alias("_rhost"),
        F.col("disallow").alias("_dis"),
        F.col("allow").alias("_alw"),
    )
    joined = frontier.withColumn(
        "_host", F.parse_url(F.col(url_col), F.lit("HOST"))
    ).join(F.broadcast(r), F.col("_host") == F.col("_rhost"), "left")

    def longest(rules: Column) -> Column:
        lens = F.transform(
            F.filter(F.coalesce(rules, F.array()), lambda p: path.startswith(p)),
            F.length,
        )
        return F.coalesce(F.array_max(lens), F.lit(-1))

    blocked = longest(F.col("_dis")) > longest(F.col("_alw"))
    allowed = joined.filter(~blocked).drop("_host", "_rhost", "_dis", "_alw")
    skipped = joined.filter(blocked).drop("_host", "_rhost", "_dis", "_alw")
    return allowed, skipped


def aged_priority(
    priority: "Column",
    enqueue_round: "Column",
    current_round: int,
    age_every: int = 4,
) -> "Column":
    """Starvation-avoidance priority aging: a frontier row's EFFECTIVE
    priority improves by one class for every ``age_every`` rounds it has
    waited, floored at 0 (the best class):

        eff = greatest(0, priority - (current_round - enqueue_round) div age_every)

    Without aging, a busy host's low-priority tail can wait forever behind a
    steady stream of fresh high-priority discoveries — the classic MLFQ
    starvation problem, solved the classic way. Pure integer column math;
    feed the result into ``admit``/``salted_admit``'s order key in place of
    the raw priority."""
    waited = (F.lit(int(current_round)) - enqueue_round).cast("long")
    # nonnegative ints: (w - w % n) / n is exact floor division in any engine
    classes = (waited - waited % F.lit(int(age_every))) / F.lit(int(age_every))
    return F.greatest(
        F.lit(0).cast("int"), (priority - classes).cast("int")
    )


def host_circuit(
    fetch_log: DataFrame,
    error_threshold_pm: int = 500,
    min_fetches: int = 5,
    host_col: str = "host",
    status_col: str = "status",
) -> DataFrame:
    """Per-host circuit breaker from recent fetch outcomes: hosts whose
    error share exceeds ``error_threshold_pm`` per-mille over at least
    ``min_fetches`` observations trip OPEN (suspend fetching; retry after a
    cool-down round), everything else stays CLOSED. The standard remedy for
    a dying host burning the round's politeness budget on timeouts.

    ``fetch_log``: (host, status) rows, status 'OK'/'ERROR_FETCH'/... —
    any non-OK counts as an error. Exact integer comparison
    (errors * 1000 > threshold_pm * n), so the trip decision is bit-stable.
    Returns (host, n_fetches, n_errors, state). One host-keyed aggregate;
    feed OPEN hosts as an anti-join into the next round's admission.
    """
    agg = fetch_log.groupBy(F.col(host_col).alias("host")).agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.sum((F.col(status_col) != "OK").cast("long")).alias("n_errors"),
    )
    tripped = (F.col("n_fetches") >= min_fetches) & (
        F.col("n_errors") * 1000 > F.lit(int(error_threshold_pm)) * F.col("n_fetches")
    )
    return agg.withColumn(
        "state", F.when(tripped, F.lit("OPEN")).otherwise(F.lit("CLOSED"))
    )
