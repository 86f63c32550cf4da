"""robots.txt parsing: raw per-host bodies → the admission gate's table.

The reference declares "Fetch and cache robots.txt per domain; honor
disallow/allow and crawl-delay" (/root/reference/README.md:146) but ships no
parser; the admission gate here (operators/admission.py apply_robots /
timed_admit) consumes a parsed (host, disallow[], crawl_delay_ms) table.
This operator closes the gap: it turns a relation of fetched robots.txt
bodies into that table, entirely with JVM-side column algebra (split +
posexplode + regex + two windows + one grouped aggregate — no Python).

Semantics (v1, fixed here and by the pytest goldens):
- comments (``#`` to end of line) stripped; keys case-insensitive; values
  trimmed; CRLF tolerated.
- group model: a ``User-agent`` line starts a new group unless the previous
  directive line was also ``User-agent`` (consecutive UA lines share one
  group, per the robots.txt spec); blank lines do not break groups.
- only groups naming ``User-agent: *`` apply (the reference models a single
  generic crawler identity).
- ``Disallow`` with an empty value allows everything (dropped); prefix
  semantics downstream are the gate's concern (admission.py '?query'
  handling).
- ``Crawl-delay`` is seconds (fractional ok) → ``crawl_delay_ms`` long; the
  first one in document order among * groups wins; absent → null.
- hosts whose body yields no * group produce (host, [], null) — the gate
  treats them as unrestricted.

Scale shape: one posexplode per body (robots files are small by spec), the
two windows and the final groupBy all share the host partitioning — a
single host-keyed shuffle for the whole parse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots_txt(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, disallow array<string> in document order, crawl_delay_ms long)
    from raw robots.txt bodies (host, body)."""
    hosts = bodies.select(F.col(host_col).alias("host")).distinct()
    lines = bodies.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("pos", "raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*", ""))
    parsed = (
        lines.select(
            "host",
            "pos",
            F.lower(F.trim(F.regexp_extract(clean, "^([^:]+):", 1))).alias("key"),
            F.trim(F.regexp_extract(clean, "^[^:]+:(.*)$", 1)).alias("val"),
        )
        .filter(F.col("key") != "")
    )
    w = Window.partitionBy("host").orderBy("pos")
    sec = parsed.withColumn(
        "_new_sec",
        (
            (F.col("key") == "user-agent")
            & (F.coalesce(F.lag("key").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn("sec", F.sum("_new_sec").over(w))
    wsec = Window.partitionBy("host", "sec")
    star = sec.withColumn(
        "_star",
        F.max(
            F.when((F.col("key") == "user-agent") & (F.col("val") == "*"), 1).otherwise(0)
        ).over(wsec),
    ).filter(F.col("_star") == 1)
    dis = (
        star.filter((F.col("key") == "disallow") & (F.col("val") != ""))
        .groupBy("host")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "val"))), lambda s: s["val"]
            ).alias("disallow")
        )
    )
    alw = (
        star.filter((F.col("key") == "allow") & (F.col("val") != ""))
        .groupBy("host")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "val"))), lambda s: s["val"]
            ).alias("allow")
        )
    )
    delay = (
        star.filter(F.col("key") == "crawl-delay")
        .groupBy("host")
        .agg(F.min(F.struct("pos", "val")).alias("_first"))
        .select(
            "host",
            # try_cast, not cast: a malformed value ("Crawl-delay: fast") in
            # ONE crawled robots.txt would otherwise kill the whole parse job
            # under ANSI mode; null = no delay, matching a missing directive
            F.round(F.col("_first.val").try_cast("double") * 1000).cast("long").alias(
                "crawl_delay_ms"
            ),
        )
    )
    return (
        hosts.join(dis, "host", "left")
        .join(alw, "host", "left")
        .join(delay, "host", "left")
        .select(
            "host",
            F.coalesce(F.col("disallow"), F.array().cast("array<string>")).alias(
                "disallow"
            ),
            F.coalesce(F.col("allow"), F.array().cast("array<string>")).alias(
                "allow"
            ),
            "crawl_delay_ms",
        )
    )


def robots_sitemaps(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, sitemap, pos) for every ``Sitemap:`` directive in each body.

    Per RFC 9309 §2.3 / sitemaps.org, ``Sitemap`` is a group-INDEPENDENT
    record: it applies regardless of user-agent groups, so unlike
    ``parse_robots_txt`` no group resolution happens — every directive
    surfaces, in document order (``pos``), absolute-URL values as given.
    Comments and CRLF handled identically to the main parser. Same scale
    shape: one posexplode per (small) body, no shuffle at all — the output
    is host-local."""
    lines = bodies.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("pos", "raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*", ""))
    return (
        lines.select(
            "host",
            "pos",
            F.lower(F.trim(F.regexp_extract(clean, "^([^:]+):", 1))).alias("key"),
            F.trim(F.regexp_extract(clean, "^[^:]+:(.*)$", 1)).alias("val"),
        )
        .filter((F.col("key") == "sitemap") & (F.col("val") != ""))
        .select("host", F.col("val").alias("sitemap"), "pos")
    )


ROBOTS_FRESH = "FRESH"
ROBOTS_STALE_USABLE = "STALE_USABLE"
ROBOTS_EXPIRED = "EXPIRED"
ROBOTS_MISSING = "MISSING"


def robots_cache_states(
    frontier_hosts: DataFrame,
    robots: DataFrame,
    now,
    ttl_s: int = 24 * 3600,
    grace_s: int = 7 * 24 * 3600,
    host_col: str = "host",
    fetched_ts_col: str = "fetched_ts",
) -> DataFrame:
    """robots.txt cache-validity plan (the "cache" half of the reference's
    "Fetch and cache robots.txt per domain", README.md:146, which it never
    implements). RFC 9309 §2.4: a cached copy MAY be used for up to 24
    hours, and for longer when the file is unreachable — modeled as a TTL
    plus a grace window:

    - ``FRESH``        age ≤ ttl_s — use the cached rules, no refetch.
    - ``STALE_USABLE`` ttl_s < age ≤ grace_s — rules still applied this
      round (the RFC's unreachable-extension), refetch scheduled.
    - ``EXPIRED``      age > grace_s — cached copy unusable; refetch
      required before fetching the host (treated like MISSING by the gate).
    - ``MISSING``      the frontier names a host with no robots row at all.

    Returns one row per distinct frontier host: (host, robots_state,
    age_s, refetch) where ``refetch`` marks STALE_USABLE / EXPIRED /
    MISSING. ``now`` is an explicit timestamp (a crawl round has ONE
    decision instant — wall-clock-per-row would make the plan
    non-deterministic and retry-unstable).

    Scale: hosts are the crawl's small dimension (10^7 hosts vs 10^10
    urls); one distinct + one host-keyed left join against the robots
    table, all JVM-side. The refetch list is exactly the host set a real
    fetcher would enqueue robots.txt GETs for."""
    hosts = frontier_hosts.select(F.col(host_col).alias("host")).distinct()
    cache = robots.select(
        F.col(host_col).alias("host"),
        F.col(fetched_ts_col).alias("_fetched_ts"),
    )
    now_col = F.lit(now).cast("timestamp")
    age = (now_col.cast("long") - F.col("_fetched_ts").cast("long"))
    state = (
        F.when(F.col("_fetched_ts").isNull(), F.lit(ROBOTS_MISSING))
        .when(age <= int(ttl_s), F.lit(ROBOTS_FRESH))
        .when(age <= int(grace_s), F.lit(ROBOTS_STALE_USABLE))
        .otherwise(F.lit(ROBOTS_EXPIRED))
    )
    return (
        hosts.join(cache, "host", "left")
        .select(
            "host",
            state.alias("robots_state"),
            age.alias("age_s"),
            (state != ROBOTS_FRESH).alias("refetch"),
        )
    )
