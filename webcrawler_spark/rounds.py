"""The crawl driver: the reference's BFS control flow restated as batch rounds.

One round = one idempotent Spark batch job per depth level (SURVEY §3.1
"Spark restatement"):

    traverse_d ⋈ pages (url)                       -- "fetch" against the corpus
      → extraction kernel (mapInPandas)            -- title/segments/links
      → posexplode(links) → normalize → rlike filter
      → first-occurrence (groupBy url, min(parent_rank, link_pos))
      → anti-join url_seen  → global_rank → append to queue/url_seen
      → anti-join visited   → traverse_{d+1}

The §2.2 order theorem makes the distributed queue order equal the reference's
single-threaded FIFO drain order: enqueue order is (depth, parent's dequeue
rank within depth, link position in the parent document), dedup keeps first
occurrence only. maxDepth semantics (harvest-but-don't-traverse,
CrawlerService.java:127-131) and the entry-enqueue-only-with-processor guard
(:110-116) are mirrored exactly.

Checkpoint/resume: with a SnapshotStore, each round's state tables are written
and re-read (also truncating the lineage DAG); the manifest commits the round
atomically. A re-run of a crashed round overwrites its versioned dirs —
idempotent by construction.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional, Set

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .config import CrawlConfig
from .functions import (
    accepted_by_filters,
    content_hash_segments,
    content_length_col,
    doc_id_col,
    host_hash_col,
    parse_host,
)
from .kernel.urlnorm import normalize_url
from .operators.dedup import anti_join_new, bloom_sidecar_build, dedup_against_seen
from .operators.ordering import first_occurrence, global_rank
from .storage import Manifest, SnapshotStore
from .udfs import extract_schema_with, make_extract_pages

SEEN_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("pos", LongType()),
        StructField("host_hash", LongType()),
        StructField("first_depth", IntegerType()),
    ]
)

LINEAGE_SCHEMA = StructType(
    [
        StructField("round", IntegerType()),
        StructField("partition_id", IntegerType()),
        StructField("hosts_served", LongType()),
        StructField("urls_fetched", LongType()),
        StructField("urls_deduped", LongType()),
        StructField("frontier_delta", LongType()),
        StructField("wall_ms", LongType()),
    ]
)


def _seed_df(spark: SparkSession, starts: List[str], extra: tuple) -> DataFrame:
    """Distributed, materialized seed frontier.

    Built via the Arrow (pandas) path and immediately localCheckpointed:
    a plain createDataFrame stays a driver-LOCAL relation that every
    consuming action re-serializes on the driver (broadcast hash builds,
    anti-joins, the final union chain) — ~10s × 5 uses at 278k seeds, all
    serial. One checkpoint pays that cost exactly once.
    """
    import pandas as pd

    cols = {"url": starts}
    fields = [StructField("url", StringType())]
    if "rank" in extra:
        cols["rank"] = list(range(len(starts)))
        fields.append(StructField("rank", LongType()))
    if "grank" in extra:
        cols["grank"] = list(range(len(starts)))
        fields.append(StructField("grank", LongType()))
    if "depth" in extra:
        cols["depth"] = [0] * len(starts)
        fields.append(StructField("depth", IntegerType()))
    df = spark.createDataFrame(pd.DataFrame(cols), StructType(fields))
    par = spark.sparkContext.defaultParallelism
    return df.repartition(par).localCheckpoint(eager=True)


@dataclass
class CrawlResult:
    queue: DataFrame            # (url, pos) — LinkQueue drain order
    seen: DataFrame             # url_seen table
    visited: DataFrame          # traversal dedup set
    docs: Optional[DataFrame]   # processed documents (None without processor)
    lineage: List[dict] = field(default_factory=list)
    rounds_run: int = 0
    urls_enqueued: int = 0


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    entry_url,
    config: CrawlConfig,
    store: Optional[SnapshotStore] = None,
    with_processor: bool = True,
    use_bloom: bool = False,
    crawl_ts: str = "2025-06-01 00:00:00",
) -> CrawlResult:
    """CrawlerService.crawl(entryUrl, waitForCompletion=True) as batch rounds.

    ``entry_url`` may be a single URL (reference semantics) or a seed list
    (README.md seed-list design): seeds occupy queue positions 0..n-1 in list
    order with first-occurrence dedup, and round 0 traverses all of them.
    """
    seed_list = [entry_url] if isinstance(entry_url, str) else list(entry_url)
    starts: List[str] = []
    _start_set: Set[str] = set()  # list membership is O(n) -> O(n^2) over big seed lists
    for s in seed_list:
        n = normalize_url(s)
        if n is not None and n not in _start_set:
            _start_set.add(n)
            starts.append(n)
    res = CrawlResult(queue=None, seen=None, visited=None, docs=None)  # type: ignore[arg-type]
    if not starts:
        empty_seen = spark.createDataFrame([], SEEN_SCHEMA)
        res.queue = empty_seen.select("url", "pos")
        res.seen = empty_seen
        res.visited = empty_seen.select("url")
        if with_processor:
            res.docs = spark.createDataFrame([], _docs_schema())
        return res

    max_depth = max(0, config.max_depth)

    traverse = _seed_df(spark, starts, ("rank",))
    visited = traverse.select("url")
    if with_processor:
        seen = traverse.select(
            "url",
            F.col("rank").cast("long").alias("pos"),
            host_hash_col(parse_host(F.col("url"))).alias("host_hash"),
            F.lit(0).alias("first_depth"),
        )
        queue_size = len(starts)
    else:
        seen = spark.createDataFrame([], SEEN_SCHEMA)
        queue_size = 0

    extract_fn, _ = make_extract_pages(config, carry_cols=["rank"])
    extract_out = extract_schema_with([StructField("rank", LongType())])

    lineage: List[dict] = []

    frontier_rows = len(starts)  # known exactly each round; drives the join strategy

    for depth in range(0, max_depth + 1):
        t0 = time.monotonic()
        # Broadcast the frontier side while it fits: the pages table (with its
        # html payload) then never shuffles — it streams through a broadcast
        # hash join. At true 10^10-frontier scale the frontier side outgrows
        # broadcast and this degrades to the shuffle join; a cluster deployment
        # co-locates by bucketing pages and frontier on url instead.
        trav_side = F.broadcast(traverse) if frontier_rows <= 5_000_000 else traverse
        fetched = pages.select("url", "html").join(trav_side, "url", "inner")
        # persist the extraction output: three downstream consumers (link
        # pipeline, fetch count, traversal frontier) would otherwise each
        # re-run the mapInPandas HTML parse — the most expensive op per round
        extracted = fetched.mapInPandas(extract_fn, extract_out).persist()

        # hrefs come out of the kernel already normalized and null-free
        links = extracted.select(
            F.col("rank").alias("parent_rank"),
            F.explode("links").alias("link"),
        ).select(
            "parent_rank",
            F.col("link.pos").alias("link_pos"),
            F.col("link.href").alias("url"),
        )

        accepted = links.filter(
            accepted_by_filters(
                F.col("url"), config.include_url_patterns, config.exclude_url_patterns
            )
        )

        # first occurrence within the round (intra-round self-dedup, SURVEY §7 #3)
        # persisted: consumed by both the enqueue path and the traversal path
        first = first_occurrence(accepted, "url", ["parent_rank", "link_pos"]).persist()

        sidecar = None
        if use_bloom:
            sidecar = bloom_sidecar_build(seen)
        new_urls = dedup_against_seen(first, seen, sidecar=sidecar)
        ranked = global_rank(
            new_urls, ["parent_rank", "link_pos"], out_col="pos", offset=queue_size
        )
        new_seen = ranked.select(
            "url",
            "pos",
            host_hash_col(parse_host(F.col("url"))).alias("host_hash"),
            F.lit(depth).alias("first_depth"),
        )

        # --- materialize round state (checkpoint or local truncation) -------
        if store is not None:
            store.write_table(new_seen, "seen_delta", depth)
            new_seen = store.read_table(spark, "seen_delta", depth)
        else:
            new_seen = new_seen.localCheckpoint(eager=True)

        # per-partition lineage rows (north_rule); n_new derived from their
        # sum — the materialized new_seen is scanned once, not counted twice
        part_rows = (
            new_seen.groupBy(
                F.pmod(F.col("host_hash"), F.lit(32)).cast("int").alias("partition_id")
            )
            .agg(
                F.countDistinct("host_hash").alias("hosts_served"),
                F.count("*").alias("urls_fetched"),
            )
            .collect()
        )
        n_new = sum(r["urls_fetched"] for r in part_rows)
        n_first = first.count()  # cached; dedup delta = n_first - n_new
        seen = seen.unionByName(new_seen)
        queue_size += n_new

        if depth < max_depth:
            cand = anti_join_new(first, visited)
            traverse_next = global_rank(
                cand, ["parent_rank", "link_pos"], out_col="new_rank"
            ).select("url", F.col("new_rank").alias("rank"))
            if store is not None:
                store.write_table(traverse_next, "traverse", depth + 1)
                traverse_next = store.read_table(spark, "traverse", depth + 1)
            else:
                traverse_next = traverse_next.localCheckpoint(eager=True)
            visited = visited.unionByName(traverse_next.select("url"))
            traverse = traverse_next
            frontier_rows = traverse_next.count()  # materialized; also the stop check
        extracted.unpersist()
        first.unpersist()
        wall_ms = int((time.monotonic() - t0) * 1000)

        for r in part_rows:
            lineage.append(
                {
                    "round": depth,
                    "partition_id": r["partition_id"],
                    "hosts_served": r["hosts_served"],
                    "urls_fetched": r["urls_fetched"],
                    "urls_deduped": n_first - n_new,
                    "frontier_delta": n_new,
                    "wall_ms": wall_ms,
                }
            )
        res.rounds_run += 1

        if depth < max_depth and frontier_rows == 0:
            break

    if store is not None:
        store.write_table(seen, "url_seen", max_depth)
        seen = store.read_table(spark, "url_seen", max_depth)
        m = store.load_manifest() or Manifest()
        m.committed_round = max_depth
        m.tables["url_seen"] = max_depth
        m.meta["entry_url"] = entry_url
        m.meta["queue_size"] = queue_size
        store.commit(m)

    res.queue = seen.select("url", "pos").orderBy("pos")
    res.seen = seen
    res.visited = visited
    res.lineage = lineage
    res.urls_enqueued = queue_size

    if with_processor:
        res.docs = process_queue(
            spark, seen, pages, config, crawl_ts=crawl_ts, queue_rows=queue_size
        )
    return res


def _docs_schema() -> StructType:
    from pyspark.sql.types import ArrayType, TimestampType

    return StructType(
        [
            StructField("id", StringType()),
            StructField("url", StringType()),
            StructField("domain", StringType()),
            StructField("crawl_ts", TimestampType()),
            StructField("status", StringType()),
            StructField("http_status", IntegerType()),
            StructField("fetch_duration_ms", LongType()),
            StructField("crawl_depth", IntegerType()),
            StructField("title", StringType()),
            StructField("description", StringType()),
            StructField("contents", ArrayType(StringType())),
            StructField("content_length", LongType()),
            StructField("content_type", StringType()),
            StructField("language", StringType()),
            StructField("out_links", ArrayType(StringType())),
            StructField("hash", StringType()),
            StructField("pos", LongType()),
        ]
    )


def process_queue(
    spark: SparkSession,
    queue: DataFrame,
    pages: DataFrame,
    config: CrawlConfig,
    crawl_ts: str = "2025-06-01 00:00:00",
    robots: Optional[DataFrame] = None,
    queue_rows: Optional[int] = None,
) -> DataFrame:
    """WebPageProcessor.processUrl over the whole admitted queue as one batch
    (the reference's N virtual-thread workers become Spark tasks — SURVEY §2.3 P1).

    Missing page (fetch failure) -> ERROR_FETCH row with partial fields
    (WebPageProcessor.java:160-170); fetched page -> OK row with title, rule
    extraction, hash and content length (:172-195). With a ``robots`` table,
    disallowed URLs become SKIPPED_ROBOTS rows (CrawlStatus.java:10-11) and
    are never fetched/parsed.
    """
    q = queue.select("url", "pos")
    skipped_robots = None
    if robots is not None:
        from .operators.admission import apply_robots

        q, blocked = apply_robots(q, robots)
        skipped_robots = blocked

    if queue_rows is not None and queue_rows <= 5_000_000:
        # broadcast the queue: the pages table (html payload) streams through
        # a broadcast hash join instead of shuffling wholesale; the missing
        # set needs only a url-column anti-join (no html movement)
        fetched = pages.join(F.broadcast(q), "url", "inner")
        missing = q.join(pages.select("url"), "url", "left_anti").withColumn(
            "html", F.lit(None).cast("binary")
        )
    else:
        joined = q.join(pages, "url", "left")
        fetched = joined.filter(F.col("html").isNotNull())
        missing = joined.filter(F.col("html").isNull())

    extract_fn, _ = make_extract_pages(config, carry_cols=["pos", "lang", "warc_ts"])
    from pyspark.sql.types import TimestampType

    out_schema = extract_schema_with(
        [
            StructField("pos", LongType()),
            StructField("lang", StringType()),
            StructField("warc_ts", TimestampType()),
        ]
    )
    ex = fetched.select("url", "html", "pos", "lang", "warc_ts").mapInPandas(
        extract_fn, out_schema
    )

    ts = F.to_timestamp(F.lit(crawl_ts))
    ok_docs = ex.select(
        doc_id_col(F.col("url")).alias("id"),
        F.col("url"),
        parse_host(F.col("url")).alias("domain"),
        ts.alias("crawl_ts"),
        F.lit("OK").alias("status"),
        F.lit(200).alias("http_status"),
        F.lit(0).cast("long").alias("fetch_duration_ms"),
        F.lit(None).cast("int").alias("crawl_depth"),
        F.col("title"),
        F.lit(None).cast("string").alias("description"),
        F.col("segments").alias("contents"),
        content_length_col(F.col("segments")).alias("content_length"),
        F.lit("text/html").alias("content_type"),
        F.col("lang").alias("language"),
        content_hash_segments(F.col("url"), F.col("segments")).alias("hash"),
        F.col("pos"),
        # out_links: the kernel already emits normalized, null-free hrefs in
        # document order — a plain column transform, no explode/regroup/
        # self-join (which would also evaluate the extraction twice per action)
        F.transform(F.col("links"), lambda l: l["href"]).alias("out_links"),
    )

    err_docs = missing.select(
        F.lit(None).cast("string").alias("id"),
        F.col("url"),
        parse_host(F.col("url")).alias("domain"),
        ts.alias("crawl_ts"),
        F.lit("ERROR_FETCH").alias("status"),
        F.lit(None).cast("int").alias("http_status"),
        F.lit(0).cast("long").alias("fetch_duration_ms"),
        F.lit(None).cast("int").alias("crawl_depth"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("description"),
        F.lit(None).cast("array<string>").alias("contents"),
        F.lit(0).cast("long").alias("content_length"),
        F.lit(None).cast("string").alias("content_type"),
        F.lit(None).cast("string").alias("language"),
        F.lit(None).cast("array<string>").alias("out_links"),
        content_hash_segments(F.col("url"), F.lit(None).cast("array<string>")).alias("hash"),
        F.col("pos"),
    )

    cols = [f.name for f in _docs_schema().fields]
    out = ok_docs.select(*cols).unionByName(err_docs.select(*cols))
    if skipped_robots is not None:
        robots_docs = skipped_robots.select(
            F.lit(None).cast("string").alias("id"),
            F.col("url"),
            parse_host(F.col("url")).alias("domain"),
            ts.alias("crawl_ts"),
            F.lit("SKIPPED_ROBOTS").alias("status"),
            F.lit(None).cast("int").alias("http_status"),
            F.lit(0).cast("long").alias("fetch_duration_ms"),
            F.lit(None).cast("int").alias("crawl_depth"),
            F.lit(None).cast("string").alias("title"),
            F.lit(None).cast("string").alias("description"),
            F.lit(None).cast("array<string>").alias("contents"),
            F.lit(0).cast("long").alias("content_length"),
            F.lit(None).cast("string").alias("content_type"),
            F.lit(None).cast("string").alias("language"),
            F.lit(None).cast("array<string>").alias("out_links"),
            content_hash_segments(
                F.col("url"), F.lit(None).cast("array<string>")
            ).alias("hash"),
            F.col("pos"),
        )
        out = out.unionByName(robots_docs.select(*cols))
    return out


# ---------------------------------------------------------------------------
# Politeness-windowed crawl (per-host admission + robots; north_rule core)
# ---------------------------------------------------------------------------

def run_polite_crawl(
    spark: SparkSession,
    pages: DataFrame,
    entry_url,
    config: CrawlConfig,
    robots: Optional[DataFrame] = None,
    store: Optional[SnapshotStore] = None,
    use_bloom: bool = False,
    salt_threshold: Optional[int] = None,
    n_salts: int = 16,
    max_rounds: int = 10_000,
    crawl_ts: str = "2025-06-01 00:00:00",
) -> CrawlResult:
    """The frontier scheduler with per-host politeness windows and a robots
    gate — semantics fixed by oracle.crawl_oracle_polite (the reference only
    *designed* these: README.md:55-57,145-147).

    Each round admits, per host, the first ``config.per_host_budget`` pending
    URLs in global discovery order (row_number over host ordered by grank);
    the rest defer unchanged. Robots-blocked URLs consume budget, produce no
    links, and process as SKIPPED_ROBOTS docs. Hot hosts can be salted
    (``salt_threshold``) at the documented cost of per-salt-only ordering.
    """
    from .operators.admission import admit, apply_robots, salted_admit

    seed_list = [entry_url] if isinstance(entry_url, str) else list(entry_url)
    starts: List[str] = []
    _start_set: Set[str] = set()  # list membership is O(n) -> O(n^2) over big seed lists
    for s in seed_list:
        n = normalize_url(s)
        if n is not None and n not in _start_set:
            _start_set.add(n)
            starts.append(n)
    res = CrawlResult(queue=None, seen=None, visited=None, docs=None)  # type: ignore[arg-type]
    if not starts:
        empty_seen = spark.createDataFrame([], SEEN_SCHEMA)
        res.queue = empty_seen.select("url", "pos")
        res.seen = empty_seen
        res.visited = empty_seen.select("url")
        res.docs = spark.createDataFrame([], _docs_schema())
        return res

    max_depth = max(0, config.max_depth)
    budget = config.per_host_budget

    traverse = _seed_df(spark, starts, ("grank", "depth"))
    visited = traverse.select("url")
    seen = traverse.select(
        "url",
        F.col("grank").alias("pos"),
        host_hash_col(parse_host(F.col("url"))).alias("host_hash"),
        F.lit(0).alias("first_depth"),
    )
    queue_size = len(starts)
    discovered = len(starts)

    extract_fn, _ = make_extract_pages(config, carry_cols=["grank", "depth"])
    extract_out = extract_schema_with(
        [StructField("grank", LongType()), StructField("depth", IntegerType())]
    )

    lineage: List[dict] = []
    frontier_rows = len(starts)

    for rnd in range(max_rounds):
        t0 = time.monotonic()
        tr = traverse.withColumn("host", parse_host(F.col("url")))
        if salt_threshold is not None:
            admitted, deferred = salted_admit(
                tr.withColumn("rank", F.col("grank")), budget,
                order_cols=("grank",), host_col="host",
                salt_threshold=salt_threshold, n_salts=n_salts,
            )
            admitted = admitted.drop("rank")
            deferred = deferred.drop("rank")
        else:
            admitted, deferred = admit(tr, budget, order_cols=("grank",), host_col="host")
        if robots is not None:
            allowed, _blocked = apply_robots(admitted, robots)
        else:
            allowed = admitted
        allowed = allowed.drop("host")
        deferred = deferred.drop("host")

        # broadcast the admitted frontier while it fits (see run_crawl note)
        allowed_side = F.broadcast(allowed) if frontier_rows <= 5_000_000 else allowed
        fetched = pages.select("url", "html").join(allowed_side, "url", "inner")
        extracted = fetched.mapInPandas(extract_fn, extract_out).persist()

        links = extracted.select(
            F.col("grank").alias("parent_rank"),
            (F.col("depth") + 1).alias("child_depth"),
            F.explode("links").alias("link"),
        ).select(
            "parent_rank",
            "child_depth",
            F.col("link.pos").alias("link_pos"),
            F.col("link.href").alias("url"),
        )
        accepted = links.filter(
            accepted_by_filters(
                F.col("url"), config.include_url_patterns, config.exclude_url_patterns
            )
        )
        first = first_occurrence(accepted, "url", ["parent_rank", "link_pos"]).persist()

        sidecar = bloom_sidecar_build(seen) if use_bloom else None
        new_urls = dedup_against_seen(first, seen, sidecar=sidecar)
        ranked = global_rank(
            new_urls, ["parent_rank", "link_pos"], out_col="pos", offset=queue_size
        )
        new_seen = ranked.select(
            "url",
            "pos",
            host_hash_col(parse_host(F.col("url"))).alias("host_hash"),
            F.col("child_depth").alias("first_depth"),
        )
        if store is not None:
            store.write_table(new_seen, "seen_delta", rnd)
            new_seen = store.read_table(spark, "seen_delta", rnd)
        else:
            new_seen = new_seen.localCheckpoint(eager=True)

        part_rows = (
            new_seen.groupBy(
                F.pmod(F.col("host_hash"), F.lit(32)).cast("int").alias("partition_id")
            )
            .agg(
                F.countDistinct("host_hash").alias("hosts_served"),
                F.count("*").alias("urls_fetched"),
            )
            .collect()
        )
        n_new = sum(r["urls_fetched"] for r in part_rows)
        n_first = first.count()
        seen = seen.unionByName(new_seen)
        queue_size += n_new

        cand = anti_join_new(
            first.filter(F.col("child_depth") <= max_depth), visited
        )
        tnext = global_rank(
            cand, ["parent_rank", "link_pos"], out_col="new_grank", offset=discovered
        ).select(
            "url",
            F.col("new_grank").alias("grank"),
            F.col("child_depth").cast("int").alias("depth"),
        )
        traverse_next = deferred.unionByName(tnext)
        if store is not None:
            store.write_table(traverse_next, "traverse", rnd + 1)
            traverse_next = store.read_table(spark, "traverse", rnd + 1)
        else:
            traverse_next = traverse_next.localCheckpoint(eager=True)
        # new children are exactly the rows ranked this round (grank >= the
        # pre-round discovered counter); deferred rows keep their older granks
        n_next_total = traverse_next.count()
        frontier_rows = n_next_total
        new_children = traverse_next.filter(F.col("grank") >= discovered)
        visited = visited.unionByName(new_children.select("url"))
        discovered += new_children.count()

        extracted.unpersist()
        first.unpersist()
        wall_ms = int((time.monotonic() - t0) * 1000)
        for r in part_rows:
            lineage.append(
                {
                    "round": rnd,
                    "partition_id": r["partition_id"],
                    "hosts_served": r["hosts_served"],
                    "urls_fetched": r["urls_fetched"],
                    "urls_deduped": n_first - n_new,
                    "frontier_delta": n_new,
                    "wall_ms": wall_ms,
                }
            )
        res.rounds_run += 1
        if n_next_total == 0:
            break
        traverse = traverse_next

    if store is not None:
        store.write_table(seen, "url_seen", res.rounds_run)
        seen = store.read_table(spark, "url_seen", res.rounds_run)
        m = store.load_manifest() or Manifest()
        m.committed_round = res.rounds_run
        m.tables["url_seen"] = res.rounds_run
        m.meta["entry_url"] = starts[0] if len(starts) == 1 else f"{len(starts)} seeds"
        m.meta["queue_size"] = queue_size
        store.commit(m)

    res.queue = seen.select("url", "pos").orderBy("pos")
    res.seen = seen
    res.visited = visited
    res.lineage = lineage
    res.urls_enqueued = queue_size
    res.docs = process_queue(
        spark, seen, pages, config, crawl_ts=crawl_ts, robots=robots,
        queue_rows=queue_size,
    )
    return res
