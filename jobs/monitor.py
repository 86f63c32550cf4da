"""spark-submit entry point: a standing crawl-feed monitor over a drop folder.

    spark-submit --py-files engine.zip jobs/monitor.py \
        --pages /path/drop-folder --state-dir /tmp/monitor \
        [--d 4] [--w 4096] [--topk 20]

One invocation = one AvailableNow drain (the reference's 3-minute cron
consumer shape, `ProcessorManager.java:182-208`): newly-landed page files are
folded into two BOUNDED standing summaries under --state-dir, then the job
prints a JSON digest and exits. Run it from cron forever — state never grows:

- host-frequency count-min sketch (streaming.cms_monitor): d x w counters,
  batch-id idempotent, answers "which hosts dominate the crawl feed" without
  an unbounded per-host table;
- first-seen URL log (streaming.first_seen): exactly-once new-URL parquet,
  the consumer-side twin of the frontier seen-set.

The digest reports the top hosts by estimated count (estimates read from the
sketch via cms_estimate against the hosts seen in THIS drain — candidates
cost one distinct on the drained slice, estimates come from all history).

Every piece is oracle-checked individually (`stream_cms`, `stream_first_seen`,
`sketch_cms` in __spark_entry__.py); this job is their composition.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import functions as F


def run(spark, pages_dir: str, state_dir: str, d: int, w: int, topk: int) -> dict:
    from webcrawler_spark.functions import parse_host
    from webcrawler_spark.pipeline.sketches import cms_estimate
    from webcrawler_spark.streaming import PAGES_SCHEMA, cms_monitor, first_seen, run_available_now

    t0 = time.monotonic()

    # 1. fold new pages' hosts into the standing CMS
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    hosts = stream.select(parse_host(F.col("url")).alias("host"))
    sketch = cms_monitor(
        hosts,
        "host",
        sketch_dir=os.path.join(state_dir, "host_cms"),
        checkpoint_dir=os.path.join(state_dir, "ckpt_cms"),
        d=d,
        w=w,
    )

    # 2. exactly-once first-seen URL log (its own checkpoint/offsets)
    stream2 = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    run_available_now(
        first_seen(stream2, ["url"]),
        out_dir=os.path.join(state_dir, "first_seen"),
        checkpoint_dir=os.path.join(state_dir, "ckpt_seen"),
    )
    seen_dir = os.path.join(state_dir, "first_seen")
    n_seen = spark.read.parquet(seen_dir).count()

    # 3. digest: estimated counts for every host in the full batch view
    # (candidate set = distinct hosts of the input dir — bounded by the
    # site list, not the page count; at larger scale pass a watch list)
    cand = [
        r["host"]
        for r in spark.read.schema(PAGES_SCHEMA).parquet(pages_dir)
        .select(parse_host(F.col("url")).alias("host"))
        .distinct()
        .collect()
        if r["host"]
    ]
    top = []
    if sketch is not None and cand:
        top = [
            {"host": r["key"], "est": r["est"]}
            for r in cms_estimate(sketch, cand, d=d, w=w)
            .orderBy(F.col("est").desc(), "key")
            .limit(topk)
            .collect()
        ]
    return {
        "state_dir": state_dir,
        "first_seen_urls": n_seen,
        "top_hosts": top,
        "wall_sec": round(time.monotonic() - t0, 2),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="drop folder of page parquet files")
    ap.add_argument("--state-dir", required=True)
    ap.add_argument("--d", type=int, default=4)
    ap.add_argument("--w", type=int, default=4096)
    ap.add_argument("--topk", type=int, default=20)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    from webcrawler_spark.session import get_spark

    spark = get_spark(app_name="monitor", master=args.master)
    print(json.dumps(run(spark, args.pages, args.state_dir, args.d, args.w, args.topk)))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
