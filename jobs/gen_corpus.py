"""spark-submit job: materialize a large deterministic synthetic corpus.

Usage:
    spark-submit --py-files engine.zip jobs/gen_corpus.py \
        --out /tmp/corpus --n-hosts 64 --n-pages 1000000 [--seed 42]

Writes pages/ (parquet dir), seeds.parquet, robots.parquet under --out.
Generation is distributed (mapInPandas, one pure-function page per row) and
bit-stable under any partitioning/core count — see corpus.generate_pages_distributed.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
# local-mode python workers inherit the driver env, not driver sys.path;
# without this a plain-python launch from outside the repo breaks mapInPandas
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n-hosts", type=int, default=64)
    ap.add_argument("--n-pages", type=int, default=1_000_000)
    ap.add_argument("--zipf-s", type=float, default=1.2)
    ap.add_argument(
        "--n-seeds", type=int, default=3,
        help="seeds.parquet gets the root page of the first N hosts",
    )
    ap.add_argument(
        "--seeds-per-host", type=int, default=1,
        help="seed the first K existing pages of each seeded host (capped by "
        "the host's Zipf allocation) — large seed lists make crawl rounds "
        "work-dominant from round 0",
    )
    ap.add_argument(
        "--layout", choices=["hash", "host"], default="hash",
        help="physical page-table layout. 'hash' distributes rows by "
        "xxhash64(url) so every scan split carries a ~uniform share of any "
        "frontier's parse load (a host-clustered layout + a Zipf frontier "
        "makes hot-host splits ~100%% parse-matched while cold splits idle — "
        "measured par 9-10/16 cores on the fetch-join parse stages vs ~15 "
        "after hashing). This is the explicit-skew-handling layout the "
        "engine prescribes for its Iceberg page table; 'host' keeps "
        "generation order (host-contiguous) for layout-sensitivity tests.",
    )
    args = ap.parse_args()

    from webcrawler_spark.corpus import EPOCH, generate_pages_distributed
    from webcrawler_spark.session import get_spark

    spark = get_spark(app_name="gen-corpus")
    t0 = time.monotonic()
    pages, _default_seeds = generate_pages_distributed(
        spark, seed=args.seed, n_hosts=args.n_hosts, n_pages=args.n_pages,
        zipf_s=args.zipf_s,
    )
    from webcrawler_spark.corpus import zipf_alloc

    alloc = zipf_alloc(args.n_hosts, args.n_pages, args.zipf_s)
    seeds = [
        f"https://host{h:03d}.example.com/page/{p}"
        for h in range(min(args.n_seeds, args.n_hosts))
        for p in range(min(args.seeds_per_host, alloc[h]))
    ]
    if args.layout == "hash":
        from pyspark.sql import functions as F

        # ~20k pages per output file keeps scan splits fine-grained enough
        # that one split's worst-case parse cost stays a few seconds
        n_parts = max(64, args.n_pages // 20_000)
        pages = pages.repartition(n_parts, F.xxhash64("url"))
    pages.write.mode("overwrite").parquet(f"{args.out}/pages")

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(args.out, exist_ok=True)
    pq.write_table(
        pa.table({"seed_id": pa.array(range(len(seeds)), pa.int64()), "url": seeds}),
        f"{args.out}/seeds.parquet",
    )
    # robots: same shape as corpus.generate_corpus, deterministic per host
    hosts = [f"host{h:03d}.example.com" for h in range(args.n_hosts)]
    rows = []
    for host in hosts:
        rng = random.Random(f"{args.seed}:robots:{host}")
        disallow = ["/missing/"]
        if rng.random() < 0.10:
            disallow.append("/page/1")
        rows.append((host, EPOCH, disallow, rng.choice([0, 500, 2000])))
    pq.write_table(
        pa.table(
            {
                "host": [r[0] for r in rows],
                "fetched_ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
                "disallow": pa.array([r[2] for r in rows], pa.list_(pa.string())),
                "crawl_delay_ms": pa.array([r[3] for r in rows], pa.int64()),
            }
        ),
        f"{args.out}/robots.parquet",
    )
    n = spark.read.parquet(f"{args.out}/pages").count()
    print(json.dumps({"pages": n, "out": args.out, "wall_sec": round(time.monotonic() - t0, 1)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
