"""Full product story, end to end: crawl a page corpus, feed the crawled
documents through the curation chain, land shard-packed training data.
This is the composition a user of the engine actually runs — the crawl's
docs table IS the curation input, bridged by one projection."""

import os

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.config import CrawlConfig


@pytest.mark.slow
def test_crawl_docs_flow_through_curation(spark, pages_df, small_corpus, tmp_path):
    from jobs.curate import run
    from webcrawler_spark.pipeline.textprep import hash64
    from webcrawler_spark.rounds import run_crawl

    cfg = CrawlConfig.from_dict(
        {"maxDepth": 2, "contentRules": {"minCharacter": 40, "tagName": "p"}}
    )
    result = run_crawl(spark, pages_df, small_corpus.seeds[0], cfg, with_processor=True)
    docs = result.docs.filter(
        (F.col("status") == "OK") & (F.size("contents") > 0)
    )
    n_crawled = docs.count()
    assert n_crawled > 0

    # bridge: crawl doc -> curation row (stable integer key from the doc id,
    # extracted text joined, domain as the mixture source)
    cur_in = docs.select(
        hash64(F.col("id")).alias("doc_id"),
        F.array_join("contents", " ").alias("text"),
        F.col("domain").alias("source"),
    )
    in_path = str(tmp_path / "curate-in")
    cur_in.write.parquet(in_path)

    out = str(tmp_path / "curated")
    s = run(
        spark,
        docs_path=in_path,
        out_path=out,
        quality="off",                  # synthetic vocab has no EN stopwords
        shard_chars=2_000,
    )
    assert s["input"] == n_crawled
    assert 0 < s["output"] <= s["input"]
    shards = spark.read.parquet(out)
    assert shards.count() == s["output"]
    # shard ids start at 0 (gaps are legal: a doc bigger than the target
    # spans multiple ids) and the text survived intact
    ids = sorted(r["shard_id"] for r in shards.select("shard_id").distinct().collect())
    assert ids[0] == 0 and len(ids) == s["n_shards"]
    assert shards.filter(F.length("text") > 0).count() == s["output"]
