"""Bucketed co-located joins: the 100 TB deployment story for the crawl's
hottest join (frontier × pages on url, repeated every round) — persisting the
hash partitioning in the table layout removes the per-round exchange of the
pages table entirely (rounds.py:115; storage.write_bucketed_table)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark(tmp_path_factory):
    from webcrawler_spark.session import get_spark

    wh = str(tmp_path_factory.mktemp("warehouse"))
    return get_spark(
        app_name="bucketing-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": wh,
            # make the exchange-free property visible: no broadcast shortcut,
            # no AQE rewrite of the join we are inspecting
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false",
        },
    )


def _tables(spark, tmp_path):
    from webcrawler_spark.storage import write_bucketed_table

    pages = spark.range(0, 5000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 40).cast("string"),
                 F.lit(".example.com/p/"), F.col("id").cast("string")).alias("url"),
        F.sha2(F.col("id").cast("string"), 256).alias("html"),
    )
    frontier = pages.select("url").filter(F.col("url").rlike("/p/1"))
    bp = write_bucketed_table(
        pages, spark, "bkt_pages", "url", 8, path=str(tmp_path / "bp")
    )
    bf = write_bucketed_table(
        frontier, spark, "bkt_frontier", "url", 8, path=str(tmp_path / "bf")
    )
    return pages, frontier, bp, bf


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    pages, frontier, bp, bf = _tables(spark, tmp_path)

    plan_bucketed = bf.join(bp, "url")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan_bucketed  # co-located: zero shuffle, both sides
    assert "SortMergeJoin" in plan_bucketed

    plan_plain = frontier.join(pages, "url")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan_plain  # the layout, not the join, removed it


def test_bucketed_join_results_identical(spark, tmp_path):
    pages, frontier, bp, bf = _tables(spark, tmp_path)
    got = sorted(r["url"] for r in bf.join(bp, "url").select("url").collect())
    exp = sorted(r["url"] for r in frontier.join(pages, "url").select("url").collect())
    assert got == exp and len(got) > 0
