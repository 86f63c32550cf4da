"""Physical-plan contracts: the plans the 100 TB story depends on, pinned as
tests so a refactor that silently degrades them (lost broadcast, lost column
pruning, an accidental cartesian product) fails CI rather than a cluster run.

Checks read the formatted explain output of the real entry queries at
sf0.001 — cheap (no execution) and stable across AQE because the asserted
properties are static plan shape, not partition counts."""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _plan(spark, name):
    import __spark_entry__ as entry

    df = entry.queries()[name](spark, SF_DIR)
    jdf = df._jdf
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jdf.queryExecution().explainString(mode)


# Queries whose plans must never contain a cartesian product. (Queries built
# on intentional tiny crossJoins — stats broadcasts, planted-clone fan-outs —
# are excluded; theirs are BroadcastNestedLoopJoins over 1-row/driver-scale
# sides by construction.)
NO_CARTESIAN = [
    "flagship_frontier_round",
    "f1_dedup_anti_join",
    "f2_admission_salted",
    "dedup_lsh_pairs",
    "dedup_simhash_pairs",
    "dedup_span_stats",
    "domain_mixture",
    "decontaminate",
    "shard_pack",
    "text_unigram_lp",
    "tfidf_keywords",
    "frontier_pr_admission",
]


@pytest.mark.parametrize("name", NO_CARTESIAN)
def test_no_cartesian_product(spark, name):
    assert "CartesianProduct" not in _plan(spark, name)


@pytest.mark.parametrize(
    "name",
    ["domain_mixture", "decontaminate", "shard_pack", "frontier_pr_admission"],
)
def test_designed_broadcasts_present(spark, name):
    """The small side (rates / eval grams / bucket offsets / rank table)
    must broadcast — a silent fallback to SortMergeJoin would reshuffle the
    corpus-sized side at scale."""
    assert "BroadcastHashJoin" in _plan(spark, name)


def test_column_pruning_reaches_the_scan(spark):
    """corpus_split needs only (doc_id, n_chars): the parquet scan must not
    read the text column (at 100 TB that is most of the bytes)."""
    p = _plan(spark, "corpus_split")
    scan = [l for l in p.splitlines() if "ReadSchema" in l]
    assert scan and all("text" not in l for l in scan)


def test_admission_window_partitions_by_host(spark):
    """The politeness window must partition by host — an un-partitioned
    window here would be a single-task global sort."""
    p = _plan(spark, "f2_admission_salted")
    assert "Window" in p
    # the window's partition spec must reference the host column
    win_lines = [l for l in p.splitlines() if "Arguments" in l and "row_number" in l]
    assert win_lines and any("host" in l for l in win_lines)
