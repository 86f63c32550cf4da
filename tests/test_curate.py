"""End-to-end curation job (jobs/curate.py): every stage exercised with
planted data — exact dups, near-dup clusters, Gopher-failing docs, eval
contamination, mixture weights, and shard packing — on one input."""

import json

import pytest
from pyspark.sql import functions as F


GOOD = ("the quick brown fox and that dog have gone with all of them to see "
        "what the other animals of the forest have been doing and that is why "
        "we follow them with great interest every single day of the week")


@pytest.fixture(scope="module")
def curate_input(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("curate"))
    docs, eval_rows = [], []
    # 40 clean docs across two sources; the shared GOOD prefix supplies the
    # stopword mass but each doc's 40 unique filler words dominate its
    # shingle set (pairwise Jaccard ~0.35 — below LSH collision range)
    for i in range(40):
        docs.append((i, GOOD + f" marker{i} " + " ".join(f"w{i}x{j}" for j in range(40)),
                     f"src{i % 2}"))
    docs.append((100, docs[0][1], "src0"))            # exact dup of doc 0
    docs.append((101, docs[1][1] + " tiny tail", "src1"))  # near-dup of doc 1
    docs.append((102, "too few words", "src0"))       # gopher: word count
    docs.append((103, "zebra quark " * 40, "src0"))   # gopher: no stopwords
    # eval doc shares an 8-gram with doc 2's UNIQUE tail only (not the GOOD
    # prefix common to all docs — that would contaminate the whole corpus)
    eval_rows.append((9000, "marker2 " + " ".join(f"w2x{j}" for j in range(8))))
    spark.createDataFrame(docs, "doc_id long, text string, source string") \
        .write.parquet(f"{base}/docs")
    spark.createDataFrame(eval_rows, "doc_id long, text string") \
        .write.parquet(f"{base}/eval")
    return base


def test_curate_all_stages(spark, curate_input, tmp_path):
    from jobs.curate import run

    out = str(tmp_path / "out")
    s = run(
        spark,
        docs_path=f"{curate_input}/docs",
        out_path=out,
        eval_path=f"{curate_input}/eval",
        weights={"src0": 600, "src1": 400},
        budget_chars=3000,
        min_words=20,
        shard_chars=1000,
    )
    # stage counts: monotone non-increasing, each planted row removed where due
    assert s["exact_deduped"] == s["input"] - 1          # doc 100 dropped
    assert s["near_deduped"] <= s["exact_deduped"] - 1   # doc 101 dropped (at least)
    assert s["quality_kept"] <= s["near_deduped"] - 2    # docs 102, 103 dropped
    assert s["decontaminated"] <= s["quality_kept"] - 1  # doc 2 dropped
    assert 0 < s["mixture_sampled"] <= s["decontaminated"]
    assert s["output"] == s["mixture_sampled"]

    got = spark.read.parquet(out)
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    for planted in (100, 101, 102, 103, 2):
        assert planted not in ids
    # shard assignment covers a contiguous 0..max range
    shards = sorted(r["shard_id"] for r in got.select("shard_id").distinct().collect())
    assert shards[0] == 0 and shards == list(range(len(shards)))
    assert s["n_shards"] == len(shards)


def test_curate_quality_off_and_defaults(spark, curate_input, tmp_path):
    from jobs.curate import run

    out = str(tmp_path / "out2")
    s = run(
        spark,
        docs_path=f"{curate_input}/docs",
        out_path=out,
        quality="off",
        near_dedup=False,
        shard_chars=100_000,
    )
    assert "quality_kept" not in s and "near_deduped" not in s
    assert s["output"] == s["exact_deduped"] == s["input"] - 1
    assert s["n_shards"] == 1   # everything fits one shard at 100k chars


@pytest.mark.slow
def test_curate_canonical_longest_flips_keeper(spark, tmp_path):
    from jobs.curate import run

    # isolated near-dup pairs (no cross-pair shingle overlap): in each pair
    # the HIGHER id is the longer copy, so --canonical longest keeps it while
    # the min-id default keeps the lower id
    docs = []
    for g in range(3):
        base = " ".join(f"g{g}tok{j}" for j in range(80))
        docs.append((10 * g + 1, base, "src0"))
        docs.append((10 * g + 2, base + " longer tail appended here", "src0"))
    spark.createDataFrame(docs, "doc_id long, text string, source string") \
        .write.mode("overwrite").parquet(str(tmp_path / "docs"))

    out_a = str(tmp_path / "longest")
    run(spark, str(tmp_path / "docs"), out_a, quality="off", canonical="longest")
    kept_a = {r["doc_id"] for r in spark.read.parquet(out_a).select("doc_id").collect()}
    assert kept_a == {2, 12, 22}

    out_b = str(tmp_path / "minid")
    run(spark, str(tmp_path / "docs"), out_b, quality="off")
    kept_b = {r["doc_id"] for r in spark.read.parquet(out_b).select("doc_id").collect()}
    assert kept_b == {1, 11, 21}
