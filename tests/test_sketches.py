"""Sketch operators (pipeline/sketches.py): count-min and KMV/bottom-k."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tokens(spark):
    rows = [(i % 4, f"u{i}") for i in range(400)] + [(0, "hot")] * 250
    return spark.createDataFrame(rows, "grp int, tok string")


def test_cms_never_underestimates_and_merges(spark, tokens):
    from webcrawler_spark.pipeline.sketches import cms_build, cms_estimate

    exact = {
        r["tok"]: r["n"]
        for r in tokens.groupBy("tok").agg(F.count("*").alias("n")).collect()
    }
    keys = ["hot", "u1", "u399", "absent"]
    sk = cms_build(tokens, F.col("tok"), d=4, w=512)
    est = {r["key"]: r["est"] for r in cms_estimate(sk, keys, d=4, w=512).collect()}
    for k in keys:
        assert est[k] >= exact.get(k, 0)          # one-sided error, always
    assert est["hot"] <= exact["hot"] + 10        # w >> n: near-exact
    # mergeability: sketch(a) + sketch(b) == sketch(a+b), counter by counter
    a = tokens.filter(F.col("grp") < 2)
    b = tokens.filter(F.col("grp") >= 2)
    merged = (
        cms_build(a, F.col("tok"), d=4, w=512)
        .unionByName(cms_build(b, F.col("tok"), d=4, w=512))
        .groupBy("lane", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(tokens, F.col("tok"), d=4, w=512)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_cms_weighted_counts(spark):
    from webcrawler_spark.pipeline.sketches import cms_build, cms_estimate

    df = spark.createDataFrame(
        [("x", 5), ("x", 7), ("y", 1)], "tok string, w long"
    )
    sk = cms_build(df, F.col("tok"), d=4, w=512, weight=F.col("w"))
    est = {r["key"]: r["est"] for r in cms_estimate(sk, ["x", "y"], d=4, w=512).collect()}
    assert est["x"] >= 12 and est["y"] >= 1


def test_bottomk_deterministic_and_exact_under_k(spark, tokens):
    from webcrawler_spark.pipeline.sketches import bottomk, kmv_distinct

    # repeated runs and re-partitioned input give the identical sample
    s1 = set(map(tuple, bottomk(tokens, "grp", F.col("tok"), k=16).collect()))
    s2 = set(
        map(tuple, bottomk(tokens.repartition(7), "grp", F.col("tok"), k=16).collect())
    )
    assert s1 == s2 and len(s1) == 4 * 16
    # duplicates collapse: the 250 'hot' copies occupy one sample slot
    kd = {r["grp"]: r for r in kmv_distinct(tokens, "grp", F.col("tok"), k=16).collect()}
    # under k distinct -> exact; here each grp has 100 or 101 distinct > 16,
    # so estimates kick in: sanity band only (k=16 -> ~25% rel error)
    for g, r in kd.items():
        true = 101 if g == 0 else 100
        assert r["n_seen"] == 16
        assert 0.4 * true <= r["est_distinct"] <= 2.5 * true
    small = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "a")], "grp int, tok string"
    )
    ex = kmv_distinct(small, "grp", F.col("tok"), k=16).collect()[0]
    assert ex["n_seen"] == 2 and ex["est_distinct"] == 2   # exact under k


def test_hll_accuracy_and_merge(spark):
    from pyspark.sql import functions as SF
    from webcrawler_spark.pipeline.sketches import hll_distinct, hll_registers

    rows = (
        [(0, f"a{i}") for i in range(3000)]
        + [(1, f"b{i}") for i in range(100)]
        + [(2, "const")] * 500
    )
    df = spark.createDataFrame(rows, "grp int, k string")
    est = {r["grp"]: r["est_distinct"] for r in hll_distinct(df, "grp", F.col("k"), p=8).collect()}
    assert abs(est[0] - 3000) / 3000 < 0.10      # ~6.5% expected at p=8
    assert est[1] == 100                          # linear-counting regime: exact-ish
    assert est[2] == 1                            # duplicates collapse
    # merge = per-register MAX: halves merged equal the whole
    a = hll_registers(df.filter("grp = 0 and k < 'a5'"), "grp", F.col("k"))
    b = hll_registers(df.filter("grp = 0 and k >= 'a5'"), "grp", F.col("k"))
    merged = (
        a.unionByName(b).groupBy("grp", "reg").agg(SF.max("rho").alias("rho"))
    )
    whole = hll_registers(df.filter("grp = 0"), "grp", F.col("k"))
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_kmv_set_ops_overlap_estimates(spark):
    from webcrawler_spark.pipeline.sketches import kmv_set_ops

    # A = 0..599, B = 300..899: |A|=|B|=600, intersection 300, union 900
    rows = [("a", f"u{i}") for i in range(600)] + [
        ("b", f"u{i}") for i in range(300, 900)
    ]
    df = spark.createDataFrame(rows, "grp string, k string")
    r = kmv_set_ops(df, "grp", F.col("k"), "a", "b", k=64).collect()[0]
    assert r["n_union_sample"] == 64
    # true jaccard = 300/900 = 333 pm; k=64 -> ~12% rel error band
    assert 180 <= r["jaccard_pm"] <= 500, r
    assert 550 <= r["est_union"] <= 1350, r
    assert 140 <= r["est_intersection"] <= 520, r
    # disjoint sets: zero common, exact-union when samples cover everything
    small = spark.createDataFrame(
        [("a", f"x{i}") for i in range(20)] + [("b", f"y{i}") for i in range(20)],
        "grp string, k string",
    )
    r2 = kmv_set_ops(small, "grp", F.col("k"), "a", "b", k=64).collect()[0]
    assert r2["n_common"] == 0 and r2["est_union"] == 40
    assert r2["jaccard_pm"] == 0 and r2["est_intersection"] == 0
