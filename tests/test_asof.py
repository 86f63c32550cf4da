"""as-of join and bucketized range join (operators/asof.py)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F


def _ts(m):
    return datetime(2024, 1, 1, 0, m, 0)


@pytest.fixture()
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, "h1", _ts(5)),
            (2, "h1", _ts(10)),
            (3, "h1", _ts(2)),   # before any right row
            (4, "h2", _ts(30)),  # host with a single old snapshot
            (5, "h3", _ts(7)),   # host with no right rows at all
        ],
        "event_id long, host string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("h1", _ts(4), 40.0),
            ("h1", _ts(10), 100.0),  # equal ts: <= semantics must match it
            ("h2", _ts(1), 10.0),
        ],
        "host string, ts timestamp, value double",
    )
    return left, right


def test_asof_join_backward_semantics(sides):
    from webcrawler_spark.operators.asof import asof_join

    left, right = sides
    out = {r["event_id"]: r for r in asof_join(left, right, on=["host"]).collect()}
    assert len(out) == 5                      # every left row survives
    assert out[1]["value"] == 40.0 and out[1]["ts_asof"] == _ts(4)
    assert out[2]["value"] == 100.0           # equal-ts right row matches (<=)
    assert out[3]["value"] is None            # nothing earlier
    assert out[4]["value"] == 10.0            # old snapshot still carried
    assert out[5]["value"] is None            # key absent from right


def test_asof_join_tolerance_nulls_stale_matches(sides):
    from webcrawler_spark.operators.asof import asof_join

    left, right = sides
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, on=["host"], tolerance_s=120.0
        ).collect()
    }
    assert out[1]["value"] == 40.0            # 60s old: fresh
    assert out[4]["value"] is None            # 29min old: stale, nulled
    assert out[4]["ts_asof"] is None


def test_asof_join_suffixes_colliding_payload(spark, sides):
    from webcrawler_spark.operators.asof import asof_join

    left, right = sides
    left2 = left.withColumn("value", F.lit(-1.0))
    out = asof_join(left2, right, on=["host"])
    assert "value_asof" in out.columns and "value" in out.columns
    row = {r["event_id"]: r for r in out.collect()}[1]
    assert row["value"] == -1.0 and row["value_asof"] == 40.0


def test_range_join_containment_and_bucket_edges(spark):
    from webcrawler_spark.operators.asof import range_join

    ev = spark.createDataFrame(
        [(1, "h1", _ts(5)), (2, "h1", _ts(8)), (3, "h2", _ts(5))],
        "event_id long, host string, ts timestamp",
    )
    iv = spark.createDataFrame(
        [
            ("h1", _ts(0), _ts(10)),
            ("h1", _ts(5), _ts(6)),    # overlapping: event 1 matches twice
            ("h2", _ts(6), _ts(30)),   # starts after event 3
        ],
        "host string, start_ts timestamp, end_ts timestamp",
    )
    # tiny bucket (60s) forces multi-bucket intervals: still no dup pairs
    got = sorted(
        (r["event_id"], r["start_ts"])
        for r in range_join(ev, iv, on=["host"], bucket_s=60).collect()
    )
    assert got == [(1, _ts(0)), (1, _ts(5)), (2, _ts(0))]
    # inclusive boundaries
    edge = range_join(
        spark.createDataFrame([(9, "h1", _ts(10))], "event_id long, host string, ts timestamp"),
        iv, on=["host"], bucket_s=60,
    ).collect()
    assert [r["event_id"] for r in edge] == [9]


def test_range_join_plan_has_no_nested_loop(spark):
    from webcrawler_spark.operators.asof import range_join

    ev = spark.createDataFrame(
        [(1, "h1", _ts(5))], "event_id long, host string, ts timestamp"
    )
    iv = spark.createDataFrame(
        [("h1", _ts(0), _ts(10))],
        "host string, start_ts timestamp, end_ts timestamp",
    )
    plan = range_join(ev, iv, on=["host"])._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_join_matches_sequential_oracle_on_random_data(spark):
    """500 seeded-random left rows x 200 right rows over 20 keys, checked
    against an independent pure-Python as-of implementation — the pattern
    the engine uses everywhere: distributed op vs sequential oracle."""
    import random

    from webcrawler_spark.operators.asof import asof_join

    rng = random.Random(42)
    left_rows = [
        (i, f"h{rng.randrange(20)}", datetime(2024, 1, 1) + timedelta(seconds=rng.randrange(0, 43200)))
        for i in range(500)
    ]
    right_rows = [
        (f"h{rng.randrange(20)}", datetime(2024, 1, 1) + timedelta(seconds=rng.randrange(0, 43200)), float(j))
        for j in range(200)
    ]
    left = spark.createDataFrame(left_rows, "event_id long, host string, ts timestamp")
    right = spark.createDataFrame(right_rows, "host string, ts timestamp, value double")

    got = {
        r["event_id"]: (r["ts_asof"], r["value"])
        for r in asof_join(left, right, on=["host"]).collect()
    }
    # sequential oracle: latest right row with rts <= ts per key; ties on
    # identical rts broken by the larger payload struct (matching the
    # window's (_ats, _side, _rp) order)
    by_host = {}
    for h, rts, v in right_rows:
        by_host.setdefault(h, []).append((rts, v))
    for h in by_host:
        by_host[h].sort()
    import bisect

    assert len(got) == 500
    for i, h, ts in left_rows:
        cands = by_host.get(h, [])
        pos = bisect.bisect_right(cands, (ts, float("inf")))
        want = cands[pos - 1] if pos else None
        if want is None:
            assert got[i] == (None, None)
        else:
            assert got[i] == want, (i, h, ts, got[i], want)


def test_asof_join_ignores_null_right_ts(spark):
    """Right rows with a NULL timestamp must never match (DuckDB ASOF JOIN /
    pandas merge_asof semantics) — before the r4 fix they sorted nulls-first
    in the carry window and leaked their payload into every left row that
    preceded the first real right row (ADVICE r3)."""
    from webcrawler_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "h1", _ts(1)), (2, "h1", _ts(10))],
        "event_id long, host string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("h1", None, 999.0), ("h1", _ts(5), 50.0)],
        "host string, ts timestamp, value double",
    )
    out = {r["event_id"]: r for r in asof_join(left, right, on=["host"]).collect()}
    # event 1 precedes every real right row: NO match, not the null-ts payload
    assert out[1]["value"] is None and out[1]["ts_asof"] is None
    assert out[2]["value"] == 50.0
