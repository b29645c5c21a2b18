"""Edge semantics of the temporal joins on hand-built frames: the
oracle parity test pins them against DuckDB's native ASOF JOIN / range
predicate on real data; these pin the corner cases explicitly."""

import datetime

from pyspark.sql import functions as F

from data_framework_spark.operators.asof import asof_join
from data_framework_spark.operators.rangejoin import bucketed_range_join


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_inclusive_tie_and_inner_drop(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:00:10")),  # exact tie with right
            (2, 10, _ts("2024-01-01T00:00:05")),  # before any right → drop
            (3, 20, _ts("2024-01-01T00:01:00")),  # other key, later
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T00:00:10"), 1.0),
            (20, _ts("2024-01-01T00:00:30"), 2.0),
            (20, _ts("2024-01-01T00:00:50"), 3.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: (r["value_r"], r["ts_r"])
        for r in asof_join(
            left, right, by="user_id", ts="ts", right_payload=["value"]
        ).collect()
    }
    assert set(out) == {1, 3}  # event 2 dropped (no prior right row)
    assert out[1][0] == 1.0  # equal timestamp matches (inclusive)
    assert out[3][0] == 3.0  # latest prior, not first


def test_asof_null_payload_is_a_valid_match(spark):
    """A right row whose payload is NULL must still win the as-of
    match: the left row gets (NULL payload, that row's ts), never an
    older row's payload paired with the newer ts (the frankenstein
    match independent per-column last() calls would produce)."""
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:01:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts("2024-01-01T00:00:10"), 7.0),   # older, non-null
            (10, _ts("2024-01-01T00:00:30"), None),  # latest prior, NULL
        ],
        "user_id long, ts timestamp, value double",
    )
    rows = asof_join(
        left, right, by="user_id", ts="ts", right_payload=["value"]
    ).collect()
    assert len(rows) == 1
    assert rows[0]["value_r"] is None  # NOT 7.0
    assert rows[0]["ts_r"] == _ts("2024-01-01T00:00:30")


def test_range_join_boundaries(spark):
    hour_us = 3_600_000_000
    left = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01T02:00:00"))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (5, _ts("2024-01-01T01:00:00"), 1.0),  # exactly W before: IN
            (5, _ts("2024-01-01T00:59:59"), 2.0),  # just older: OUT
            (5, _ts("2024-01-01T02:00:00"), 3.0),  # equal: IN
            (5, _ts("2024-01-01T02:00:01"), 4.0),  # future: OUT
            (6, _ts("2024-01-01T01:30:00"), 5.0),  # other key: OUT
        ],
        "user_id long, ts timestamp, value double",
    )
    vals = sorted(
        r["value_r"]
        for r in bucketed_range_join(
            left, right, by="user_id", ts="ts", window_us=hour_us,
            right_payload=["value"],
        ).collect()
    )
    assert vals == [1.0, 3.0]
