"""Bounded-interval range join — the scale path for temporal windows.

"Left rows matched to right rows with ts in [left.ts - W, left.ts]"
expressed naively is an inequality join, which Spark executes as a
broadcast-nested-loop or a per-key cartesian — quadratic in the hot
keys. The bucketed plan makes it an EQUI-join: quantize both sides to
buckets of width W, explode the right side to its bucket and the next
one (every interval of width W spans at most two W-buckets), equi-join
on (key, bucket), then apply the exact range predicate as a cheap
post-filter. Work is linear in true matches + one bounded duplication
factor (2×) — the standard interval-join strategy (Flink's interval
join and range-join optimizers in Databricks/Trino use the same
quantization idea).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    window_us: int,
    right_payload: list[str],
    suffix: str = "_r",
) -> DataFrame:
    """Inner join of left to right rows with
    right.ts in [left.ts - window_us, left.ts], same `by` key.
    Equi-join on (by, W-bucket) with the right side exploded to its
    two covering buckets; exact predicate applied post-join."""
    l = left.withColumn(
        "__b", F.floor(F.unix_micros(ts) / window_us).cast("long")
    )
    r = (
        right.select(
            F.col(by),
            F.unix_micros(ts).alias("__rts"),
            *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
        )
        .withColumn("__rb", F.floor(F.col("__rts") / window_us).cast("long"))
        .withColumn("__b", F.explode(F.array(F.col("__rb"), F.col("__rb") + 1)))
        .drop("__rb")
    )
    joined = l.join(r, [by, "__b"]).filter(
        (F.col("__rts") >= F.unix_micros(ts) - F.lit(window_us))
        & (F.col("__rts") <= F.unix_micros(ts))
    )
    return joined.drop("__b")


def q_range_join_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per 'error' event: count and value-sum of the same user's
    'click' events in the preceding hour — the bucketed range join
    aggregated per left row. Oracle states the range predicate
    directly; the bucketed plan must reproduce it exactly (inclusive
    both ends)."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    hour_us = 3_600_000_000
    j = bucketed_range_join(
        errors, clicks, by="user_id", ts="ts", window_us=hour_us,
        right_payload=["value"],
    )
    return (
        j.groupBy("event_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.round(F.sum("value_r"), 2).alias("click_value_sum"),
        )
        .orderBy("event_id")
    )


Q_RANGE_JOIN_CLICKS_SQL = """
SELECT e.event_id, e.user_id,
       count(*) AS n_clicks,
       round(sum(c.value), 2) AS click_value_sum
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id
 AND c.ts >= e.ts - INTERVAL 1 HOUR
 AND c.ts <= e.ts
GROUP BY e.event_id, e.user_id
ORDER BY e.event_id
"""
