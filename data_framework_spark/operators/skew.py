"""Skew-resistant aggregation: explicit salting.

`events.event_type` has ~5 distinct values over the whole table — the
degenerate key distribution where a naive `groupBy(key).agg(
countDistinct(...))` funnels every row of a hot key through one
reducer. (Plain algebraic aggs — count/sum/min/max — don't need this:
Spark's map-side partial aggregation already collapses them before
the shuffle.)

The salted decomposition for EXACT count-distinct: salt by
`hash(distinct_col) % n_salt`, so every occurrence of the same
distinct value lands in the same (key, salt) group. Stage 1 counts
distinct within each of the n_salt sub-groups (parallel across
reducers); stage 2 SUMS the partial counts — correct because the
salt partitions the distinct-value space, making partial counts
additive. Hot-key work is now spread over n_salt reducers, and stage
2 handles only keys × n_salt tiny rows. Same pattern handles skewed
join keys (salt the hot side, replicate the other); AQE's
skew-join split covers the join case automatically, but aggregation
salting must be explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table


def salted_count_distinct(
    df: DataFrame, key: str, distinct_col: str, n_salt: int = 16
) -> DataFrame:
    """Exact count(DISTINCT distinct_col) per key, two-stage via a
    hash-salt on the distinct column: returns (key, n_distinct)."""
    stage1 = (
        df.withColumn("__salt", F.pmod(F.xxhash64(F.col(distinct_col)), n_salt))
        .groupBy(key, "__salt")
        .agg(F.countDistinct(distinct_col).alias("__part"))
    )
    return stage1.groupBy(key).agg(F.sum("__part").alias("n_distinct"))


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type (5 hot keys over the whole table): exact
    distinct-user count via the salted two-stage plan, plus plain
    algebraic aggregates for contrast. Oracle recomputes with a
    direct COUNT(DISTINCT) — identical results, different physical
    plan."""
    ev = load_table(spark, sf_dir, "events")
    distinct_users = salted_count_distinct(ev, "event_type", "user_id").select(
        "event_type", F.col("n_distinct").alias("n_users")
    )
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return (
        plain.join(F.broadcast(distinct_users), "event_type")
        .select("event_type", "n_users", "n_events", "total_value")
        .orderBy("event_type")
    )


Q_SKEW_SALTED_AGG_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""
