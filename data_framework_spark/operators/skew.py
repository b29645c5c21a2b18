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


# --- scalar/vector math surface (SURVEY.md §2.8) ---------------------------


def q_scalar_fns_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scalar/vector helpers as column math, driver-
    checked: vector norm + unit-vector components (the unit_vec
    computation of Dataset.ndslice, dataset.py:240-243), sign relative
    to a global scalar (threshold masks, vpicdataset.py:531-533), and
    uniform-spacing arithmetic (uniform(), vpicdataset.py:18-22) on
    the hour grid. (The reference's seeded-RNG flood ordering is
    deliberately neutralized — SURVEY.md §2.8 — so no RNG appears.)

    Per event_type: v = (avg, stddev_pop) of value; emit |v|, v/|v|,
    sign(avg - global avg), and the grid spacing of the type's hour
    timeline including a uniformity flag."""
    ev = load_table(spark, sf_dir, "events")
    hours = F.floor(F.unix_micros("ts") / 3_600_000_000)
    per_type = ev.groupBy("event_type").agg(
        F.avg("value").alias("a"),
        F.stddev_pop("value").alias("s"),
        F.count_distinct(hours).alias("n_hours"),
        (F.max(hours) - F.min(hours)).alias("hour_span"),
    )
    g = per_type.agg(F.avg("a").alias("g_avg"))
    nrm = F.sqrt(F.col("a") * F.col("a") + F.col("s") * F.col("s"))
    return (
        per_type.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            F.round(nrm, 6).alias("norm"),
            # all-zero values make v = (0, 0) exactly on BOTH engines
            # (sums/deviations of exact zeros), so the unit vector is
            # 0/0 — guarded to NULL on both engines; NULL vs NaN is
            # DuckDB-version-dependent (see the spacing note above),
            # the guard pins it (round-11 sweep; same class as the
            # single-hour spacing).
            # The exact-0 comparison is engine-stable here because a
            # zero norm requires every value to be exactly 0 — a
            # cancellation residue (mixed ±x) leaves s > 0 and
            # nrm ≈ s, never a near-zero denominator.
            F.when(nrm > 0, F.round(F.col("a") / nrm, 6)).alias("unit_0"),
            F.when(nrm > 0, F.round(F.col("s") / nrm, 6)).alias("unit_1"),
            F.signum(F.col("a") - F.col("g_avg")).alias("sign_vs_global"),
            # spacing of an hour grid with every hour occupied is 1.
            # A type with a SINGLE distinct hour makes this 0/0.
            # Spark division yields NULL; DuckDB's depends on version
            # (1.0.0: NULL for any x/0; 1.1+ defaults
            # ieee_floating_point_ops=true → NaN), so the degenerate
            # case is guarded to NULL explicitly on BOTH engines —
            # version-portable semantics instead of an accidental
            # match (round-10 review item 5, precise diagnosis r11).
            F.when(
                F.col("n_hours") > 1,
                F.col("hour_span") / (F.col("n_hours") - 1),
            ).alias("spacing"),
            (F.col("hour_span") == F.col("n_hours") - 1).alias("uniform"),
        )
        .orderBy("event_type")
    )


# hour bucket: epoch_us // 3600e6, NOT epoch(ts)::BIGINT // 3600 —
# epoch() returns DOUBLE and the cast ROUNDS to the nearest second,
# so an event in the last 0.5 s of an hour would land in the next
# hour bucket while Spark's floor(unix_micros/3.6e9) keeps it
# (round-9 review; latent on the shipped data only because every
# hour is already occupied per type). Integer // truncation equals
# Spark's floor for these post-1970 (positive-epoch) timestamps.
Q_SCALAR_FNS_EVENTS_SQL = """
WITH per_type AS (
  SELECT event_type,
         avg(value) AS a,
         stddev_pop(value) AS s,
         count(DISTINCT epoch_us(ts) // 3600000000) AS n_hours,
         (max(epoch_us(ts) // 3600000000)
          - min(epoch_us(ts) // 3600000000)) AS hour_span
  FROM events GROUP BY event_type
),
g AS (SELECT avg(a) AS g_avg FROM per_type)
SELECT event_type,
       round(sqrt(a*a + s*s), 6) AS norm,
       CASE WHEN sqrt(a*a + s*s) > 0
            THEN round(a / sqrt(a*a + s*s), 6)
       END AS unit_0,
       CASE WHEN sqrt(a*a + s*s) > 0
            THEN round(s / sqrt(a*a + s*s), 6)
       END AS unit_1,
       sign(a - g_avg)::DOUBLE AS sign_vs_global,
       CASE WHEN n_hours > 1
            THEN (hour_span / (n_hours - 1))::DOUBLE
       END AS spacing,
       (hour_span = n_hours - 1) AS uniform
FROM per_type CROSS JOIN g
ORDER BY event_type
"""
