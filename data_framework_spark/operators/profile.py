"""Data-profiling / analytic-SQL surface: exact percentiles, bounded
window frames, CUBE multi-level aggregation, and pivot — the shapes a
profiling pass over a training corpus runs before any heavy job.

All pure built-in column expressions (JVM-side); each oracle states
the identical ANSI semantics in DuckDB:
- `percentile(col, q)` (exact, linear interpolation) == DuckDB
  `quantile_cont`;
- ROWS BETWEEN frames are engine-independent by definition;
- CUBE null-markers compare via grouping() flags lifted into label
  columns (the raw NULL group keys would collide with real NULLs);
- pivot == conditional aggregation, stated as FILTER clauses in SQL.

Scale: percentiles per group shuffle once on the group key (exact
percentile needs the group's values together — for corpus-wide
profiling at 100 TB switch to approx_percentile, which is partial-
aggregatable; documented trade, not the driver-checked path since
sketch results are engine-specific). Frames/cube/pivot are ordinary
partial-aggregated shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table


def q_profile_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per return-flag price distribution: exact median / p90 / p99,
    plus spread. The 100 TB variant swaps percentile→approx_percentile
    (mergeable sketches); exact is the oracle-checkable contract."""
    li = load_table(spark, sf_dir, "lineitem")
    # one percentile aggregate with an array of quantiles: the group's
    # value buffer is built once, not once per requested percentile
    pcts = F.expr("percentile(l_extendedprice, array(0.5D, 0.9D, 0.99D))")
    return (
        li.groupBy("l_returnflag")
        .agg(
            pcts.alias("__p"),
            F.round(
                F.max("l_extendedprice") - F.min("l_extendedprice"), 4
            ).alias("price_range"),
        )
        .select(
            "l_returnflag",
            F.round(F.element_at("__p", 1), 4).alias("p50"),
            F.round(F.element_at("__p", 2), 4).alias("p90"),
            F.round(F.element_at("__p", 3), 4).alias("p99"),
            "price_range",
        )
        .orderBy("l_returnflag")
    )


Q_PROFILE_PERCENTILES_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
       round(max(l_extendedprice) - min(l_extendedprice), 4) AS price_range
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q_moving_average_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 4-event moving average and peak (ROWS BETWEEN
    3 PRECEDING AND CURRENT ROW) — the bounded-frame window shape of
    rolling features. Restricted to users < 20 to keep the checked
    output compact; the frame itself is cardinality-independent."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("moving_avg"),
        F.round(F.max("value").over(w), 2).alias("moving_max"),
    ).orderBy("event_id")


Q_MOVING_AVERAGE_EVENTS_SQL = """
SELECT event_id, user_id,
       round(avg(value) OVER w, 6) AS moving_avg,
       round(max(value) OVER w, 2) AS moving_max
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def q_rolling_median_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling MEDIAN over the trailing 10 events — the
    robust-statistics sibling of the moving average (outlier-resistant
    rolling features). Exact interpolated percentile per bounded frame
    (Spark percentile == DuckDB quantile_cont), deterministic frame
    order via the (ts, event_id) tie-break. Window cost is
    O(frame log frame) per row and partition-parallel by user — no
    repartition beyond the window's own shuffle."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.percentile("value", 0.5).over(w), 6).alias("rolling_med"),
    ).orderBy("event_id")


Q_ROLLING_MEDIAN_EVENTS_SQL = """
SELECT event_id, user_id,
       round(quantile_cont(value, 0.5) OVER w, 6) AS rolling_med
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (orderstatus, orderpriority): all four aggregation
    levels in one pass. grouping() flags are lifted into explicit
    'ALL' labels so subtotal rows are unambiguous (and hashable
    cross-engine)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            # grouping() is only valid inside the cube aggregate
            F.grouping("o_orderstatus").alias("__gs"),
            F.grouping("o_orderpriority").alias("__gp"),
        )
        .select(
            F.when(F.col("__gs") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderstatus"))
            .alias("status"),
            F.when(F.col("__gp") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderpriority"))
            .alias("priority"),
            "n_orders",
            "total",
        )
        .orderBy("status", "priority")
    )


Q_CUBE_ORDERS_SQL = """
SELECT
  CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL' ELSE o_orderstatus END AS status,
  CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority,
  count(*) AS n_orders,
  round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


def q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events pivoted to one column per event_type (count + value sum
    per user): Spark's `pivot` with an EXPLICIT value list — at scale
    the implicit list triggers a distinct-scan planning pass, so the
    vocabulary is pinned. Oracle states the same table as FILTERed
    conditional aggregates."""
    types = ["click", "error", "purchase", "signup", "view"]
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("v"),
        )
        .orderBy("user_id")
    )
    # pivot emits NULL for absent (user, type) cells; normalize counts
    # to 0 so the oracle's count(*) FILTER semantics match
    for t in types:
        out = out.withColumn(f"{t}_n", F.coalesce(F.col(f"{t}_n"), F.lit(0)))
    return out


def _pivot_sql() -> str:
    types = ["click", "error", "purchase", "signup", "view"]
    cols = ",\n  ".join(
        f"count(*) FILTER (event_type = '{t}') AS {t}_n,\n"
        f"  round(sum(value) FILTER (event_type = '{t}'), 2) AS {t}_v"
        for t in types
    )
    return f"""
SELECT user_id,
  {cols}
FROM events
WHERE user_id < 30
GROUP BY user_id
ORDER BY user_id
"""


Q_PIVOT_EVENTS_SQL = _pivot_sql()
