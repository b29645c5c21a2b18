"""Time-series resampling: interpolate series onto a regular grid.

The per-series analog of the grid line slice (SURVEY.md §2.9) for
irregular event streams: for each series, linearly interpolate
`value` at fixed sample times. Implemented as the standard
segment-join: consecutive-pair segments via `lead`, range-joined to
the (tiny, broadcast) sample grid, interpolation weight as a column
expression — all JVM-side.

Scale: segments shuffle once on the series key (the `lead` window);
the grid is a broadcast. The range join is a BroadcastNestedLoop of
|segments|·|grid| predicate checks per series — fine while the grid
is bounded; for dense grids, bucket both sides by time window to make
it an equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table


def interp_at(
    df: DataFrame,
    series_col: str,
    time_col: str,
    value_col: str,
    grid: DataFrame,
    method: str = "linear",
    grid_col: str = "s",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Interpolate each series at the sample times in `grid(grid_col)`.

    Samples strictly inside a segment [t0, t1) interpolate between its
    endpoints; times outside a series' span produce no row (matching
    the line slice's clip-to-box semantics, statmeshvar.py:166-183).
    The grid's sample column is aliased internally, so any `grid_col`
    name works; `tiebreak_cols` make the lead pairing deterministic
    when two rows share a time (round-9 review).
    """
    if method not in ("linear", "nearest"):
        raise ValueError(f"method {method!r} not supported (linear|nearest)")
    reserved = {"s", "t0", "v0", "t1", "v1"}
    if series_col in reserved:
        raise ValueError(
            f"series_col {series_col!r} collides with a reserved "
            f"output/segment column name ({sorted(reserved)})"
        )
    w = W.partitionBy(series_col).orderBy(
        time_col, *(tiebreak_cols or [])
    )
    seg = (
        df.select(
            series_col,
            F.col(time_col).alias("t0"),
            F.col(value_col).alias("v0"),
            F.lead(time_col).over(w).alias("t1"),
            F.lead(value_col).over(w).alias("v1"),
        )
        .filter(F.col("t1").isNotNull())
    )
    gs = grid.select(F.col(grid_col).alias("__s"))
    j = seg.join(
        F.broadcast(gs),
        (F.col("__s") >= F.col("t0")) & (F.col("__s") < F.col("t1")),
    )
    frac = (F.col("__s") - F.col("t0")) / (F.col("t1") - F.col("t0"))
    if method == "linear":
        val = F.col("v0") + (F.col("v1") - F.col("v0")) * frac
    else:
        val = F.when(frac > 0.5, F.col("v1")).otherwise(F.col("v0"))
    return j.select(
        series_col, F.col("__s").alias("s"), val.alias("value")
    )


def _hourly_grid(spark: SparkSession, start: str, end: str) -> DataFrame:
    """Epoch-second sample grid, one row per hour in [start, end)."""
    return spark.sql(
        f"""
        SELECT explode(sequence(
          unix_timestamp(timestamp'{start}'),
          unix_timestamp(timestamp'{end}') - 1,
          3600)) AS s
        """
    ).select(F.col("s").cast("double").alias("s"))


# --- driver-checkable query instantiations ---------------------------------

GRID_START = "2024-01-02 00:00:00"
GRID_END = "2024-01-04 00:00:00"


def q_interp_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly linear interpolation of event values."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "t_epoch", F.col("ts").cast("double")
    )
    grid = _hourly_grid(spark, GRID_START, GRID_END)
    out = interp_at(
        ev, "user_id", "t_epoch", "value", grid, "linear",
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "user_id",
        F.round("s", 1).alias("s"),
        F.round("value", 6).alias("value"),
    )


Q_INTERP_EVENTS_SQL = f"""
WITH seg AS (
  SELECT
    user_id,
    epoch(ts)::DOUBLE AS t0,
    value AS v0,
    lead(epoch(ts)::DOUBLE) OVER w AS t1,
    lead(value) OVER w AS v1
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)::DOUBLE, event_id)
),
grid AS (
  SELECT epoch(g)::DOUBLE AS s
  FROM generate_series(TIMESTAMP '{GRID_START}',
                       TIMESTAMP '{GRID_END}' - INTERVAL 1 SECOND,
                       INTERVAL 1 HOUR) AS t(g)
)
SELECT
  user_id,
  round(s, 1) AS s,
  round(v0 + (v1 - v0) * (s - t0) / (t1 - t0), 6) AS value
FROM seg JOIN grid ON s >= t0 AND s < t1
WHERE t1 IS NOT NULL
"""
