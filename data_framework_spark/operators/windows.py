"""Window-function kernels: running sums, discrete gradients, flux ψ.

The reference's numeric core is (a) prefix sums along a spatial axis —
the flux-function integral, `np.cumsum(b2*d0, axis=1)` /
`np.cumsum(-b1*d1, axis=2)` (src/datasets/vpicdataset.py:287,290) —
and (b) central-difference gradients with one-sided edges,
`np.gradient` (vpicdataset.py:378-379). Both are SQL window functions:

- cumsum  → `sum(v) OVER (PARTITION BY series ORDER BY axis
             ROWS UNBOUNDED PRECEDING)`
- gradient → `lag`/`lead` + the np.gradient non-uniform-spacing
             formula; one-sided difference at the two edges.

Scale posture: each window partitions by a bounded key (one user, one
timestep row/column strip), so per-partition state is a single running
accumulator — Spark streams it without materializing the partition.
Skewed series keys are the one risk at 100 TB; AQE skew handling plus
(if needed) range-splitting a monster series with a secondary bucket
key are the mitigations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table


def running_sum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    partition_cols: list[str],
    out_col: str = "running",
) -> DataFrame:
    """Per-series prefix sum (the cumsum at vpicdataset.py:287)."""
    w = (
        W.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def central_gradient(
    df: DataFrame,
    value_col: str,
    coord_col: str,
    partition_cols: list[str],
    out_col: str = "grad",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """np.gradient semantics over an ordered series.

    Interior points use the non-uniform central-difference formula
    np.gradient documents:
        g = (h0²·f1 - (h0²-h1²)·f0 - h1²·f_-1) / (h0·h1·(h0+h1))
    with h1 = x0-x_-1, h0 = x1-x0 (reduces to (f1-f_-1)/(x1-x_-1)
    for uniform spacing). Edges are one-sided differences.

    `tiebreak_cols` make the lag/lead pairing deterministic when two
    rows share a coordinate — without a unique tiebreak the window
    order (and hence which row is "previous") is engine- and even
    run-dependent (round-9 review; the other window ops here already
    order by (ts, event_id) for exactly this reason).
    """
    w = W.partitionBy(*partition_cols).orderBy(
        coord_col, *(tiebreak_cols or [])
    )
    x = F.col(coord_col)
    v = F.col(value_col)
    x_prev, v_prev = F.lag(x).over(w), F.lag(v).over(w)
    x_next, v_next = F.lead(x).over(w), F.lead(v).over(w)
    h1 = x - x_prev  # spacing to previous sample
    h0 = x_next - x  # spacing to next sample
    interior = (
        (h1 * h1 * v_next - (h1 * h1 - h0 * h0) * v - h0 * h0 * v_prev)
        / (h0 * h1 * (h0 + h1))
    )
    # np.gradient's non-uniform interior weights: note h1=x_i-x_{i-1} is
    # "hs" and h0=x_{i+1}-x_i is "hd" in numpy's notation; the formula
    # above is symmetric so the assignment order doesn't matter.
    first = (v_next - v) / h0
    last = (v - v_prev) / h1
    grad = (
        F.when(x_prev.isNull() & x_next.isNull(), F.lit(None))
        .when(x_prev.isNull(), first)
        .when(x_next.isNull(), last)
        .otherwise(interior)
    )
    return df.withColumn(out_col, grad)


def flux_function_grid(
    grid: DataFrame,
    b1_col: str = "b1",
    b2_col: str = "b2",
    i0: str = "i0",
    i1: str = "i1",
    d0: float = 1.0,
    d1: float = 1.0,
) -> DataFrame:
    """Magnetic-flux ψ on a uniform 2-D grid (calc_fluxfn).

    ψ[i,j] = Σ_{i'≤i} b2[i',0]·d0 − Σ_{j'≤j} b1[i,j']·d1
    (vpicdataset.py:286-291). Two chained window prefix sums:
    the first over the j=0 column ordered by i (its result broadcast
    to the row via a second window max — the column value is constant
    per i), the second along each row ordered by j.
    """
    w_col0 = (
        W.partitionBy(F.lit(1))
        .orderBy(i0)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # prefix sum of b2 down the first column (j = 0)
    col0 = (
        grid.filter(F.col(i1) == 0)
        .withColumn("psi_col0", F.sum(F.col(b2_col) * F.lit(d0)).over(w_col0))
        .select(i0, "psi_col0")
    )
    w_row = (
        W.partitionBy(i0)
        .orderBy(i1)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        grid.join(F.broadcast(col0), on=i0, how="inner")
        .withColumn("row_int", F.sum(F.col(b1_col) * F.lit(d1)).over(w_row))
        # np.cumsum includes the first element, so both prefix sums start
        # at index 0 — ψ = cumsum(b2[:,0]·d0)[i] + cumsum(-b1·d1, axis=1)[i,j]
        .withColumn("psi", F.col("psi_col0") - F.col("row_int"))
        .drop("psi_col0", "row_int")
    )


# --- driver-checkable query instantiations over the test tables ------------


def q_running_sum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running total of event value ordered by time."""
    ev = load_table(spark, sf_dir, "events")
    out = running_sum(
        ev, "value", ["ts", "event_id"], ["user_id"], out_col="running_value"
    )
    return out.select(
        "event_id", "user_id", "ts", F.round("running_value", 4).alias("running_value")
    )


Q_RUNNING_SUM_EVENTS_SQL = """
SELECT
  event_id,
  user_id,
  ts,
  round(sum(value) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value
FROM events
"""


def q_gradient_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """np.gradient of value w.r.t. time (epoch seconds), per user."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "t_epoch", F.col("ts").cast("double")
    )
    out = central_gradient(
        ev, "value", "t_epoch", ["user_id"],
        out_col="dv_dt", tiebreak_cols=["event_id"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.round("t_epoch", 6).alias("t_epoch"),
        F.round("dv_dt", 8).alias("dv_dt"),
    )


Q_GRADIENT_EVENTS_SQL = """
WITH s AS (
  SELECT
    event_id,
    user_id,
    epoch(ts)::DOUBLE AS t_epoch,
    value,
    lag(epoch(ts)::DOUBLE)  OVER w AS x_prev,
    lead(epoch(ts)::DOUBLE) OVER w AS x_next,
    lag(value)  OVER w AS v_prev,
    lead(value) OVER w AS v_next
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)::DOUBLE, event_id)
)
SELECT
  event_id,
  user_id,
  round(t_epoch, 6) AS t_epoch,
  round(
    CASE
      WHEN x_prev IS NULL AND x_next IS NULL THEN NULL
      WHEN x_prev IS NULL THEN (v_next - value) / (x_next - t_epoch)
      WHEN x_next IS NULL THEN (value - v_prev) / (t_epoch - x_prev)
      ELSE (
        (t_epoch - x_prev) * (t_epoch - x_prev) * v_next
        - ((t_epoch - x_prev) * (t_epoch - x_prev)
           - (x_next - t_epoch) * (x_next - t_epoch)) * value
        - (x_next - t_epoch) * (x_next - t_epoch) * v_prev
      ) / ((x_next - t_epoch) * (t_epoch - x_prev) * ((x_next - t_epoch) + (t_epoch - x_prev)))
    END, 8) AS dv_dt
FROM s
"""


def q_fluxfn_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """calc_fluxfn on a 16×16 grid derived deterministically from lineitem.

    The grid derivation (orderkey/partkey modulo 16, summed quantity /
    price as the two field components) is identical in the oracle SQL,
    so the hash check pins the two-chained-cumsum semantics
    (vpicdataset.py:286-291).
    """
    from data_framework_spark.operators.raster_queries import lineitem_cells

    grid = lineitem_cells(
        spark,
        sf_dir,
        F.sum("l_quantity").alias("b1"),
        (F.sum("l_extendedprice") / 100000.0).alias("b2"),
    )
    out = flux_function_grid(grid, d0=0.5, d1=0.25)
    return out.select("i0", "i1", F.round("psi", 4).alias("psi"))


def _fluxfn_sql() -> str:
    from data_framework_spark.operators.raster_queries import grid_cells_sql

    cells = grid_cells_sql(
        "sum(l_quantity)           AS b1,\n"
        "    sum(l_extendedprice) / 100000.0 AS b2"
    )
    return f"""
WITH grid AS ({cells}
),
col0 AS (
  SELECT i0,
         sum(b2 * 0.5) OVER (ORDER BY i0
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS psi_col0
  FROM grid WHERE i1 = 0
),
rows_int AS (
  SELECT i0, i1,
         sum(b1 * 0.25) OVER (PARTITION BY i0 ORDER BY i1
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS row_int
  FROM grid
)
SELECT r.i0, r.i1, round(c.psi_col0 - r.row_int, 4) AS psi
FROM rows_int r JOIN col0 c ON r.i0 = c.i0
"""


Q_FLUXFN_GRID_SQL = _fluxfn_sql()
