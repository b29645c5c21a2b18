"""Aggregation operators: bounds, σ-thresholds, per-label extrema.

Reference semantics reproduced (citations → /root/reference):
- `StatMeshVar.bounds` / `Dataset.bounds`: [min, max] of the time and
  space coordinate arrays (src/variables/statmeshvar.py:35-59,
  src/datasets/dataset.py:152-181). We implement the DOCUMENTED
  intent — min of mins / max of maxes — not the `np.minimum`-on-both
  bug at dataset.py:178-179 (deviation recorded in SURVEY.md §2.4).
- 3σ outlier thresholds: `mean ± 3·std` with NumPy's POPULATION std
  (ddof=0), vpicdataset.py:486-487 → `stddev_pop`, never Spark's
  default sample `stddev`.
- per-label extrema value + position: `nd.maximum/minimum(...)` and
  `nd.maximum_position/minimum_position` (vpicdataset.py:493-501) →
  grouped max/min plus a deterministic rank-1 row per group.

All are single-shuffle grouped aggregations with map-side partial
aggregation; the 3σ filter is two passes (tiny scalar agg broadcast
into a scan filter) — at 100 TB the second pass re-reads only the
columns it needs and the scalar side is a one-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table


def bounds(df: DataFrame, cols: list[str], group_cols: list[str] | None = None) -> DataFrame:
    """[min, max] per column, optionally per group (documented-intent
    version of Dataset.bounds, dataset.py:152-181)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def sigma_threshold(
    df: DataFrame, value_col: str, n_sigma: float = 3.0, side: str = "above"
) -> DataFrame:
    """Rows beyond mean ± n·stddev_pop (vpicdataset.py:486-487).

    Population stddev to match np.std(ddof=0). The scalar aggregate is
    cross-joined back (a 1-row broadcast, no shuffle of the big side).
    """
    stats = df.agg(
        F.avg(value_col).alias("__mu"), F.stddev_pop(value_col).alias("__sd")
    )
    joined = df.crossJoin(F.broadcast(stats))
    if side == "above":
        pred = F.col(value_col) > F.col("__mu") + n_sigma * F.col("__sd")
    elif side == "below":
        pred = F.col(value_col) < F.col("__mu") - n_sigma * F.col("__sd")
    else:
        raise ValueError(f"side must be 'above' or 'below', got {side!r}")
    return joined.filter(pred).drop("__mu", "__sd")


def label_extrema(
    df: DataFrame,
    label_col: str,
    value_col: str,
    position_cols: list[str],
) -> DataFrame:
    """Per-label max/min value and the (deterministic) argmax position.

    scipy.ndimage.maximum/minimum + *_position semantics
    (vpicdataset.py:493-501): value extrema via grouped agg; position
    of the extremum via a rank-1 window ordered (value DESC, position
    ASC) so ties resolve identically in any engine.
    """
    w_max = W.partitionBy(label_col).orderBy(
        F.col(value_col).desc(), *[F.col(c).asc() for c in position_cols]
    )
    w_min = W.partitionBy(label_col).orderBy(
        F.col(value_col).asc(), *[F.col(c).asc() for c in position_cols]
    )
    ranked = df.withColumn("__rmax", F.row_number().over(w_max)).withColumn(
        "__rmin", F.row_number().over(w_min)
    )
    maxes = ranked.filter(F.col("__rmax") == 1).select(
        F.col(label_col),
        F.col(value_col).alias("max_value"),
        *[F.col(c).alias(f"max_{c}") for c in position_cols],
    )
    mins = ranked.filter(F.col("__rmin") == 1).select(
        F.col(label_col),
        F.col(value_col).alias("min_value"),
        *[F.col(c).alias(f"min_{c}") for c in position_cols],
    )
    return maxes.join(mins, on=label_col, how="inner")


# --- driver-checkable query instantiations over the test tables ------------


def q_bounds_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset.bounds analog: per-variable (event_type) time+value bounds."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "t_epoch", F.col("ts").cast("double")
    )
    out = bounds(ev, ["t_epoch", "value"], group_cols=["event_type"])
    return out.select(
        "event_type",
        F.round("t_epoch_min", 6).alias("t_min"),
        F.round("t_epoch_max", 6).alias("t_max"),
        F.round("value_min", 4).alias("value_min"),
        F.round("value_max", 4).alias("value_max"),
    )


Q_BOUNDS_EVENTS_SQL = """
SELECT
  event_type,
  round(min(epoch(ts)::DOUBLE), 6) AS t_min,
  round(max(epoch(ts)::DOUBLE), 6) AS t_max,
  round(min(value), 4) AS value_min,
  round(max(value), 4) AS value_max
FROM events
GROUP BY event_type
"""


def q_sigma_threshold_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3σ outliers of l_extendedprice (population stddev, as the
    reference's np.std)."""
    li = load_table(spark, sf_dir, "lineitem")
    # 1.5σ on the 'above' side: l_extendedprice is bounded (price
    # model), so ≥2σ selects zero rows at test SFs; 1.5σ keeps the
    # check populated while pinning the same mean/stddev_pop semantics.
    out = sigma_threshold(li, "l_extendedprice", n_sigma=1.5, side="above")
    return out.select(
        "l_orderkey", "l_linenumber", F.round("l_extendedprice", 2).alias("price")
    )


Q_SIGMA_THRESHOLD_LINEITEM_SQL = """
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM lineitem
WHERE l_extendedprice > (
  SELECT avg(l_extendedprice) + 1.5 * stddev_pop(l_extendedprice) FROM lineitem
)
"""


def q_label_extrema_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event_type extrema value and argmax/argmin event position."""
    ev = load_table(spark, sf_dir, "events")
    out = label_extrema(ev, "event_type", "value", ["event_id"])
    return out.select(
        "event_type",
        F.round("max_value", 4).alias("max_value"),
        "max_event_id",
        F.round("min_value", 4).alias("min_value"),
        "min_event_id",
    )


def q_bounds_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset.bounds analog on lineitem — events-independent hedge so
    §2.4 coverage survives an events-loader regression (round-1
    postmortem: one loader bug wiped every §2.4 driver entry)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = bounds(
        li, ["l_quantity", "l_extendedprice", "l_discount"], group_cols=["l_returnflag"]
    )
    return out.select(
        "l_returnflag",
        F.round("l_quantity_min", 4).alias("qty_min"),
        F.round("l_quantity_max", 4).alias("qty_max"),
        F.round("l_extendedprice_min", 4).alias("price_min"),
        F.round("l_extendedprice_max", 4).alias("price_max"),
        F.round("l_discount_min", 4).alias("disc_min"),
        F.round("l_discount_max", 4).alias("disc_max"),
    )


Q_BOUNDS_LINEITEM_SQL = """
SELECT
  l_returnflag,
  round(min(l_quantity), 4)      AS qty_min,
  round(max(l_quantity), 4)      AS qty_max,
  round(min(l_extendedprice), 4) AS price_min,
  round(max(l_extendedprice), 4) AS price_max,
  round(min(l_discount), 4)      AS disc_min,
  round(max(l_discount), 4)      AS disc_max
FROM lineitem
GROUP BY l_returnflag
"""


def q_label_extrema_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-linestatus extrema + deterministic arg-positions on lineitem
    (events-independent §2.4 hedge, same rank-1 tie-break rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = label_extrema(
        li, "l_linestatus", "l_extendedprice", ["l_orderkey", "l_linenumber"]
    )
    return out.select(
        "l_linestatus",
        F.round("max_value", 4).alias("max_value"),
        F.col("max_l_orderkey").alias("max_orderkey"),
        F.col("max_l_linenumber").alias("max_linenumber"),
        F.round("min_value", 4).alias("min_value"),
        F.col("min_l_orderkey").alias("min_orderkey"),
        F.col("min_l_linenumber").alias("min_linenumber"),
    )


Q_LABEL_EXTREMA_LINEITEM_SQL = """
WITH ranked AS (
  SELECT
    l_linestatus, l_extendedprice, l_orderkey, l_linenumber,
    row_number() OVER (PARTITION BY l_linestatus
      ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rmax,
    row_number() OVER (PARTITION BY l_linestatus
      ORDER BY l_extendedprice ASC, l_orderkey ASC, l_linenumber ASC)  AS rmin
  FROM lineitem
)
SELECT
  mx.l_linestatus,
  round(mx.l_extendedprice, 4) AS max_value,
  mx.l_orderkey                AS max_orderkey,
  mx.l_linenumber              AS max_linenumber,
  round(mn.l_extendedprice, 4) AS min_value,
  mn.l_orderkey                AS min_orderkey,
  mn.l_linenumber              AS min_linenumber
FROM (SELECT * FROM ranked WHERE rmax = 1) mx
JOIN (SELECT * FROM ranked WHERE rmin = 1) mn ON mx.l_linestatus = mn.l_linestatus
"""


Q_LABEL_EXTREMA_EVENTS_SQL = """
WITH ranked AS (
  SELECT
    event_type, value, event_id,
    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rmax,
    row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC)  AS rmin
  FROM events
)
SELECT
  mx.event_type,
  round(mx.value, 4) AS max_value,
  mx.event_id        AS max_event_id,
  round(mn.value, 4) AS min_value,
  mn.event_id        AS min_event_id
FROM (SELECT * FROM ranked WHERE rmax = 1) mx
JOIN (SELECT * FROM ranked WHERE rmin = 1) mn ON mx.event_type = mn.event_type
"""
