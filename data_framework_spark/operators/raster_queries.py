"""Driver-checkable queries for the raster kernels (SURVEY.md §2.5/§2.9).

Each query derives a deterministic 16×16 dense grid from `lineitem`
(orderkey/partkey modulo 16, summed quantity — same derivation in the
oracle SQL, like q_fluxfn_grid), runs one NumPy tile kernel through
`plans.tile_kernel.tile_apply`, and re-expresses the same stencil as
plain SQL for the DuckDB oracle. That makes the applyInPandas
densify→kernel→re-explode path itself the thing under differential
test, not just the kernel function.

Numeric-stability notes (why the hash check is safe):
- every grid cell exists at all test SFs (verified: min cell count 256)
  and cell values are sums of integer quantities → exactly
  representable doubles in both engines;
- the mask threshold is `avg(v) + 0.375`: the mean of 256 integer-sum
  cells is exact (division by a power of two), and `x.375` can never
  tie with an integer cell value, so `v > level` can't flip between
  engines;
- smoothed values are rounded to 4 decimals; kernel-weight float noise
  is ~1e-12 relative, far inside the rounding guard.

Kernel↔reference parity citations live in kernels/ndimage.py.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.kernels import ndimage
from data_framework_spark.plans.tile_kernel import tile_apply
from data_framework_spark.sources.tables import load_table

N = 16  # grid side; keep in sync with the SQL literals below


def lineitem_cells(spark: SparkSession, sf_dir: str, *aggs) -> DataFrame:
    """The ONE (l_orderkey % N, l_partkey % N) cell derivation behind
    every lineitem-derived test grid (this module, the line-slice
    variable, the flux grid) — a single definition so the grid recipe
    cannot silently desynchronize between its Spark consumers and
    their oracle pairs (round-9 review)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        (F.col("l_orderkey") % N).cast("long").alias("i0"),
        (F.col("l_partkey") % N).cast("long").alias("i1"),
    ).agg(*aggs)


def grid_cells_sql(select_aggs: str) -> str:
    """The oracle-side spelling of lineitem_cells with the caller's
    aggregate list — same single-definition rule as the Spark side."""
    return f"""
  SELECT
    (l_orderkey % {N})::BIGINT AS i0,
    (l_partkey % {N})::BIGINT  AS i1,
    {select_aggs}
  FROM lineitem
  GROUP BY 1, 2
"""


def lineitem_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared 16×16 test grid in tile_apply's long schema
    (t, i0, i1, c0, c1, value)."""
    return lineitem_cells(
        spark, sf_dir, F.sum("l_quantity").alias("value")
    ).select(
        F.lit(0.0).alias("t"),
        "i0",
        "i1",
        F.col("i0").cast("double").alias("c0"),
        F.col("i1").cast("double").alias("c1"),
        "value",
    )


GRID_SQL = grid_cells_sql("sum(l_quantity)           AS v")


def _masked_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid with value replaced by the 0/1 mask `v > avg(v)+0.375`.

    The scalar aggregate is a 1-row broadcast cross join (no shuffle of
    the grid side) — the same shape as sigma_threshold."""
    g = lineitem_grid(spark, sf_dir)
    stats = g.agg((F.avg("value") + F.lit(0.375)).alias("__lvl"))
    return (
        g.crossJoin(F.broadcast(stats))
        .withColumn(
            "value", (F.col("value") > F.col("__lvl")).cast("double")
        )
        .drop("__lvl")
    )


MASK_SQL = f"""
  SELECT g.i0, g.i1,
         (g.v > (SELECT avg(v) + 0.375 FROM ({GRID_SQL}))) AS b
  FROM ({GRID_SQL}) g
"""


# --- Gaussian smoothing (vpicdataset.py:352-369, §2.5) ---------------------


def q_gaussian_smooth_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """σ=1 separable Gaussian (truncate=4 → radius 4), reflect
    boundary, via the tile kernel; oracle is the same 9-tap weighted
    sum as two SQL passes."""
    g = lineitem_grid(spark, sf_dir)
    out = tile_apply(g, lambda a: ndimage.gaussian_filter(a, 1.0))
    return out.select(
        "i0", "i1", F.round("value", 4).alias("smooth")
    ).orderBy("i0", "i1")


Q_GAUSSIAN_SMOOTH_GRID_SQL = f"""
WITH grid AS ({GRID_SQL}),
kern AS (
  SELECT x AS d, exp(-0.5 * x * x) AS kw FROM range(-4, 5) t(x)
),
knorm AS (
  SELECT d, kw / (SELECT sum(kw) FROM kern) AS w FROM kern
),
p1 AS (
  SELECT g.i0, g.i1, sum(k.w * s.v) AS v
  FROM grid g
  CROSS JOIN knorm k
  JOIN grid s ON s.i1 = g.i1 AND s.i0 = CASE
      WHEN g.i0 + k.d < 0   THEN -(g.i0 + k.d) - 1
      WHEN g.i0 + k.d >= 16 THEN 31 - (g.i0 + k.d)
      ELSE g.i0 + k.d END
  GROUP BY g.i0, g.i1
),
p2 AS (
  SELECT g.i0, g.i1, sum(k.w * s.v) AS v
  FROM p1 g
  CROSS JOIN knorm k
  JOIN p1 s ON s.i0 = g.i0 AND s.i1 = CASE
      WHEN g.i1 + k.d < 0   THEN -(g.i1 + k.d) - 1
      WHEN g.i1 + k.d >= 16 THEN 31 - (g.i1 + k.d)
      ELSE g.i1 + k.d END
  GROUP BY g.i0, g.i1
)
SELECT i0, i1, round(v, 4) AS smooth FROM p2 ORDER BY i0, i1
"""


# --- 10×10 extrema filter (vpicdataset.py:484-485, §2.5) -------------------


def q_extrema_filter_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scipy-convention 10×10 sliding max AND min (reflect boundary)
    in one pass; oracle is a 100-offset reflect-indexed self-join."""
    g = lineitem_grid(spark, sf_dir)
    vmax = tile_apply(
        g, lambda a: ndimage.extrema_filter(a, (10, 10), "max"), out_col="value"
    ).select("i0", "i1", F.col("value").alias("vmax"))
    vmin = tile_apply(
        g, lambda a: ndimage.extrema_filter(a, (10, 10), "min"), out_col="value"
    ).select("i0", "i1", F.col("value").alias("vmin"))
    return (
        vmax.join(vmin, on=["i0", "i1"])
        .select(
            "i0",
            "i1",
            F.round("vmax", 4).alias("vmax"),
            F.round("vmin", 4).alias("vmin"),
        )
        .orderBy("i0", "i1")
    )


Q_EXTREMA_FILTER_GRID_SQL = f"""
WITH grid AS ({GRID_SQL}),
offs AS (
  SELECT a.x AS d0, b.x AS d1 FROM range(-5, 5) a(x), range(-5, 5) b(x)
)
SELECT g.i0, g.i1,
       round(max(s.v), 4) AS vmax,
       round(min(s.v), 4) AS vmin
FROM grid g
CROSS JOIN offs o
JOIN grid s
  ON s.i0 = CASE WHEN g.i0 + o.d0 < 0   THEN -(g.i0 + o.d0) - 1
                 WHEN g.i0 + o.d0 >= 16 THEN 31 - (g.i0 + o.d0)
                 ELSE g.i0 + o.d0 END
 AND s.i1 = CASE WHEN g.i1 + o.d1 < 0   THEN -(g.i1 + o.d1) - 1
                 WHEN g.i1 + o.d1 >= 16 THEN 31 - (g.i1 + o.d1)
                 ELSE g.i1 + o.d1 END
GROUP BY g.i0, g.i1
ORDER BY g.i0, g.i1
"""


# --- gap_fill with wraparound (vpicdataset.py:71-113, §2.5) ----------------


def q_gap_fill_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's np.roll 1-px gap closer (edges wrap) on the
    thresholded mask; oracle joins the 8 wrapped neighbors by modular
    index arithmetic."""
    m = _masked_grid(spark, sf_dir)
    out = tile_apply(m, ndimage.gap_fill)
    return out.select(
        "i0", "i1", F.col("value").cast("long").alias("filled")
    ).orderBy("i0", "i1")


Q_GAP_FILL_GRID_SQL = f"""
WITH m AS ({MASK_SQL})
SELECT g.i0, g.i1,
       (g.b
        OR (l.b AND (ur.b OR dr.b OR r.b))
        OR (r.b AND (dl.b OR ul.b OR l.b))
        OR (u.b AND (dl.b OR dr.b OR d.b))
        OR (d.b AND (ul.b OR ur.b OR u.b))
        OR (ul.b AND dr.b)
        OR (ur.b AND dl.b))::BIGINT AS filled
FROM m g
JOIN m l  ON l.i0  = g.i0              AND l.i1  = (g.i1 + 15) % 16
JOIN m r  ON r.i0  = g.i0              AND r.i1  = (g.i1 + 1)  % 16
JOIN m u  ON u.i0  = (g.i0 + 15) % 16  AND u.i1  = g.i1
JOIN m d  ON d.i0  = (g.i0 + 1)  % 16  AND d.i1  = g.i1
JOIN m ul ON ul.i0 = (g.i0 + 15) % 16  AND ul.i1 = (g.i1 + 15) % 16
JOIN m dr ON dr.i0 = (g.i0 + 1)  % 16  AND dr.i1 = (g.i1 + 1)  % 16
JOIN m ur ON ur.i0 = (g.i0 + 15) % 16  AND ur.i1 = (g.i1 + 1)  % 16
JOIN m dl ON dl.i0 = (g.i0 + 1)  % 16  AND dl.i1 = (g.i1 + 15) % 16
ORDER BY g.i0, g.i1
"""


# --- binary dilation (vpicdataset.py:449-451, §2.5) ------------------------


def q_dilate_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step cross-footprint dilation (NO wraparound — edge cells
    just have fewer neighbors); oracle uses left joins so the border
    contributes nothing."""
    m = _masked_grid(spark, sf_dir)
    out = tile_apply(m, lambda a: ndimage.binary_dilation(a > 0.5).astype(float))
    return out.select(
        "i0", "i1", F.col("value").cast("long").alias("dilated")
    ).orderBy("i0", "i1")


Q_DILATE_GRID_SQL = f"""
WITH m AS ({MASK_SQL})
SELECT g.i0, g.i1,
       (g.b
        OR coalesce(u.b, false)
        OR coalesce(d.b, false)
        OR coalesce(l.b, false)
        OR coalesce(r.b, false))::BIGINT AS dilated
FROM m g
LEFT JOIN m u ON u.i0 = g.i0 - 1 AND u.i1 = g.i1
LEFT JOIN m d ON d.i0 = g.i0 + 1 AND d.i1 = g.i1
LEFT JOIN m l ON l.i0 = g.i0     AND l.i1 = g.i1 - 1
LEFT JOIN m r ON r.i0 = g.i0     AND r.i1 = g.i1 + 1
ORDER BY g.i0, g.i1
"""


# --- connected-component labeling (vpicdataset.py:490-491, §2.9) -----------


def q_flood_label_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-order cross-connectivity labels of the mask. The oracle
    computes each component's minimum row-major linear index by
    recursive-CTE closure; dense_rank over that min IS the scan-order
    label (the first-encountered pixel of a component in a row-major
    scan is exactly its min-linear-index pixel)."""
    m = _masked_grid(spark, sf_dir)
    out = tile_apply(m, lambda a: ndimage.label(a > 0.5)[0].astype(float))
    return (
        out.filter(F.col("value") > 0)
        .select("i0", "i1", F.col("value").cast("long").alias("lbl"))
        .orderBy("i0", "i1")
    )


Q_FLOOD_LABEL_GRID_SQL = f"""
WITH RECURSIVE
m AS (SELECT i0, i1, i0 * 16 + i1 AS lin FROM ({MASK_SQL}) WHERE b),
reach AS (
  SELECT i0, i1, lin AS root FROM m
  UNION
  SELECT n.i0, n.i1, r.root
  FROM reach r
  JOIN m n ON abs(n.i0 - r.i0) + abs(n.i1 - r.i1) = 1
),
comp AS (SELECT i0, i1, min(root) AS cmin FROM reach GROUP BY i0, i1)
SELECT i0, i1, dense_rank() OVER (ORDER BY cmin) AS lbl
FROM comp
ORDER BY i0, i1
"""


# --- flood fill from a seed (vpicdataset.py:470-471, §2.9) -----------------


def q_flood_region_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """skimage.flood semantics: cells connected to seed (8,8) over
    values equal to the seed's; oracle grows the region by recursive
    CTE over same-mask-value neighbors."""
    m = _masked_grid(spark, sf_dir)
    out = tile_apply(m, lambda a: ndimage.flood(a > 0.5, (8, 8)).astype(float))
    return (
        out.filter(F.col("value") > 0)
        .select("i0", "i1")
        .orderBy("i0", "i1")
    )


Q_FLOOD_REGION_GRID_SQL = f"""
WITH RECURSIVE
m AS (SELECT i0, i1, b FROM ({MASK_SQL})),
seed AS (SELECT b AS tgt FROM m WHERE i0 = 8 AND i1 = 8),
region AS (
  SELECT i0, i1 FROM m, seed WHERE i0 = 8 AND i1 = 8
  UNION
  SELECT n.i0, n.i1
  FROM region r
  JOIN m n ON abs(n.i0 - r.i0) + abs(n.i1 - r.i1) = 1
  JOIN seed s ON n.b = s.tgt
)
SELECT i0, i1 FROM region ORDER BY i0, i1
"""


# --- marching-squares contours (vpicdataset.py:383-384, §2.9) --------------


def q_contours_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct interpolated contour points at level = avg+0.375.

    The point multiset of marching squares IS the set of sign-change
    edge crossings with linear interpolation — SQL-expressible — so
    the oracle pins crossing detection + interpolation; polyline
    STITCHING order is non-relational and stays pinned by the golden
    tests (tests/test_kernels.py)."""
    g = lineitem_grid(spark, sf_dir)
    stats = g.agg((F.avg("value") + F.lit(0.375)).alias("lvl"))
    gl = g.crossJoin(F.broadcast(stats))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        i0 = pdf["i0"].to_numpy()
        i1 = pdf["i1"].to_numpy()
        u0 = np.unique(i0)
        u1 = np.unique(i1)
        tile = np.full((len(u0), len(u1)), np.nan)
        tile[np.searchsorted(u0, i0), np.searchsorted(u1, i1)] = pdf[
            "value"
        ].to_numpy()
        lvl = float(pdf["lvl"].iloc[0])
        pts = set()
        # half-away-from-zero 6dp (coords are >= 0 here): the oracle's
        # SQL round(); Python's builtin round is banker's and diverges
        # on an exactly-representable .0000005 crossing (round-10
        # review, the recurring rounding class)
        r6 = lambda x: math.floor(float(x) * 1e6 + 0.5) / 1e6
        for poly in ndimage.find_contours(tile, lvl):
            for r, c in poly:
                pts.add((r6(r), r6(c)))
        return pd.DataFrame(sorted(pts), columns=["r", "c"])

    return (
        gl.groupBy("t")
        .applyInPandas(kernel, schema="r double, c double")
        .orderBy("r", "c")
    )


Q_CONTOURS_GRID_SQL = f"""
WITH grid AS ({GRID_SQL}),
stats AS (SELECT avg(v) + 0.375 AS lvl FROM grid),
h AS (
  SELECT g.i0::DOUBLE AS r,
         g.i1 + (s.lvl - g.v) / (n.v - g.v) AS c
  FROM grid g
  JOIN grid n ON n.i0 = g.i0 AND n.i1 = g.i1 + 1
  CROSS JOIN stats s
  WHERE (g.v > s.lvl) <> (n.v > s.lvl)
),
v AS (
  SELECT g.i0 + (s.lvl - g.v) / (n.v - g.v) AS r,
         g.i1::DOUBLE AS c
  FROM grid g
  JOIN grid n ON n.i1 = g.i1 AND n.i0 = g.i0 + 1
  CROSS JOIN stats s
  WHERE (g.v > s.lvl) <> (n.v > s.lvl)
)
SELECT DISTINCT round(r, 6) AS r, round(c, 6) AS c
FROM (SELECT * FROM h UNION ALL SELECT * FROM v)
ORDER BY r, c
"""


def q_tiled_gaussian_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME σ=1 Gaussian as q_gaussian_smooth_grid, but through
    the halo-exchange tiled runner (8×8 patches, radius-4 halos over
    the 16×16 grid → 4 patches): proves the scale path for a single
    oversized timestep produces bit-identical output — the oracle is
    the identical 9-tap SQL."""
    from data_framework_spark.plans.tile_kernel import tile_apply_halo

    g = lineitem_grid(spark, sf_dir)
    out = tile_apply_halo(
        g, lambda a: ndimage.gaussian_filter(a, 1.0), radius=4, tile=8
    )
    return out.select(
        "i0", "i1", F.round("value", 4).alias("smooth")
    ).orderBy("i0", "i1")


Q_TILED_GAUSSIAN_GRID_SQL = Q_GAUSSIAN_SMOOTH_GRID_SQL


# --- multi-timestep halo smoothing (bench-scale concurrency) ---------------

# 8 timesteps × (1056 × 1000) cells: every timestep individually
# exceeds plans/structures._HALO_CELLS (1 << 20), so ALL of them take
# the halo-exchange tiled path CONCURRENTLY — 8 t × 20 patches = 160
# simultaneous stencil tasks, the two-axis parallelism (timesteps ×
# patches) the reference's own TODO asked for (vpicdataset.py:323-325).
HALO_MT_NT = 8
HALO_MT_N0 = 1056
HALO_MT_N1 = 1000


def _halo_mt_field(spark: SparkSession) -> DataFrame:
    """Deterministic synthetic multi-timestep field, generated
    DISTRIBUTEDLY (spark.range + JVM trig exprs — no driver-side
    materialization; at 100 TB the input would be a parquet scan)."""
    n_t, n0, n1 = HALO_MT_NT, HALO_MT_N0, HALO_MT_N1
    return (
        spark.range(n_t * n0 * n1)
        .select(
            (F.col("id") / (n0 * n1)).cast("long").cast("double").alias("t"),
            ((F.col("id") % (n0 * n1)) / n1).cast("long").alias("i0"),
            (F.col("id") % n1).alias("i1"),
        )
        .withColumn("c0", F.lit(-8.0) + F.col("i0") * F.lit(16.0 / (n0 - 1)))
        .withColumn("c1", F.col("i1") * F.lit(0.01))
        .withColumn(
            "value",
            F.sin(F.col("c0")) * F.cos(F.col("c1"))
            + F.sin(F.lit(0.35) * F.col("t")),
        )
    )


def q_halo_smooth_multi_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """σ=1 Gaussian smoothing of 8 oversized timesteps through the
    halo-exchange tiled runner, summarized per timestep (cell count +
    4dp value checksum). Ignores sf_dir — the field is synthetic by
    design. The oracle states the pinned literal summaries
    (find_structures_contract pattern): a regression in the halo
    exchange, tile stitching, or the kernel moves a checksum."""
    from data_framework_spark.plans.tile_kernel import tile_apply_halo

    # r17 (guide §2.3 project-before-the-exchange / §4.1): the halo
    # runner ships EVERY input column through the patch-replicating
    # explode, the (t, patch) shuffle AND the Arrow boundary — c0/c1
    # are dead weight for this query (the kernel scatters by i0/i1,
    # the summary reads t/value), ~1/3 of the 8.4M-row shuffle bytes.
    # Values untouched: same kernel, same cells.
    out = tile_apply_halo(
        _halo_mt_field(spark).select("t", "i0", "i1", "value"),
        lambda a: ndimage.gaussian_filter(a, (1.0, 1.0)),
        radius=4,
        tile=256,
    )
    return (
        out.groupBy("t")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            # |value| then 2dp: a signed sum over ~1M cells cancels to
            # ~0 at t=0, where partition-order float error could flip
            # the rounded digit; the absolute sum has no cancellation
            # and ~1e-4 accumulation error — 2dp is stable
            F.round(F.sum(F.abs(F.col("value"))), 2).alias("checksum"),
        )
        .orderBy("t")
    )


# Pinned from the deterministic synthetic field (regenerate by
# printing q_halo_smooth_multi_t's rows after an INTENDED kernel
# change; verified stable across runs — the |value| checksum has no
# cancellation, so partition-order float drift stays below 2dp).
# ENVIRONMENT PIN (round-5 advisory): these 2dp literals were computed
# under numpy 1.26.4 / pandas 2.2.2 / pyarrow 16.1.0 with the repo's
# own kernels/ndimage.py Gaussian (separable correlate1d, float64
# accumulation). A dependency bump that changes FMA/SIMD reduction
# order could move a ~1e6 sum across a 0.005 rounding boundary — if
# this query goes red with NO kernel change, check the numpy version
# FIRST and re-pin from a fresh print rather than hunting a code bug.
Q_HALO_SMOOTH_MULTI_T_SQL = """
SELECT * FROM (VALUES
  (0.0::DOUBLE, 1056000::BIGINT, 444686.41::DOUBLE),
  (1.0::DOUBLE, 1056000::BIGINT, 540071.48::DOUBLE),
  (2.0::DOUBLE, 1056000::BIGINT, 731277.58::DOUBLE),
  (3.0::DOUBLE, 1056000::BIGINT, 923140.65::DOUBLE),
  (4.0::DOUBLE, 1056000::BIGINT, 1040725.89::DOUBLE),
  (5.0::DOUBLE, 1056000::BIGINT, 1039199.45::DOUBLE),
  (6.0::DOUBLE, 1056000::BIGINT, 919148.28::DOUBLE),
  (7.0::DOUBLE, 1056000::BIGINT, 726333.18::DOUBLE)
) AS t(t, n_cells, checksum)
"""
