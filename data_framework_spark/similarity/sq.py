"""Scalar quantization (SQ8): per-dimension int8 compression of the
embedding corpus with reconstruction-error accounting.

Extension layer (SURVEY.md §7 phase 5) — the third compression tier
of a production vector stack alongside IVF (`ivf.py`, coarse
partitioning) and PQ (`pq.py`, subspace codebooks): uniform scalar
quantization maps each dimension independently onto 256 levels
between its corpus min and max (the faiss `ScalarQuantizer QT_8bit`
recipe). 4× smaller than float32 with near-exact recall on most
corpora, and — unlike PQ — decode is a fused multiply-add, so SQ8 is
the usual choice when memory is 4× too small rather than 64×.

Scale shape: pass 1 is ONE corpus aggregate producing a
dimension-sized (64-row) min/max frame — broadcast; pass 2 re-scans
the corpus, quantizes each value row-locally against the broadcast
frame, and folds per-dimension error stats. Both passes are
explode + JVM expressions in whole-stage codegen; nothing is
corpus-sized except the two linear scans. At 100 TB the min/max pass
would swap to a (0.001, 0.999) quantile clip (percentile_approx,
mergeable sketches) to stop a single outlier from stretching the
grid — same plan shape, one extra broadcast column.

Determinism: code = round((x - mn) / scale) is HALF_UP on positives
in both engines and (x - mn) / scale is the same two-operation
double expression, so codes agree bit-for-bit; the only
association-order floats are the per-dimension error AVERAGES,
rounded to 6dp (values are exact to ~1e-16 relative, the repo-wide
convention for averaged metrics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table

SQ_LEVELS = 255  # codes 0..255
SQ_DIM = 64  # embedding dimensionality (TESTDATA.md)


def q_sq8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension SQ8 audit: grid scale, codes actually used,
    mean/max absolute reconstruction error. 64 bounded rows from two
    linear corpus passes (stats pass broadcast back into the
    quantize pass)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vals = emb.select(
        "vec_id",
        F.posexplode("embedding").alias("pos", "xf"),
    ).select(
        (F.col("pos") + 1).alias("dim"), F.col("xf").cast("double").alias("x")
    )
    stats = vals.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    q = vals.join(F.broadcast(stats), "dim").select(
        "dim",
        "x",
        "mn",
        ((F.col("mx") - F.col("mn")) / SQ_LEVELS).alias("scale"),
    )
    # scale == 0 (a constant dimension) would make (x-mn)/scale a
    # 0/0 NaN — code 0 / zero error is the correct quantization and
    # both engines must spell the guard identically (DuckDB errors
    # casting NaN to INTEGER).
    code = F.when(F.col("scale") == 0, F.lit(0)).otherwise(
        F.least(
            F.lit(SQ_LEVELS),
            F.greatest(
                F.lit(0),
                F.round(
                    (F.col("x") - F.col("mn")) / F.col("scale"), 0
                ).cast("int"),
            ),
        )
    )
    deq = F.col("mn") + code.cast("double") * F.col("scale")
    err = F.abs(deq - F.col("x"))
    return (
        q.select("dim", "scale", code.alias("code"), err.alias("err"))
        .groupBy("dim")
        .agg(
            F.round(F.first("scale"), 9).alias("q_scale"),
            F.countDistinct("code").alias("n_codes_used"),
            F.round(F.avg("err"), 6).alias("avg_abs_err"),
            F.round(F.max("err"), 9).alias("max_abs_err"),
        )
        .orderBy("dim")
    )


Q_SQ8_QUANTIZE_SQL = f"""
WITH vals AS (
  SELECT i.i::INTEGER AS dim, embedding[i.i]::DOUBLE AS x
  FROM embeddings, range(1, {SQ_DIM} + 1) i(i)
),
stats AS (
  SELECT dim, min(x) AS mn, max(x) AS mx FROM vals GROUP BY dim
),
q AS (
  SELECT v.dim, v.x, s.mn, (s.mx - s.mn) / {SQ_LEVELS} AS scale
  FROM vals v JOIN stats s USING (dim)
),
coded AS (
  SELECT dim, scale,
         CASE WHEN scale = 0 THEN 0
              ELSE least({SQ_LEVELS}, greatest(0,
                round((x - mn) / scale, 0)::INTEGER)) END AS code,
         abs(mn + (CASE WHEN scale = 0 THEN 0
              ELSE least({SQ_LEVELS}, greatest(0,
                round((x - mn) / scale, 0)::INTEGER)) END)::DOUBLE
             * scale - x) AS err
  FROM q
)
SELECT dim, round(first(scale), 9) AS q_scale,
       count(DISTINCT code) AS n_codes_used,
       round(avg(err), 6) AS avg_abs_err,
       round(max(err), 9) AS max_abs_err
FROM coded
GROUP BY dim
ORDER BY dim
"""
