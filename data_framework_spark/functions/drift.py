"""Distribution-drift monitoring: per-domain two-sample KS statistic.

Extension layer (SURVEY.md §7 phase 5) — the data-quality monitor a
production corpus pipeline runs on every ingest: does a source's
document-length distribution still look like the rest of the corpus,
or did a crawler change / template explosion / truncation bug shift
it? The two-sample Kolmogorov-Smirnov statistic (sup-norm distance
between empirical CDFs) is the standard scale-free answer; computed
here for each source against the REST of the corpus.

Scale posture: lengths are quantized into fixed-width buckets first
(BUCKET_W), so the only corpus-sized work is ONE (source, bucket)
count aggregate — a single shuffle with map-side combine down to
#sources × #buckets rows. The dense grid, cumulative windows, and
sup-norm max all run over that tiny frame (at 100 TB it is still
thousands of rows). Quantization makes the statistic a lower bound
of the exact KS — the standard streaming/histogram tradeoff, and the
monitor's sensitivity knob is the bucket width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table

# n_chars quantization width; the synthetic corpus spans ~30-600 chars
# so this yields ~35 populated buckets
BUCKET_W = 16


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KS drift vs the rest of the corpus over the
    bucketized document-length distribution: ks = sup over buckets of
    |ECDF_source − ECDF_rest|. One corpus aggregate; everything after
    runs on the #sources × #buckets grid."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.floor(F.col("n_chars") / BUCKET_W).alias("bucket")
    counts = docs.select("source", bucket).groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    srcs = counts.select("source").distinct()
    buckets = counts.select("bucket").distinct()
    grid = srcs.crossJoin(buckets)
    dense = grid.join(counts, ["source", "bucket"], "left").select(
        "source", "bucket", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    w_cum = (
        W.partitionBy("source")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_bucket_tot = (
        W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = dense.select(
        "source",
        "bucket",
        F.sum("c").over(w_cum).alias("cum_s"),
        F.sum("c").over(W.partitionBy("source")).alias("n_s"),
    )
    # total cumulative per bucket — aggregated from the SPARSE counts
    # frame (grid zeros contribute nothing and counts' distinct bucket
    # set IS the grid's bucket set, so the result is identical; the
    # densified frame is only needed for the per-source ECDF —
    # round-9 review)
    tot = (
        counts.groupBy("bucket")
        .agg(F.sum("c").alias("cb"))
        .select(
            "bucket",
            F.sum("cb").over(w_bucket_tot).alias("cum_all"),
            F.sum("cb").over(W.partitionBy()).alias("n_all"),
        )
    )
    # single-source guard: when one source IS the whole corpus the
    # rest-of-corpus denominator is 0 — Spark's x/0 yields NULL while
    # DuckDB yields IEEE NaN, an engine-divergent edge; both engines
    # emit d = 0.0 (drift against an empty complement is undefined,
    # and 0 keeps the ks aggregate total-order stable)
    joined = cum.join(tot, "bucket").select(
        "source",
        "n_s",
        F.when(F.col("n_all") == F.col("n_s"), F.lit(0.0))
        .otherwise(
            F.abs(
                F.col("cum_s") / F.col("n_s")
                - (F.col("cum_all") - F.col("cum_s"))
                / (F.col("n_all") - F.col("n_s"))
            )
        )
        .alias("d"),
    )
    return (
        joined.groupBy("source")
        .agg(
            F.first("n_s").alias("n_docs"),
            F.round(F.max("d"), 6).alias("ks"),
        )
        .orderBy("source")
    )


Q_KS_DRIFT_SQL = f"""
WITH counts AS (
  SELECT source, floor(n_chars / {BUCKET_W})::BIGINT AS bucket,
         count(*) AS c
  FROM documents
  GROUP BY source, bucket
),
grid AS (
  SELECT s.source, b.bucket
  FROM (SELECT DISTINCT source FROM counts) s
  CROSS JOIN (SELECT DISTINCT bucket FROM counts) b
),
dense AS (
  SELECT g.source, g.bucket, coalesce(c.c, 0) AS c
  FROM grid g LEFT JOIN counts c
    ON g.source = c.source AND g.bucket = c.bucket
),
cum AS (
  SELECT source, bucket,
         sum(c) OVER (PARTITION BY source ORDER BY bucket
                      ROWS UNBOUNDED PRECEDING) AS cum_s,
         sum(c) OVER (PARTITION BY source) AS n_s
  FROM dense
),
tot AS (
  SELECT bucket,
         sum(cb) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum_all,
         sum(cb) OVER () AS n_all
  FROM (SELECT bucket, sum(c) AS cb FROM counts GROUP BY bucket)
)
SELECT source,
       any_value(n_s)::BIGINT AS n_docs,
       round(max(CASE WHEN n_all = n_s THEN 0.0
                 ELSE abs(cum_s::DOUBLE / n_s
                          - (cum_all - cum_s)::DOUBLE / (n_all - n_s))
                 END), 6) AS ks
FROM cum JOIN tot USING (bucket)
GROUP BY source
ORDER BY source
"""
