"""Structured-Streaming analogs of the engine's window operators.

The reference has no streaming at all (SURVEY.md §2.11); this is the
driver-mandated extension. Design rule: every streaming aggregation
has a batch-equivalent DataFrame expression (same `F.window` /
`session_window` calls), so correctness is pinned by the batch oracle
and the streaming tests only have to prove the plan runs
incrementally with watermarked state.

At scale: tumbling/sliding windows shuffle on (window, keys); the
watermark bounds state size — without it a 100 TB/day stream grows
state forever. `10 minutes` here is a test default, not doctrine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window event counts + value sums per event_type.

    Works identically on a batch DataFrame and a readStream one (add
    `withWatermark` upstream for the streaming case).
    """
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_tumbling_counts(
    spark: SparkSession, sf_dir: str, width: str = "1 hour"
) -> DataFrame:
    """Streaming variant: parquet source → watermark → tumbling agg.

    Returns the streaming DataFrame (caller starts the query). The
    parquet file source replays the test table as a bounded stream;
    in production the source is Kafka/files with the same plan.
    """
    import os

    path = os.path.join(sf_dir, "events.parquet")
    # use the ON-DISK schema (ts = bigint nanos under nanosAsLong),
    # not load_table's converted one — a readStream schema that
    # disagrees with the files mis-reads silently
    raw_schema = spark.read.parquet(path).schema
    # the file stream source requires a directory/glob, not a bare
    # file path — a trailing glob makes the single test file listable
    stream = spark.readStream.schema(raw_schema).parquet(path + "*")
    # events.ts arrives as bigint nanos from the raw parquet (see
    # sources/tables.py); normalize identically here.
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return tumbling_counts(stream.withWatermark("ts", "10 minutes"), width)


def run_stream_to_memory(sdf: DataFrame, name: str) -> None:
    """Drive a bounded streaming query to completion synchronously
    (memory sink)."""
    q = (
        sdf.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


# --- driver-checkable query instantiation (batch-equivalent) ----------------


def q_tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"), "1 hour")


Q_TUMBLING_WINDOW_EVENTS_SQL = """
SELECT
  date_trunc('hour', ts) AS window_start,
  event_type,
  count(*) AS n_events,
  round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""
