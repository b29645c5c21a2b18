"""Exact deduplication: hash-group on content (or a content key).

The 100 TB-scale shape: one shuffle on the group key. Grouping on a
64-bit md5 fingerprint instead of the raw text keeps shuffle rows
small (16 bytes vs document bytes) — the canonical trick for
content-dedup at scale; collision probability at 1e12 docs is ~1e-5
and can be eliminated by a secondary equality check within groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.functions.text import fingerprint
from data_framework_spark.sources.tables import load_table


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """One row per distinct content: the minimum id wins, with the
    duplicate-group size attached."""
    key = fingerprint(F.col(content_col)).alias("__fp")
    return (
        df.select(key, F.col(id_col))
        .groupBy("__fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .drop("__fp")
    )


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id").select(
        "keep_id", "group_size"
    )


Q_DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS keep_id, count(*) AS group_size
FROM documents
GROUP BY substring(md5(text), 1, 16)
"""
