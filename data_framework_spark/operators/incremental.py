"""Incremental aggregate refresh — materialized-view maintenance by
partial-state merge.

Extension layer (SURVEY.md §7 phase 5): at 100 TB you never recompute
a corpus-level rollup from scratch when a new batch lands — you keep
the aggregate's PARTIAL STATE (per group: count, sum, ...) as a
materialized table and MERGE the new batch's partial state into it.
Distributive aggregates (count, sum, min, max) merge trivially;
algebraic ones (avg) merge through their state (sum/count), which is
exactly how Spark's own partial aggregation works internally — this
operator makes that contract a user-level, oracle-checked primitive.

The driver-checked query splits `documents` into a deterministic
"historical" batch and a "new" batch (md5-band, same trick as
dedup_incremental), computes each batch's partial state
independently, merges, and finalizes (avg = merged sum / merged
count). The oracle computes the same rollup over the WHOLE table in
one pass — hash equality proves merge(partials) == recompute(full),
the invariant incremental refresh rests on.

Scale shape: two scans (in production: one scan of the small new
batch + a read of the small state table), one shuffle each on the
group key, then a group-key merge join of two group-sized frames.
Nothing is corpus-sized after the partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.functions.sampling import hash_fraction
from data_framework_spark.sources.tables import load_table

# md5-band boundary: below = historical batch, above = new batch
INC_SPLIT = 0.8


def partial_state(docs: DataFrame) -> DataFrame:
    """Per-source mergeable aggregate state: (n_docs, sum_chars,
    min_chars, max_chars)."""
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def merge_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two partial states on the group key (full outer — either
    side may have groups the other lacks)."""
    cols = ["n_docs", "sum_chars", "min_chars", "max_chars"]
    a2 = a.select("source", *[F.col(c).alias(f"a_{c}") for c in cols])
    b2 = b.select("source", *[F.col(c).alias(f"b_{c}") for c in cols])
    j = a2.join(b2, "source", "full_outer")
    z = lambda c: F.coalesce(F.col(c), F.lit(0))
    return j.select(
        "source",
        (z("a_n_docs") + z("b_n_docs")).alias("n_docs"),
        (z("a_sum_chars") + z("b_sum_chars")).alias("sum_chars"),
        F.least(
            F.coalesce(F.col("a_min_chars"), F.col("b_min_chars")),
            F.coalesce(F.col("b_min_chars"), F.col("a_min_chars")),
        ).alias("min_chars"),
        F.greatest(
            F.coalesce(F.col("a_max_chars"), F.col("b_max_chars")),
            F.coalesce(F.col("b_max_chars"), F.col("a_max_chars")),
        ).alias("max_chars"),
    )


def q_incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge the historical batch's partial state with the new
    batch's, finalize (avg from merged sum/count), and require hash
    equality with the oracle's single-pass full rollup — the
    merge == recompute invariant of incremental view maintenance."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars", "doc_id")
    frac = hash_fraction(F.col("doc_id"))
    hist = partial_state(docs.filter(frac < INC_SPLIT))
    new = partial_state(docs.filter(frac >= INC_SPLIT))
    merged = merge_states(hist, new)
    return (
        merged.select(
            "source",
            "n_docs",
            "sum_chars",
            "min_chars",
            "max_chars",
            F.round(
                F.col("sum_chars") / F.col("n_docs").cast("double"), 4
            ).alias("avg_chars"),
        )
        .orderBy("source")
    )


Q_INCREMENTAL_AGG_REFRESH_SQL = """
SELECT source,
       count(*) AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars,
       min(n_chars)::BIGINT AS min_chars,
       max(n_chars)::BIGINT AS max_chars,
       round(sum(n_chars) / count(*)::DOUBLE, 4) AS avg_chars
FROM documents
GROUP BY source
ORDER BY source
"""
