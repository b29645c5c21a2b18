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


# --- incremental dedup (new batch vs historical corpus) --------------------

INCR_SPLIT = 250  # doc_id < INCR_SPLIT = "historical corpus", rest = new batch


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (cross-batch) dedup: the arriving batch is checked
    against the HISTORICAL corpus's fingerprints, not against itself —
    the shape a daily ingestion pipeline runs, where the seen-set is a
    persisted fingerprint table that only grows by the day's survivors.

    Two levels, both engine-portable md5 arithmetic:
    - exact: whole-text md5 match against any historical doc;
    - near: full minhash-signature match (dedup/minhash.py semantics)
      against any historical doc.
    Emits per-source accounting of the new batch: arriving docs, exact
    hits, near hits (excluding exact), survivors.

    Scale shape: the historical side reduces to DISTINCT fingerprint /
    signature keys (far smaller than the corpus); both checks are
    LEFT joins of the new batch against those key sets — broadcastable
    when the seen-set fits, shuffle-partitioned otherwise (AQE picks),
    never any pair enumeration. The split constant stands in for the
    batch boundary a real pipeline gets from ingestion metadata."""
    from data_framework_spark.dedup.minhash import K, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") < INCR_SPLIT)
    new = docs.filter(F.col("doc_id") >= INCR_SPLIT)

    hist_fp = hist.select(F.md5("text").alias("fp")).distinct()
    new_fp = new.select(
        "doc_id", "source", F.md5("text").alias("fp")
    ).join(
        hist_fp.withColumn("exact_hit", F.lit(1)), "fp", "left"
    )

    sig_cols = [f"h{k}" for k in range(K)]
    hist_sig = minhash_signatures(hist, "doc_id", "text").select(
        *sig_cols
    ).distinct()
    new_sig = minhash_signatures(new, "doc_id", "text").join(
        hist_sig.withColumn("near_hit", F.lit(1)), sig_cols, "left"
    ).select("doc", "near_hit")

    joined = new_fp.join(
        new_sig, new_fp["doc_id"] == new_sig["doc"], "left"
    )
    exact = F.coalesce("exact_hit", F.lit(0))
    near = F.coalesce("near_hit", F.lit(0))
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.sum(exact).alias("n_exact_dup"),
            F.sum(
                (near.cast("boolean") & ~exact.cast("boolean")).cast("long")
            ).alias("n_near_dup"),
            F.sum(
                (~near.cast("boolean") & ~exact.cast("boolean")).cast("long")
            ).alias("n_kept"),
        )
        .orderBy("source")
    )


def _dedup_incremental_sql() -> str:
    from data_framework_spark.dedup.minhash import K

    sig_mins = ", ".join(
        f"min(md5(shingle || '#{k}')) AS h{k}" for k in range(K)
    )
    sig_keys = ", ".join(f"h{k}" for k in range(K))
    return f"""
WITH hist_fp AS (
  SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id < {INCR_SPLIT}
),
new_docs AS (
  SELECT doc_id, source, md5(text) AS fp FROM documents
  WHERE doc_id >= {INCR_SPLIT}
),
sh AS (
  SELECT doc_id AS doc, unnest(list_distinct(string_split(text, ' '))) AS shingle
  FROM documents
),
sig AS (
  SELECT doc, {sig_mins} FROM sh GROUP BY doc
),
hist_sig AS (
  SELECT DISTINCT {sig_keys} FROM sig WHERE doc < {INCR_SPLIT}
),
flags AS (
  SELECT nd.doc_id, nd.source,
         (hf.fp IS NOT NULL) AS exact_hit,
         EXISTS (SELECT 1 FROM hist_sig h
                 WHERE {" AND ".join(f"h.h{k} = n.h{k}" for k in range(K))})
           AS near_hit
  FROM new_docs nd
  LEFT JOIN hist_fp hf ON nd.fp = hf.fp
  JOIN sig n ON n.doc = nd.doc_id
)
SELECT source,
       count(*) AS n_new,
       sum(CASE WHEN exact_hit THEN 1 ELSE 0 END)::BIGINT AS n_exact_dup,
       sum(CASE WHEN near_hit AND NOT exact_hit THEN 1 ELSE 0 END)::BIGINT
         AS n_near_dup,
       sum(CASE WHEN NOT near_hit AND NOT exact_hit THEN 1 ELSE 0 END)::BIGINT
         AS n_kept
FROM flags
GROUP BY source
ORDER BY source
"""


Q_DEDUP_INCREMENTAL_SQL = _dedup_incremental_sql()
