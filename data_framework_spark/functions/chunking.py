"""Document chunking and train/val/test splitting for training-data
pipelines.

Extension layer (SURVEY.md §7 phase 5) — absent from the reference
(whose string surface is split('/') + substring containment,
src/datasets/vpicdataset.py:206-216); these are the tokenize-adjacent
steps a pretraining pipeline runs after curation:

- fixed-window chunking with overlap (every long document becomes
  training-sequence-sized pieces; the chunk hash doubles as the key
  for chunk-level exact dedup, the cheap cousin of substring dedup);
- chunk-level dedup accounting (what fraction of emitted chunks are
  byte-identical to another chunk — boilerplate headers/footers show
  up here long before document-level dedup sees them);
- deterministic stratified train/val/test splitting with cross-split
  leakage accounting (a doc whose exact text appears in more than one
  split is train/eval contamination introduced by the split itself).

Scale posture: chunking is a pure flatMap — shuffle-free, linear in
corpus bytes, and the explode happens inside whole-stage codegen (no
Python). Chunk dedup shuffles once on chunk_hash with map-side
partial aggregation. The split is a per-row md5 expression (a doc's
split depends only on doc_id, so it is stable across engines,
partitionings, and corpus appends); the leakage check shuffles once
on the document fingerprint. Nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_framework_spark.functions.sampling import (
    HASH_FRACTION_SQL_TMPL,
    hash_fraction,
)
from data_framework_spark.functions.text import token_count, tokens
from data_framework_spark.sources.tables import load_table

# Tiny window/stride so the synthetic ~60-token docs produce several
# overlapping chunks each; production values (2048/1920 etc.) are a
# constant swap.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24

# train/val/test cumulative hash-fraction boundaries
SPLIT_TRAIN = 0.8
SPLIT_VAL = 0.9


def _chunks(docs: DataFrame, *extra_cols: str) -> DataFrame:
    """(doc_id, [extra_cols...,] chunk_idx, n_tok, chunk_hash) — token
    windows of CHUNK_TOKENS at stride CHUNK_STRIDE; the last window
    may be short; a doc shorter than one window yields exactly one
    chunk. Extra columns ride along so callers never re-join the
    corpus just to recover metadata."""
    c, s = CHUNK_TOKENS, CHUNK_STRIDE
    n = token_count(F.col("text"))
    # ceil(max(n - c, 0) / s) extra starts beyond the first
    n_starts = (
        F.lit(1)
        + F.floor((F.greatest(n - c, F.lit(0)) + (s - 1)) / F.lit(float(s)))
    ).cast("long")
    chunk = F.slice(tokens(F.col("text")), F.col("chunk_idx").cast("int") * s + 1, c)
    return (
        docs.select(
            "doc_id",
            *extra_cols,
            F.explode(F.sequence(F.lit(0).cast("long"), n_starts - 1)).alias(
                "chunk_idx"
            ),
            "text",
        )
        .select(
            "doc_id",
            *extra_cols,
            "chunk_idx",
            F.size(chunk).cast("long").alias("n_tok"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-window chunking: every document becomes
    ceil-spaced windows of CHUNK_TOKENS tokens at CHUNK_STRIDE, each
    with its token count and md5 chunk hash. Pure flatMap — no
    shuffle, no Python; the output is the unit a tokenizer/packer
    consumes and the hash is the chunk-dedup key."""
    docs = load_table(spark, sf_dir, "documents")
    return _chunks(docs).orderBy("doc_id", "chunk_idx")


Q_CHUNK_DOCUMENTS_SQL = f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents
),
s AS (
  SELECT doc_id, w,
         unnest(range(0,
           1 + floor((greatest(n - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE - 1})
                     / {CHUNK_STRIDE}.0)::BIGINT)) AS chunk_idx
  FROM d
)
SELECT doc_id, chunk_idx,
       len(w[chunk_idx * {CHUNK_STRIDE} + 1
             : chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}])::BIGINT AS n_tok,
       md5(array_to_string(
             w[chunk_idx * {CHUNK_STRIDE} + 1
               : chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')) AS chunk_hash
FROM s
ORDER BY doc_id, chunk_idx
"""


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact-dedup accounting per source: how many chunks
    each source emits, how many distinct chunk hashes, and the
    duplicate fraction — boilerplate (shared headers, templated spans)
    surfaces at chunk granularity while the containing documents stay
    unique. One flatMap + one shuffle on (source, chunk_hash) via the
    two-level distinct-then-count aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    ch = _chunks(docs, "source")
    return (
        ch.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chunk_hash").alias("n_distinct"),
        )
        .select(
            "source",
            "n_chunks",
            "n_distinct",
            F.round(
                (F.col("n_chunks") - F.col("n_distinct"))
                / F.col("n_chunks").cast("double"),
                4,
            ).alias("dup_frac"),
        )
        .orderBy("source")
    )


Q_CHUNK_DEDUP_SQL = f"""
WITH d AS (
  SELECT doc_id, source, string_split(text, ' ') AS w,
         len(string_split(text, ' ')) AS n
  FROM documents
),
s AS (
  SELECT doc_id, source, w,
         unnest(range(0,
           1 + floor((greatest(n - {CHUNK_TOKENS}, 0) + {CHUNK_STRIDE - 1})
                     / {CHUNK_STRIDE}.0)::BIGINT)) AS chunk_idx
  FROM d
),
ch AS (
  SELECT source,
         md5(array_to_string(
               w[chunk_idx * {CHUNK_STRIDE} + 1
                 : chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')) AS chunk_hash
  FROM s
)
SELECT source,
       count(*) AS n_chunks,
       count(DISTINCT chunk_hash) AS n_distinct,
       round((count(*) - count(DISTINCT chunk_hash)) / count(*)::DOUBLE, 4)
         AS dup_frac
FROM ch
GROUP BY source
ORDER BY source
"""


def q_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split + leakage audit: split =
    md5-hash-fraction(doc_id) against cumulative boundaries (stable
    under appends and engine changes), then per (split, source) doc
    and token counts PLUS the count of docs whose exact-text
    fingerprint also appears in a DIFFERENT split — contamination the
    split itself introduced when the corpus holds exact duplicates.
    The fingerprint audit is one extra shuffle on md5(text); the split
    assignment is shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    frac = hash_fraction(F.col("doc_id"))
    split = (
        F.when(frac < SPLIT_TRAIN, F.lit("train"))
        .when(frac < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    base = docs.select(
        "doc_id",
        "source",
        split.alias("split"),
        token_count(F.col("text")).alias("n_tok"),
        F.md5("text").alias("fp"),
    )
    fp_spread = base.groupBy("fp").agg(
        F.countDistinct("split").alias("n_splits")
    )
    return (
        base.join(fp_spread, "fp")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0)).alias(
                "n_leaked"
            ),
        )
        .orderBy("split", "source")
    )


_HASH_FRAC_SQL = HASH_FRACTION_SQL_TMPL.format(key="doc_id")

Q_STRATIFIED_SPLIT_SQL = f"""
WITH base AS (
  SELECT doc_id, source,
         CASE WHEN {_HASH_FRAC_SQL} < {SPLIT_TRAIN} THEN 'train'
              WHEN {_HASH_FRAC_SQL} < {SPLIT_VAL} THEN 'val'
              ELSE 'test' END AS split,
         len(string_split(text, ' '))::BIGINT AS n_tok,
         md5(text) AS fp
  FROM documents
),
fp_spread AS (
  SELECT fp, count(DISTINCT split) AS n_splits FROM base GROUP BY fp
)
SELECT split, source,
       count(*) AS n_docs,
       sum(n_tok)::BIGINT AS n_tokens,
       sum(CASE WHEN n_splits > 1 THEN 1 ELSE 0 END)::BIGINT AS n_leaked
FROM base JOIN fp_spread USING (fp)
GROUP BY split, source
ORDER BY split, source
"""


# --- content-defined chunking ----------------------------------------------


# boundary divisor: a position STARTS a new chunk when the
# rolling-window hash of the trigram ending there is ≡ 0
# (mod CDC_DIVISOR) — the boundary token is the first token of the
# new chunk. Expected chunk length ≈ CDC_DIVISOR tokens.
CDC_DIVISOR = 16


def _cdc_chunk_frame(docs: DataFrame) -> DataFrame:
    """(doc_id, source, chunk_id, n_tok, chunk_hash) content-defined
    chunks: a token starts a new chunk when the md5 of the trigram
    ending at it is ≡ 0 mod CDC_DIVISOR (gear/Rabin construction with
    an engine-portable window hash). Shared by q_cdc_chunks and the
    edit-resistance test so the tested boundary rule IS the shipped
    one."""
    tok = docs.select(
        "doc_id",
        "source",
        F.posexplode(tokens(F.col("text"))).alias("i", "tok"),
    )
    # rolling trigram ending at i (shorter at the doc head)
    w3 = (
        W.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(-2, 0)
    )
    gram = F.concat_ws(" ", F.collect_list("tok").over(w3))
    h = F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
    flagged = tok.select(
        "doc_id",
        "source",
        "i",
        "tok",
        F.when((h % CDC_DIVISOR == 0) | (F.col("i") == 0), 1)
        .otherwise(0)
        .alias("boundary"),
    )
    w_cum = (
        W.partitionBy("doc_id")
        .orderBy("i")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    chunked = flagged.select(
        "doc_id",
        "source",
        "i",
        "tok",
        F.sum("boundary").over(w_cum).alias("chunk_id"),
    )
    return (
        chunked.groupBy("doc_id", "source", "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("i", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                )
            ).alias("chunk_hash"),
        )
    )


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking accounting: chunk boundaries depend
    only on LOCAL content (see _cdc_chunk_frame), so an insertion
    reshuffles the chunks around the edit point and nowhere else —
    chunk-level dedup survives document edits, where fixed windows
    (q_chunk_documents) shift everything after the edit. Emits per
    source: chunk count, distinct chunk hashes, mean chunk length,
    and the duplicate-chunk fraction.

    Scale shape: posexplode (flatMap) → per-position hash (row-local)
    → one per-doc prefix-sum window (partitioned by doc_id — bounded
    partitions, corpus-parallel) → per-chunk rollup → per-source
    rollup. Two shuffles total on (doc_id) and (source)."""
    chunks = _cdc_chunk_frame(load_table(spark, sf_dir, "documents"))
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chunk_hash").alias("n_distinct"),
            F.round(F.avg("n_tok"), 4).alias("avg_tok"),
        )
        .select(
            "source",
            "n_chunks",
            "n_distinct",
            "avg_tok",
            F.round(
                (F.col("n_chunks") - F.col("n_distinct"))
                / F.col("n_chunks").cast("double"),
                4,
            ).alias("dup_frac"),
        )
        .orderBy("source")
    )


Q_CDC_CHUNKS_SQL = f"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS i
  FROM documents
),
grams AS (
  SELECT doc_id, source, i, tok,
         string_agg(tok, ' ') OVER (
           PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS gram
  FROM tok
),
flagged AS (
  SELECT doc_id, source, i, tok,
         CASE WHEN (('0x' || substring(md5(gram), 1, 8))::UBIGINT
                    % {CDC_DIVISOR} = 0) OR i = 0
              THEN 1 ELSE 0 END AS boundary
  FROM grams
),
chunked AS (
  SELECT doc_id, source, i, tok,
         sum(boundary) OVER (
           PARTITION BY doc_id ORDER BY i
           ROWS UNBOUNDED PRECEDING) AS chunk_id
  FROM flagged
),
chunks AS (
  SELECT doc_id, source, chunk_id,
         count(*) AS n_tok,
         md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_hash
  FROM chunked
  GROUP BY doc_id, source, chunk_id
)
SELECT source,
       count(*) AS n_chunks,
       count(DISTINCT chunk_hash) AS n_distinct,
       round(avg(n_tok), 4) AS avg_tok,
       round((count(*) - count(DISTINCT chunk_hash)) / count(*)::DOUBLE, 4)
         AS dup_frac
FROM chunks
GROUP BY source
ORDER BY source
"""
