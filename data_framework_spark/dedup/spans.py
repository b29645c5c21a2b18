"""Exact-substring duplicate SPAN extraction: the maximal token
ranges of each document that also occur verbatim elsewhere in the
corpus.

Extension layer (SURVEY.md §7 phase 5) — the output shape of Lee et
al. 2022 ("Deduplicating Training Data Makes Language Models
Better", §4): not a per-doc duplicate *fraction* (that is
`dup_ngram_fraction`) but the concrete character/token RANGES to cut
from each document. Their suffix-array pipeline emits byte ranges;
the distributable equivalent here is k-gram collision marking
followed by interval merging:

1. every token position i (0-based) contributes the k-gram
   tokens[i .. i+K-1];
2. a position is DUPLICATED if its k-gram occurs more than once in
   the corpus (cross-doc or an intra-doc repeat — both are verbatim
   duplication);
3. a duplicated position i covers token indices [i, i+K-1]; the
   per-doc union of these intervals, merged where they overlap or
   touch, is the set of maximal duplicated spans.

Step 3 is the classic gaps-and-islands plan, expressed identically
on both engines: order a doc's duplicated intervals by start, carry
a running max of the interval ends, start a new island when an
interval begins past (running-max-end + 1), island id = running sum
of the flags, then min(start)/max(end) per island.

Scale shape: ONE posexplode of the raw tokens (corpus-linear,
~n_tokens rows), grams assembled by per-doc window leads (each gram
built exactly once — see duplicated_positions for the two Generate/
double-scan traps this dodges), then one gram-partitioned window
count — a single scan and two bounded shuffles (doc_id, then gram). At 100 TB
the gram column would be `xxhash64(gram)` (8 bytes instead of the
string; a hash collision marks a non-duplicate position duplicated —
harmless for cutting) — the string is kept here for DuckDB oracle
bit-parity. The islands window partitions by doc_id, so state is
per-document and bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table

SPAN_K = 5  # k-gram width in tokens


def duplicated_positions(docs: DataFrame) -> DataFrame:
    """(doc_id, pos) for every 0-based token position whose k-gram
    occurs >1 time in the corpus. ONE plain token explode, grams
    assembled by window `lead`s, ONE gram-partitioned window count.

    Two performance traps this shape avoids (both measured at sf0.1):
    - exploding a PRE-BUILT gram array re-evaluates the whole
      O(doc_len) array-construction expression once per OUTPUT row
      inside Generate (Catalyst collapses the projection into the
      generator child; a repartition between them does not stop it) —
      ~54× the intended work, 3.5 s vs 0.8 s. Exploding the raw
      tokens is cheap, and `concat_ws(w, lead(w,1)..lead(w,k-1))`
      over (doc_id, pos) builds each gram exactly once; the trailing
      partial windows are dropped via `lead(w, k-1) IS NOT NULL`
      (concat_ws would silently skip the nulls), which also zeroes
      out docs shorter than k tokens.
    - the round-7 aggregate+join formulation evaluated the gram
      subtree twice; `count(*) over (partition by gram)` marks each
      position in the same pass that counts it.

    Scale: the lead window partitions by doc_id (bounded per-doc
    state); the count window shuffles once on the gram. A
    pathological hot gram co-locates in one partition (no map-side
    combine) — if the corpus has such grams, pre-filter stopword
    grams or fall back to a persisted aggregate+join."""
    from data_framework_spark.functions.text import windowed_kgrams

    pos = windowed_kgrams(docs, SPAN_K)
    occ = F.count(F.lit(1)).over(W.partitionBy("gram"))
    return (
        pos.withColumn("occ", occ)
        .filter(F.col("occ") > 1)
        .select("doc_id", "pos")
    )


def merge_spans(iv: DataFrame) -> DataFrame:
    """Merge per-doc intervals (doc_id, s, e) where they overlap or
    touch (gap of exactly 1 still merges: adjacent token ranges form
    one contiguous duplicated region) into maximal spans
    (doc_id, span_start, span_end, span_len)."""
    w_ord = W.partitionBy("doc_id").orderBy("s")
    w_prev = w_ord.rowsBetween(W.unboundedPreceding, -1)
    flagged = iv.select(
        "doc_id",
        "s",
        "e",
        F.when(
            F.col("s") > F.max("e").over(w_prev) + 1, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("new_island"),
    ).select(
        "doc_id",
        "s",
        "e",
        F.sum("new_island").over(
            w_ord.rowsBetween(W.unboundedPreceding, 0)
        ).alias("island"),
    )
    return (
        flagged.groupBy("doc_id", "island")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
        )
        .orderBy("doc_id", "span_start")
    )


def q_dup_span_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated token spans per document:
    (doc_id, span_start, span_end, span_len), token indices 0-based
    inclusive, ordered by (doc_id, span_start)."""
    docs = load_table(spark, sf_dir, "documents")
    iv = duplicated_positions(docs).select(
        "doc_id",
        F.col("pos").alias("s"),
        (F.col("pos") + (SPAN_K - 1)).alias("e"),
    )
    return merge_spans(iv)


Q_DUP_SPAN_EXTRACT_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
),
positions AS (
  SELECT doc_id, ts,
         unnest(range(0, greatest(len(ts) - {SPAN_K} + 1, 0)))::BIGINT
           AS pos
  FROM toks
),
grams AS (
  SELECT doc_id, pos,
         array_to_string(list_slice(ts, pos + 1, pos + {SPAN_K}), ' ')
           AS gram
  FROM positions
),
dup_pos AS (
  SELECT doc_id, pos
  FROM grams
  WHERE gram IN (
    SELECT gram FROM grams GROUP BY gram HAVING count(*) > 1
  )
),
iv AS (
  SELECT doc_id, pos AS s, pos + {SPAN_K - 1} AS e FROM dup_pos
),
flagged AS (
  SELECT doc_id, s, e,
         CASE WHEN s > max(e) OVER (
                PARTITION BY doc_id ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1
              THEN 1 ELSE 0 END AS new_island
  FROM iv
),
islands AS (
  SELECT doc_id, s, e,
         sum(new_island) OVER (
           PARTITION BY doc_id ORDER BY s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
)
SELECT doc_id, min(s) AS span_start, max(e) AS span_end,
       max(e) - min(s) + 1 AS span_len
FROM islands
GROUP BY doc_id, island
ORDER BY doc_id, span_start
"""
