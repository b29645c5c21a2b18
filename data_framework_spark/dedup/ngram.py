"""Character n-gram Jaccard similarity — the exact-set complement to
the hashed sketches in dedup/minhash.py and dedup/simhash.py.

Shingles are character trigrams (position-windowed substrings), which
catch near-dups that word-level shingles miss (small edits inside
words, whitespace/punctuation drift). The gram set is built with
JVM-side higher-order functions (`sequence` → `transform` →
`array_distinct` → `explode`) — no Python in the path.

Jaccard is computed exactly via the postings join: explode both sides
to (doc, gram), inner-join probe grams to corpus grams, count
intersections per pair, then |A∪B| = |A|+|B|−|A∩B|. With a probe set
the join cost is Σ_gram |probe postings|·|corpus postings| — linear
in the corpus for bounded probe sets, never the n² cross product.
At 100 TB the corpus postings list is the thing to pre-build and
reuse (it's a straight shuffle on gram); pathologically common grams
act like skewed join keys — cap or drop top-df grams upstream exactly
as web dedup pipelines drop stop-grams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table

N = 3  # character trigrams


def char_ngrams(text_col: str, n: int = N) -> Column:
    """Distinct character n-grams of column `text_col` (1-based
    windows) — pure higher-order-function SQL, no Python."""
    return F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length({text_col}), {n}) - {n - 1}),"
            f" i -> substring({text_col}, i, {n}))"
        )
    )


def gram_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, gram) rows — the postings table both queries join on."""
    return docs.select(
        F.col(id_col).alias("doc"),
        F.explode(char_ngrams(text_col)).alias("gram"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    probe: DataFrame,
) -> DataFrame:
    """(a, b, jaccard) for probe×corpus pairs with trigram-set Jaccard
    ≥ threshold (self-pairs excluded; a<b normalized).

    Shape: the probe docs' gram SETS broadcast as arrays; every corpus
    doc is compared against all of them with `array_intersect` — one
    corpus scan, |corpus|·|probe| bounded comparisons, zero shuffle.
    This beats the postings self-join decisively for small probe sets
    because common trigrams (' th', 'he ', …) appear in nearly every
    document: the postings join degenerates into a skewed
    near-cross-product on those grams (measured 20 s vs 2 s at sf0.1),
    while the array form's cost is flat per pair. For probe sets too
    large to broadcast, fall back to the postings join with stop-gram
    capping — the trade documented in the module docstring.
    """
    # the repartition is a materialization barrier: without it Catalyst
    # collapses this projection into the join output and re-evaluates
    # the O(len) gram-array expression once per PAIR instead of once
    # per doc (measured 13.5 s vs ~2 s at sf0.1). Grams are hashed to
    # longs AFTER the distinct — intersecting long arrays is ~2× faster
    # than UTF8 arrays, and a 64-bit collision inside one document
    # pair's trigram sets (≤ ~10^3 values) is ~1e-13 — far below any
    # float-rounding noise in the jaccard itself.
    gram_sets = docs.select(
        F.col(id_col).alias("doc"),
        F.transform(char_ngrams(text_col), lambda g: F.xxhash64(g)).alias("grams"),
    ).repartition(F.col("doc"))
    probe_sets = gram_sets.join(F.broadcast(probe), on="doc").select(
        F.col("doc").alias("p_doc"), F.col("grams").alias("p_grams")
    )
    inter = F.size(F.array_intersect(F.col("grams"), F.col("p_grams")))
    union = F.size("grams") + F.size("p_grams") - inter
    # exact-safe length prefilter: J(A,B) >= t implies
    # |A∩B| <= min(|A|,|B|) and |A∪B| >= max(|A|,|B|), so
    # min >= t·max — pairs failing the cheap size-ratio test cannot
    # reach the threshold and skip the O(|A|+|B|) intersect entirely
    sa, sb = F.size("grams"), F.size("p_grams")
    ratio_ok = F.least(sa, sb) >= F.lit(threshold) * F.greatest(sa, sb)
    return (
        gram_sets.crossJoin(F.broadcast(probe_sets))
        .filter((F.col("doc") != F.col("p_doc")) & ratio_ok)
        .select(
            F.least(F.col("doc"), F.col("p_doc")).alias("a"),
            F.greatest(F.col("doc"), F.col("p_doc")).alias("b"),
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .distinct()
    )


# --- driver-checkable query instantiations ---------------------------------


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-Jaccard ≥ 0.5 pairs for probe docs (doc_id < 20)."""
    docs = load_table(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") < 20).select(F.col("doc_id").alias("doc"))
    return ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5, probe=probe)


Q_NGRAM_JACCARD_PAIRS_SQL = f"""
WITH grams AS (
  SELECT doc_id AS doc,
         unnest(list_distinct(
           list_transform(range(1, greatest(length(text), {N}) - {N - 2}),
                          i -> substring(text, i, {N})))) AS gram
  FROM documents
),
sizes AS (SELECT doc, count(*) AS n FROM grams GROUP BY doc),
inter AS (
  SELECT least(l.doc, r.doc) AS a, greatest(l.doc, r.doc) AS b,
         count(DISTINCT l.gram) AS inter
  FROM grams l
  JOIN grams r ON l.gram = r.gram AND l.doc <> r.doc
  WHERE l.doc < 20
  GROUP BY least(l.doc, r.doc), greatest(l.doc, r.doc)
)
SELECT DISTINCT i.a, i.b,
       round(i.inter * 1.0 / (na.n + nb.n - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes na ON i.a = na.doc
JOIN sizes nb ON i.b = nb.doc
WHERE round(i.inter * 1.0 / (na.n + nb.n - i.inter), 6) >= 0.5
"""
