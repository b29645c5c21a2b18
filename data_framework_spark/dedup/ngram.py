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
    ≥ threshold (a = probe doc; self-pairs excluded; a<b normalized)."""
    grams = gram_postings(docs, id_col, text_col)
    sizes = grams.groupBy("doc").agg(F.count(F.lit(1)).alias("n"))
    probe_grams = grams.join(F.broadcast(probe), on="doc")
    inter = (
        probe_grams.alias("l")
        .join(
            grams.alias("r"),
            (F.col("l.gram") == F.col("r.gram"))
            & (F.col("l.doc") != F.col("r.doc")),
        )
        .groupBy(
            F.least(F.col("l.doc"), F.col("r.doc")).alias("a"),
            F.greatest(F.col("l.doc"), F.col("r.doc")).alias("b"),
        )
        # probe×probe pairs arrive in both orientations — DISTINCT
        # grams per (a,b) keeps the intersection count exact
        .agg(F.countDistinct(F.col("l.gram")).alias("inter"))
    )
    jac = (
        inter.join(sizes.alias("na"), F.col("a") == F.col("na.doc"))
        .join(sizes.alias("nb"), F.col("b") == F.col("nb.doc"))
        .select(
            "a",
            "b",
            "inter",
            F.col("na.n").alias("n_a"),
            F.col("nb.n").alias("n_b"),
        )
    )
    return (
        jac.withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
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
