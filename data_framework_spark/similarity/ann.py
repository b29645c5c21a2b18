"""Similarity search over embedding columns.

Brute-force cosine top-k is the exact baseline: query set × corpus
with the dot product computed JVM-side via `zip_with` + `aggregate`
higher-order functions — no Python, no per-element explode/shuffle;
the cross join ships each corpus row past each (broadcast) query row
once. Cost is O(|Q|·N·d) FLOPs; right whenever |Q| is small or recall
must be exact.

The scale path (N ~ 10⁹ corpus vectors) is bucketed search: cluster /
hash vectors into buckets, search only the query's bucket(s).
`bucketed_topk` implements a deterministic sign-LSH (random-hyperplane
family with md5-derived hyperplanes) so buckets are reproducible
across engines and runs; recall/latency trades with `n_planes`.

Norms are precomputed once per side; arithmetic in double regardless
of the stored float32 to keep error below the 1e-6 rounding used for
oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table


def dot(a: Column, b: Column) -> Column:
    """Elementwise product + sum, all JVM-side (array<float> → double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cos) — self-matches excluded,
    ties broken by neighbor id so results are deterministic.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def signature_bits(vec: Column, n_planes: int, dim: int) -> Column:
    """Sign-LSH bucket id: bit p = sign(v · hyperplane_p).

    Hyperplane components are deterministic pseudo-randoms derived
    from md5(p, i) — reproducible across engines/runs without any
    RNG state (the reference pins its RNG seed for the same reason,
    vpicdataset.py:12).
    """
    bits = []
    for p in range(n_planes):
        comps = F.array(
            *[
                # md5 hex prefix → [0,1) uniform → centered at 0
                (
                    F.conv(F.substring(F.md5(F.lit(f"plane{p}_{i}")), 1, 8), 16, 10)
                    .cast("double")
                    / F.lit(float(16**8))
                    - 0.5
                )
                for i in range(dim)
            ]
        )
        proj = F.aggregate(
            F.zip_with(vec, comps, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.alias("bucket")


def bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    The join is an equi-join on bucket id — at scale that's a shuffle
    by bucket instead of a full cross product, cutting compared pairs
    by ~2^n_planes at the cost of recall near bucket boundaries
    (standard multi-probe / multi-table extensions apply).
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        signature_bits(F.col(vec_col), n_planes, dim),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        signature_bits(F.col(vec_col), n_planes, dim),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# --- driver-checkable query instantiations ---------------------------------


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 neighbors for the first 20 vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return brute_force_topk(emb, queries, "vec_id", "embedding", k=5)


Q_COSINE_TOPK_SQL = """
WITH e AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
  FROM embeddings
),
scored AS (
  SELECT
    q.vec_id AS query_id,
    c.vec_id AS neighbor_id,
    round(
      list_sum(list_transform(range(1, len(q.embedding) + 1),
                              i -> q.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE))
      / (q.nrm * c.nrm), 6) AS cos
  FROM e q, e c
  WHERE q.vec_id < 20 AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cos, rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
WHERE rank <= 5
"""


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos ≥ 0.4; the corpus is isotropic-random so its
    pairwise-cosine tail tops out near 0.5)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= 0.40)
    )


Q_EMBEDDING_NEAR_DUPS_SQL = """
WITH e AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))) AS nrm
  FROM embeddings
)
SELECT a.vec_id AS a, b.vec_id AS b,
       round(
         list_sum(list_transform(range(1, len(a.embedding) + 1),
                                 i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
         / (a.nrm * b.nrm), 6) AS cos
FROM e a, e b
WHERE a.vec_id < b.vec_id
  AND round(
        list_sum(list_transform(range(1, len(a.embedding) + 1),
                                i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        / (a.nrm * b.nrm), 6) >= 0.40
"""
