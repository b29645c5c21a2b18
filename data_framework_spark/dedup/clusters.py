"""Dedup clustering: connected components over the near-dup pair graph.

Pair generators (minhash/simhash/ngram/embedding) emit edges; the
pipeline step that actually SHRINKS a corpus is grouping those edges
into components and keeping one representative per cluster. Components
are computed by iterative min-label propagation (the standard
distributed CC algorithm, cf. GraphX/Pregel): every vertex starts as
its own label, each round adopts the minimum label in its closed
neighborhood, and the loop stops when a round changes nothing. Rounds
needed = graph diameter (near-dup clusters are dense and shallow —
a handful of rounds); each round is one join + one aggregate on the
edge list, both partitioned by vertex — no driver-side graph.

The driver-checked query runs CC over the MinHash-LSH near-dup pairs
of the documents table; the oracle computes the same components in
DuckDB with a recursive transitive-closure CTE (fine at oracle scale;
the Spark path is the one that scales).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, a: str = "a", b: str = "b", max_rounds: int = 50
) -> DataFrame:
    """(vertex, component) for every vertex appearing in `edges`;
    component = min vertex id reachable. Iterates label propagation to
    a fixpoint (checked per round with a cheap count of changed
    labels)."""
    # eager localCheckpoint: iterative plans grow lineage every round —
    # without truncation each action re-analyzes (and can re-execute)
    # the whole chain back to the edge producer. Checkpointing the
    # edge list once and the labels each round keeps every round's
    # plan two joins deep (measured ~40x on the near-dup graph).
    # The rounds run on few shuffle partitions: the label table is
    # vertex-sized (thousands), so per-round cost is task scheduling,
    # not data — partitions scale with |V|, not the cluster default.
    spark = edges.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        return _cc_rounds(edges, a, b, max_rounds)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def _cc_rounds(
    edges: DataFrame, a: str, b: str, max_rounds: int
) -> DataFrame:
    sym = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("v"))
        .distinct()
        .withColumn("label", F.col("v"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        # min label over the closed neighborhood: own label ∪ neighbors'
        neighbor_min = (
            sym.join(labels, sym.dst == labels.v)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        # carry a changed flag instead of re-joining against the old
        # labels: the fixpoint check is then a filter on the (already
        # checkpointed) new frame
        new_labels = (
            labels.join(neighbor_min, labels.v == neighbor_min.src, "left")
            .select(
                "v",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("new_label"),
                F.col("label").alias("old_label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(
            F.col("new_label") != F.col("old_label")
        ).count()
        labels = new_labels.select(
            "v", F.col("new_label").alias("label")
        )
        if changed == 0:
            break
    return labels.select(F.col("v").alias("vertex"), F.col("label").alias("component"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the MinHash-LSH near-dup graph on
    `documents`: (doc_id, cluster representative = min doc_id in the
    component), plus each cluster's size — the keep-one-per-cluster
    step of corpus dedup. Oracle: recursive transitive closure over
    the same edge list (the pair query is itself oracle-verified, so
    both engines see identical edges)."""
    from data_framework_spark.dedup.minhash import q_minhash_near_dups

    pairs = q_minhash_near_dups(spark, sf_dir).select("a", "b")
    cc = connected_components(pairs)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(F.broadcast(sizes), "component")
        .select(
            F.col("vertex").alias("doc_id"),
            F.col("component").alias("cluster_rep"),
            "cluster_size",
        )
        .orderBy("doc_id")
    )


def _clusters_sql(pairs_sql: str) -> str:
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION
  SELECT b AS src, a AS dst FROM pairs
),
walk AS (
  SELECT src, src AS reach FROM edges
  UNION
  SELECT e.src, w.reach
  FROM edges e JOIN walk w ON e.dst = w.src
),
cc AS (
  SELECT src AS doc_id, min(reach) AS cluster_rep FROM walk GROUP BY src
),
sizes AS (
  SELECT cluster_rep AS c, count(*) AS cluster_size FROM cc GROUP BY 1
)
SELECT cc.doc_id, cc.cluster_rep, sizes.cluster_size
FROM cc JOIN sizes ON cc.cluster_rep = sizes.c
ORDER BY cc.doc_id
"""


def clusters_sql() -> str:
    from data_framework_spark.dedup.minhash import Q_MINHASH_NEAR_DUPS_SQL

    inner = Q_MINHASH_NEAR_DUPS_SQL
    return _clusters_sql(f"SELECT a, b FROM ({inner})")
