"""Streaming heavy hitters: Misra-Gries state per hash bucket under
`applyInPandasWithState`, exact-verified after the replay.

The streaming face of functions/heavy_hitters.py (same sketch, same
sketch-then-verify contract): "which keys exceed the frequency
threshold?" answered ONLINE over an unbounded stream, without the
full-cardinality state a plain streaming groupBy(user).count() would
accumulate. Each incoming micro-batch folds into a bounded
Misra-Gries summary (STREAM_HH_K counters) kept in the state store,
so state size is O(buckets × K) forever, independent of key
cardinality — the property that matters when the stream's key space
grows without bound.

Sharding: keys are hashed into STREAM_HH_BUCKETS buckets and each
bucket maintains its own MG summary in parallel (the state store
partitions by the group key). A key's entire stream lands in ONE
bucket, so the per-bucket MG guarantee (no key with bucket-count >
n_bucket/(K+1) is ever evicted) implies the global superset property:
any key above the global threshold survives its bucket's summary.
With the threshold at STREAM_HH_NUM/STREAM_HH_DEN of the per-key mean
and U distinct keys, K must exceed U·DEN/(NUM·BUCKETS) — 256 covers
the shipped corpora with ~6× margin; at production cardinality K
scales with U/BUCKETS, still sketch-sized.

After the bounded replay drains, the final per-bucket summaries are
merged (bounded: BUCKETS × K rows) and the candidates re-counted
EXACTLY over the batch table — the oracle is a plain GROUP BY/HAVING,
and the hash must match, proving both the streaming state machinery
AND the sketch's superset guarantee end-to-end. The threshold test is
integer-exact (cnt·U·DEN > total·NUM·... no float boundaries).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from data_framework_spark.functions.heavy_hitters import mg_fold
from data_framework_spark.sources.tables import load_table
from data_framework_spark.streaming.stateful import (
    chunked_events_source,
    run_stateful_to_completion,
)

STREAM_HH_BUCKETS = 8
STREAM_HH_K = 256
# heavy = count > (NUM/DEN) × mean per-key count, i.e. 1.2× the mean
STREAM_HH_NUM = 12
STREAM_HH_DEN = 10

_OUT_SCHEMA = "bucket long, user_id long, n_bucket long"
_STATE_SCHEMA = "uids array<long>, cnts array<long>, n bigint"


def streaming_bucket_sketches(stream: DataFrame) -> DataFrame:
    """Per-bucket MG summaries maintained across micro-batches; each
    update emits the bucket's current candidate set stamped with the
    bucket's running row count (monotone — the read-out keys on its
    maximum to find the final summary)."""

    def track(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.exists:
            uids, cnts, n = state.get
            counters = pd.Series(list(cnts), index=list(uids), dtype="int64")
        else:
            counters, n = None, 0
        for pdf in pdfs:
            n += len(pdf)
            counters = mg_fold(
                counters, pdf["user_id"].value_counts(), STREAM_HH_K
            )
        state.update(
            ([int(u) for u in counters.index], [int(c) for c in counters], n)
        )
        yield pd.DataFrame(
            {
                "bucket": bucket,
                "user_id": [int(u) for u in counters.index],
                "n_bucket": n,
            }
        )

    return stream.groupBy("bucket").applyInPandasWithState(
        track,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def q_streaming_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END streaming heavy hitters: the 3-chunk events replay
    feeds per-bucket Misra-Gries state; the final summaries' merged
    candidates are exactly re-counted and thresholded at 1.2× the
    mean per-user event count. The result must hash-equal the
    oracle's plain GROUP BY/HAVING — the driver-visible proof that
    the sketch state survives micro-batches AND retains every true
    heavy hitter."""
    stream = chunked_events_source(spark, sf_dir, n_chunks=3)
    keyed = stream.select(
        (F.col("user_id") % STREAM_HH_BUCKETS).alias("bucket"), "user_id"
    )
    # 2 partitions: only STREAM_HH_BUCKETS=8 group keys exist, so
    # extra partitions buy no Python-side parallelism and pay extra
    # per-partition state-store commits (r15 ablation)
    updates, progress = run_stateful_to_completion(
        spark, streaming_bucket_sketches(keyed), shuffle_partitions=2
    )
    n_batches = len([p for p in progress if p["numInputRows"] > 0])
    assert n_batches >= 3, f"expected >=3 data micro-batches, got {n_batches}"
    # final summary per bucket = rows stamped with the bucket's max n
    w = W.partitionBy("bucket")
    cand = (
        updates.withColumn("__mx", F.max("n_bucket").over(w))
        .filter(F.col("n_bucket") == F.col("__mx"))
        .select("user_id")
        .distinct()
    )
    # ONE events scan serves both the exact candidate re-count and the
    # global (total, distinct-users) denominators: per-user counts are
    # the common sub-aggregate of both (the oracle's CTE shape), so
    # they are persisted once and both consumers read the 1500-row
    # cache instead of re-scanning the table (the pagerank
    # materialize-then-release pattern — the previous form scanned
    # events twice, once per denominator)
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    ).persist()
    totals = counts.agg(
        F.sum("n_events").alias("total"), F.count(F.lit(1)).alias("u")
    )
    out = (
        counts.join(F.broadcast(cand), "user_id")
        .crossJoin(F.broadcast(totals))
        # integer-exact: n_events > (NUM/DEN) * total / u
        .filter(
            F.col("n_events") * F.col("u") * STREAM_HH_DEN
            > F.col("total") * STREAM_HH_NUM
        )
        .select("user_id", "n_events")
        .orderBy("user_id")
    )
    # materialize before releasing the persisted counts; the release
    # must survive a failed materialization or retries re-persist a
    # fresh copy per attempt (r15 review)
    try:
        pdf = out.toPandas()
    finally:
        counts.unpersist()
    return spark.createDataFrame(pdf, schema=out.schema)


Q_STREAMING_HEAVY_HITTERS_SQL = f"""
WITH c AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
),
t AS (
  SELECT sum(n_events)::BIGINT AS total, count(*)::BIGINT AS u FROM c
)
SELECT user_id, n_events
FROM c, t
WHERE n_events * u * {STREAM_HH_DEN} > total * {STREAM_HH_NUM}
ORDER BY user_id
"""
