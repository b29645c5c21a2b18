"""Property tests for connected components and deterministic sampling
beyond the oracle parity check: known-graph components, convergence on
chains, and the sampling guarantee that actually matters — the kept
set depends only on keys, never on partitioning or row order."""

import pytest

from pyspark.sql import functions as F

from data_framework_spark.dedup.clusters import connected_components
from data_framework_spark.functions.sampling import (
    hash_fraction,
    stratified_sample,
)


@pytest.mark.slow  # r18: >9 s; slow lane (see pytest.ini)
def test_cc_known_graph(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (10, 11), (11, 12), (12, 13), (13, 14)],
        "a long, b long",
    )
    want = {
        1: 1, 2: 1, 3: 1,
        4: 4, 5: 4,
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
    }
    # both the driver-side fast path (default for small graphs) and
    # the distributed label-propagation path (forced) must agree
    for threshold in (None, 0):
        kw = {} if threshold is None else {"small_graph_edges": 0}
        out = {
            r["vertex"]: r["component"]
            for r in connected_components(edges, **kw).collect()
        }
        assert out == want, f"threshold={threshold}"


@pytest.mark.slow  # r18: >10 s; slow lane (see pytest.ini)
def test_cc_long_chain_converges(spark):
    """A 30-vertex path needs many propagation rounds — the fixpoint
    loop must actually reach it, not stop early."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "a long, b long"
    )
    out = connected_components(edges, small_graph_edges=0)
    comps = out.select("component").distinct().collect()
    assert len(comps) == 1 and comps[0]["component"] == 0


def test_cc_warns_when_fixpoint_not_reached(spark, caplog):
    """Exhausting max_rounds without convergence must be loud: the
    returned labels are then upper bounds, not component minima."""
    import logging

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "a long, b long"
    )
    with caplog.at_level(logging.WARNING, "data_framework_spark.dedup.clusters"):
        connected_components(edges, max_rounds=2, small_graph_edges=0).collect()
    assert any("fixpoint NOT reached" in r.message for r in caplog.records)


def test_sampling_partition_independent(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string")).alias("st"),
    )
    rates = {"s0": 0.5, "s1": 0.2, "s2": 0.9}
    base = {
        r["k"] for r in stratified_sample(df, "k", "st", rates).collect()
    }
    shuffled = df.repartition(7, "st").sortWithinPartitions(F.desc("k"))
    again = {
        r["k"]
        for r in stratified_sample(shuffled, "k", "st", rates).collect()
    }
    assert base == again
    # rates actually bite: each stratum's keep ratio near its rate
    for s, rate in rates.items():
        tot = 2000 / 3
        kept = sum(1 for k in base if k % 3 == int(s[1]))
        assert abs(kept / tot - rate) < 0.1, (s, kept / tot)


def test_hash_fraction_range(spark):
    row = (
        spark.range(0, 500)
        .select(hash_fraction(F.col("id")).alias("f"))
        .agg(F.min("f"), F.max("f"))
        .first()
    )
    assert 0.0 <= row[0] and row[1] < 1.0
