"""Round-6 changes: vectorized Misra-Gries heavy-hitters pass,
shuffle-free lang_id second barrier, funnel scratch lifecycle +
materialized feature-table variant, and ANN route-cache bench
eviction."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


# --- heavy hitters: vectorized Misra-Gries ---------------------------------


def _run_mg(batches, k):
    from data_framework_spark.functions.heavy_hitters import _mg_partial

    out = list(_mg_partial(k)(iter(batches)))
    assert len(out) == 1
    pdf = out[0]
    n = int(pdf.loc[pdf["tok"].isna(), "c"].iloc[0])
    cands = set(pdf.loc[pdf["tok"].notna(), "tok"])
    return cands, n


def test_mg_superset_guarantee():
    """The per-partition summary must retain every token whose count
    exceeds n_part/k — the Misra-Gries guarantee the exact re-count
    pass relies on — including across batch boundaries (the merge-rule
    trim must not evict a true heavy hitter)."""
    k = 5
    # one dominant token spread across batches + unique filler
    toks = (["hot"] * 40) + [f"u{i}" for i in range(60)]
    batches = [
        pd.DataFrame({"tok": toks[i : i + 10]}) for i in range(0, 100, 10)
    ]
    cands, n = _run_mg(batches, k)
    assert n == 100
    assert "hot" in cands  # 40 > 100/5
    assert len(cands) <= k  # the k-counter bound held after trims


def test_mg_handles_empty_partition():
    cands, n = _run_mg([pd.DataFrame({"tok": pd.Series([], dtype=str)})], 5)
    assert n == 0 and cands == set()


def test_mg_trim_bound_many_batches():
    """Adversarial trim pressure: every batch introduces k+1 distinct
    tokens so the trim fires on every merge; the row-count marker and
    counter bound must survive."""
    k = 3
    batches = [
        pd.DataFrame({"tok": [f"b{b}_t{i}" for i in range(k + 1)]})
        for b in range(20)
    ]
    cands, n = _run_mg(batches, k)
    assert n == 20 * (k + 1)
    assert len(cands) <= k


# --- lang_id: one exchange, uncollapsed projections ------------------------


def test_lang_id_plan_single_exchange(spark, sf_dir):
    """The round-6 rework replaced the second repartition barrier with
    a value-preserving non-deterministic guard: the physical plan must
    contain exactly ONE exchange (the parallelism repartition) and the
    padded-text concat must appear exactly once (CollapseProject did
    NOT inline it into the 25-replace score chain)."""
    from data_framework_spark.functions.text import q_lang_id

    plan = (
        q_lang_id(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert plan.count("concat( , lower(") == 1, plan


def test_lang_id_nd_barrier_preserves_values(spark):
    """The rand()-guard barrier must be a value no-op."""
    from data_framework_spark.functions.text import _nd_barrier

    df = spark.range(100).select(
        F.col("id"), _nd_barrier(F.col("id") * 2).alias("v")
    )
    assert df.filter(F.col("v") != F.col("id") * 2).count() == 0


# --- curation funnel: scratch lifecycle + materialized variant -------------


def test_funnel_scratch_tracked_and_released(spark, sf_dir):
    from data_framework_spark.functions.corpus import (
        _FUNNEL_SCRATCH,
        q_curation_funnel,
        release_funnel_scratch,
    )

    release_funnel_scratch()
    q_curation_funnel(spark, sf_dir).collect()
    assert len(_FUNNEL_SCRATCH) == 1
    (df,) = _FUNNEL_SCRATCH.values()
    assert df.storageLevel.useMemory  # actually persisted
    release_funnel_scratch()
    assert not _FUNNEL_SCRATCH
    assert not df.storageLevel.useMemory  # actually unpersisted


def test_funnel_mat_matches_default(spark, sf_dir):
    from data_framework_spark.functions.corpus import (
        q_curation_funnel,
        q_curation_funnel_mat,
    )

    a = sorted(map(tuple, q_curation_funnel(spark, sf_dir).collect()))
    b = sorted(map(tuple, q_curation_funnel_mat(spark, sf_dir).collect()))
    assert a == b


# --- ANN route cache: bench eviction ---------------------------------------


def test_evict_route_forces_reexecution(spark, sf_dir):
    from data_framework_spark.similarity.ann import (
        _ROUTE_CACHE,
        evict_route,
        q_cosine_topk,
    )

    df1 = q_cosine_topk(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "cosine_topk")
    assert key in _ROUTE_CACHE
    evict_route(spark, sf_dir, "cosine_topk")
    assert key not in _ROUTE_CACHE
    assert not df1.storageLevel.useMemory  # unpersisted on eviction
    df2 = q_cosine_topk(spark, sf_dir)
    assert df2 is not df1  # rebuilt, not a dict hit
    # evicting a key that is absent is a no-op, not an error
    evict_route(spark, sf_dir, "cosine_topk")
    evict_route(spark, sf_dir, "cosine_topk")
