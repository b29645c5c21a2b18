"""Round-9 changes: widen_scan positive-allowlist guard, the
session-index source fingerprint, the shuffle-free _shingles form,
and the written-order ADC fold.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


# --- widen_scan: positive allowlist guard -----------------------------------


def test_widen_scan_noops_on_dedup_and_distinct(spark):
    """The round-8 substring blocklist let Deduplicate/Distinct frames
    through to the df.rdd probe (silent eager-execution hazard under
    AQE); the round-9 positive allowlist must return ANY frame whose
    plan is not pure Project/Filter/scan unchanged."""
    from data_framework_spark.sources.tables import load_table, widen_scan

    docs = load_table(spark, SF_SMALL, "documents")
    dd = docs.dropDuplicates(["source"])
    assert widen_scan(dd) is dd
    di = docs.select("source").distinct()
    assert widen_scan(di) is di
    # the r8 contract still holds for scan/filter/project frames
    n = spark.sparkContext.defaultParallelism
    fp = docs.filter(F.col("doc_id") < 100).select("doc_id", "text")
    assert widen_scan(fp).rdd.getNumPartitions() == n


# --- session_index_dir: source-data fingerprint -----------------------------


def test_session_index_dir_rebuilds_on_source_rewrite(spark, tmp_path):
    """Rewriting the data under sf_dir within a session must
    invalidate the cached index entry (round-8 advisory: the stale
    entry produced wrong-but-plausible BM25/IVF results for callers
    reusing a directory)."""
    from data_framework_spark.sources.formats import (
        get_index_dir,
        session_index_dir,
    )

    sf = str(tmp_path / "sfx")
    os.makedirs(sf)
    shutil.copy(
        os.path.join(SF_SMALL, "region.parquet"),
        os.path.join(sf, "region.parquet"),
    )
    builds = []
    p1 = session_index_dir(spark, sf, "fp_idx_", lambda p: builds.append(p))
    p1b = session_index_dir(spark, sf, "fp_idx_", lambda p: builds.append(p))
    assert p1 == p1b and len(builds) == 1  # build-once while unchanged
    assert get_index_dir(spark, sf, "fp_idx_") == p1
    # rewrite the source: copy again with a bumped mtime
    time.sleep(0.01)
    shutil.copy(
        os.path.join(SF_SMALL, "nation.parquet"),
        os.path.join(sf, "region.parquet"),
    )
    os.utime(os.path.join(sf, "region.parquet"))
    p2 = session_index_dir(spark, sf, "fp_idx_", lambda p: builds.append(p))
    assert len(builds) == 2 and p2 != p1
    assert get_index_dir(spark, sf, "fp_idx_") == p2


# --- _shingles: shuffle-free form -------------------------------------------


def test_shingles_plan_is_exchange_free(spark):
    """The round-9 _shingles (explode over array_distinct inside
    codegen) must add ZERO exchanges — the structural property that
    keeps the multi-consumer pair/cluster paths from paying one
    (doc, shingle) shuffle per consumer at 100 TB."""
    from data_framework_spark.dedup.minhash import _shingles
    from data_framework_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    sh = _shingles(docs, "doc_id", "text")
    plan = sh._jdf.queryExecution().executedPlan().toString()
    # widen_scan MAY add one round-robin repartition on the small test
    # scan (structural no-op at scale); no shuffle beyond that
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 1, plan
    assert "hashpartitioning" not in plan, plan
    # semantics: per-doc distinct shingles
    rows = sh.filter(F.col("doc") == 0).collect()
    vals = [r["shingle"] for r in rows]
    assert len(vals) == len(set(vals))


# --- ADC written-order fold: Spark == oracle under permuted input ------------


def test_adc_fold_is_subspace_ordered(spark):
    """The PQ/IVFPQ ADC aggregation folds the 8 subspace lookups in
    subspace order regardless of row arrival order — the property
    F.sum does NOT guarantee (round-8 advisory)."""
    rows = [(1, 7, 0.3), (1, 0, 0.1), (1, 3, 0.2)]
    df = spark.createDataFrame(rows, "neighbor_id int, subspace int, dlook double")
    folded = df.groupBy("neighbor_id").agg(
        F.round(
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("subspace"), F.col("dlook")))
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["dlook"],
            ),
            6,
        ).alias("adc_dist")
    )
    assert folded.collect()[0]["adc_dist"] == round(0.0 + 0.1 + 0.2 + 0.3, 6)
