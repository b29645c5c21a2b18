"""Round-5 additions: curation funnel, incremental dedup, ANN route
cache, and the funnel's single-scan plan property.

The oracle parity suite already pins VALUES for every registered
query; these tests pin the structural invariants that a hash match
alone would not explain if they broke — stage monotonicity, exhaustive
accounting, cache identity, and plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_funnel_stage_monotonicity(spark, sf_dir):
    """Each funnel stage can only shrink the survivor set, per source,
    and the shard/token columns are consistent with the kept set."""
    from data_framework_spark.functions.corpus import q_curation_funnel

    rows = q_curation_funnel(spark, sf_dir).collect()
    assert rows, "funnel returned no sources"
    for r in rows:
        assert (
            r["n_docs"]
            >= r["n_quality"]
            >= r["n_clean"]
            >= r["n_unique"]
            >= r["n_kept"]
            >= 0
        ), f"stage counts not monotone for {r['source']}: {r}"
        assert r["n_shards_used"] <= r["n_kept"]
        if r["n_kept"] == 0:
            assert r["kept_tokens"] == 0 and r["n_shards_used"] == 0
        else:
            assert r["kept_tokens"] > 0 and r["n_shards_used"] >= 1


def test_funnel_totals_match_training_corpus(spark, sf_dir):
    """Funnel stage-0 totals equal the documents table minus the
    held-out benchmark slice (the same deterministic split
    q_benchmark_decontam uses)."""
    from data_framework_spark.functions.corpus import (
        DECONTAM_BENCH_FRAC,
        q_curation_funnel,
    )
    from data_framework_spark.functions.sampling import hash_fraction
    from data_framework_spark.sources.tables import load_table

    funnel_total = sum(
        r["n_docs"] for r in q_curation_funnel(spark, sf_dir).collect()
    )
    docs = load_table(spark, sf_dir, "documents")
    train_total = docs.filter(
        hash_fraction(F.col("doc_id")) >= DECONTAM_BENCH_FRAC
    ).count()
    assert funnel_total == train_total


def test_funnel_reads_documents_via_cache(spark, sf_dir):
    """The shared per-doc feature projection is materialized once.
    Since r18 the train chain reads the eager localCheckpoint of the
    slim flags frame (a Scan ExistingRDD — the checkpoint replaced the
    repeated cache-read of the heavy projection), while the bench
    shingle branch still reads the persisted base (InMemoryTableScan);
    every parquet FileScan in the plan string must sit INSIDE an
    InMemoryRelation rendering (displayed, not re-executed), so the
    documents file is scanned at most once per materialization."""
    from data_framework_spark.functions.corpus import q_curation_funnel

    df = q_curation_funnel(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the bench-shingle branch reads the persisted base...
    assert plan.count("InMemoryTableScan") >= 1, plan[:2000]
    # ...and the train chain reads the checkpointed slim frame
    assert "Scan ExistingRDD" in plan, plan[:2000]
    # no bare FileScan: each line mentioning the parquet file must be
    # part of an InMemoryRelation subtree (rendered with ':' or '+-'
    # nesting below the relation), i.e. no top-level re-scan
    for line in plan.splitlines():
        if "documents.parquet" in line and "FileScan" in line:
            assert line.lstrip().startswith(("+-", ":")), line


def test_dedup_incremental_accounting(spark, sf_dir):
    """exact + near + kept partitions the arriving batch exactly, and
    the batch size matches the split constant."""
    from data_framework_spark.dedup.exact import (
        INCR_SPLIT,
        q_dedup_incremental,
    )
    from data_framework_spark.sources.tables import load_table

    rows = q_dedup_incremental(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["n_exact_dup"] + r["n_near_dup"] + r["n_kept"] == r["n_new"]
    batch = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") >= INCR_SPLIT)
        .count()
    )
    assert sum(r["n_new"] for r in rows) == batch


def test_ann_route_cache_reuses_results(spark, sf_dir):
    """Within one session + sf_dir the route query returns the SAME
    persisted DataFrame object, so the recall contracts read cached
    results instead of re-executing the route plans."""
    from data_framework_spark.similarity.ann import q_cosine_topk

    a = q_cosine_topk(spark, sf_dir)
    b = q_cosine_topk(spark, sf_dir)
    assert a is b
    assert a.storageLevel.useMemory, "route result is not persisted"


def test_asof_right_side_tie_proof(spark):
    """With duplicate right rows at the same (by, ts), the attribution
    pre-dedupe keeps max(value) — the same row DuckDB's grouped oracle
    keeps — so exact-timestamp ties cannot diverge between engines."""
    import datetime as dt

    from data_framework_spark.operators.asof import asof_join

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    left = spark.createDataFrame(
        [(1, t0, "L")], "user_id long, ts timestamp, tag string"
    )
    right_dup = spark.createDataFrame(
        [(1, t0, 10.0), (1, t0, 30.0), (1, t0, 20.0)],
        "user_id long, ts timestamp, value double",
    )
    deduped = right_dup.groupBy("user_id", "ts").agg(
        F.max("value").alias("value")
    )
    out = asof_join(
        left, deduped, by="user_id", ts="ts", right_payload=["value"]
    ).collect()
    assert len(out) == 1 and out[0]["value_r"] == 30.0
    # and even WITHOUT the dedupe, the carry-struct tie-break picks the
    # greatest payload deterministically
    out2 = asof_join(
        left, right_dup, by="user_id", ts="ts", right_payload=["value"]
    ).collect()
    assert len(out2) == 1 and out2[0]["value_r"] == 30.0


def test_compaction_produces_disjoint_ts_ranges(spark, sf_dir, tmp_path):
    """Range-sorted compaction must give output files with disjoint ts
    min/max ranges — the property that makes row-group/file skipping
    effective on later time-range scans."""
    import os

    import pyarrow.parquet as pq

    from data_framework_spark.sources.formats import compact_files
    from data_framework_spark.sources.tables import load_table

    frag = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(16).write.mode("overwrite").parquet(frag)
    compact_files(spark, frag, out, target_files=4, sort_col="ts")

    spans = []
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(out, f))
        los, his = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "ts"
            )
            los.append(col.statistics.min)
            his.append(col.statistics.max)
        spans.append((min(los), max(his)))
    assert len(spans) == 4
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {spans}"
    # and content survived intact
    assert spark.read.parquet(out).count() == ev.count()


def test_heavy_hitters_superset_guarantee(spark):
    """Misra-Gries candidate union must contain every true heavy
    hitter on adversarial-ish skewed data, so the re-counted result
    equals the exact answer (checked across several skew shapes)."""
    import random

    from data_framework_spark.functions.heavy_hitters import heavy_hitters

    rng = random.Random(7)
    for trial, (n_heavy, n_noise, reps) in enumerate(
        [(3, 500, 80), (1, 2000, 300), (10, 100, 40)]
    ):
        stream = []
        for h in range(n_heavy):
            stream += [f"hot{h}"] * reps
        stream += [f"cold{i}" for i in range(n_noise)]
        rng.shuffle(stream)
        toks = spark.createDataFrame(
            [(t,) for t in stream], "tok string"
        ).repartition(8)
        got = {
            (r["tok"], r["cnt"])
            for r in heavy_hitters(toks, k=50).collect()
        }
        from collections import Counter

        c = Counter(stream)
        want = {
            (t, n) for t, n in c.items() if n * 50 > len(stream)
        }
        assert got == want, f"trial {trial}: {got} != {want}"


def test_weighted_sample_avoids_global_sort(spark, sf_dir):
    """The top-K cut must plan as TakeOrderedAndProject (per-partition
    top-K + driver merge), not a full Sort over an Exchange of the
    whole corpus."""
    from data_framework_spark.functions.sampling import q_weighted_sample

    plan = (
        q_weighted_sample(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_heavy_hitters_broadcasts_candidates(spark, sf_dir):
    """The exact re-count pass must broadcast the (tiny) candidate set
    and filter the token stream BEFORE aggregating — the plan carries a
    BroadcastHashJoin, never a shuffle join of the raw tokens against
    candidates."""
    from data_framework_spark.functions.heavy_hitters import q_heavy_hitters

    plan = (
        q_heavy_hitters(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, (
        plan[:1500]
    )
    assert "SortMergeJoin" not in plan, plan[:1500]
