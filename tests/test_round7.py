"""Round-7 regression suite: signed-zero stabilization (the round-6
driver red), engine-divergent edge guards, and the GEMM association
fix — plus a source-level sweep that keeps new queries from
reintroducing bare rounded regression aggregates.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest
from pyspark.sql import functions as F

PKG = Path(__file__).resolve().parent.parent / "data_framework_spark"


# --- signed-zero: the stable_round contract -------------------------------


def test_stable_round_canonicalizes_negative_zero(spark):
    """-0.0 + 0.0 == +0.0 per IEEE 754; stable_round must render a
    rounded -0.0 as a value the strict digest formats as '0', not
    '-0'."""
    import duckdb

    from data_framework_spark.functions.numeric import stable_round
    from data_framework_spark.oracle import _norm

    row = (
        spark.range(1)
        .select(stable_round(F.lit(-0.00001), 4).alias("s"))
        .collect()[0]
    )
    assert _norm(row["s"]) == "0"
    # the trap is DuckDB-side (Spark's round already canonicalizes):
    # bare round keeps the sign, `+ 0.0` clears it
    bare, stab = duckdb.connect().execute(
        "SELECT round(-0.00001::DOUBLE, 4), round(-0.00001::DOUBLE, 4) + 0.0"
    ).fetchone()
    assert _norm(bare) == "-0"  # what made the round-6 driver row red
    assert _norm(stab) == "0"


def test_oracle_norm_distinguishes_signed_zero():
    """The local replica must be at least as strict as the driver's
    digest: -0.0 and +0.0 hash differently (round-6 process bug —
    the replica collapsed them, hiding a driver-only red)."""
    from data_framework_spark.oracle import _norm

    assert _norm(-0.0) != _norm(0.0)
    assert _norm(0.0) == "0"


def test_no_bare_rounded_regression_aggregates():
    """Every F.round over a regr_* / covar_* aggregate in the query
    modules must go through stable_round (or append + F.lit(0.0)):
    a rounded slope/covariance can land on -0.0 on one engine and
    +0.0 on the other, and the driver digest distinguishes them."""
    bad: list[str] = []
    pat = re.compile(r"F\.round\(\s*F\.(regr_|covar_)")
    for path in PKG.rglob("*.py"):
        if path.name == "numeric.py":  # the helper documents the pattern
            continue
        for i, line in enumerate(path.read_text().splitlines(), 1):
            if pat.search(line):
                bad.append(f"{path.relative_to(PKG)}:{i}: {line.strip()}")
    assert not bad, f"bare rounded regression aggregates: {bad}"


def test_oracle_sql_regr_rounds_are_stabilized():
    """The DuckDB side of the same sweep: any round(regr_*...) in an
    oracle SQL string must be followed by `+ 0.0`."""
    from data_framework_spark.registry import QUERIES

    bad: list[str] = []
    pat = re.compile(r"round\(regr_[a-z0-9_]+\([^;]*?\),\s*\d+\)(?!\s*\+\s*0\.0)")
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        for m in pat.finditer(q.oracle):
            bad.append(f"{name}: {m.group(0)[:80]}")
    assert not bad, f"unstabilized oracle regr rounds: {bad}"


# --- repeated-digest stress for the regr family ---------------------------


@pytest.mark.parametrize("name", ["heaps_fit", "zipf_fit"])
def test_regr_query_digest_stable_across_duckdb_runs(spark, sf_dir, name):
    """The round-6 flap reproduced within 6 DuckDB runs; 5 fresh
    connections against one fixed Spark digest catch a recurrence."""
    from data_framework_spark.oracle import _digest, duckdb_connection
    from data_framework_spark.registry import QUERIES

    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    sdig = _digest([tuple(r) for r in sdf.collect()], list(sdf.columns))
    for _ in range(5):
        con = duckdb_connection(sf_dir)
        res = con.execute(q.oracle)
        dcols = [d[0] for d in res.description]
        assert _digest(res.fetchall(), dcols) == sdig
        con.close()


# --- funnel rounding semantics --------------------------------------------


def test_funnel_rates_use_half_up_not_banker(spark):
    """A representable 4dp midpoint (1/32 = 0.03125) must round to
    0.0313 (HALF_UP, matching DuckDB), not Python round()'s 0.0312
    (HALF_EVEN) — checked through the same F.round expression the
    funnel uses (round-6 advisory, medium)."""
    assert round(1 / 32, 4) == 0.0312  # Python banker's — the bug

    v = (
        spark.createDataFrame([(1, 32)], "num long, den long")
        .select(
            F.when(F.col("den") == 0, F.lit(0.0))
            .otherwise(F.round(F.col("num") / F.col("den").cast("double"), 4))
            .alias("r")
        )
        .collect()[0]["r"]
    )
    assert v == 0.0313


def test_funnel_zero_denominator_yields_zero(spark):
    """An empty stage must give conversion 0.0 on both engines (the
    SQL has the same CASE guard; Spark NULL vs DuckDB NaN from 0/0
    was the divergence)."""
    from data_framework_spark.operators.analytics import Q_FUNNEL_STAGES_SQL

    assert "CASE WHEN n1 = 0 THEN 0.0" in Q_FUNNEL_STAGES_SQL
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        "(1::BIGINT, TIMESTAMP '2024-01-01', 'signup')) t(user_id, ts, event_type)"
    )
    row = con.execute(Q_FUNNEL_STAGES_SQL).fetchone()
    # n_signup=1, all later stages empty -> all rates 0.0, never NaN
    assert row[0] == 1 and row[4] == 0.0 and row[5] == 0.0 and row[6] == 0.0


# --- ks_drift single-source guard -----------------------------------------


def test_ks_drift_single_source_is_zero(spark):
    """When one source constitutes the whole corpus the rest-of-corpus
    CDF denominator is 0 (Spark NULL vs DuckDB NaN); both engines now
    emit ks = 0.0."""
    import duckdb

    from data_framework_spark.functions.drift import Q_KS_DRIFT_SQL, q_ks_drift

    docs = spark.createDataFrame(
        [(i, "only", 10 * i) for i in range(1, 21)],
        "doc_id long, source string, n_chars long",
    )
    import data_framework_spark.functions.drift as drift_mod
    from data_framework_spark.sources import tables as tables_mod

    orig = tables_mod.load_table
    try:
        drift_mod.load_table = lambda s, d, t: docs
        out = q_ks_drift(spark, "unused").collect()
    finally:
        drift_mod.load_table = orig
    assert len(out) == 1 and out[0]["ks"] == 0.0

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT "
        "range AS doc_id, 'only' AS source, 10 * range AS n_chars "
        "FROM range(1, 21)"
    )
    drow = con.execute(Q_KS_DRIFT_SQL).fetchall()
    assert len(drow) == 1 and drow[0][2] == 0.0


# --- PageRank LSH edge route ----------------------------------------------


def test_pagerank_lsh_edges_match_exact(spark, sf_dir):
    """The flagged sign-LSH edge route must produce the same edge set
    as the exact all-pairs GEMM on the shipped corpus (round-6
    verdict #5; the chosen 2-plane x 12-band parameters were measured
    to give exact recall at cos >= 0.40 here), hence identical
    PageRank output."""
    from data_framework_spark.operators.graph import neardup_edges
    from data_framework_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {tuple(r) for r in neardup_edges(emb, "exact").collect()}
    lsh = {tuple(r) for r in neardup_edges(emb, "lsh").collect()}
    assert exact == lsh
    assert len(exact) > 0


# --- product quantization -------------------------------------------------


def test_pq_codebook_vectors_quantize_to_themselves(spark, sf_dir):
    """Exactness anchor: each codebook vector (vec_id < PQ_K) must be
    assigned its OWN code in every subspace with zero quantization
    error (self-distance 0 is the unique minimum on a random-float
    corpus), and every corpus vector gets exactly PQ_M codes."""
    from data_framework_spark.similarity.pq import (
        PQ_K,
        PQ_M,
        _codebooks,
        assign_pq_codes,
    )
    from data_framework_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = _codebooks(emb)
    codes = assign_pq_codes(emb, books)
    self_rows = codes.filter(F.col("vec_id") < PQ_K).collect()
    assert len(self_rows) == PQ_K * PQ_M
    for r in self_rows:
        assert r["code"] == r["vec_id"] and r["err"] == 0.0
    n = emb.count()
    assert codes.count() == n * PQ_M


def test_pq_adc_retrieves_clusters_on_clustered_corpus(spark):
    """On data with actual cluster structure (the regime PQ is built
    for — the isotropic bench corpus is its structural worst case and
    the measured recall there is documented in pq.py), ADC must
    retrieve same-cluster members: PQ_K tight clusters of 4 around
    the PQ_K codebook seeds (vec_ids 0..PQ_K-1 are the seeds
    themselves); every vector must quantize to its own cluster's full
    code word in all 8 subspaces (hence ADC distance 0 to
    cluster-mates — exact retrieval)."""
    import numpy as np

    from data_framework_spark.similarity.pq import (
        PQ_K,
        _codebooks,
        assign_pq_codes,
    )

    rng = np.random.default_rng(42)
    centers = rng.normal(size=(PQ_K, 64)) * 10
    rows = []
    vid = 0
    for rep in range(4):  # vec_ids 0..PQ_K-1 are the seeds themselves
        for c in range(PQ_K):
            v = centers[c] + (rng.normal(size=64) * 0.01 if rep else 0.0)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = _codebooks(emb)
    codes = assign_pq_codes(emb, books).collect()
    # every member of cluster c must share all 8 codes with seed c
    by_vec = {}
    for r in codes:
        by_vec.setdefault(r["vec_id"], {})[r["subspace"]] = r["code"]
    for v, sub_codes in by_vec.items():
        assert sub_codes == by_vec[v % PQ_K], f"vec {v} left its cluster"


# --- BPE vocabulary induction ---------------------------------------------


def test_bpe_merges_hand_corpus(spark):
    """Hand-verifiable BPE run: 'abab abab cd' → words abab(×2),
    cd(×1). Pair counts: (a,b)=4, (b,a)=2, (c,d)=1 → merge 1 is
    (a,b,4); after applying, abab = (ab)(ab) → merge 2 is (ab,ab,2)
    — the iterative property: merge 2 consumes merge 1's symbol —
    then (c,d,1), then no pairs remain (early stop before
    n_merges)."""
    from data_framework_spark.functions.bpe import learn_bpe_merges

    docs = spark.createDataFrame(
        [(1, "abab abab cd")], "doc_id long, text string"
    )
    merges = learn_bpe_merges(docs, n_merges=6)
    assert merges == [
        (1, "a", "b", 4),
        (2, "ab", "ab", 2),
        (3, "c", "d", 1),
    ]


def test_bpe_tokenize_hand_corpus(spark):
    """Apply-side accounting on the hand corpus: after the 3
    learnable merges, 'abab'(×2) is one token and 'cd' one token —
    chars 10, tokens 3, fertility 10/3, induced vocab {abab, cd}.
    Content chars must be invariant under merging."""
    import data_framework_spark.functions.bpe as bpe_mod

    docs = spark.createDataFrame(
        [(1, "abab abab cd")], "doc_id long, text string"
    )
    import data_framework_spark.sources.tables as tables_mod

    orig = bpe_mod.load_table
    try:
        bpe_mod.load_table = lambda s, d, t: docs
        row = bpe_mod.q_bpe_tokenize(spark, "unused").collect()[0]
    finally:
        bpe_mod.load_table = orig
    assert row["n_words"] == 2
    assert row["total_occurrences"] == 3
    assert row["chars_total"] == 10
    assert row["tokens_total"] == 3
    assert row["fertility"] == round(10 / 3, 6)
    assert row["vocab_symbols"] == 2


def test_bpe_greedy_overlap_left_to_right(spark):
    """Pair (a,a) on 'aaa' must merge greedily left-to-right into
    (aa)(a) — so the second merge sees pair (aa, a), not (a, aa)."""
    from data_framework_spark.functions.bpe import learn_bpe_merges

    docs = spark.createDataFrame([(1, "aaa")], "doc_id long, text string")
    merges = learn_bpe_merges(docs, n_merges=2)
    assert merges == [(1, "a", "a", 2), (2, "aa", "a", 1)]


# --- SemDeDup k-means refinement ------------------------------------------


def test_lloyd_refinement_improves_compactness_and_reports_purity(
    spark, sf_dir
):
    """One Lloyd round over the stand-in centroids must (a) produce a
    complete assignment (every vector, ≤ K clusters), (b) improve the
    internal objective it optimizes — mean cosine to the assigned
    centroid (measured 0.306 → 0.391 at sf0.01) — and (c) report the
    external purity delta vs the stand-in. On this corpus labels are
    uncorrelated with the isotropic embedding geometry, so purity
    moves only within noise (measured −0.004..−0.010); the assertion
    bounds it rather than demanding improvement (round-6 verdict #6:
    'variant + purity delta reported; oracle surface unchanged')."""
    from data_framework_spark.similarity.ann import cosine
    from data_framework_spark.similarity.semantic import (
        _assign_clusters,
        _seed_centroids,
        K_CLUSTERS,
        lloyd_refine,
    )
    from data_framework_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select("vec_id", "embedding")
    seeds = _seed_centroids(e)
    refined = lloyd_refine(e, seeds, rounds=1)
    assert refined.count() == K_CLUSTERS

    def mean_cos(cents):
        a = _assign_clusters(e, cents)
        j = a.join(cents.withColumnRenamed("cent_id", "cluster"), "cluster")
        return j.agg(
            F.avg(cosine(F.col("embedding"), F.col("cent"))).alias("m")
        ).collect()[0]["m"]

    assert mean_cos(refined) > mean_cos(seeds) + 0.02

    def purity(cents):
        a = _assign_clusters(e, cents).join(
            emb.select("vec_id", "label"), "vec_id"
        )
        cl = a.groupBy("cluster", "label").agg(F.count(F.lit(1)).alias("c"))
        top = cl.groupBy("cluster").agg(
            F.max("c").alias("m"), F.sum("c").alias("n")
        )
        return top.agg((F.sum("m") / F.sum("n")).alias("p")).collect()[0]["p"]

    n = e.count()
    assigned = _assign_clusters(e, refined)
    assert assigned.count() == n  # complete partition, nothing dropped
    delta = purity(refined) - purity(seeds)
    print(f"purity delta (refined - standin): {delta:+.4f}")
    assert abs(delta) < 0.05  # random-label corpus: noise-bounded


# --- persistable IVF index ------------------------------------------------


def test_ivf_index_reload_matches_in_memory_build(spark, sf_dir, tmp_path):
    """An index written to parquet and reloaded must search to exactly
    the in-memory build's results (same _probe_and_score tail; the
    roundtrip only moves the assignment through the partitioned
    layout)."""
    from data_framework_spark.similarity.ivf import (
        ivf_index_write,
        ivf_topk,
        ivf_topk_from_index,
    )
    from data_framework_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    mem = ivf_topk(emb, queries, "vec_id", "embedding", k=5, ncells=16, nprobe=4)
    path = str(tmp_path / "ivf")
    ivf_index_write(emb, path, "vec_id", "embedding", ncells=16)
    disk = ivf_topk_from_index(
        spark, path, queries, "vec_id", "embedding", k=5, nprobe=4
    )
    assert sorted(map(tuple, mem.collect())) == sorted(map(tuple, disk.collect()))
    # the on-disk inverted lists are cell-partitioned (directory-
    # prunable at scale)
    import os

    assert any(d.startswith("cell=") for d in os.listdir(f"{path}/lists"))


# --- physical-plan properties of the new operators ------------------------


def test_pq_adc_lut_join_is_broadcast(spark, sf_dir):
    """The ADC scoring join must broadcast the bounded lookup-table
    side (|Q|·M·K rows) — a shuffled join here would move the whole
    code table for a 2560-row build side."""
    from data_framework_spark.similarity.pq import q_pq_adc_topk

    plan = (
        q_pq_adc_topk(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_ivf_index_cell_read_is_partition_pruned(spark, sf_dir, tmp_path):
    """The persisted inverted lists are partitioned by cell, so a
    single-cell probe must show up as a PartitionFilter on the scan
    (directory pruning — the layout claim the index makes), not a
    post-scan filter."""
    from data_framework_spark.similarity.ivf import ivf_index_write
    from data_framework_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_plan")
    ivf_index_write(emb, path, "vec_id", "embedding", ncells=16)
    df = spark.read.parquet(f"{path}/lists").filter(F.col("cell") == 3)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "cell" in seg, seg


def test_bpe_word_table_is_the_only_corpus_shuffle(spark, sf_dir):
    """BPE pair counting runs on the vocab frame: the pair-count plan
    contains the word-count aggregate's exchange plus the final
    top-1 single-partition exchange — both hash exchanges key on
    vocab-sized data, and no exchange carries corpus rows after the
    word aggregate (structural: everything downstream reads the
    grouped word table)."""
    from data_framework_spark.functions.bpe import _wrapped_words
    from data_framework_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    words = _wrapped_words(docs)
    plan = words._jdf.queryExecution().executedPlan().toString()
    # one corpus-keyed exchange (the word groupBy); the regex wrap is
    # a projection on top, adding none
    assert plan.count("Exchange hashpartitioning") == 1, plan


# --- GEMM association matches the oracle ----------------------------------


def test_gemm_association_is_dot_over_norm_product():
    """The numpy kernels must compute dot/(nrm_a*nrm_b) — the same
    float association as the oracle SQL — not normalize-then-GEMM
    (a threshold-edge pair can flip under the other association)."""
    import numpy as np

    rng = np.random.default_rng(7)
    av = rng.normal(size=(50, 64))
    bv = rng.normal(size=(40, 64))
    # reference association (the oracle's): per-pair dot / (na * nb)
    expect = np.empty((50, 40))
    na = np.linalg.norm(av, axis=1)
    nb = np.linalg.norm(bv, axis=1)
    for i in range(50):
        for j in range(40):
            expect[i, j] = (av[i] @ bv[j]) / (na[i] * nb[j])
    got = (av @ bv.T) / np.outer(na, nb)
    # bit-identical is too strong across BLAS paths (blocked GEMM may
    # reorder the dot itself), but the association change removed the
    # systematic normalize-first divergence; require agreement far
    # below the 6dp rounding granularity
    assert np.max(np.abs(got - expect)) < 1e-12

    src = (PKG / "similarity" / "ann.py").read_text()
    assert "np.outer(" in src
    assert "keepdims=True)\n        sim =" not in src
