"""LSH bucket-cap behavior on a pathological (degenerate) corpus:
thousands of identical documents collapse into one bucket per band;
without a cap the pair self-join is quadratic. With `max_bucket` the
mega-bucket is dropped (and logged), bounding both runtime and output
(VERDICT r1 item 6)."""

from __future__ import annotations

import logging

from pyspark.sql import functions as F

from data_framework_spark.dedup.minhash import (
    candidate_pairs,
    lsh_bands,
    minhash_signatures,
    signature_dedup,
)


def _degenerate_docs(spark, n=2000):
    """n identical docs plus one small genuine near-dup cluster."""
    rows = [(i, "the same exact text every single time") for i in range(n)]
    rows += [(n + i, f"a distinct cluster of close documents v{i % 2}") for i in range(4)]
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_uncapped_bucket_is_quadratic_and_cap_bounds_it(spark, caplog):
    docs = _degenerate_docs(spark, n=200)  # 200²/2 pairs uncapped
    bands = lsh_bands(minhash_signatures(docs, "doc_id", "text"))
    uncapped = candidate_pairs(bands).count()
    assert uncapped >= 200 * 199 / 2  # the quadratic blow-up is real

    with caplog.at_level(logging.WARNING, "data_framework_spark.dedup.minhash"):
        capped = candidate_pairs(bands, max_bucket=100)
        n_capped = capped.count()
    # the mega-bucket is gone; only the small genuine cluster remains
    assert n_capped <= 6
    assert capped.filter(F.col("a") >= 200).count() == n_capped
    # and the drop was logged, not silent
    assert any("dropping" in r.message for r in caplog.records)


def test_cap_is_noop_on_normal_buckets(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} content {i * 7}") for i in range(50)],
        schema="doc_id long, text string",
    )
    bands = lsh_bands(minhash_signatures(docs, "doc_id", "text"))
    a = sorted(map(tuple, candidate_pairs(bands).collect()))
    b = sorted(map(tuple, candidate_pairs(bands, max_bucket=100).collect()))
    assert a == b


def test_cap_applies_in_probe_mode_too(spark, caplog):
    """max_bucket combined with probe must still drop mega-buckets:
    a probe doc inside a 200-doc bucket would otherwise produce ~200
    pairs despite the cap (the ADVICE r2 silent-ignore bug)."""
    docs = _degenerate_docs(spark, n=200)
    bands = lsh_bands(minhash_signatures(docs, "doc_id", "text"))
    probe = spark.createDataFrame([(0,), (200,)], "doc long")
    uncapped = candidate_pairs(bands, probe=probe).count()
    assert uncapped >= 199  # probe doc 0 pairs with the whole mega-bucket
    with caplog.at_level(logging.WARNING, "data_framework_spark.dedup.minhash"):
        capped = candidate_pairs(bands, probe=probe, max_bucket=100)
        n_capped = capped.count()
    assert n_capped <= 3  # only probe doc 200's small genuine cluster
    assert capped.filter((F.col("a") < 200) & (F.col("b") < 200)).count() == 0
    assert any("dropping" in r.message for r in caplog.records)


def test_signature_dedup_collapses_degenerate_corpus_linearly(spark):
    docs = _degenerate_docs(spark, n=2000)
    out = signature_dedup(docs, "doc_id", "text")
    rows = {r["keep_id"]: r["group_size"] for r in out.collect()}
    assert rows[0] == 2000  # the mega-cluster is ONE output row
    assert len(rows) <= 4
