"""Round-7 late additions: BM25 retrieval, exact-substring duplicate
spans, and SQ8 scalar quantization — semantics pinned on hand-built
inputs plus plan-shape assertions for the scale claims. (Oracle
parity for all three runs in test_oracle_parity.py like every
registry entry.)
"""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


# --- dup_span_extract -------------------------------------------------------


def test_merge_spans_gaps_and_islands(spark):
    """Interval merging: overlapping and touching (gap == 1) intervals
    fuse; a gap of 2+ starts a new span; docs are independent."""
    from data_framework_spark.dedup.spans import merge_spans

    iv = spark.createDataFrame(
        [
            # doc 1: [0,4] overlaps [3,7]; [8,12] touches (gap 1) -> one span
            (1, 0, 4),
            (1, 3, 7),
            (1, 8, 12),
            # doc 1: [20,24] isolated
            (1, 20, 24),
            # doc 2: nested interval swallowed
            (2, 5, 9),
            (2, 6, 7),
        ],
        "doc_id int, s int, e int",
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in merge_spans(iv).collect()
    }
    assert got == {
        (1, 0, 12, 13),
        (1, 20, 24, 5),
        (2, 5, 9, 5),
    }


def test_dup_span_extract_hand_corpus(spark, tmp_path):
    """Two docs sharing a verbatim 7-token run (positions 2..8 in doc
    0, 0..6 in doc 1) and nothing else: the k-gram marking (K=5) must
    recover exactly those token ranges; the unique doc yields no
    spans."""
    from data_framework_spark.dedup.spans import q_dup_span_extract

    shared = "q w e r t y u"  # 7 tokens
    rows = [
        (0, f"a b {shared} c d", "en", "s0", 0),
        (1, f"{shared} x z v k", "en", "s1", 0),
        (2, "m n o p j h g f d s", "en", "s2", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in q_dup_span_extract(spark, str(tmp_path)).collect()
    }
    assert got == {(0, 2, 8), (1, 0, 6)}


def test_dup_span_short_docs_no_grams(spark, tmp_path):
    """Docs shorter than K tokens produce no k-grams (the sequence()
    guard) instead of a descending-sequence crash."""
    from data_framework_spark.dedup.spans import q_dup_span_extract

    rows = [
        (0, "a b", "en", "s0", 0),
        (1, "a b", "en", "s1", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    assert q_dup_span_extract(spark, str(tmp_path)).count() == 0


def test_dup_span_single_gram_scan(spark):
    """The round-8 rewrite pins the single-scan shape: exactly ONE
    Generate (posexplode) in the physical plan — the round-7
    aggregate+join formulation materialized the gram subtree twice
    (two Generates), doubling the heaviest scan in the suite."""
    import re

    from data_framework_spark.dedup.spans import q_dup_span_extract
    from tests.test_plan_properties import plan_text

    p = plan_text(q_dup_span_extract(spark, SF_SMALL))
    # formatted explain prints each node twice (tree + detail); count
    # the detail headers "(n) Generate"
    assert len(re.findall(r"\(\d+\) Generate", p)) == 1, p


# --- bm25_topk ---------------------------------------------------------------


def test_bm25_matches_hand_formula(spark, tmp_path):
    """BM25 on a 4-doc hand corpus equals the textbook formula
    computed in pure Python (Lucene IDF, k1=1.2, b=0.75), and docs
    with no query term are absent."""
    from data_framework_spark.functions.retrieval import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        q_bm25_topk,
    )

    texts = {
        0: "table spark vector table",
        1: "table other words here",
        2: "spark spark spark pad pad pad pad pad",
        3: "nothing relevant at all",
    }
    rows = [(i, t, "en", "s", 0) for i, t in texts.items()]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )

    toks = {i: t.split(" ") for i, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs = {
        t: sum(1 for v in toks.values() if t in v) for t in BM25_TERMS
    }

    def score(i):
        s = 0.0
        for t in BM25_TERMS:
            tf = toks[i].count(t)
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            s += (
                idf
                * tf
                * (BM25_K1 + 1.0)
                / (
                    tf
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * len(toks[i]) / avgdl)
                )
            )
        return round(s, 6)

    got = {r.doc_id: r.bm25 for r in q_bm25_topk(spark, str(tmp_path)).collect()}
    assert set(got) == {0, 1, 2}  # doc 3 has no query term
    for i in got:
        assert got[i] == pytest.approx(score(i), abs=1e-6)


def test_bm25_plan_no_explode(spark):
    """The scale claim: tf comes from row-local array filters — the
    plan must contain no Generate (explode) node, and the corpus
    stats must come back via a broadcast."""
    from data_framework_spark.functions.retrieval import q_bm25_topk

    plan = (
        q_bm25_topk(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Generate" not in plan
    assert "BroadcastExchange" in plan or "Broadcast" in plan


def test_bm25_postings_route_equals_row_local(spark, tmp_path):
    """Route equality for the persisted inverted-index path: on a
    hand corpus where docs match only subsets of the query terms,
    q_bm25_postings_topk (build → parquet → reload → postings join →
    written-order fold) returns the EXACT same (doc_id, bm25) rows —
    same doubles, not approx — as the row-local q_bm25_topk, and the
    fold claim (array_sort + aggregate reproduces the t0+t1+t2 float
    association) holds bitwise."""
    from data_framework_spark.functions.retrieval import (
        q_bm25_postings_topk,
        q_bm25_topk,
    )

    rows = [
        (0, "table spark vector table", "en", "s", 0),
        (1, "table other words here", "en", "s", 0),  # t0 only
        (2, "spark spark spark pad pad pad pad pad", "en", "s", 0),  # t1 only
        (3, "vector pad", "en", "s", 0),  # t2 only
        (4, "nothing relevant at all", "en", "s", 0),  # no terms
        (5, "spark vector spark vector x y z", "en", "s", 0),  # t1+t2
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "documents.parquet")
    )
    row_local = [
        (r.doc_id, r.bm25) for r in q_bm25_topk(spark, str(tmp_path)).collect()
    ]
    postings = [
        (r.doc_id, r.bm25)
        for r in q_bm25_postings_topk(spark, str(tmp_path)).collect()
    ]
    assert row_local == postings
    assert {d for d, _ in row_local} == {0, 1, 2, 3, 5}


def test_bm25_postings_prunes_term_buckets(spark):
    """The persisted index's scale claim: the postings read is
    partition-pruned to the query terms' hash buckets — the scan's
    PartitionFilters must reference tbucket, and the documents text
    is not rescanned at query time (exactly one parquet scan of the
    postings, none of documents.parquet)."""
    from data_framework_spark.functions.retrieval import q_bm25_postings_topk
    from tests.test_plan_properties import plan_text

    q_bm25_postings_topk(spark, SF_SMALL)  # ensure index built
    p = plan_text(q_bm25_postings_topk(spark, SF_SMALL))
    assert "tbucket" in p
    assert "documents.parquet" not in p


# --- sq8_quantize ------------------------------------------------------------


def test_sq8_error_bounded_by_half_step(spark):
    """Uniform quantization invariant: every dimension's max absolute
    reconstruction error is at most scale/2 (+ float slop), every
    code count is within 0..256, and the scale is positive on the
    random test embeddings."""
    from data_framework_spark.similarity.sq import q_sq8_quantize

    rows = q_sq8_quantize(spark, SF_SMALL).collect()
    assert len(rows) == 64
    for r in rows:
        assert r.q_scale > 0
        assert 1 <= r.n_codes_used <= 256
        assert r.max_abs_err <= r.q_scale / 2 + 1e-9
        assert r.avg_abs_err <= r.max_abs_err + 1e-9


def test_sq8_constant_dimension_guard(spark):
    """A constant dimension (scale == 0) must quantize to code 0 with
    zero error on both engines instead of a NaN cast error — pinned
    here on the Spark side with a hand-built embeddings table."""
    import duckdb

    from data_framework_spark.similarity import sq as sq_mod

    rows = [(i, [1.5] * 64, 0) for i in range(4)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    import os as _os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(
            _os.path.join(d, "embeddings.parquet")
        )
        got = sq_mod.q_sq8_quantize(spark, d).collect()
        assert len(got) == 64
        assert all(r.q_scale == 0.0 and r.max_abs_err == 0.0 for r in got)
        # the oracle SQL survives the same degenerate input
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{_os.path.join(d, 'embeddings.parquet', '*.parquet')}')"
        )
        duck = con.execute(sq_mod.Q_SQ8_QUANTIZE_SQL).fetchall()
        assert len(duck) == 64
