"""Round-12 tests: the r12 rotation window arithmetic, the K=256 PQ
codebook adoption invariants, the hierarchical semantic-dedup
assignment parity, and the incremental BPE trainer equality."""

from __future__ import annotations

import json
import os


# --- rotation window arithmetic (r12) ----------------------------------------


def test_r12_verify_window_arithmetic():
    """The driver verifies the FIRST 50 registry entries. Round 12's
    window, exactly as the r11 rotation comment bound it: the 11-query
    last-green-r8 tail (one past the 3-round staleness budget) LEADS,
    then the 9 queries round 12 itself touched (semantic_dedup_scaled's
    hierarchical assignment switch + the 8 PQ/IVFPQ-family queries
    whose kernels AND oracles re-derive under the K=256 codebook
    adoption) in registry order, filled from the last-green-r9 block
    in REGISTRY ORDER (the fill is pinned as the exact prefix, not a
    subset). The 17-query r9 remainder is the named tail that must
    lead r13."""
    from data_framework_spark.registry import QUERIES, _VERIFY_FIRST

    here = os.path.dirname(__file__)
    root = os.path.join(here, "..")

    def load(n):
        with open(os.path.join(root, f"CORRECTNESS_r{n:02d}.json")) as f:
            return set(json.load(f))

    assert len(_VERIFY_FIRST) == 50
    assert len(set(_VERIFY_FIRST)) == 50
    assert set(_VERIFY_FIRST) <= set(QUERIES)
    assert list(QUERIES)[:50] == _VERIFY_FIRST  # hoisting actually applied

    last_green_r8 = load(8) - load(9) - load(10) - load(11)
    last_green_r9 = load(9) - load(10) - load(11)
    # (a) the whole last-green-r8 tail, registry order
    tail_r8 = [q for q in QUERIES if q in last_green_r8]
    assert len(tail_r8) == 11
    assert _VERIFY_FIRST[:11] == tail_r8
    # (b) round-12 touched, registry order: the hierarchical
    # assignment switch + every query whose hash the K=256 adoption
    # re-derives (kernel and oracle both retrain at PQ_K=256)
    touched_r12 = [
        "semantic_dedup_scaled",
        "pq_codes",
        "pq_adc_topk",
        "ivfpq_persist_topk",
        "ivfpq_recall_contract",
        "ivfpq_refine_topk",
        "ivfpq_refine_recall",
        "ivfpq_nprobe_curve",
        "pq_train_gain",
    ]
    assert _VERIFY_FIRST[11:20] == touched_r12
    # (c) fill = the FIRST 30 of the last-green-r9 block in registry
    # order (pinned exactly, not as a subset)
    r9_block = [
        q for q in QUERIES if q in last_green_r9 and q not in touched_r12
    ]
    assert _VERIFY_FIRST[20:] == r9_block[:30]
    # the named r13 lead debt: the 17-query r9 remainder
    tail_r13 = r9_block[30:]
    assert len(tail_r13) == 17
