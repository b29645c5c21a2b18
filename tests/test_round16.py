"""Round-16 contracts: the verify-window rotation arithmetic (r15
verdict ask 3) and the re-derived find_structures contract literals
(ask 1). The reference-formula differential layer this round
introduced lives in tests/test_reference_formulas.py.
"""

from __future__ import annotations

import json
import os


# --- r16 verify-window rotation (r15 verdict ask 3) ---------------------------


# test_r16_verify_window_arithmetic moved WITH the rotation: the
# window is a per-round artifact, so its arithmetic pin lives in the
# round file that last rotated it (tests/test_round18.py::
# test_r18_verify_window_arithmetic since r18; the r16 composition it
# used to pin is preserved in the git history and in the r16
# CORRECTNESS record).


# --- re-derived island-family contract literals (r15 verdict ask 1) -----------


def test_contract_sql_carries_r16_rederived_literals():
    """The find_structures contract's mask-cell literals were
    RE-DERIVED (not forced) after the r16 kernel corrections: the
    SQL must state the new values, and the old self-referential ones
    must be gone. The actual Spark-vs-oracle equality is the driver's
    hash check; this pins that the re-pin landed and can't silently
    revert with a stale-branch merge."""
    from data_framework_spark.plans.structures import (
        Q_FIND_STRUCTURES_CONTRACT_SQL,
    )

    sql = Q_FIND_STRUCTURES_CONTRACT_SQL
    assert "('separatrices_cells', 257.0::DOUBLE)" in sql
    assert "('o_structures_cells', 383.0::DOUBLE)" in sql
    # 115 = 59 positive + 56 negative sheet cells from island_jy's two
    # blobs — nonzero BY CONSTRUCTION so the sheets kernel sits inside
    # the driver's hash gate (0 would mean an all-zero mask passes)
    assert "('current_sheets_cells', 115.0::DOUBLE)" in sql
    assert "140.0" not in sql and "425.0" not in sql and "692.0" not in sql


def test_gap_fill_oracle_encodes_any_of_three_rule():
    """The corrected oracle must encode the reference's any-of-three
    disjunction per direction, not the strict-pairs rule the r15
    verdict demoted (Q_GAP_FILL_GRID_SQL was the self-referential
    half of that finding)."""
    from data_framework_spark.operators.raster_queries import (
        Q_GAP_FILL_GRID_SQL,
    )

    sql = Q_GAP_FILL_GRID_SQL
    assert "(l.b AND (ur.b OR dr.b OR r.b))" in sql
    assert "(u.b AND (dl.b OR dr.b OR d.b))" in sql
    # the old strict-pair terms must be gone
    assert "(l.b AND r.b)" not in sql
    assert "(u.b AND d.b)" not in sql


# --- build_source_fp hardening (r15 advisories, low) ---------------------------


def test_build_source_fp_nested_defs_are_position_insensitive():
    """The stated guarantee — two textually-identical builds
    fingerprint equal wherever they sit in a file — must hold for
    callables containing nested defs/lambdas too (r15 advisory: the
    position normalization now recurses into co_consts). Exec the
    same source at different line offsets so only position metadata
    differs, including the NESTED code object's."""
    from data_framework_spark.sources.formats import build_source_fp

    src = (
        "def outer(xs):\n"
        "    inner = lambda v: v * 3 + 1\n"
        "    def helper(v):\n"
        "        return inner(v) - 2\n"
        "    return [helper(x) for x in xs]\n"
    )
    fps = []
    for pad in (0, 7, 123):
        ns = {}
        exec(compile("\n" * pad + src, "<fp-test>", "exec"), ns)  # noqa: S102
        fps.append(build_source_fp(ns["outer"]))
    assert fps[0] == fps[1] == fps[2]
    # and a semantic change in the NESTED code still diverges it
    ns2 = {}
    exec(compile(src.replace("v * 3", "v * 4"), "<fp-test>", "exec"), ns2)  # noqa: S102
    assert build_source_fp(ns2["outer"]) != fps[0]


def test_build_source_fp_no_code_objects_get_stable_token():
    """Objects without __code__ or retrievable source used to fall
    back to repr(), whose default embeds the memory address — a
    run-varying fingerprint that evicted and rebuilt the artifact
    every session (r15 advisory). Now: a stable module.qualname
    token, identical across instances and runs (and documented as
    code-change-insensitive)."""
    from data_framework_spark.sources.formats import build_source_fp

    # force the last-resort path: no __code__, AND getmodule/getsource
    # both fail (a class defined in a test file would hash the test
    # module's source and never reach the fallback)
    Opaque = type("Opaque", (), {"__module__": "no_such_module_xyz"})

    # two distinct instances (different addresses) — same fingerprint
    assert build_source_fp(Opaque()) == build_source_fp(Opaque())
    # sanity: the default repr really does vary (the failure mode)
    assert repr(Opaque()) != repr(Opaque())
    # and the token distinguishes different types
    Other = type("Other", (), {"__module__": "no_such_module_xyz"})
    assert build_source_fp(Opaque()) != build_source_fp(Other())
