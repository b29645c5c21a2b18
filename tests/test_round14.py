"""Round-14 additions: the cross-session persistent index cache
(formats.persistent_index_dir — the r13 verdict's ask 2: the ivfpq
session-first-call Lloyd retrain was the suite's only structurally
growing cold cost; a fresh session now RELOADS a persisted index
whose source fingerprint and build knobs match), plus the integral
`div` tile keys in the distributed CCL (r13 advisory)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def cache_root(tmp_path, monkeypatch):
    """Redirect the persistent index cache to a throwaway root and
    drop any session-registry entries for the test prefixes, so each
    test observes build-vs-reload from a clean slate."""
    from data_framework_spark.sources import formats

    root = tmp_path / "index_cache"
    monkeypatch.setenv(formats.INDEX_CACHE_ENV, str(root))
    _forget_session_entries("r14unit_")
    from data_framework_spark.similarity.ivfpq import IVFPQ_INDEX_PREFIX

    _forget_session_entries(IVFPQ_INDEX_PREFIX)
    yield str(root)
    _forget_session_entries("r14unit_")
    _forget_session_entries(IVFPQ_INDEX_PREFIX)


def _forget_session_entries(prefix: str) -> None:
    """Simulate a fresh session's empty index registry for `prefix`
    (the applicationId can't change within a test session, but the
    reload-vs-retrain decision lives entirely in the on-disk cache —
    dropping the in-memory entry forces the persistent-path lookup a
    fresh session would perform)."""
    from data_framework_spark.sources.formats import _INDEX_DIRS

    for k in [k for k in _INDEX_DIRS if k[2] == prefix]:
        del _INDEX_DIRS[k]


def test_persistent_index_builds_once_across_sessions(spark, cache_root):
    """Second 'session' (cleared registry, same data, same params)
    must RELOAD: zero additional build calls, same directory."""
    from data_framework_spark.sources.formats import persistent_index_dir

    builds = []

    def build(p):
        builds.append(p)
        with open(os.path.join(p, "payload.txt"), "w") as fh:
            fh.write("x")

    p1 = persistent_index_dir(
        spark, SF_SMALL, "r14unit_", build, params={"fmt": 1, "k": 4}
    )
    assert builds == [f"{p1}.build-{os.getpid()}"]
    assert os.path.isfile(os.path.join(p1, "payload.txt"))
    assert os.path.isfile(os.path.join(p1, "manifest.json"))

    _forget_session_entries("r14unit_")
    p2 = persistent_index_dir(
        spark, SF_SMALL, "r14unit_", build, params={"fmt": 1, "k": 4}
    )
    assert p2 == p1 and len(builds) == 1  # reload, not retrain


def test_persistent_index_param_change_diverges_digest(spark, cache_root):
    """A build-knob change must be a cache MISS (the safety property:
    an ncells adoption or Lloyd-round change can never be served a
    stale index), and the superseded same-source directory is
    evicted."""
    from data_framework_spark.sources.formats import persistent_index_dir

    builds = []
    p1 = persistent_index_dir(
        spark, SF_SMALL, "r14unit_", lambda p: builds.append(p),
        params={"fmt": 1, "ncells": 16},
    )
    _forget_session_entries("r14unit_")
    p2 = persistent_index_dir(
        spark, SF_SMALL, "r14unit_", lambda p: builds.append(p),
        params={"fmt": 1, "ncells": 32},
    )
    assert p2 != p1 and len(builds) == 2
    assert not os.path.exists(p1)  # superseded tree evicted
    with open(os.path.join(p2, "manifest.json")) as fh:
        assert json.load(fh)["params"]["ncells"] == 32


def test_persistent_index_source_rewrite_rebuilds(spark, cache_root, tmp_path):
    """Rewriting a source parquet under the same path must diverge
    the fingerprint → rebuild into a new directory, old one evicted
    (the session_index_dir round-8 staleness contract, held across
    sessions)."""
    from data_framework_spark.sources.formats import persistent_index_dir

    sf = tmp_path / "sf"
    sf.mkdir()
    f = sf / "t.parquet"
    f.write_bytes(b"v1-bytes")
    builds = []
    p1 = persistent_index_dir(
        spark, str(sf), "r14unit_", lambda p: builds.append(p),
        params={"fmt": 1},
    )
    f.write_bytes(b"v2-bytes-longer")
    p2 = persistent_index_dir(
        spark, str(sf), "r14unit_", lambda p: builds.append(p),
        params={"fmt": 1},
    )
    assert p2 != p1 and len(builds) == 2
    assert not os.path.exists(p1)


def test_persistent_index_corrupt_manifest_rebuilds(spark, cache_root):
    """A directory whose manifest is unreadable is a dead tree: it
    must be evicted and rebuilt, never served."""
    from data_framework_spark.sources.formats import persistent_index_dir

    builds = []
    p1 = persistent_index_dir(
        spark, SF_SMALL, "r14unit_", lambda p: builds.append(p),
        params={"fmt": 1},
    )
    with open(os.path.join(p1, "manifest.json"), "w") as fh:
        fh.write("{not json")
    _forget_session_entries("r14unit_")
    p2 = persistent_index_dir(
        spark, SF_SMALL, "r14unit_", lambda p: builds.append(p),
        params={"fmt": 1},
    )
    assert p2 == p1 and len(builds) == 2  # same digest path, rebuilt


def test_ivfpq_reload_path_matches_build_path(spark, cache_root):
    """Query-level contract for ask 2: q_ivfpq_persist_topk answered
    from a RELOADED persistent index (fresh-session simulation) must
    return exactly the rows the building session returned — the
    hashes-can-never-change property of reload-not-retrain."""
    from data_framework_spark.similarity.ivfpq import (
        IVFPQ_INDEX_PREFIX,
        q_ivfpq_persist_topk,
    )

    built = [tuple(r) for r in q_ivfpq_persist_topk(spark, SF_SMALL).collect()]
    assert built
    _forget_session_entries(IVFPQ_INDEX_PREFIX)
    reloaded = [
        tuple(r) for r in q_ivfpq_persist_topk(spark, SF_SMALL).collect()
    ]
    assert reloaded == built


def test_ivfpq_stale_cache_unreachable_after_fmt_bump(spark, cache_root, monkeypatch):
    """Bumping IVFPQ_INDEX_FMT (the build-code-change discipline) must
    diverge the digest so the persisted pre-bump index is never
    served."""
    from data_framework_spark.similarity import ivfpq
    from data_framework_spark.sources.formats import get_index_dir

    ivfpq.q_ivfpq_persist_topk(spark, SF_SMALL).collect()
    p1 = get_index_dir(spark, SF_SMALL, ivfpq.IVFPQ_INDEX_PREFIX)
    assert p1 is not None
    _forget_session_entries(ivfpq.IVFPQ_INDEX_PREFIX)
    monkeypatch.setattr(ivfpq, "IVFPQ_INDEX_FMT", ivfpq.IVFPQ_INDEX_FMT + 1)
    p2 = ivfpq.session_ivfpq_index(spark, SF_SMALL)
    assert p2 != p1


# --- shared island-family upstream (r13 verdict ask 4) -----------------------


def _island_2t_dataset(spark):
    import numpy as np

    from data_framework_spark.dataset import SparkDataset
    from data_framework_spark.variable import SparkVariable

    k, eps, phase = 1.0, 0.3, 0.7
    z = np.linspace(-8.0, 8.0, 120)
    x = np.linspace(-np.pi / 2, 2.5 * np.pi, 64)
    zz, xx = np.meshgrid(z, x, indexing="ij")
    b2 = np.tanh(zz)
    jy = 8.0 / np.cosh(zz) ** 2 * (1 + 0.3 * np.cos(k * xx)) + 0.5 * np.cos(
        4.7 * zz
    ) * np.cos(4.5 * xx)
    b1_t = np.stack(
        [eps * k * np.sin(k * xx), eps * k * np.sin(k * xx - phase)]
    )
    ts = np.array([0.0, 1.0])
    ds = SparkDataset()
    ds.add_var(SparkVariable.from_numpy(spark, "b1", ts, [z, x], b1_t))
    ds.add_var(
        SparkVariable.from_numpy(spark, "b2", ts, [z, x], np.stack([b2, b2]))
    )
    ds.add_var(
        SparkVariable.from_numpy(spark, "jy", ts, [z, x], np.stack([jy, jy]))
    )
    return ds


def test_family_upstream_bitwise_equals_standalone(spark):
    """find_structures fed the sliced 8-phase family upstream must
    produce BITWISE the null coordinates and mask cells the standalone
    (derive-everything) path produces on the same 2-timestep island
    dataset — the property that makes the r14 session cache a plan
    change, not a semantics change. Phase 0.7 exercises the
    0.35*2.0 == 0.7 exact-doubling identity the cache relies on."""
    from data_framework_spark.plans.structures import (
        find_structures,
        island_family_upstream,
    )

    ds_a = _island_2t_dataset(spark)
    find_structures(ds_a, "b1", "b2", smoothing=1, multi_t=True)
    ds_b = _island_2t_dataset(spark)
    up = island_family_upstream(
        spark, "/root/testdata/sf0.001", [(0.0, 0), (1.0, 2)]
    )
    find_structures(
        ds_b, "b1", "b2", smoothing=1, multi_t=True, upstream=up
    )

    assert ds_a.params["x_coords"] == ds_b.params["x_coords"]
    assert ds_a.params["o_coords"] == ds_b.params["o_coords"]
    key = ["t", "i0", "i1"]
    rows_a = sorted(
        tuple(r) for r in ds_a.masks_df.orderBy(*key).collect()
    )
    rows_b = sorted(
        tuple(r) for r in ds_b.masks_df.orderBy(*key).collect()
    )
    assert rows_a == rows_b
    # flux_fn registered for API parity and bitwise equal
    fa = sorted(
        tuple(r)
        for r in ds_a.variables["flux_fn"].df.select(*key, "value").collect()
    )
    fb = sorted(
        tuple(r)
        for r in ds_b.variables["flux_fn"].df.select(*key, "value").collect()
    )
    assert fa == fb
    for d in getattr(ds_a, "scratch_cached", []) + getattr(
        ds_b, "scratch_cached", []
    ):
        d.unpersist()


def test_family_upstream_missing_columns_refused(spark):
    """A frame without the upstream contract's columns must be refused
    loudly, not half-consumed."""
    import pytest as _pytest

    from data_framework_spark.plans.structures import find_structures

    ds = _island_2t_dataset(spark)
    bad = ds.variables["b1"].df  # value frame, no sb1/sb2/psi/jys
    with _pytest.raises(ValueError, match="missing columns"):
        find_structures(
            ds, "b1", "b2", smoothing=1, multi_t=True, upstream=bad
        )
