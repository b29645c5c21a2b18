"""Round-15 additions: the forgotten-FMT-bump hardening of the
persistent caches (r14 verdict ask 3 — every cross-session digest now
folds a source hash of the build code, so changed build semantics can
never serve an artifact persisted by older code even when the
family's *_FMT constant is not bumped), plus the r14-advisory pq
fixes (plan-fp=None degrades to retrain-only; per-(file, plan)
eviction of persisted codebooks)."""

from __future__ import annotations

import glob
import importlib.util
import os
import sys
import textwrap

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def cache_root(tmp_path, monkeypatch):
    """Throwaway persistent-cache root + cleared session registry for
    the unit prefixes (the test_round14 convention)."""
    from data_framework_spark.sources import formats

    root = tmp_path / "index_cache"
    monkeypatch.setenv(formats.INDEX_CACHE_ENV, str(root))
    _forget("r15unit_")
    yield str(root)
    _forget("r15unit_")


def _forget(prefix: str) -> None:
    from data_framework_spark.sources.formats import _INDEX_DIRS

    for k in [k for k in _INDEX_DIRS if k[2] == prefix]:
        del _INDEX_DIRS[k]


def _import_temp_module(path: str, name: str):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


_BUILD_MODULE_SRC = textwrap.dedent(
    """\
    import os

    SCALE = {scale}

    def build(path):
        with open(os.path.join(path, "payload.txt"), "w") as fh:
            fh.write(str(SCALE))
    """
)


def test_build_source_fp_tracks_module_source(tmp_path):
    """The fingerprint is the MODULE source: an edit anywhere in the
    defining module (here: a build-semantics change the params don't
    name) diverges it; re-reading identical source does not."""
    from data_framework_spark.sources.formats import build_source_fp

    p = tmp_path / "r15_build_mod.py"
    p.write_text(_BUILD_MODULE_SRC.format(scale=1))
    m1 = _import_temp_module(str(p), "r15_build_mod_a")
    fp1 = build_source_fp(m1.build)
    m1b = _import_temp_module(str(p), "r15_build_mod_a2")
    assert build_source_fp(m1b.build) == fp1  # same source, same fp

    p.write_text(_BUILD_MODULE_SRC.format(scale=2))  # forgotten-bump edit
    m2 = _import_temp_module(str(p), "r15_build_mod_b")
    assert build_source_fp(m2.build) != fp1


def test_forgotten_fmt_bump_cannot_serve_stale_index(
    spark, cache_root, tmp_path
):
    """END-TO-END (the r14 verdict's Done criterion): build code
    changes, params/fmt unchanged → persistent_index_dir must resolve
    a DIFFERENT directory and re-run the build, never reload the
    artifact the old code persisted."""
    from data_framework_spark.sources.formats import persistent_index_dir

    p = tmp_path / "r15_build_mod.py"
    params = {"fmt": 1}  # never bumped — that is the point

    p.write_text(_BUILD_MODULE_SRC.format(scale=1))
    old = _import_temp_module(str(p), "r15_fmt_mod_v1")
    d1 = persistent_index_dir(spark, SF_SMALL, "r15unit_", old.build, params)
    assert open(os.path.join(d1, "payload.txt")).read() == "1"

    # 'new session' running EDITED build code with the same params
    _forget("r15unit_")
    p.write_text(_BUILD_MODULE_SRC.format(scale=2))
    new = _import_temp_module(str(p), "r15_fmt_mod_v2")
    d2 = persistent_index_dir(spark, SF_SMALL, "r15unit_", new.build, params)
    assert d2 != d1
    assert open(os.path.join(d2, "payload.txt")).read() == "2"


def test_pq_books_digest_folds_build_source(monkeypatch):
    """The PQ codebook content digest must respond to the build-code
    fingerprint (proves the fold is wired, not just present in
    formats): patching build_source_fp changes cd, nothing else."""
    from data_framework_spark.similarity import pq
    from data_framework_spark.sources import formats

    stamp = (123, 456)
    pd1, cd1 = pq._books_digests("/x/emb.parquet", stamp, "planA")
    monkeypatch.setattr(
        formats, "build_source_fp", lambda *objs: "ffffffffffff"
    )
    pd2, cd2 = pq._books_digests("/x/emb.parquet", stamp, "planA")
    assert pd2 == pd1  # path digest is (file, plan) only
    assert cd2 != cd1  # content digest folds the build source


def test_pq_path_digest_is_per_file_and_plan():
    """r14 advisory: two distinct plans over the same source file get
    DISTINCT path digests, so persisting one no longer evicts the
    other (the eviction loop globs on the path digest)."""
    from data_framework_spark.similarity import pq

    stamp = (123, 456)
    pd_a, _ = pq._books_digests("/x/emb.parquet", stamp, "planA")
    pd_b, _ = pq._books_digests("/x/emb.parquet", stamp, "planB")
    pd_a2, _ = pq._books_digests("/x/emb.parquet", (9, 9), "planA")
    assert pd_a != pd_b  # plan distinguishes the eviction group
    assert pd_a == pd_a2  # a stamp change stays WITHIN the group


def test_plan_fp_failure_degrades_to_retrain_only(
    spark, cache_root, monkeypatch
):
    """r14 advisory (medium): when _stable_plan_fp returns None (py4j
    hiccup), trained_codebooks must neither LOAD nor PERSIST a
    cross-session codebook — retrain-only, so two different frames
    over the same file can never cross-serve through a shared
    fallback key."""
    from data_framework_spark.similarity import pq
    from data_framework_spark.sources.tables import load_table

    monkeypatch.setattr(pq, "_stable_plan_fp", lambda df: None)
    pq._BOOKS_CACHE.clear()
    emb = load_table(spark, SF_SMALL, "embeddings")
    books = pq.trained_codebooks(emb)
    assert books is not None
    persisted = glob.glob(os.path.join(cache_root, "pq_books2_*.npy"))
    assert persisted == []  # nothing persisted under a degraded key
    pq._BOOKS_CACHE.clear()


# --- hier-vs-sharded auto routing (r14 verdict ask 5) -------------------------


def _route_spies(monkeypatch):
    """Wrap both assignment engines with call recorders."""
    from data_framework_spark.similarity import semantic as sem

    calls = []
    orig_hier, orig_shard = sem._assign_clusters_hier, sem._assign_clusters_sharded

    def hier(*a, **kw):
        calls.append("hier")
        return orig_hier(*a, **kw)

    def shard(*a, **kw):
        calls.append("sharded")
        return orig_shard(*a, **kw)

    monkeypatch.setattr(sem, "_assign_clusters_hier", hier)
    monkeypatch.setattr(sem, "_assign_clusters_sharded", shard)
    return calls


def test_route_cap_arithmetic_pinned():
    """The routing boundary is derived, not tuned: a 2 GiB driver
    budget over the measured 2816-bytes/row collect cost
    (scripts/measure_route_crossover.py: 2610-2811 B/row, flat from
    K=50k to 2M). Changing either constant must change this pin
    consciously."""
    from data_framework_spark.similarity import semantic as sem

    assert sem.DRIVER_COLLECT_BUDGET_BYTES == 2 * 1024**3
    assert sem.CENT_ROW_DRIVER_BYTES == 2816
    assert (
        sem.HIER_ROUTE_MAX_K
        == sem.DRIVER_COLLECT_BUDGET_BYTES // sem.CENT_ROW_DRIVER_BYTES
        == 762_600
    )


def test_auto_route_parity_at_boundary(spark, monkeypatch):
    """One K, both sides of the cap: with the cap set to K the auto
    route must take hier; at K-1 it must take sharded; the two
    assignments must be BITWISE identical (so the routing rule can
    never change a result hash)."""
    from pyspark.sql import functions as F

    from data_framework_spark.similarity import semantic as sem
    from data_framework_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", "embedding"
    )
    k = sem.scaled_k(emb.count())  # 8 at sf0.001 (500 rows / 64)
    cents = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent")
    )
    calls = _route_spies(monkeypatch)

    monkeypatch.setattr(sem, "HIER_ROUTE_MAX_K", k)
    via_hier = {
        r["vec_id"]: r["cluster"]
        for r in sem.assign_clusters_auto(emb, cents, k=k).collect()
    }
    monkeypatch.setattr(sem, "HIER_ROUTE_MAX_K", k - 1)
    via_sharded = {
        r["vec_id"]: r["cluster"]
        for r in sem.assign_clusters_auto(emb, cents, k=k).collect()
    }
    assert calls == ["hier", "sharded"]  # the rule actually switched
    assert via_hier == via_sharded  # and the switch is invisible
    assert len(via_hier) == 500


def test_scaled_dedup_routes_hier_below_cap(spark, monkeypatch):
    """Every shipped SF sits far below HIER_ROUTE_MAX_K, so the
    driver-checked scaled query must route hier (the faster engine
    everywhere both run — the r14 crossover measurement)."""
    from data_framework_spark.similarity import semantic as sem

    calls = _route_spies(monkeypatch)
    sem.q_semantic_dedup_scaled(spark, SF_SMALL).collect()
    assert calls == ["hier"]


# --- r15 verify-window rotation (r14 verdict ask 1) ---------------------------


# The r15 rotation-window test was superseded by
# tests/test_round16.py::test_r16_verify_window_arithmetic — each
# round's window replaces the previous round's arithmetic pin (the
# r13 -> r14 -> r15 precedent).


# --- concurrency lock + fingerprint fallbacks (r14 advisory, low) -------------


def test_prefix_lock_serializes_concurrent_builders(tmp_path):
    """Two same-root processes must SERIALIZE their evict/build/publish
    cycles: while a subprocess holds the prefix flock, entering
    _prefix_lock in this process blocks until release."""
    import subprocess
    import sys
    import time

    root = str(tmp_path)
    holder = subprocess.Popen(
        [
            sys.executable,
            "-c",
            (
                "import fcntl, sys, time;"
                f"fh = open({root!r} + '/.r15lk_lock', 'a');"
                "fcntl.flock(fh, fcntl.LOCK_EX);"
                "print('held', flush=True);"
                "time.sleep(2.0)"
            ),
        ],
        stdout=subprocess.PIPE,
        text=True,
    )
    try:
        assert holder.stdout.readline().strip() == "held"
        from data_framework_spark.sources.formats import _prefix_lock

        t0 = time.perf_counter()
        with _prefix_lock(root, "r15lk_"):
            waited = time.perf_counter() - t0
        # entered only after the holder's sleep released the flock
        assert waited >= 1.0, waited
    finally:
        holder.wait(timeout=10)


def test_build_source_fp_fallback_is_deterministic():
    """An object with no importable module and no file-backed source
    (exec'd code) must still fingerprint deterministically via its
    MARSHALLED bytecode — never raise, never produce a run-varying
    token (which would rebuild every call), and a constant-only
    semantics change must still diverge it (co_code alone would not:
    literals live in co_consts — r15 review)."""
    from data_framework_spark.sources.formats import build_source_fp

    def mk(code, tag):
        ns = {}
        exec(compile(code, "<r15-string>", "exec"), ns)
        fn = ns["build"]
        fn.__module__ = "r15_nonexistent_module_xyz"
        return fn

    code_v1 = "def build(path):\n    return path + '1'\n"
    f1 = mk(code_v1, "a")
    f2 = mk(code_v1, "b")
    fp1, fp2 = build_source_fp(f1), build_source_fp(f2)
    assert fp1 == fp2  # identical code, identical fp
    assert len(fp1) == 12 and int(fp1, 16) >= 0
    # constant-only change — same co_code, different co_consts
    f3 = mk("def build(path):\n    return path + '2'\n", "c")
    assert build_source_fp(f3) != fp1


# --- structural pins for the streaming-replay trims ---------------------------


def test_interval_join_replays_one_source_three_batches(spark, monkeypatch):
    """Pins the two structural r15 trims on the stream-stream join:
    the self-joined plan must run exactly ONE streaming source (a
    regression back to two independent readStreams doubles scans and
    offset commits per trigger), and the bounded replay must drain in
    exactly 3 data micro-batches with NO trailing zero-row
    watermark-only batch (no-data micro-batches are disabled for the
    replay)."""
    from data_framework_spark.streaming import stateful as st

    captured = {}
    orig = st.run_stateful_to_completion

    def capture(spark_, stream_out, output_mode="update",
                shuffle_partitions=8):
        out, progress = orig(
            spark_, stream_out, output_mode, shuffle_partitions
        )
        captured["progress"] = progress
        return out, progress

    monkeypatch.setattr(st, "run_stateful_to_completion", capture)
    n = st.q_streaming_interval_join(spark, SF_SMALL).count()
    assert n > 0
    progress = captured["progress"]
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(data_batches) == 3
    assert len(progress) == 3  # no trailing no-data batch
    for p in progress:
        assert len(p["sources"]) == 1  # self-join: ONE replay source


def test_legacy_pq_books_files_are_swept(spark, cache_root):
    """The r15 path-scheme change (pq_books_ -> pq_books2_) must not
    orphan pre-r15 files: a legacy-named file in the cache root is
    removed by the next persist (r15 review)."""
    import numpy as np

    from data_framework_spark.similarity import pq
    from data_framework_spark.sources.tables import load_table

    os.makedirs(cache_root, exist_ok=True)
    legacy = os.path.join(cache_root, "pq_books_deadbeef00_feedface.npy")
    np.save(legacy, np.zeros((2, 2)))
    pq._BOOKS_CACHE.clear()
    emb = load_table(spark, SF_SMALL, "embeddings")
    pq.trained_codebooks(emb)  # trains and persists under pq_books2_
    pq._BOOKS_CACHE.clear()
    assert not os.path.exists(legacy)
    assert glob.glob(os.path.join(cache_root, "pq_books2_*.npy"))
