"""Property-based parity tests: randomized inputs checked against an
independent reference implementation (pandas / a slow-but-obviously-
correct kernel). These catch the corner cases hand-picked fixtures
miss — NULL payloads, tie storms, degenerate masks, pathological
partitionings."""

from __future__ import annotations

import datetime

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_framework_spark.dedup.clusters import connected_components
from data_framework_spark.functions.sampling import pack_bins
from data_framework_spark.kernels.ndimage import _CROSS, flood
from data_framework_spark.operators.asof import asof_join

_SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _flood_reference(mask: np.ndarray, seed: tuple[int, int]) -> np.ndarray:
    """Per-pixel BFS — the obviously-correct O(pixels) reference."""
    from collections import deque

    target = mask[seed]
    out = np.zeros(mask.shape, dtype=bool)
    dq = deque([seed])
    out[seed] = True
    while dq:
        y, x = dq.popleft()
        for dy, dx in _CROSS:
            ny, nx = y + dy, x + dx
            if (
                0 <= ny < mask.shape[0]
                and 0 <= nx < mask.shape[1]
                and not out[ny, nx]
                and mask[ny, nx] == target
            ):
                out[ny, nx] = True
                dq.append((ny, nx))
    return out


@given(st.data())
@settings(max_examples=40, deadline=None)
def test_flood_matches_pixel_bfs(data):
    h = data.draw(st.integers(1, 24), label="h")
    w = data.draw(st.integers(1, 24), label="w")
    density = data.draw(st.floats(0.1, 0.9), label="density")
    seed_rng = data.draw(st.integers(0, 2**31 - 1), label="rng")
    rng = np.random.default_rng(seed_rng)
    mask = (rng.random((h, w)) < density).astype(np.int64)
    sy = data.draw(st.integers(0, h - 1), label="sy")
    sx = data.draw(st.integers(0, w - 1), label="sx")
    got = flood(mask, (sy, sx))
    want = _flood_reference(mask, (sy, sx))
    assert np.array_equal(got, want)


@given(st.data())
@_SLOW
def test_asof_matches_pandas_merge_asof(spark, data):
    """asof_join vs pandas.merge_asof on random frames with NULL
    payloads and timestamp ties — DuckDB-equivalent semantics:
    inclusive ties, per-key grouping, inner drop, payload and ts_r
    from the SAME right row."""
    n_left = data.draw(st.integers(1, 20), label="n_left")
    n_right = data.draw(st.integers(1, 20), label="n_right")
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31 - 1)))
    base = datetime.datetime(2024, 1, 1)
    mk_ts = lambda n: [
        base + datetime.timedelta(seconds=int(s))
        for s in rng.integers(0, 30, n)
    ]
    left = pd.DataFrame(
        {
            "event_id": np.arange(n_left),
            "user_id": rng.integers(0, 4, n_left),
            "ts": mk_ts(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "user_id": rng.integers(0, 4, n_right),
            "ts": mk_ts(n_right),
            "value": [
                None if rng.random() < 0.3 else float(v)
                for v in rng.integers(0, 100, n_right)
            ],
        }
    )
    got = asof_join(
        spark.createDataFrame(left, "event_id long, user_id long, ts timestamp"),
        spark.createDataFrame(right, "user_id long, ts timestamp, value double"),
        by="user_id",
        ts="ts",
        right_payload=["value"],
    ).toPandas()

    # reference: merge_asof needs sorted inputs; ties within right on
    # the same (user_id, ts) resolve to the GREATEST payload (NULL
    # smallest) — asof_join's deterministic tie-break (the carry-struct
    # term in its window order). The value col may be a legit NULL, so
    # inner-drop detection uses a sentinel has_match column rather than
    # value's null-ness.
    rs = (
        right.sort_values(
            ["user_id", "ts", "value"], kind="stable", na_position="first"
        )
        .drop_duplicates(["user_id", "ts"], keep="last")
        .sort_values("ts", kind="stable")
        .reset_index(drop=True)
        .assign(ts_r_ref=lambda d: d["ts"], has_match=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        rs[["user_id", "ts", "value", "ts_r_ref", "has_match"]],
        on="ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
        suffixes=("", "_r"),
    )
    want = want[want["has_match"].notna()]

    got_s = {
        (int(r.event_id), r.ts_r, None if pd.isna(r.value_r) else float(r.value_r))
        for r in got.itertuples()
    }
    want_s = {
        (
            int(r.event_id),
            r.ts_r_ref.to_pydatetime(),
            None if pd.isna(r.value) else float(r.value),
        )
        for r in want.itertuples()
    }
    assert got_s == want_s


@pytest.mark.slow  # r18: >9 s; slow lane (see pytest.ini)
@given(st.integers(0, 2**31 - 1), st.integers(1, 17))
@_SLOW
def test_pack_bins_partition_independent(spark, seed, n_parts):
    """Bin assignment must depend only on (doc_id, source, n_tok) —
    never on the physical partitioning of the input."""
    rng = np.random.default_rng(seed)
    n = 200
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n),
            "source": [f"s{int(x)}" for x in rng.integers(0, 3, n)],
            "n_tok": rng.integers(1, 500, n),
        }
    )
    base = spark.createDataFrame(pdf, "doc_id long, source string, n_tok long")
    a = {
        (r.doc_id, r.bin)
        for r in pack_bins(base.repartition(1), budget=512).collect()
    }
    b = {
        (r.doc_id, r.bin)
        for r in pack_bins(base.repartition(n_parts, "doc_id"), budget=512).collect()
    }
    assert a == b


def test_cc_matches_networkx_free_reference(spark):
    """connected_components vs a driver-side union-find on a random
    graph (200 vertices, 300 edges) — one deterministic heavy case in
    addition to the fixed-shape tests."""
    rng = np.random.default_rng(42)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 200, (300, 2))]
    parent = list(range(201))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    seen = {v for e in edges for v in e}
    want = {v: find(v) for v in sorted(seen)}
    # min-label CC: component id = min vertex id; union-find with
    # min-root merging yields the same representative
    df = spark.createDataFrame(edges, "a long, b long")
    for kw in ({}, {"small_graph_edges": 0}):  # fast path AND distributed
        got = {
            r.vertex: r.component
            for r in connected_components(df, **kw).collect()
        }
        assert got == want, f"kwargs={kw}"


# --- round-6 chunking / mixing kernels -------------------------------------


def _fixed_chunks_reference(toks: list[str], c: int, s: int):
    """Obviously-correct Python chunker: windows of c at stride s,
    one chunk minimum, last window may be short."""
    import hashlib
    import math

    n = len(toks)
    n_starts = 1 + max(0, math.ceil((n - c) / s))
    out = []
    for i in range(n_starts):
        w = toks[i * s : i * s + c]
        out.append((i, len(w), hashlib.md5(" ".join(w).encode()).hexdigest()))
    return out


@given(st.data())
@_SLOW
def test_fixed_chunking_matches_reference(spark, data):
    from data_framework_spark.functions.chunking import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        _chunks,
    )

    n_docs = data.draw(st.integers(1, 6), label="n_docs")
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31 - 1)))
    docs = []
    for d in range(n_docs):
        n_tok = int(rng.integers(1, 120))
        docs.append((d, " ".join(f"t{rng.integers(0, 30)}" for _ in range(n_tok))))
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.chunk_idx): (r.n_tok, r.chunk_hash)
        for r in _chunks(sdf).collect()
    }
    want = {}
    for d, text in docs:
        for i, n, h in _fixed_chunks_reference(
            text.split(" "), CHUNK_TOKENS, CHUNK_STRIDE
        ):
            want[(d, i)] = (n, h)
    assert got == want


def _cdc_reference(toks: list[str], divisor: int):
    """Python CDC: boundary where md5(trigram ending here) first-8-hex
    int % divisor == 0, or at position 0; returns chunk hash list."""
    import hashlib

    chunks, cur = [], []
    for i, t in enumerate(toks):
        gram = " ".join(toks[max(0, i - 2) : i + 1])
        h = int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)
        if (h % divisor == 0 or i == 0) and cur:
            chunks.append(cur)
            cur = []
        cur.append(t)
    if cur:
        chunks.append(cur)
    return [
        hashlib.md5(" ".join(ch).encode()).hexdigest() for ch in chunks
    ]


@given(st.data())
@_SLOW
def test_cdc_chunking_matches_reference(spark, tmp_path_factory, data):
    import hashlib

    import data_framework_spark.functions.chunking as chmod
    from pyspark.sql import functions as F

    rng = np.random.default_rng(data.draw(st.integers(0, 2**31 - 1)))
    n_docs = data.draw(st.integers(1, 4), label="n_docs")
    docs = []
    for d in range(n_docs):
        n_tok = int(rng.integers(1, 150))
        docs.append(
            (d, "s", " ".join(f"t{rng.integers(0, 40)}" for _ in range(n_tok)))
        )
    tmp = tmp_path_factory.mktemp("cdcprop")
    pd.DataFrame(docs, columns=["doc_id", "source", "text"]).to_parquet(
        tmp / "documents.parquet", index=False
    )
    out = {
        r.source: r for r in chmod.q_cdc_chunks(spark, str(tmp)).collect()
    }["s"]
    want_hashes = []
    for _, _, text in docs:
        want_hashes.extend(_cdc_reference(text.split(" "), chmod.CDC_DIVISOR))
    assert out.n_chunks == len(want_hashes)
    assert out.n_distinct == len(set(want_hashes))


@given(st.data())
@_SLOW
def test_domain_mix_matches_numpy(spark, tmp_path_factory, data):
    from data_framework_spark.functions.sampling import (
        MIX_ALPHA,
        MIX_BUDGET,
        q_domain_mix,
    )

    rng = np.random.default_rng(data.draw(st.integers(0, 2**31 - 1)))
    n_src = data.draw(st.integers(2, 6), label="n_src")
    rows, doc_id = [], 0
    for s in range(n_src):
        for _ in range(int(rng.integers(1, 20))):
            n_tok = int(rng.integers(1, 50))
            rows.append(
                (doc_id, f"src{s}", " ".join("x" for _ in range(n_tok)))
            )
            doc_id += 1
    tmp = tmp_path_factory.mktemp("mixprop")
    pd.DataFrame(rows, columns=["doc_id", "source", "text"]).to_parquet(
        tmp / "documents.parquet", index=False
    )
    got = {r.source: r for r in q_domain_mix(spark, str(tmp)).collect()}
    pdf = pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    pdf["n_tok"] = pdf["text"].str.split(" ").str.len()
    per = pdf.groupby("source")["n_tok"].sum()
    p = per / per.sum()
    q = np.power(p, MIX_ALPHA)
    w = q / q.sum()
    for src in per.index:
        assert got[src].n_tokens == per[src]
        # one-rounding-step slack: the engines round HALF_UP, Python
        # rounds half-even, so an exact 6dp tie differs by 1e-6
        assert abs(got[src].p_raw - float(p[src])) <= 1.01e-6
        assert abs(got[src].w_temp - float(w[src])) <= 1.01e-6
        want_epochs = float(w[src] * MIX_BUDGET / per[src])
        assert abs(got[src].epochs - want_epochs) <= 1.01e-4


def _pagerank_reference(n, edges, d, iters):
    """Dense numpy PageRank, synchronous, dangling mass leaks."""
    deg = np.zeros(n)
    for a, _ in edges:
        deg[a] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        c = np.zeros(n)
        for a, b in edges:
            c[b] += r[a] / deg[a]
        r = (1 - d) / n + d * c
    return r


@given(st.data())
@_SLOW
@pytest.mark.slow  # r18: >10 s; slow lane (see pytest.ini)
def test_pagerank_matches_numpy(spark, data):
    from data_framework_spark.operators.graph import (
        PR_DAMPING,
        PR_ITERS,
        pagerank,
    )

    rng = np.random.default_rng(data.draw(st.integers(0, 2**31 - 1)))
    n = data.draw(st.integers(2, 15), label="n")
    # random undirected edge set (possibly leaving isolated nodes)
    pairs = {
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(data.draw(st.integers(0, 25)), 2))
        if a != b
    }
    edges = sorted({e for a, b in pairs for e in [(a, b), (b, a)]})
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "node long")
    if edges:
        edges_df = spark.createDataFrame(edges, "a long, b long")
    else:
        edges_df = spark.createDataFrame([], "a long, b long")
    got = {
        r.node: r.r for r in pagerank(nodes_df, edges_df).collect()
    }
    want = _pagerank_reference(n, edges, PR_DAMPING, PR_ITERS)
    assert set(got) == set(range(n))
    for i in range(n):
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])
