"""Hierarchical-assignment measurement (r11 verdict ask 3): the
scaled semantic dedup's ASSIGNMENT STAGE alone — flat Arrow GEMM
(`_assign_clusters_arrow`, O(N·K) FLOPs) vs the exact
coarse-over-centroids route (`_assign_clusters_hier`) — at sf0.1 and
the throwaway 10× corpus, on BOTH regimes:

- the shipped isotropic corpus: cosine concentration makes every
  pruning bound loose, so the hier route honestly does ~flat work
  plus one N×√K coarse pass — the structural worst case (the OPQ
  ablation precedent: measure the null, don't argue it);
- a deterministic CLUSTERED corpus of the same shape (K isotropic
  anchors at the K~N/64 policy count, 64 members each): members
  cluster but the CENTROID SET itself stays isotropic — measured to
  show pruning needs centroid-level structure, not just member
  cohesion (first measurement: 0.86-0.97 pairs still evaluated);
- a deterministic HIERARCHICAL corpus (sqrt(K) super-topics, each
  with sqrt(K) sub-anchors at ~20 deg spread, members at ~15 deg) —
  the topic/subtopic structure real embedding spaces exhibit and the
  regime the route exists for: coarse cells align with super-topics,
  bounds go tight, and most vectors evaluate ~1 cell's centroids.

Wall times: 1 cold + min-of-3 warm per (corpus, route) via a noop
sink over just the assignment frame. FLOP truth: a driver-side numpy
replica of the hier algorithm counts evaluated (vector, centroid)
pairs / (N·K) — wall time on a 32-core box under-reports the win
because the flat GEMM is BLAS-saturated.

Usage: python scripts/measure_hier_assign.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _write(path: str, X: np.ndarray) -> None:
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    pd.DataFrame(
        {
            "vec_id": np.arange(len(X), dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in X],
        }
    ).to_parquet(os.path.join(path, "embeddings.parquet"))
    open(os.path.join(path, "_SUCCESS_GEN"), "w").write("ok")


def make_clustered(path: str, n: int, dim: int = 64) -> None:
    """Deterministic clustered corpus at the K~N/64 policy shape:
    K = ceil(n/64) ISOTROPIC unit anchors (seeded RNG), 64 members per
    anchor with small perturbations — written once, reused."""
    if os.path.exists(os.path.join(path, "_SUCCESS_GEN")):
        return
    k = max(1, -(-n // 64))
    rng = np.random.default_rng(20260815)
    anchors = rng.standard_normal((k, dim))
    anchors /= np.sqrt((anchors * anchors).sum(axis=1))[:, None]
    owner = np.arange(n) % k
    X = anchors[owner] + 0.05 * rng.standard_normal((n, dim))
    _write(path, X)


def make_hierarchical(path: str, n: int, dim: int = 64) -> None:
    """Deterministic TWO-LEVEL corpus: S = ceil(sqrt(K)) isotropic
    super-topics; K sub-anchors = super + 0.045-sigma perturbation
    (within-super spread ~20 deg, cross-super ~90 deg); members =
    sub-anchor + 0.02-sigma noise (~15 deg). The low vec_ids — which
    the K~N/64 policy samples as centroids — are the sub-anchors'
    nearest members, so the centroid set inherits the super-topic
    structure the coarse cells need."""
    if os.path.exists(os.path.join(path, "_SUCCESS_GEN")):
        return
    k = max(1, -(-n // 64))
    s = max(1, int(np.ceil(np.sqrt(k))))
    rng = np.random.default_rng(20260816)
    supers = rng.standard_normal((s, dim))
    supers /= np.sqrt((supers * supers).sum(axis=1))[:, None]
    subs = supers[np.arange(k) % s] + 0.045 * rng.standard_normal((k, dim))
    subs /= np.sqrt((subs * subs).sum(axis=1))[:, None]
    owner = np.arange(n) % k
    X = subs[owner] + 0.02 * rng.standard_normal((n, dim))
    _write(path, X)


def pruned_fraction(C: np.ndarray, cids: np.ndarray, X: np.ndarray) -> float:
    """Driver-side replica of `_assign_clusters_hier`'s pruning loop
    that returns evaluated-pairs / (N·K)."""
    from data_framework_spark.similarity.semantic import _hier_coarse_index

    idx = _hier_coarse_index(cids, C)
    Mu, members, radius = idx["Mu"], idx["members"], idx["radius"]
    G = len(members)
    n = len(X)
    nx = np.sqrt((X * X).sum(axis=1))
    Xu = X / nx[:, None]
    Cn = np.sqrt((C * C).sum(axis=1))
    theta = np.arccos(np.clip(Xu @ Mu.T, -1.0, 1.0))
    ub = np.cos(np.maximum(theta - radius[None, :], 0.0))
    best_raw = np.full(n, -np.inf)
    done = np.zeros((n, G), dtype=bool)
    evaluated = 0

    def eval_cell(rows, g):
        nonlocal evaluated
        mem = members[g]
        raw = (X[rows] @ C[mem].T) / (nx[rows, None] * Cn[mem][None, :])
        best_raw[rows] = np.maximum(best_raw[rows], raw.max(axis=1))
        done[rows, g] = True
        evaluated += len(rows) * len(mem)

    nonempty = [g for g in range(G) if len(members[g])]
    g0 = np.asarray(nonempty)[ub[:, nonempty].argmax(axis=1)]
    for g in np.unique(g0):
        eval_cell(np.where(g0 == g)[0], int(g))
    for g in sorted(nonempty, key=lambda g: -float(ub[:, g].max())):
        rows = np.where(~done[:, g] & (ub[:, g] >= best_raw - 2e-6))[0]
        if len(rows):
            eval_cell(rows, int(g))
    return evaluated / (n * len(C))


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    clustered1 = "/tmp/hier_clustered_2k"
    clustered10 = "/tmp/hier_clustered_20k"
    hier1 = "/tmp/hier_twolevel_2k"
    hier10 = "/tmp/hier_twolevel_20k"
    make_clustered(clustered1, 2000)
    make_clustered(clustered10, 20000)
    make_hierarchical(hier1, 2000)
    make_hierarchical(hier10, 20000)

    from pyspark.sql import functions as F

    from data_framework_spark.session import get_spark
    from data_framework_spark.similarity.semantic import (
        _assign_clusters_arrow,
        _assign_clusters_hier,
        scaled_k,
    )

    spark = get_spark("hier-assign-measurement")
    out: dict = {}
    for label, d in (
        ("iso_1x", "/root/testdata/sf0.1"),
        ("iso_10x", sf1),
        ("clu_1x", clustered1),
        ("clu_10x", clustered10),
        ("hier_1x", hier1),
        ("hier_10x", hier10),
    ):
        emb = (
            spark.read.parquet(f"{d}/embeddings.parquet")
            .select("vec_id", "embedding")
        )
        n = emb.count()
        k = scaled_k(n)
        cents_rows = (
            emb.filter(F.col("vec_id") < k)
            .select("vec_id", "embedding")
            .orderBy("vec_id")
            .collect()
        )
        rec = {"n": n, "k": k}
        for route_name, route in (
            ("flat", _assign_clusters_arrow),
            ("hier", _assign_clusters_hier),
        ):
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                route(emb, cents_rows).select("vec_id", "cluster").write.format(
                    "noop"
                ).mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
            rec[route_name] = {"cold": times[0], "warm": min(times[1:])}
        X = np.asarray(
            [[float(v) for v in r["embedding"]]
             for r in emb.orderBy("vec_id").collect()],
            dtype=np.float64,
        )
        C = np.asarray(
            [[float(v) for v in r["embedding"]] for r in cents_rows],
            dtype=np.float64,
        )
        cids = np.asarray([int(r["vec_id"]) for r in cents_rows])
        rec["evaluated_pair_fraction"] = round(pruned_fraction(C, cids, X), 4)
        out[label] = rec
        print(json.dumps({label: rec}), flush=True)
    print("FINAL", json.dumps(out))


if __name__ == "__main__":
    main()
