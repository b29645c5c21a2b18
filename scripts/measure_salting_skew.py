"""Hot-coarse-cell salting measurement (r13 verdict ask 5 follow-up:
the escape is wired + parity-pinned in r14; this prices it).

Corpus: every vector AND every centroid inside one tight spherical
cap, so the sharded route's coarse quantizer (G = ceil(sqrt(K))
cells) funnels ~all vectors through ONE (cell) cogroup key — the
maximal skew regime. At salt=1 that is a single straggler task
scoring the whole corpus; salt=S splits the vector side across S
tasks while each still scores the cell's full member set (bitwise
invariance pinned in tests/test_round14.py).

Reports wall time of the full assignment at salt ∈ {1, 4, 8, 16} and
checks the maps are identical. The reading is a TASK-PARALLELISM
lever: on local[32] the win is bounded by the kernel's numpy share;
on a real cluster the salt=1 shape is one executor doing all the
work while the rest idle — the classic skewed-join pathology.

Usage: python scripts/measure_salting_skew.py [n_vectors] [k_cents]
Defaults: 80000 vectors, 256 centroids, dim 64.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 80000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    dim = 64
    from data_framework_spark.session import get_spark
    from data_framework_spark.similarity.semantic import (
        _assign_clusters_sharded,
    )

    spark = get_spark("salting-skew-measure")
    rng = np.random.default_rng(20260816)
    hot = np.zeros(dim)
    hot[0] = 1.0
    C = hot[None, :] + 0.01 * rng.standard_normal((k, dim))
    C /= np.sqrt((C * C).sum(axis=1))[:, None]
    X = C[rng.integers(0, k, n)] + 0.004 * rng.standard_normal((n, dim))
    emb = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).repartition(32).persist()
    emb.count()
    cents = spark.createDataFrame(
        [(i, [float(x) for x in C[i]]) for i in range(k)],
        "cent_id long, cent array<double>",
    )

    out = {}
    base = None
    for salt in (1, 4, 8, 16):
        t0 = time.perf_counter()
        got = {
            r["vec_id"]: r["cluster"]
            for r in _assign_clusters_sharded(emb, cents, salt=salt).collect()
        }
        dt = time.perf_counter() - t0
        if base is None:
            base = got
        out[f"salt{salt}"] = {
            "wall_s": round(dt, 2),
            "equal": got == base,
            "n": len(got),
        }
        print(json.dumps({f"salt{salt}": out[f"salt{salt}"]}), flush=True)
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
