"""OPQ-style rotation ablation (the OTHER ADC lever the r10 verdict
named next to K=256): does rotating the residual space before product
quantization cut quantization error / lift ADC recall on THIS corpus?

OPQ's gain (Ge et al. 2013) comes from decorrelating dimensions and
balancing per-subspace variance so each codebook models comparable
energy. The driver corpora's embeddings are isotropic unit-norm
Gaussians (TESTDATA.md), whose residuals are already ~decorrelated
with ~equal per-dimension variance — the expected rotation gain is
~0, and this script measures that instead of asserting it.

Protocol: coarse quantizer + residuals exactly as production (16
Lloyd-trained cells); then per rotation R ∈ {identity, seeded random
orthonormal, PCA of residuals} train K=16 per-subspace codebooks on
R·residual with a numpy Lloyd (same rounds/seeding recipe; numpy here
because the ablation compares QUALITY between rotations — the
distributed trainer's arithmetic is pinned elsewhere) and report mean
quantization error + ADC recall@5 at nprobe=8. Orthogonal R preserves
L2, so ADC distances in rotated space are comparable across variants.

Usage: python scripts/ablate_opq_rotation.py [corpus]
Default: /tmp/spark_graft_sf1
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def round9(x: np.ndarray) -> np.ndarray:
    return np.sign(x) * np.floor(np.abs(x) * 1e9 + 0.5) / 1e9


def np_lloyd_books(R: np.ndarray, M: int, K: int, seed_off: int, rounds: int = 2):
    """Per-subspace k-means matching the production recipe's shape:
    seeds = rows seed_off..seed_off+K-1, `rounds` mean updates."""
    n, dim = R.shape
    sub = dim // M
    books = np.stack(
        [R[seed_off : seed_off + K, s * sub : (s + 1) * sub] for s in range(M)]
    ).astype(np.float64)
    for _ in range(rounds):
        new = books.copy()
        for s in range(M):
            Xs = R[:, s * sub : (s + 1) * sub]
            d = ((Xs[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
            code = np.argmin(round9(d), axis=1)
            for k in range(K):
                m = code == k
                if m.any():
                    new[s, k] = Xs[m].mean(axis=0)
        books = new
    return books


def encode(R: np.ndarray, books: np.ndarray):
    n = len(R)
    M, K, sub = books.shape
    codes = np.empty((n, M), dtype=np.int64)
    err = 0.0
    for s in range(M):
        Xs = R[:, s * sub : (s + 1) * sub]
        d = round9(((Xs[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2))
        codes[:, s] = np.argmin(d, axis=1)
        err += d[np.arange(n), codes[:, s]].sum()
    return codes, err / (n * M)


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    from data_framework_spark.session import get_spark
    from data_framework_spark.similarity import train
    from data_framework_spark.similarity.ivf import (
        _centroid_rows,
        _rounded_centroid_cosines,
    )
    from data_framework_spark.similarity.ivfpq import (
        IVFPQ_NCELLS,
        IVFPQ_NQ,
        assign_and_residual,
    )
    from data_framework_spark.similarity.pq import PQ_K, PQ_M
    from data_framework_spark.similarity.train import lloyd_coarse_centroids
    from data_framework_spark.sources.tables import load_table

    spark = get_spark("opq-ablation")
    emb = load_table(spark, corpus, "embeddings").select("vec_id", "embedding")
    cents = lloyd_coarse_centroids(
        emb, _centroid_rows(emb, IVFPQ_NCELLS), train.COARSE_ROUNDS
    )
    rows = assign_and_residual(emb, cents).orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    cells = np.array([r["cell"] for r in rows])
    Res = np.array([r["residual"] for r in rows], dtype=np.float64)
    X = np.array(
        [
            [float(v) for v in r["embedding"]]
            for r in emb.orderBy("vec_id").collect()
        ],
        dtype=np.float64,
    )
    n, dim = Res.shape

    # rotations (orthonormal -> L2-preserving)
    rng = np.random.default_rng(20260815)
    Q_rand, _ = np.linalg.qr(rng.standard_normal((dim, dim)))
    cov = np.cov(Res.T)
    _, Q_pca = np.linalg.eigh(cov)
    Q_pca = Q_pca[:, ::-1]  # descending variance, OPQ-natural order
    rotations = {
        "identity": np.eye(dim),
        "random_orthonormal": Q_rand,
        "pca_residuals": Q_pca,
    }

    # exact L2 top-5 baseline (self excluded)
    q_idx = np.where(ids < IVFPQ_NQ)[0]
    exact_top = {}
    for qi in q_idx:
        d = np.round(((X - X[qi]) ** 2).sum(axis=1), 6)
        order = np.lexsort((ids, d))
        exact_top[int(ids[qi])] = set(
            [int(ids[j]) for j in order if j != qi][:5]
        )

    import pandas as pd

    cos_matrix = _rounded_centroid_cosines(cents)
    qcos = cos_matrix(pd.Series(list(X[q_idx])))
    cell_ids = np.arange(len(cents))
    C = np.asarray(cents)
    nprobe = 8

    out = {"corpus": corpus, "n": n, "M": PQ_M, "K": PQ_K}
    for name, Q in rotations.items():
        R = Res @ Q
        books = np_lloyd_books(R, PQ_M, PQ_K, seed_off=IVFPQ_NCELLS)
        codes, mean_err = encode(R, books)
        sub = dim // PQ_M
        hits = tot = 0
        for pos, qi in enumerate(q_idx):
            probed = np.lexsort((cell_ids, -qcos[pos]))[:nprobe]
            best: dict[int, float] = {}
            for cell in probed:
                in_cell = np.where(
                    (cells == cell) & (ids != ids[qi])
                )[0]
                if len(in_cell) == 0:
                    continue
                qres = (X[qi] - C[cell]) @ Q
                adc = np.zeros(len(in_cell))
                for s in range(PQ_M):
                    qs = qres[s * sub : (s + 1) * sub]
                    lut = round9(((books[s] - qs[None, :]) ** 2).sum(axis=1))
                    adc += lut[codes[in_cell, s]]
                for j, a in zip(in_cell, adc):
                    best[int(ids[j])] = float(a)
            top5 = {
                nid
                for nid, _ in sorted(best.items(), key=lambda kv: (kv[1], kv[0]))[:5]
            }
            hits += len(top5 & exact_top[int(ids[qi])])
            tot += len(exact_top[int(ids[qi])])
        out[name] = {
            "mean_err": round(float(mean_err), 4),
            "adc_recall_nprobe8": round(hits / tot, 3),
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
