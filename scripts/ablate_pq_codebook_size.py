"""PQ codebook-size ablation: K=16 (4 bits/subspace, the operating
point through round 11) vs K=256 (8 bits — the standard faiss point,
ADOPTED round 12 on this ablation's evidence), r10 verdict ask 4. The
nprobe curve proved coverage is solved (0.93 at nprobe=8) while raw
ADC recall sat ~0.33: the hypothesis — confirmed, then shipped — was
that 16-entry codebooks were the binding constraint on ADC RANKING
quality.

Protocol (per corpus): train the production coarse quantizer (16
cells, 2 fixed-point Lloyd rounds), compute residuals once, then for
each K train residual codebooks (seeds = residuals of vec_ids
16..16+K-1, 2 Lloyd rounds — the production recipe with only K
changed) and evaluate ADC recall@5 for the 20 contract queries at
nprobe ∈ {4, 8} against exact L2 (self excluded, 6dp/9dp rounding
conventions of ivfpq.py). Training wall time is measured; evaluation
runs driver-side in numpy over the collected residuals (20k × 64
doubles ≈ 10 MB — an EVALUATION shortcut only; the production encode
path stays the Arrow mapInPandas pass).

Usage: python scripts/ablate_pq_codebook_size.py [corpus ...]
Defaults: /root/testdata/sf0.1 /tmp/spark_graft_sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def round9(x: np.ndarray) -> np.ndarray:
    return np.sign(x) * np.floor(np.abs(x) * 1e9 + 0.5) / 1e9


def main() -> None:
    corpora = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/spark_graft_sf1"]
    from pyspark.sql import functions as F

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
    from data_framework_spark.similarity.pq import PQ_M, _SUB
    from data_framework_spark.similarity.train import (
        lloyd_coarse_centroids,
        lloyd_subspace_books,
    )
    from data_framework_spark.sources.tables import load_table

    spark = get_spark("pq-codebook-ablation")
    out: dict[str, dict] = {}
    for corpus in corpora:
        emb = load_table(spark, corpus, "embeddings").select(
            "vec_id", "embedding"
        )
        t0 = time.perf_counter()
        cents = lloyd_coarse_centroids(
            emb, _centroid_rows(emb, IVFPQ_NCELLS), train.COARSE_ROUNDS
        )
        t_coarse = time.perf_counter() - t0
        res = assign_and_residual(emb, cents).persist()
        rows = res.orderBy("vec_id").collect()
        ids = np.array([r["vec_id"] for r in rows])
        cells = np.array([r["cell"] for r in rows])
        R = np.array([r["residual"] for r in rows], dtype=np.float64)
        X = np.array(
            [
                [float(v) for v in r["embedding"]]
                for r in emb.orderBy("vec_id").collect()
            ],
            dtype=np.float64,
        )
        n = len(ids)

        # exact L2 top-5 (6dp rounded, self excluded, ties to smaller id)
        q_idx = np.where(ids < IVFPQ_NQ)[0]
        exact_top: dict[int, set] = {}
        for qi in q_idx:
            d = np.round(((X - X[qi]) ** 2).sum(axis=1), 6)
            order = np.lexsort((ids, d))
            picked = [int(ids[j]) for j in order if j != qi][:5]
            exact_top[int(ids[qi])] = set(picked)

        cos_matrix = _rounded_centroid_cosines(cents)
        import pandas as pd

        qcos = cos_matrix(pd.Series(list(X[q_idx])))
        cell_ids = np.arange(len(cents))

        rec: dict[str, dict] = {"coarse_train_s": round(t_coarse, 2), "n": n}
        for K in (16, 256):
            seed_mask = (ids >= IVFPQ_NCELLS) & (ids < IVFPQ_NCELLS + K)
            seeds = np.stack(
                [
                    R[seed_mask][:, s * _SUB : (s + 1) * _SUB]
                    for s in range(PQ_M)
                ]
            )
            t0 = time.perf_counter()
            books = lloyd_subspace_books(
                res.select(F.col("residual").alias("v")),
                "v",
                seeds,
                train.BOOK_ROUNDS,
            )
            t_books = time.perf_counter() - t0

            # encode: per-subspace argmin of round9(sq-l2), ties smallest
            codes = np.empty((n, PQ_M), dtype=np.int64)
            for s in range(PQ_M):
                Rs = R[:, s * _SUB : (s + 1) * _SUB]
                d = round9(
                    ((Rs[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                )
                codes[:, s] = np.argmin(d, axis=1)
            mean_err = float(
                np.mean(
                    [
                        round9(
                            (
                                (
                                    R[i, s * _SUB : (s + 1) * _SUB]
                                    - books[s][codes[i, s]]
                                )
                                ** 2
                            ).sum()
                        )
                        for i in range(0, n, max(1, n // 2000))
                        for s in range(PQ_M)
                    ]
                )
            )

            krec: dict[str, float] = {
                "train_s": round(t_books, 2),
                "mean_err_sampled": round(mean_err, 4),
                "lut_entries_per_query_at_nprobe8": 8 * PQ_M * K,
            }
            for nprobe in (4, 8):
                hits = tot = 0
                for pos, qi in enumerate(q_idx):
                    probed = set(
                        np.lexsort((cell_ids, -qcos[pos]))[:nprobe].tolist()
                    )
                    cand = np.where(
                        np.isin(cells, list(probed)) & (ids != ids[qi])
                    )[0]
                    # ADC: query residual vs EACH probed cell
                    best: dict[int, float] = {}
                    C = np.asarray(cents)
                    for cell in probed:
                        in_cell = cand[cells[cand] == cell]
                        if len(in_cell) == 0:
                            continue
                        qres = X[qi] - C[cell]
                        adc = np.zeros(len(in_cell))
                        for s in range(PQ_M):
                            qs = qres[s * _SUB : (s + 1) * _SUB]
                            lut = round9(
                                ((books[s] - qs[None, :]) ** 2).sum(axis=1)
                            )
                            adc += lut[codes[in_cell, s]]
                        for j, a in zip(in_cell, adc):
                            best[int(ids[j])] = float(a)
                    top5 = {
                        nid
                        for nid, _ in sorted(
                            best.items(), key=lambda kv: (kv[1], kv[0])
                        )[:5]
                    }
                    hits += len(top5 & exact_top[int(ids[qi])])
                    tot += len(exact_top[int(ids[qi])])
                krec[f"adc_recall_nprobe{nprobe}"] = round(hits / tot, 3)
            rec[f"K{K}"] = krec
        res.unpersist()
        out[corpus] = rec
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
