"""ncells ~ sqrt(N) policy ablation (r13 verdict ask 3).

Round 13 adopted FIXED ncells=32 / refine-nprobe=16, which lifts
shipped-SF refine recall to 0.96-1.00 but leaves the 10x synthetic
corpus (20k vectors) at 0.80 — the coverage-at-scale question: a
fixed cell count means each cell's population grows linearly with N,
so a fixed nprobe probes a constant 50% of CELLS but the per-cell
neighborhoods blur. The faiss guidance is ncells ~ sqrt(N)..4*sqrt(N).

Candidate policy (power-of-2 so shipped SFs are UNTOUCHED):

    ncells(N) = max(32, 2**floor(0.5*log2(N) + 0.5))

    N=500 (sf0.001/0.01) -> 32   (clamped; shipped hashes unchanged)
    N=2,000 (sf0.1)      -> 32   (2**floor(5.48+.5)=2**5; unchanged)
    N=20,000 (10x)       -> 128
    N=200,000 (100x)     -> 512

Protocol (per corpus, per ncells in {32, policy(N), 2*policy(N)}):
train the production coarse quantizer (seeds vec_id < ncells, 2
fixed-point Lloyd rounds — the shipped recipe), assign with the
production rounded-cosine argmax, and report over the 20 contract
queries coverage@nprobe (= the refine route's recall ceiling — r12's
`test_k256_refine_recall_sits_at_coverage_ceiling`) and scan_frac
(mean corpus fraction whose codes the probe touches). The comparison
that decides adoption: coverage at EQUAL scan_frac — finer cells win
only if they buy coverage at the same ADC cost.

Evaluation runs driver-side in numpy over the collected corpus
(200k x 64 doubles = 102 MB at the 100x point — evaluation shortcut
only, chunked GEMMs; training is the real Spark fixed-point Lloyd).

Usage: python scripts/ablate_ivfpq_sqrtn.py [corpus ...]
Defaults: /root/testdata/sf0.1 /tmp/spark_graft_sf1 /tmp/spark_graft_sf10
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def sqrtn_ncells(n: int) -> int:
    return max(32, 1 << int(math.floor(0.5 * math.log2(n) + 0.5)))


def main() -> None:
    corpora = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        "/tmp/spark_graft_sf1",
        "/tmp/spark_graft_sf10",
    ]
    import pandas as pd

    from data_framework_spark.session import get_spark
    from data_framework_spark.similarity import train
    from data_framework_spark.similarity.ivf import (
        _centroid_rows,
        _rounded_centroid_cosines,
    )
    from data_framework_spark.similarity.ivfpq import IVFPQ_NQ
    from data_framework_spark.similarity.train import lloyd_coarse_centroids
    from data_framework_spark.sources.tables import load_table

    spark = get_spark("ivfpq-sqrtn-ablation")
    out: dict[str, dict] = {}
    for corpus in corpora:
        emb = load_table(spark, corpus, "embeddings").select(
            "vec_id", "embedding"
        )
        rows = emb.orderBy("vec_id").collect()
        ids = np.array([r["vec_id"] for r in rows])
        X = np.array(
            [[float(v) for v in r["embedding"]] for r in rows],
            dtype=np.float64,
        )
        n = len(ids)
        q_idx = np.where(ids < IVFPQ_NQ)[0]
        exact_top: dict[int, set] = {}
        for qi in q_idx:
            d = np.round(((X - X[qi]) ** 2).sum(axis=1), 6)
            order = np.lexsort((ids, d))
            exact_top[int(ids[qi])] = set(
                [int(ids[j]) for j in order if j != qi][:5]
            )

        pol = sqrtn_ncells(n)
        cand = sorted({32, pol, 2 * pol})
        rec: dict[str, object] = {"n": n, "policy_ncells": pol}
        for ncells in cand:
            t0 = time.perf_counter()
            cents = lloyd_coarse_centroids(
                emb, _centroid_rows(emb, ncells), train.COARSE_ROUNDS
            )
            t_train = time.perf_counter() - t0
            cos_matrix = _rounded_centroid_cosines(cents)
            cell_ids = np.arange(ncells)
            # chunked production assignment (200k x 512 doubles would
            # be 800 MB in one GEMM)
            cell1 = np.empty(n, dtype=np.int64)
            for lo in range(0, n, 20000):
                hi = min(lo + 20000, n)
                cosall = cos_matrix(pd.Series(list(X[lo:hi])))
                cell1[lo:hi] = np.lexsort(
                    (
                        np.broadcast_to(cell_ids, cosall.shape),
                        -cosall,
                    ),
                    axis=1,
                )[:, 0]
            qcos = cos_matrix(pd.Series(list(X[q_idx])))
            sizes = np.bincount(cell1, minlength=ncells)
            crec: dict[str, object] = {
                "train_s": round(t_train, 2),
                "balance_max_over_mean": round(
                    float(sizes.max() / sizes.mean()), 2
                ),
                "empty_cells": int((sizes == 0).sum()),
            }
            # sweep nprobe as FRACTIONS of ncells so equal-scan_frac
            # points line up across cell counts
            for frac_name, frac in (
                ("f1_16", 1 / 16),
                ("f1_8", 1 / 8),
                ("f1_4", 1 / 4),
                ("f1_2", 1 / 2),
            ):
                nprobe = max(1, int(round(ncells * frac)))
                hits = tot = 0
                scanned = 0.0
                for pos, qi in enumerate(q_idx):
                    probed = np.lexsort((cell_ids, -qcos[pos]))[:nprobe]
                    probed_set = set(probed.tolist())
                    scanned += float(sizes[probed].sum()) / n
                    for nid in exact_top[int(ids[qi])]:
                        j = int(np.where(ids == nid)[0][0])
                        hits += cell1[j] in probed_set
                        tot += 1
                crec[f"{frac_name}_nprobe{nprobe}"] = {
                    "coverage": round(hits / tot, 3),
                    "scan_frac": round(scanned / len(q_idx), 3),
                }
            rec[f"ncells{ncells}"] = crec
            print(
                json.dumps({corpus: {f"ncells{ncells}": crec}}), flush=True
            )
        out[corpus] = rec
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()
