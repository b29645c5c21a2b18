"""Production-pipeline measurement for the ncells 16 → 32 adoption
decision (r12 verdict ask 3, stage 2 — ablate_ivfpq_ncells.py's
coverage table nominated ncells=32 as the candidate; this script
prices the REAL operating points before the constants move).

Per corpus (the three shipped SFs + the throwaway 10×): build the
actual persisted index (`ivfpq_index_write`, trained quantizer +
K=256 residual books) at ncells ∈ {16, 32}, then measure through the
REAL search routes (`ivfpq_topk_from_index` ADC,
`ivfpq_refine_topk`):

- ADC recall@5 at nprobe=4 (the shipped plain-ADC point);
- refine recall@5 at nprobe=8 (shipped) and nprobe=16 (the
  equal-scan candidate: 16/32 cells ≈ today's 8/16);
- build wall time.

Recall vs a driver-side numpy exact-L2 top-5 (6dp, self excluded,
ties to smaller id — the exact_l2_topk conventions).

Usage: python scripts/measure_ivfpq_ncells32.py [corpus ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    corpora = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
        "/tmp/spark_graft_sf1",
    ]
    from data_framework_spark.session import get_spark
    from data_framework_spark.similarity.ivfpq import (
        IVFPQ_NQ,
        ivfpq_index_write,
        ivfpq_refine_topk,
        ivfpq_topk_from_index,
    )
    from data_framework_spark.sources.tables import load_table

    spark = get_spark("ivfpq-ncells32-measurement")
    out: dict = {}
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
        q_idx = np.where(ids < IVFPQ_NQ)[0]
        queries = [
            (int(ids[qi]), [float(v) for v in X[qi]]) for qi in q_idx
        ]
        exact_top: dict[int, set] = {}
        for qi in q_idx:
            d = np.round(((X - X[qi]) ** 2).sum(axis=1), 6)
            order = np.lexsort((ids, d))
            exact_top[int(ids[qi])] = set(
                [int(ids[j]) for j in order if j != qi][:5]
            )

        def recall(df) -> float:
            got: dict[int, set] = {}
            for r in df.select("query_id", "neighbor_id").collect():
                got.setdefault(int(r["query_id"]), set()).add(
                    int(r["neighbor_id"])
                )
            hits = sum(
                len(got.get(q, set()) & t) for q, t in exact_top.items()
            )
            return round(hits / sum(len(t) for t in exact_top.values()), 3)

        rec: dict = {"n": len(ids)}
        for ncells in (16, 32):
            path = f"/tmp/ncells_ablate_{ncells}"
            shutil.rmtree(path, ignore_errors=True)
            t0 = time.perf_counter()
            ivfpq_index_write(emb, path, ncells=ncells)
            t_build = round(time.perf_counter() - t0, 2)
            crec = {"build_s": t_build}
            crec["adc_recall_nprobe4"] = recall(
                ivfpq_topk_from_index(spark, path, queries, k=5, nprobe=4)
            )
            for nprobe in (8, 16):
                if nprobe > ncells:
                    continue
                crec[f"refine_recall_nprobe{nprobe}"] = recall(
                    ivfpq_refine_topk(
                        spark, path, corpus, k=5, r=100, nprobe=nprobe
                    )
                )
            rec[f"ncells{ncells}"] = crec
            shutil.rmtree(path, ignore_errors=True)
        out[corpus] = rec
        print(json.dumps({corpus: rec}), flush=True)
    print("FINAL", json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
