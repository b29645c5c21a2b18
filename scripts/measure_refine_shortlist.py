"""Refine-shortlist (R) measurement at 10× scale (r13 follow-through
on the ncells adoption): at the adopted 32-cell / nprobe=16 point the
10× corpus shows refine recall 0.80 vs coverage 1.00 — the first
regime where the ADC SHORTLIST, not cell coverage, is the binding
loss (at 20k vectors a 16/32 probe yields ~10k candidates and the
top-100 ADC shortlist starts dropping covered true neighbors; the
shipped SFs' ≤1k-candidate pools never exposed this). This script
prices the R knob: refine recall and wall time at R ∈ {100, 200,
400, 800} against the same persisted index, same queries, same exact
baseline.

The production reading this measurement documents: R must grow with
the per-query candidate-pool size (faiss guidance: k_factor × k vs
the pool), i.e. R ~ pool/quality-constant, NOT a fixed 100 — the
shortlist fetch stays |Q|·R rows (broadcast-joined point reads), so
R growth is cheap until it approaches the pool itself.

Usage: python scripts/measure_refine_shortlist.py [corpus]
Default: /tmp/spark_graft_sf1 (run scripts/gen_scale_corpus.py first)
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
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    from data_framework_spark.session import get_spark
    from data_framework_spark.similarity.ivfpq import (
        IVFPQ_NQ,
        IVFPQ_REFINE_NPROBE,
        ivfpq_index_write,
        ivfpq_refine_topk,
    )
    from data_framework_spark.sources.tables import load_table

    spark = get_spark("refine-shortlist-measurement")
    emb = load_table(spark, corpus, "embeddings").select(
        "vec_id", "embedding"
    )
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array(
        [[float(v) for v in r["embedding"]] for r in rows], dtype=np.float64
    )
    q_idx = np.where(ids < IVFPQ_NQ)[0]
    exact_top: dict[int, set] = {}
    for qi in q_idx:
        d = np.round(((X - X[qi]) ** 2).sum(axis=1), 6)
        order = np.lexsort((ids, d))
        exact_top[int(ids[qi])] = set(
            [int(ids[j]) for j in order if j != qi][:5]
        )

    path = "/tmp/refine_shortlist_idx"
    shutil.rmtree(path, ignore_errors=True)
    ivfpq_index_write(emb, path)
    out: dict = {"n": len(ids), "nprobe": IVFPQ_REFINE_NPROBE}
    for r_short in (100, 200, 400, 800):
        t0 = time.perf_counter()
        df = ivfpq_refine_topk(
            spark, path, corpus, k=5, r=r_short, nprobe=IVFPQ_REFINE_NPROBE
        )
        got: dict[int, set] = {}
        for row in df.select("query_id", "neighbor_id").collect():
            got.setdefault(int(row["query_id"]), set()).add(
                int(row["neighbor_id"])
            )
        dt = round(time.perf_counter() - t0, 2)
        hits = sum(len(got.get(q, set()) & t) for q, t in exact_top.items())
        tot = sum(len(t) for t in exact_top.values())
        out[f"R{r_short}"] = {
            "recall": round(hits / tot, 3),
            "wall_s": dt,
        }
        print(json.dumps({f"R{r_short}": out[f"R{r_short}"]}), flush=True)
    shutil.rmtree(path, ignore_errors=True)
    print("FINAL", json.dumps(out))


if __name__ == "__main__":
    main()
