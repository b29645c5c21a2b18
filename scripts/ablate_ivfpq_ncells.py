"""IVF cell-count / multi-assignment ablation (r12 verdict ask 3).

Round 12 pinned refine recall EXACTLY at the nprobe=8 coverage
ceiling (0.92/0.93/0.96) — with 8-bit codebooks the ADC shortlist
drops no covered true neighbor, so the ONLY remaining recall loss is
a true neighbor whose assigned cell is unprobed. Coverage depends
ONLY on the coarse quantizer and the probe rule, so this ablation
measures coverage directly (refine recall == coverage at the shipped
operating point, `test_k256_refine_recall_sits_at_coverage_ceiling`)
plus the scanned-candidate fraction that prices each configuration.

Protocol (per corpus): for each ncells ∈ {16, 32, 64}, train the
production coarse quantizer (seeds vec_id < ncells, 2 fixed-point
Lloyd rounds — the shipped recipe with only ncells changed), assign
cells with the production rounded-cosine argmax, then for each
nprobe report, over the 20 contract queries:

- coverage@nprobe — fraction of exact-L2 top-5 neighbors whose
  assigned cell is probed (= the refine route's recall ceiling);
- scan_frac — mean fraction of the corpus whose codes the probe
  touches (the ADC cost knob: candidates ≈ scan_frac·N per query);
- balance — max/mean cell size (skew: a hot cell bounds the probed
  partition read).

Multi-assignment (A=2): each corpus vector additionally enters the
inverted list of its SECOND-nearest cell (codes stored twice, index
2×): a neighbor is covered if EITHER of its cells is probed. Same
metrics; scan_frac counts the doubled lists honestly.

The comparison that matters at fixed ADC budget: configurations with
equal scan_frac (e.g. 16 cells/nprobe 4 ≈ 32/8 ≈ 64/16 ≈ 25%;
16/8 ≈ 32/16 ≈ A=2@16/8-ish ≈ 50%) — finer cells win only if
coverage at EQUAL scan cost beats the shipped point.

Evaluation runs driver-side in numpy over the collected corpus (20k
× 64 doubles ≈ 10 MB — evaluation shortcut only, the pq-ablation
precedent); training is the real Spark fixed-point Lloyd.

Usage: python scripts/ablate_ivfpq_ncells.py [corpus ...]
Defaults: /root/testdata/sf0.1 /tmp/spark_graft_sf1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    corpora = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/spark_graft_sf1"]
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

    spark = get_spark("ivfpq-ncells-ablation")
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

        rec: dict[str, dict] = {"n": n}
        for ncells in (16, 32, 64):
            t0 = time.perf_counter()
            cents = lloyd_coarse_centroids(
                emb, _centroid_rows(emb, ncells), train.COARSE_ROUNDS
            )
            t_train = time.perf_counter() - t0
            cos_matrix = _rounded_centroid_cosines(cents)
            cell_ids = np.arange(ncells)
            # production assignment: rounded-cosine argmax (first max
            # = smallest cid); second-place cell for multi-assignment
            cosall = cos_matrix(pd.Series(list(X)))
            order = np.lexsort(
                (np.broadcast_to(cell_ids, cosall.shape), -cosall), axis=1
            )
            cell1 = order[:, 0]
            cell2 = order[:, 1] if ncells > 1 else order[:, 0]
            qcos = cosall[q_idx]
            sizes = np.bincount(cell1, minlength=ncells)
            crec: dict[str, object] = {
                "train_s": round(t_train, 2),
                "balance_max_over_mean": round(
                    float(sizes.max() / sizes.mean()), 2
                ),
            }
            for assign_mode in ("single", "multi2"):
                own = (
                    cell1[:, None]
                    if assign_mode == "single"
                    else np.stack([cell1, cell2], axis=1)
                )
                for nprobe in (2, 4, 8, 16, 32):
                    if nprobe > ncells:
                        continue
                    hits = tot = 0
                    scanned = 0.0
                    for pos, qi in enumerate(q_idx):
                        probed = set(
                            np.lexsort((cell_ids, -qcos[pos]))[
                                :nprobe
                            ].tolist()
                        )
                        in_probe = np.isin(own, list(probed)).any(axis=1)
                        # scanned codes: every (vector, list) entry in a
                        # probed cell — multi-assignment lists count twice
                        scanned += float(
                            np.isin(own, list(probed)).sum()
                        ) / n
                        for nid in exact_top[int(ids[qi])]:
                            j = int(np.where(ids == nid)[0][0])
                            hits += bool(in_probe[j])
                            tot += 1
                    key = f"{assign_mode}_nprobe{nprobe}"
                    crec[key] = {
                        "coverage": round(hits / tot, 3),
                        "scan_frac": round(scanned / len(q_idx), 3),
                    }
            rec[f"ncells{ncells}"] = crec
            print(json.dumps({corpus: {f"ncells{ncells}": crec}}), flush=True)
        out[corpus] = rec
    print("FINAL", json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
