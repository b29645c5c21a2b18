"""Batched-BPE trainer at a realistic merge count (r10 verdict ask 6):
the contract demonstrates 8 merges in 2 passes; the production claim
is a job-count recipe for ~32k-merge vocabularies. This script runs
the batched trainer to ~64 merges on the throwaway 10× corpus
(scripts/gen_scale_corpus.py), measures wall time and the realized
BATCH UTILIZATION (symbol-disjoint merges accepted per pass — the
quantity the job-count recipe n_merges/P depends on), and compares
against the classic one-merge-per-job trainer measured over its first
16 merges and extrapolated linearly (its cost/merge is flat: every
merge is one vocab-sized aggregate + one 1-row collect).

Usage: python scripts/measure_bpe_batched.py [corpus_dir] [target]
Defaults: /tmp/spark_graft_sf1, 64 merges.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    target = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    from data_framework_spark.functions.bpe import (
        learn_bpe_merges,
        learn_bpe_merges_batched,
    )
    from data_framework_spark.session import get_spark
    from data_framework_spark.sources.tables import load_table

    spark = get_spark("bpe-batched-measurement")
    docs = load_table(spark, corpus, "documents")
    docs.count()  # warm FS

    # batched: per_pass=4, enough passes to reach the target
    per_pass = 4
    passes = -(-target // per_pass)
    t0 = time.perf_counter()
    merges = learn_bpe_merges_batched(docs, passes=passes, per_pass=per_pass)
    t_batched = time.perf_counter() - t0
    by_pass: dict[int, int] = {}
    for p, _k, _l, _r, _c in merges:
        by_pass[p] = by_pass.get(p, 0) + 1
    utilization = {p: by_pass[p] for p in sorted(by_pass)}

    # classic: measure the first 16 merges, extrapolate to the same
    # merge count (cost/merge is flat by construction)
    n_probe = 16
    t0 = time.perf_counter()
    classic = learn_bpe_merges(docs, n_merges=n_probe)
    t_classic_probe = time.perf_counter() - t0
    per_merge = t_classic_probe / max(1, len(classic))

    print(
        json.dumps(
            {
                "corpus": corpus,
                "target_merges": target,
                "batched": {
                    "merges_learned": len(merges),
                    "passes_run": len(utilization),
                    "accepted_per_pass": utilization,
                    "mean_utilization": round(
                        len(merges) / (per_pass * max(1, len(utilization))), 3
                    ),
                    "wall_s": round(t_batched, 2),
                },
                "classic": {
                    "probe_merges": len(classic),
                    "probe_wall_s": round(t_classic_probe, 2),
                    "s_per_merge": round(per_merge, 3),
                    "extrapolated_wall_s_at_target": round(
                        per_merge * target, 1
                    ),
                },
                "speedup_at_target": round(
                    (per_merge * target) / t_batched, 2
                ),
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
