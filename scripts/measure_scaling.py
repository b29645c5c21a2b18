"""Scaling measurement harness (r9 verdict ask 4): run the heaviest
LLM-pipeline operators at sf0.1 and at the throwaway 10× corpus
(scripts/gen_scale_corpus.py) and report the wall-time ratio. A
shuffle-free / bucketed / bounded design should scale ~linearly in
rows (ratio ≈ 10 on a fixed-core box, LESS when the small scale
underutilizes the 32 cores); anything well above ~1.5× linear is a
hidden super-linear path (bucket blowup, all-pairs leak) to fix or
justify. Cold includes index/scratch builds; warm = min of 2 repeats.

Usage: python scripts/measure_scaling.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = [
    "curation_funnel",
    "minhash_near_dup_pairs",
    "dedup_clusters",
    "dup_span_extract",
    "ivfpq_persist_topk",
    "ivfpq_refine_topk",
    "bm25_postings_topk",
    "semantic_dedup",
    # the K~N/const scale-path variant next to the fixed-K contract it
    # fixes: the before/after pair for the r10 verdict's ask 3
    "semantic_dedup_scaled",
]


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    from data_framework_spark.registry import QUERIES
    from data_framework_spark.session import get_spark
    from data_framework_spark.similarity.ann import evict_route

    spark = get_spark("scaling-measurement")
    out: dict[str, dict] = {}
    for sf_dir in ["/root/testdata/sf0.1", sf1]:
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm FS
        for name in OPS:
            rec = out.setdefault(name, {})
            times = []
            for rep in range(3):
                for route in QUERIES[name].cached_routes:
                    evict_route(spark, sf_dir, route)
                t0 = time.perf_counter()
                QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(round(time.perf_counter() - t0, 3))
            key = "sf0.1" if sf_dir.endswith("sf0.1") else "sf1"
            rec[key] = {"cold": times[0], "warm": min(times[1:])}
    for name, rec in out.items():
        rec["ratio_cold"] = round(rec["sf1"]["cold"] / rec["sf0.1"]["cold"], 2)
        rec["ratio_warm"] = round(rec["sf1"]["warm"] / rec["sf0.1"]["warm"], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
