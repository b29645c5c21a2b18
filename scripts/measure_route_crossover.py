"""Measure the hier-vs-sharded routing boundary (r14 verdict ask 5).

The hier assignment route collects the FULL K-row centroid frame to
the driver; the sharded route keeps it distributed and collects only
G = ceil(sqrt(K)) coarse centers. Per r14's measurement the sharded
route LOSES on wall clock everywhere both run (179 s vs 67 s at 200k
vectors / K=3125), so the routing rule cannot be time-based — it is
a driver-MEMORY rule: hier until the K-row collect approaches the
driver budget, sharded above, where there is no alternative.

This script measures what that collect actually costs: wall seconds
and resident Python-side bytes per centroid row (64-dim float64
arrays through Spark's Row path), at K from 10k to 2M. The routing
cap in similarity/semantic.py is derived from these numbers.

Usage: python scripts/measure_route_crossover.py
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _rss_bytes() -> int:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) * 1024
    return 0


def main() -> None:
    from pyspark.sql import functions as F

    from data_framework_spark.session import get_spark

    spark = get_spark("route-crossover-measurement")

    def cents_frame(k: int):
        # synthetic 64-dim float centroids, the semantic-dedup shape
        return spark.range(k).select(
            F.col("id").alias("cent_id"),
            F.expr(
                "transform(sequence(1, 64), i -> "
                "cast(pmod(hash(id, i), 997) + 1 as double) / 997.0)"
            ).alias("cent"),
        )

    results = []
    for k in (10_000, 50_000, 100_000, 250_000, 500_000, 1_000_000,
              2_000_000):
        df = cents_frame(k)
        df.count()  # materialize source-side, exclude planning
        gc.collect()
        rss0 = _rss_bytes()
        t0 = time.perf_counter()
        rows = df.collect()
        t_collect = time.perf_counter() - t0
        gc.collect()
        rss1 = _rss_bytes()
        # the hier route's next step: numpy matrix + coarse index
        import numpy as np

        t1 = time.perf_counter()
        C = np.asarray(
            [[float(x) for x in r[1]] for r in rows], dtype=np.float64
        )
        t_numpy = time.perf_counter() - t1
        per_row = (rss1 - rss0) / k if k else 0
        rec = {
            "K": k,
            "collect_s": round(t_collect, 2),
            "to_numpy_s": round(t_numpy, 2),
            "rss_delta_mb": round((rss1 - rss0) / 1e6, 1),
            "bytes_per_row": int(per_row),
            "numpy_mb": round(C.nbytes / 1e6, 1),
        }
        del rows, C
        gc.collect()
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print(json.dumps({"table": results}))


if __name__ == "__main__":
    main()
