"""Sharded-centroid assignment measurement (r12 verdict ask 2): the
escape past `_assign_clusters_hier`'s K-row driver collect, run at a
K deliberately PAST comfortable broadcast size and checked for exact
result parity against the current route.

Setup: the deterministic two-level topic/subtopic corpus from
measure_hier_assign (20k vectors, 313 planted sub-anchors under 18
super-topics) with TARGET_CLUSTER_SIZE forced to 4 → K = 5,000
centroids (a quarter of the corpus IS the centroid set — the regime
where collecting/broadcasting the centroid frame stops being a
"bounded artifact" in spirit). The sharded route's driver state is
G = ceil(√K) = 71 coarse centers + radii; the centroid frame itself
stays distributed, sharded per coarse cell, joined by cell key.

Also measured: the shipped isotropic sf0.1 corpus at the production
TARGET=64 policy (K = 200) — the honest worst case where loose
bounds make phase B explode ~G candidate cells per vector and the
sharded route pays shuffle volume the in-driver routes don't. The
conclusion the module docstring states: sharded is the route for K
past driver/broadcast scale; below that, hier stays the default.

Parity: full (vec_id → cluster) map equality plus a sorted-map
SHA-256 digest printed per route.

Usage: python scripts/measure_sharded_assign.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.measure_hier_assign import make_hierarchical  # noqa: E402


def digest(m: dict) -> str:
    s = ";".join(f"{k}:{m[k]}" for k in sorted(m))
    return hashlib.sha256(s.encode()).hexdigest()[:16]


def main() -> None:
    twolevel = "/tmp/hier_twolevel_20k"
    make_hierarchical(twolevel, 20000)

    from pyspark.sql import functions as F

    from data_framework_spark.session import get_spark
    from data_framework_spark.similarity.semantic import (
        _assign_clusters_hier,
        _assign_clusters_sharded,
    )

    spark = get_spark("sharded-assign-measurement")
    out: dict = {}
    for label, d, target in (
        ("twolevel_k5000", twolevel, 4),
        ("iso_sf01_k200", "/root/testdata/sf0.1", 64),
    ):
        emb = (
            spark.read.parquet(f"{d}/embeddings.parquet")
            .select("vec_id", "embedding")
        )
        n = emb.count()
        k = max(1, -(-n // target))
        cents_df = emb.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("cent"),
        )
        cents_rows = (
            emb.filter(F.col("vec_id") < k)
            .select("vec_id", "embedding")
            .orderBy("vec_id")
            .collect()
        )
        rec = {"n": n, "k": k, "g": int(-(-(k**0.5) // 1))}
        maps = {}
        for route_name, run in (
            ("hier", lambda: _assign_clusters_hier(emb, cents_rows)),
            ("sharded", lambda: _assign_clusters_sharded(emb, cents_df)),
        ):
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                run().select("vec_id", "cluster").write.format(
                    "noop"
                ).mode("overwrite").save()
                times.append(round(time.perf_counter() - t0, 3))
            m = {
                r["vec_id"]: r["cluster"]
                for r in run().select("vec_id", "cluster").collect()
            }
            maps[route_name] = m
            rec[route_name] = {
                "cold": times[0],
                "warm": min(times[1:]),
                "digest": digest(m),
            }
        rec["parity"] = maps["hier"] == maps["sharded"]
        out[label] = rec
        print(json.dumps({label: rec}), flush=True)
    print("FINAL", json.dumps(out))


if __name__ == "__main__":
    main()
