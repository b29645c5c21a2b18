"""r18: isolate the ivfpq codes-layout effect (the r17 warm
regression). Builds the persisted-index codes in BOTH layouts from
the same rows — compact (1 file/cell, the r18 repartition("cell")
write) and fragmented (the r17 accidental ~files×cells layout,
reproduced by a round-robin repartition before the partitioned
write) — then interleaves timed ADC searches against each.

Usage: python scripts/measure_ivfpq_layout.py [reps]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from data_framework_spark.session import get_spark
    from data_framework_spark.similarity import ivfpq as M
    from data_framework_spark.sources.tables import load_table

    spark = get_spark("measure_ivfpq_layout")
    emb = load_table(spark, sf_dir, "embeddings")
    emb.count()  # warm

    base = "/tmp/ivfpq_layout_ab"
    import shutil

    shutil.rmtree(base, ignore_errors=True)
    compact = os.path.join(base, "compact")
    frag = os.path.join(base, "frag")
    t0 = time.perf_counter()
    M.ivfpq_index_write(emb, compact)
    print(f"build compact: {time.perf_counter() - t0:.2f}s")
    # fragmented twin: same centroid/book/code rows, codes re-written
    # through a 32-way round-robin (reproduces the r17 widened-build
    # fan-out: every task holds rows of every cell)
    for part in ("centroids", "pq_books"):
        shutil.copytree(os.path.join(compact, part), os.path.join(frag, part))
    (
        spark.read.parquet(f"{compact}/codes")
        .repartition(32)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{frag}/codes")
    )

    def count_files(p):
        return sum(
            len([f for f in fs if f.endswith(".parquet")])
            for _, _, fs in os.walk(p)
        )

    print(f"files compact={count_files(compact + '/codes')} "
          f"frag={count_files(frag + '/codes')}")

    q_rows = (
        emb.filter(F.col("vec_id") < M.IVFPQ_NQ)
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    queries = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in q_rows]

    def run_topk(path):
        t = time.perf_counter()
        M.ivfpq_topk_from_index(spark, path, queries).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t

    def run_distinct_scan(path):
        # the nprobe_curve's second codes read (cell_of lookup)
        t = time.perf_counter()
        (
            spark.read.parquet(f"{path}/codes")
            .select("vec_id", "cell")
            .distinct()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - t

    results: dict[str, list[float]] = {}
    for metric, fn in (("topk", run_topk), ("distinct", run_distinct_scan)):
        for r in range(reps):
            for name, path in (("compact", compact), ("frag", frag)):
                results.setdefault(f"{metric}_{name}", []).append(fn(path))
    for k, v in results.items():
        print(f"{k}: min={min(v):.3f} med={sorted(v)[len(v)//2]:.3f} "
              f"all={[round(x, 3) for x in v]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
