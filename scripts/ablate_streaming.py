"""Ablate the streaming-replay harness knobs (r14 verdict ask 4):
shuffle partitions x no-data micro-batches x checkpoint filesystem,
over the two heaviest replay queries at sf0.1. Prints one JSON line
per (query, config) with warm-pass seconds (chunk cache hot)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from data_framework_spark.session import get_spark
    from data_framework_spark.registry import QUERIES
    from data_framework_spark.streaming import stateful as st

    spark = get_spark("ablate-streaming")
    orig = st.run_stateful_to_completion

    def make_runner(nparts: int, nodata: bool, ckpt_root: str | None):
        def run(spark_, stream_out, output_mode="update",
                shuffle_partitions=8):
            name = f"ab_{uuid.uuid4().hex[:12]}"
            prev_p = spark_.conf.get("spark.sql.shuffle.partitions")
            prev_nd = spark_.conf.get(
                "spark.sql.streaming.noDataMicroBatches.enabled", "true"
            )
            spark_.conf.set("spark.sql.shuffle.partitions", str(nparts))
            spark_.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled",
                "true" if nodata else "false",
            )
            ckpt = None
            try:
                w = stream_out.writeStream.outputMode(output_mode).format(
                    "memory"
                ).queryName(name)
                if ckpt_root:
                    ckpt = os.path.join(ckpt_root, f"ckpt_{name}")
                    w = w.option("checkpointLocation", ckpt)
                q = w.start()
                try:
                    q.processAllAvailable()
                    progress = list(q.recentProgress)
                finally:
                    q.stop()
            finally:
                spark_.conf.set("spark.sql.shuffle.partitions", prev_p)
                spark_.conf.set(
                    "spark.sql.streaming.noDataMicroBatches.enabled", prev_nd
                )
                if ckpt:
                    shutil.rmtree(ckpt, ignore_errors=True)
            sink = spark_.table(name)
            pdf = sink.toPandas()
            spark_.catalog.dropTempView(name)
            return spark_.createDataFrame(pdf, schema=sink.schema), progress

        return run

    queries = ["stateful_user_totals_live", "streaming_interval_join",
               "streaming_heavy_hitters", "streaming_dedup_events"]
    # warm the chunk cache once
    for qn in queries[:1]:
        QUERIES[qn].fn(spark, SF)

    configs = [
        ("base8", 8, True, None),
        ("p2", 2, True, None),
        ("p1", 1, True, None),
        ("p8_nodata_off", 8, False, None),
        ("p2_nodata_off", 2, False, None),
        ("p2_nodata_off_shm", 2, False, "/dev/shm/spark_graft_ablate"),
        ("p8_shm", 8, True, "/dev/shm/spark_graft_ablate"),
        ("p1_nodata_off_shm", 1, False, "/dev/shm/spark_graft_ablate"),
    ]
    os.makedirs("/dev/shm/spark_graft_ablate", exist_ok=True)
    results: dict[str, dict] = {}
    baseline_hash: dict[str, str] = {}
    for label, nparts, nodata, ckpt in configs:
        from data_framework_spark.streaming import sketches as sk

        runner = make_runner(nparts, nodata, ckpt)
        st.run_stateful_to_completion = runner
        sk.run_stateful_to_completion = runner  # imported by name there
        try:
            for qn in queries:
                fn = QUERIES[qn].fn
                t0 = time.perf_counter()
                df = fn(spark, SF)
                rows = df.collect()
                dt = time.perf_counter() - t0
                import hashlib

                h = hashlib.sha256(
                    repr(sorted(map(tuple, rows))).encode()
                ).hexdigest()[:12]
                if label == "base8":
                    baseline_hash[qn] = h
                print(
                    json.dumps(
                        {
                            "config": label,
                            "query": qn,
                            "sec": round(dt, 2),
                            "rows": len(rows),
                            "hash": h,
                            "hash_ok": h == baseline_hash.get(qn, h),
                        }
                    ),
                    flush=True,
                )
        finally:
            st.run_stateful_to_completion = orig
            sk.run_stateful_to_completion = orig
    shutil.rmtree("/dev/shm/spark_graft_ablate", ignore_errors=True)


if __name__ == "__main__":
    main()
