"""Profile the streaming replay block (r14 verdict ask 4): where do
the ~11.5 s warm go in streaming_interval_join /
stateful_user_totals_live / streaming_heavy_hitters at sf0.1?

Times each query twice (cold = includes the chunk split; warm =
chunk cache hit) and breaks the stateful run into phases via a
monkeypatched run_stateful_to_completion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from data_framework_spark.session import get_spark
    from data_framework_spark.registry import QUERIES
    from data_framework_spark.streaming import stateful as st

    spark = get_spark("profile-streaming")

    # phase probe: wrap run_stateful_to_completion to time the inner
    # streaming drive vs everything around it
    orig = st.run_stateful_to_completion
    phases: list[dict] = []

    def probe(spark_, stream_out, output_mode="update", shuffle_partitions=8):
        t0 = time.perf_counter()
        q = (
            stream_out.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(f"probe_{len(phases)}_{int(t0 * 1e6) % 100000}")
            .start()
        )
        t_start = time.perf_counter()
        q.processAllAvailable()
        t_drain = time.perf_counter()
        progress = list(q.recentProgress)
        q.stop()
        t_stop = time.perf_counter()
        name = q.name
        sink = spark_.table(name)
        pdf = sink.toPandas()
        spark_.catalog.dropTempView(name)
        out = spark_.createDataFrame(pdf, schema=sink.schema)
        t_end = time.perf_counter()
        batch_ms = [
            {
                "rows": p["numInputRows"],
                "total_ms": p["durationMs"].get("triggerExecution"),
                "addBatch_ms": p["durationMs"].get("addBatch"),
                "getBatch_ms": p["durationMs"].get("getBatch"),
                "commit_ms": p["durationMs"].get("commitOffsets"),
                "state_ms": (p["stateOperators"][0].get("commitTimeMs")
                             if p.get("stateOperators") else None),
            }
            for p in progress
        ]
        phases.append(
            {
                "start_s": round(t_start - t0, 3),
                "drain_s": round(t_drain - t_start, 3),
                "stop_s": round(t_stop - t_drain, 3),
                "collect_s": round(t_end - t_stop, 3),
                "batches": batch_ms,
            }
        )
        return out, progress

    st.run_stateful_to_completion = probe
    try:
        for qname in (
            "stateful_user_totals_live",
            "streaming_interval_join",
            "streaming_heavy_hitters",
            "streaming_dedup_events",
        ):
            if qname not in QUERIES:
                continue
            fn = QUERIES[qname].fn
            for label in ("cold", "warm"):
                phases.clear()
                t0 = time.perf_counter()
                df = fn(spark, SF)
                n = df.count()
                dt = time.perf_counter() - t0
                print(
                    json.dumps(
                        {
                            "query": qname,
                            "pass": label,
                            "sec": round(dt, 2),
                            "rows": n,
                            "phases": phases,
                        }
                    ),
                    flush=True,
                )
    finally:
        st.run_stateful_to_completion = orig


if __name__ == "__main__":
    main()
