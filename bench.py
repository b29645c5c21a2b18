"""Benchmark runner: every registry query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

Each query is materialized with the noop sink (full computation, no
driver-side collect) after a warm-up of the session itself. Timings
are single-shot — the regime the driver measures.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from data_framework_spark.registry import QUERIES
    from data_framework_spark.session import get_spark

    spark = get_spark("data_framework_spark-bench")
    # warm the JVM + parquet footers once so the first query isn't
    # charged for session startup
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    for name, q in QUERIES.items():
        t0 = time.perf_counter()
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)

    out = {
        "metric": "total_query_wall_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # apples-to-apples subtotal over the round-1 query set: the
    # registry grows every round, so the headline total is not
    # comparable across rounds; this is.
    r1_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_r01.json")
    try:
        with open(r1_path) as f:
            r1_queries = set(json.load(f)["parsed"]["queries"])
        out["r1_subset_value"] = round(
            sum(v for k, v in timings.items() if k in r1_queries), 4
        )
        out["r1_subset_n"] = sum(1 for k in timings if k in r1_queries)
    except (OSError, KeyError, json.JSONDecodeError):
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
