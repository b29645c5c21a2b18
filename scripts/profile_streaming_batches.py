"""r18: per-micro-batch durationMs decomposition of the four
streaming replay queries (VERDICT item 4). The event-log job profiler
cannot see streaming wall time (it sits between jobs in the
micro-batch machinery); StreamingQueryProgress.durationMs can.
Run: PYTHONPATH=. python scripts/profile_streaming_batches.py
"""
import json, time
sf = "/root/testdata/sf0.1"
from data_framework_spark.session import get_spark
from data_framework_spark.streaming import stateful as S
spark = get_spark("stream_prof")
spark.range(10).count()
# warm the chunk cache once
S.chunked_events_source(spark, sf, n_chunks=3)

import data_framework_spark.streaming.stateful as st

def run_and_report(name, fn):
    t0 = time.perf_counter()
    df = fn(spark, sf)
    wall = time.perf_counter() - t0
    print(f"== {name}: wall {wall:.2f}s")

# instrument run_stateful_to_completion to dump progress
orig = S.run_stateful_to_completion
def wrapped(spark_, stream_out, output_mode="update", shuffle_partitions=8):
    t0 = time.perf_counter()
    out, progress = orig(spark_, stream_out, output_mode, shuffle_partitions)
    t1 = time.perf_counter()
    print(f"  stream section: {t1-t0:.2f}s, {len(progress)} progress entries")
    for p in progress:
        d = p.get("durationMs", {})
        print(f"   batch {p.get('batchId')}: rows={p.get('numInputRows')} "
              f"durations={ {k: v for k, v in sorted(d.items())} }")
    return out, progress
S.run_stateful_to_completion = wrapped
import data_framework_spark.streaming.sketches as SK
SK.run_stateful_to_completion = wrapped

for name, fn in (("user_totals", S.q_stateful_user_totals_live),
                 ("interval_join", S.q_streaming_interval_join),
                 ("heavy_hitters", SK.q_streaming_heavy_hitters),
                 ("dedup_events", S.q_streaming_dedup_events)):
    run_and_report(name, fn)   # cold-ish
    run_and_report(name, fn)   # warm
spark.stop()
