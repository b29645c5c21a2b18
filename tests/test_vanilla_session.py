"""Regression gate: every registered query must run on a VANILLA SparkSession.

Round-1 postmortem (VERDICT.md): `load_table` silently depended on
`spark.sql.legacy.parquet.nanosAsLong` being set at session-build time
(session.py), which only the package's own `get_spark()` does. The
correctness driver builds a bare `SparkSession.builder.getOrCreate()`,
so all 12 events-reading queries failed with PARQUET_TYPE_ILLEGAL while
tests/ stayed green — because tests also used the configured session.

This test closes that gap: it spawns a fresh Python (fresh JVM — the
already-running configured test session can't be "unconfigured"), builds
a bare session with NO builder configs, and smoke-runs every
`registry.queries()` entry at sf0.001. Any query that depends on a
builder-time conf dies here, before a round ships.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from tests.conftest import SF_SMALL

_DRIVER_SCRIPT = r"""
import json, os, sys, tempfile, traceback

from pyspark.sql import SparkSession

# Exactly the driver's posture: NO builder configs. The parent set
# TZ=America/New_York, so the JVM session default is NON-UTC — every
# query must still match UTC semantics via the unconditional runtime
# pin (ensure_session_conventions), per the round-4 advisory.
spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from data_framework_spark import registry

sf_dir = sys.argv[1]
failures = {}
for name, fn in registry.queries().items():
    try:
        df = fn(spark, sf_dir)
        df.limit(5).collect()  # force execution incl. the parquet scan
    except Exception:
        failures[name] = traceback.format_exc(limit=3)

# --- encoding sweep: the driver has shipped events.ts as both
# TIMESTAMP(NANOS) (reads as bigint under nanosAsLong) and
# TIMESTAMP(MICROS, NTZ). Rewrite events under the OTHER encodings and
# re-run the events-shaped queries: same row count proves the
# normalize_ts branches agree under a vanilla non-UTC session.
try:
    import pyarrow as pa
    import pyarrow.parquet as pq

    EVENT_QUERIES = ("timeslice_events", "tumbling_window_events")
    base_counts = {
        n: registry.queries()[n](spark, sf_dir).count() for n in EVENT_QUERIES
    }
    tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    i = tbl.schema.get_field_index("ts")
    for enc, typ in (("nanos", pa.timestamp("ns")), ("ntz", pa.timestamp("us"))):
        with tempfile.TemporaryDirectory() as tmp:
            for f in os.listdir(sf_dir):
                if f != "events.parquet":
                    os.symlink(os.path.join(sf_dir, f), os.path.join(tmp, f))
            recast = tbl.set_column(i, "ts", tbl.column("ts").cast(typ))
            pq.write_table(
                recast,
                os.path.join(tmp, "events.parquet"),
                use_deprecated_int96_timestamps=False,
                coerce_timestamps=None,
                store_schema=False,
            )
            for n in EVENT_QUERIES:
                try:
                    got = registry.queries()[n](spark, tmp).count()
                    if got != base_counts[n]:
                        failures[f"{enc}:{n}"] = (
                            f"row count {got} != base {base_counts[n]}"
                        )
                except Exception:
                    failures[f"{enc}:{n}"] = traceback.format_exc(limit=3)
except Exception:
    failures["encoding-sweep-setup"] = traceback.format_exc(limit=3)
print("VANILLA_RESULT " + json.dumps(failures))
"""


@pytest.mark.slow
def test_all_queries_on_vanilla_session():
    env = dict(os.environ)
    env.pop("PYSPARK_SUBMIT_ARGS", None)
    # non-UTC local zone: the JVM/session default TZ must not leak into
    # results (round-4 advisory — unconditional UTC runtime pin)
    env["TZ"] = "America/New_York"
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER_SCRIPT, SF_SMALL],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    marker = "VANILLA_RESULT "
    line = next(
        (l for l in proc.stdout.splitlines() if l.startswith(marker)), None
    )
    assert line is not None, (
        f"vanilla-session subprocess died before reporting\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
    failures = json.loads(line[len(marker):])
    assert not failures, (
        "queries failing on a vanilla (driver-style) SparkSession:\n"
        + "\n".join(f"--- {k}\n{v}" for k, v in failures.items())
    )
