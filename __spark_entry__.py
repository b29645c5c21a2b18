"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``data_framework_spark`` (registry.py is the
single source of truth); this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark import registry
from data_framework_spark.operators.slicing import timeslice
from data_framework_spark.operators.windows import running_sum


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the `ndslice` analog —
    inclusive time-range filter + per-series window prefix sum
    (SURVEY.md §7 phase 0)."""
    from data_framework_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    sliced = timeslice(ev, "ts", ("2024-01-01 00:00:00", "2024-01-07 00:00:00"))
    out = running_sum(
        sliced, "value", ["ts", "event_id"], ["user_id"], out_col="running_value"
    )
    return out.select(
        "event_id", "user_id", "ts", "event_type", "value", "running_value"
    ).orderBy("user_id", "ts", "event_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column names)."""
    return registry.oracle_sql()
