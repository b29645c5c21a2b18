"""Parquet table sources for the test star schema.

The driver test data (/root/testdata/sf*/..., see TESTDATA.md) is one
parquet file per table. Reads go through `spark.read.parquet` so
column pruning and predicate pushdown reach the scan (verify with
`df.explain("formatted")` → `PushedFilters` / `ReadSchema`).

At 100 TB these tables would be directory-partitioned (e.g. orders by
o_orderdate month); nothing in the query layer assumes single-file
inputs — paths are opaque to every operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# (region/nation are fixed-cardinality; supplier/part/customer grow with
# SF but stay orders of magnitude below the fact tables).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from `sf_dir`."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # events.parquet uses TIMESTAMP(NANOS), which Spark can only read
        # as long nanoseconds; a vanilla session (no builder configs, e.g.
        # the correctness driver's) would otherwise fail with
        # PARQUET_TYPE_ILLEGAL. Runtime-settable SQLConf, so set it here
        # rather than relying on the caller's session builder.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS); with
    # spark.sql.legacy.parquet.nanosAsLong it arrives as long
    # nanoseconds. Convert with INTEGER division (ns ≈ 1.7e18 exceeds
    # double's 53-bit mantissa) — truncation toward zero matches
    # DuckDB's ns→µs behavior for post-epoch data.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Load several tables at once; defaults to all of them."""
    use = names or TABLES
    return {n: load_table(spark, sf_dir, n) for n in use}
