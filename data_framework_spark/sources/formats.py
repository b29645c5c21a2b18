"""CSV and JSON source/sink connectors.

The engine's native interchange format is Parquet (sources/tables.py,
Dataset.export/restore); this module proves the text-format edges a
real pipeline needs at its boundaries: schema-explicit CSV and
JSON-lines read/write. Both writes are executor-side (`df.write`),
both reads are schema-ON-READ with an explicit StructType — never
inferSchema, which at 100 TB means a full extra pass over the data
and nondeterministic typing.

The driver-checked query round-trips two dimension tables through the
two formats and joins them back, so a value mangled by either codec
(quoting, timestamp formatting, numeric precision) breaks the oracle
hash.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.option("header", True).schema(schema).csv(path)


def write_json(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_json(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).json(path)


def q_format_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation → CSV → read back; region → JSON → read back; join the
    two rehydrated tables and count nations per region. Any codec
    corruption in either format surfaces as a hash mismatch against
    the oracle computed from the original parquet."""
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    tmp = tempfile.mkdtemp(prefix="fmt_roundtrip_")
    write_csv(nation, f"{tmp}/nation_csv")
    write_json(region, f"{tmp}/region_json")
    n2 = read_csv(spark, f"{tmp}/nation_csv", nation.schema)
    r2 = read_json(spark, f"{tmp}/region_json", region.schema)
    return (
        n2.join(F.broadcast(r2), n2.n_regionkey == r2.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
        .orderBy("r_name")
    )


Q_FORMAT_ROUNDTRIP_SQL = """
SELECT r_name, count(*) AS n_nations, min(n_name) AS first_nation
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def q_partitioned_prune_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + partition pruning: documents
    written `partitionBy("source")` to parquet, read back with a
    source predicate — at 100 TB this layout turns a per-source query
    from a full scan into a directory listing (the read plan carries
    the predicate as PartitionFilters, pinned by the plan test). The
    oracle aggregates the same slice of the original table, so a row
    lost or duplicated by the partitioned write breaks the hash."""
    docs = load_table(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="part_roundtrip_")
    (
        docs.write.mode("overwrite")
        .partitionBy("source")
        .parquet(f"{tmp}/documents_by_source")
    )
    back = spark.read.parquet(f"{tmp}/documents_by_source")
    return (
        back.filter(F.col("source").isin("src0", "src7", "src15"))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source", "lang")
    )


Q_PARTITIONED_PRUNE_ROUNDTRIP_SQL = """
SELECT source, lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM documents
WHERE source IN ('src0', 'src7', 'src15')
GROUP BY source, lang
ORDER BY source, lang
"""


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink/source round-trip: the orders table written to ORC
    (Spark's second columnar native format; predicate pushdown and
    column pruning work the same as parquet) and read back for a
    per-status aggregate. The oracle aggregates the parquet original,
    so any codec/type mangling (decimal widths, timestamp encoding)
    breaks the hash. Avro was probed and is NOT available in this
    build (external spark-avro module, not installable here)."""
    orders = load_table(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="orc_roundtrip_")
    orders.write.mode("overwrite").orc(f"{tmp}/orders_orc")
    back = spark.read.orc(f"{tmp}/orders_orc")
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
        )
        .orderBy("o_orderstatus")
    )


Q_ORC_ROUNDTRIP_SQL = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price,
       min(o_orderdate) AS first_date,
       max(o_orderdate) AS last_date
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""
