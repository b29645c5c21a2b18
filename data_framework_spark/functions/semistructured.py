"""Semi-structured (JSON) column functions.

The reference has no string/JSON functions at all (SURVEY.md §2.8
"Absent"); a real event pipeline always carries a JSON properties
blob. Extraction uses `get_json_object` — JVM-side path evaluation,
no Python — and stays inside whole-stage codegen, so a 100 TB events
table pays one scan + one shuffle for the final aggregate. At scale
the better layout is extracting hot keys into real columns at ingest
(schema-on-write); this operator is the schema-on-read fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_framework_spark.functions.numeric import (
    stable_round,
    stable_round_sql,
)
from data_framework_spark.sources.tables import load_table


def q_json_props_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract props.k, bucket it, and profile value by bucket."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select(k.alias("k"), "value")
        .groupBy((F.col("k") % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            # stable_round: value is an unconstrained measure — a
            # bucket mean that lands just below zero would round to
            # +0.0 on Spark vs -0.0 on DuckDB (round-9 review)
            stable_round(F.avg("value"), 6).alias("avg_value"),
        )
    )


# The int extraction mirrors Spark's LENIENT string->int cast (trim,
# optional sign, digits only; anything else -> NULL). A bare ::INT
# would ABORT DuckDB on 'abc' (ConversionException) and ROUND '3.7'
# to 4 where Spark yields NULL — latent on the integer-only generator,
# guaranteed divergence on free-form JSON (round-9 review).
_K_INT = (
    "CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')),"
    " '^[+-]?[0-9]+$')"
    " THEN trim(json_extract_string(props, '$.k'))::INT END"
)

Q_JSON_PROPS_EVENTS_SQL = f"""
SELECT
  ({_K_INT} % 10) AS k_bucket,
  count(*) AS n_events,
  min({_K_INT}) AS min_k,
  max({_K_INT}) AS max_k,
  {stable_round_sql('avg(value)', 6)} AS avg_value
FROM events
GROUP BY 1
"""
