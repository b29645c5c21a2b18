"""Relational query library (joins / grouped aggregation / top-k).

The reference implements no relational joins or grouped aggregation
(SURVEY.md §2.3/§2.4 "Absent"); this layer is the driver-mandated
extension (SURVEY.md §7 phase 5) built entirely from Spark built-ins
so Catalyst picks join strategy, pushes filters to the parquet scan,
and runs partial (map-side) aggregation automatically.

Scale notes, per query, live in each docstring. Common conventions:
- `F.broadcast` on dimension tables (region/nation/supplier/part and,
  at test SFs, customer) to avoid shuffling the fact side.
- Every computed column is aliased identically to the DuckDB oracle
  (driver hash-compares by sorted column name).
- Monetary aggregates rounded to 2 decimals in BOTH engines so
  double-accumulation order can't flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary over `lineitem`.

    Single wide scan → groupBy(2 low-cardinality keys) → 8 aggregates.
    Map-side partial aggregation reduces the shuffle to
    |groups|·|partitions| rows, so this scales linearly with input and
    is shuffle-light at 100 TB. Filter and the 10-column projection
    push down to the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


TPCH_Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  round(sum(l_quantity), 2)                                        AS sum_qty,
  round(sum(l_extendedprice), 2)                                   AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
  round(avg(l_quantity), 6)                                        AS avg_qty,
  round(avg(l_extendedprice), 6)                                   AS avg_price,
  round(avg(l_discount), 6)                                        AS avg_disc,
  count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority: customer ⋈ orders ⋈ lineitem, top 10.

    customer (filtered to one segment) broadcasts; orders⋈lineitem is
    the only big join and shuffles on o_orderkey/l_orderkey — the
    natural co-partitioning key for both tables at scale (bucketing
    both by orderkey removes even that shuffle). Top-10 is a
    deterministic window rank (revenue DESC, orderkey ASC tiebreak),
    which AQE executes as a partial top-k per partition.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    joined = li.join(
        orders, li.l_orderkey == orders.o_orderkey, "inner"
    ).join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner")
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )
    w = W.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )


TPCH_Q3_SQL = """
WITH agg AS (
  SELECT
    l_orderkey,
    o_orderdate,
    o_orderpriority,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1995-03-15'
    AND l_shipdate  > TIMESTAMP '1995-03-15'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
SELECT l_orderkey, o_orderdate, o_orderpriority, revenue
FROM (
  SELECT *, row_number() OVER (ORDER BY revenue DESC, l_orderkey ASC) AS rn
  FROM agg
) WHERE rn <= 10
"""


def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style local-supplier revenue by nation.

    Five-way join: the three fixed-cardinality dims (region, nation,
    supplier) broadcast; orders⋈lineitem shuffles on orderkey. The
    supplier-nation = customer-nation equality is applied as a join
    predicate, not a post-filter, so Catalyst can prune early.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")

    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


TPCH_Q5_SQL = """
SELECT
  n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
GROUP BY n_name
"""


def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue: pure scan + filter + scalar agg.

    The canonical pushdown check: all three predicates and the
    two-column projection must reach the parquet scan (`PushedFilters`
    in explain). No shuffle beyond the final single-row reduction.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


TPCH_Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate <  TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 orders by total price with deterministic tiebreak.

    Demonstrates the ORDER BY / LIMIT surface the reference lacks
    (SURVEY.md §2.6). Window rank instead of bare limit so ties can't
    make the result nondeterministic across engines. At scale Spark
    executes this as per-partition top-k then a single merge (AQE);
    the window has no partition key but the input to the final sort is
    already reduced by the filter pushdown on rn.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = W.orderBy(F.col("total_price").desc(), F.col("o_orderkey").asc())
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice"), 2).alias("total_price"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
    )


TOP_K_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, total_price, rn
FROM (
  SELECT
    o_orderkey,
    o_custkey,
    round(o_totalprice, 2) AS total_price,
    row_number() OVER (ORDER BY round(o_totalprice, 2) DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 25
"""


def group_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation over orders: (status, priority) hierarchy.

    Grouping-set surface absent from the reference (SURVEY.md §2.4
    "Absent"); native in Spark via `rollup` — one shuffle, grouping
    sets expanded map-side.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


GROUP_ROLLUP_SQL = """
SELECT
  o_orderstatus,
  o_orderpriority,
  count(*)                   AS n_orders,
  round(sum(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: split each user's event stream at >30 min gaps.

    The classic lag + gap-flag + running-sum pattern (batch analog of
    streaming `session_window`). Both windows partition by user_id —
    one shuffle total, state bounded per user. Deterministic ordering
    (ts, event_id) so engines agree on tie order.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "t_epoch", F.col("ts").cast("double")
    )
    w = W.partitionBy("user_id").orderBy("t_epoch", "event_id")
    gap = F.col("t_epoch") - F.lag("t_epoch").over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800.0), F.lit(1)).otherwise(F.lit(0)),
    )
    w_run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = flagged.withColumn("session_idx", F.sum("new_session").over(w_run))
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.min("t_epoch"), 6).alias("session_start"),
        F.round(F.max("t_epoch"), 6).alias("session_end"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


SESSIONIZE_EVENTS_SQL = """
WITH flagged AS (
  SELECT
    user_id,
    epoch(ts)::DOUBLE AS t_epoch,
    value,
    event_id,
    CASE WHEN epoch(ts)::DOUBLE - lag(epoch(ts)::DOUBLE) OVER w IS NULL
           OR epoch(ts)::DOUBLE - lag(epoch(ts)::DOUBLE) OVER w > 1800.0
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)::DOUBLE, event_id)
),
sessions AS (
  SELECT *,
    sum(new_session) OVER (PARTITION BY user_id ORDER BY t_epoch, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
  FROM flagged
)
SELECT
  user_id,
  session_idx::BIGINT AS session_idx,
  count(*) AS n_events,
  round(min(t_epoch), 6) AS session_start,
  round(max(t_epoch), 6) AS session_end,
  round(sum(value), 4) AS session_value
FROM sessions
GROUP BY user_id, session_idx
"""
