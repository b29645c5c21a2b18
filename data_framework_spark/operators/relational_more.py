"""Extended relational coverage: the join/aggregation shapes TPC-H
exercises that `relational.py` doesn't yet — semi/anti/outer joins,
self-dim (nation-pair) joins, conditional and DISTINCT aggregation,
correlated-subquery patterns, and relational set operations.

All absent from the reference (SURVEY.md §2.3/§2.4/§2.7 "Absent");
this is the driver-mandated extension layer (SURVEY.md §7 phase 5).
Predicates are adapted to the synthetic star schema (TESTDATA.md): the
reduced lineitem has no commitdate/receiptdate/shipmode, dates span
1995–2001, nations are NATION_0..24, p_type is a single word.

Scale conventions (same as relational.py): dimension sides broadcast;
fact-fact joins shuffle on orderkey (the natural bucketing key); every
aggregate aliased identically to its DuckDB oracle; money rounded to
2 decimals in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from data_framework_spark.sources.tables import load_table


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp")


def tpch_q4_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts over orders having at
    least one qualifying lineitem — a LEFT SEMI join.

    (Adapted predicate: the reduced schema has no commit/receipt
    dates, so "late line" is l_shipdate > o_orderdate.) The semi join
    shuffles both sides on orderkey but ships no lineitem payload
    columns and short-circuits per key — the right plan at 100 TB vs
    a join+distinct. Aggregation is on a 5-value key: map-side
    partials reduce the final shuffle to a handful of rows.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    qualifying = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return qualifying.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


TPCH_Q4_SEMIJOIN_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


def tpch_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: revenue between two nations by year,
    both directions — the same dimension (nation) joined twice under
    different roles.

    Both nation copies broadcast; lineitem⋈orders is the only shuffle
    (orderkey). The nation-pair disjunction is applied after the two
    broadcast joins so Catalyst evaluates it as a cheap row predicate;
    supplier/customer also broadcast at any realistic scale.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            F.col("supp_nation").isin("NATION_1", "NATION_2", "NATION_3")
            & F.col("cust_nation").isin("NATION_1", "NATION_2", "NATION_3")
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


TPCH_Q7_VOLUME_SQL = """
SELECT
  supp_nation, cust_nation, l_year,
  round(sum(volume), 2) AS revenue
FROM (
  SELECT
    n1.n_name AS supp_nation,
    n2.n_name AS cust_nation,
    year(l_shipdate)::INT AS l_year,
    l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    AND n1.n_name <> n2.n_name
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
GROUP BY supp_nation, cust_nation, l_year
"""


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_3 suppliers' revenue
    share of ECONOMY-part sales to EUROPE customers, per year —
    conditional aggregation (sum-if / sum) over a 6-way join.

    All five dims broadcast; the one shuffle is lineitem⋈orders on
    orderkey, then a 2-row aggregate. The share division happens after
    aggregation so it's exact regardless of row order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(_ts("1996-01-01"), _ts("1997-12-31"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cr_key")
    )
    nat_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat_c), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(nat_s), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(region), F.col("cr_key") == region.r_regionkey)
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


TPCH_Q8_MARKET_SHARE_SQL = """
SELECT
  o_year,
  round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
        / sum(volume), 6) AS mkt_share
FROM (
  SELECT
    year(o_orderdate)::INT AS o_year,
    l_extendedprice * (1 - l_discount) AS volume,
    ns.n_name AS supp_nation
  FROM lineitem
  JOIN orders    ON l_orderkey = o_orderkey
  JOIN part      ON l_partkey = p_partkey
  JOIN customer  ON o_custkey = c_custkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN region    ON nc.n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
    AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
)
GROUP BY o_year
"""


def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: top-20 customers by revenue
    lost to returns in one quarter.

    customer/nation broadcast; lineitem('R')⋈orders shuffles on
    orderkey; the grouped aggregate is keyed by customer. Top-20 is a
    deterministic global window rank (revenue DESC, custkey ASC) over
    the already-aggregated (small) result.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    w = W.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )


TPCH_Q10_RETURNS_SQL = """
WITH agg AS (
  SELECT
    c_custkey, c_name, c_acctbal, n_name,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-10-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
)
SELECT c_custkey, c_name, c_acctbal, n_name, revenue
FROM (
  SELECT *, row_number() OVER (ORDER BY revenue DESC, c_custkey ASC) AS rn
  FROM agg
) WHERE rn <= 20
"""


def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution — LEFT OUTER join
    (customers with zero orders must survive) then a two-level
    aggregation.

    At scale: orders aggregates to per-customer counts first (shuffle
    on custkey with map-side partials), then the customer side joins
    that much smaller result; the second aggregate is on a tiny key
    domain. The outer join is what the reference's mask algebra cannot
    express relationally (SURVEY.md §2.7).
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    joined = cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey, "left_outer"
    ).select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
    return joined.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


TPCH_Q13_CUSTDIST_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
"""


def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: PROMO share of one month's revenue
    — conditional aggregation over a broadcast fact⋈dim join.

    part broadcasts; no shuffle at all beyond the single-row final
    aggregate (the month filter pushes to the lineitem scan).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    part = load_table(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("promo_revenue_pct")
        )
    )


TPCH_Q14_PROMO_SQL = """
SELECT
  round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate <  TIMESTAMP '1997-10-01'
"""


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: supplier(s) achieving the maximum
    quarterly revenue — an aggregate reused both as a ranking input
    and a scalar subquery (max), joined back.

    The revenue aggregate is computed once and self-compared via a
    broadcast of its 1-row max — no second scan of lineitem. Revenue
    is rounded BEFORE the max comparison so both engines select the
    same supplier set under float accumulation differences.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == max_rev.mx)
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


TPCH_Q15_TOP_SUPPLIER_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


def tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: lines of one brand
    whose quantity is below half that part's average quantity — a
    correlated aggregate subquery, decorrelated as aggregate + join.

    Q17's correlated average for part p ranges over all of p's lines,
    so restricting lineitem to the brand's partkeys FIRST (broadcast
    semi filter) leaves every per-part average unchanged while
    shrinking the aggregate's input ~25×. The per-part averages are
    then dimension-sized and broadcast back — the whole query runs
    with zero shuffles of lineitem (two broadcast hash joins + a
    partial-aggregated scalar agg), the plan that survives 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    brand_lines = li.join(
        F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    )
    avg_qty = brand_lines.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        brand_lines.join(F.broadcast(avg_qty), li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_weekly_revenue")
        )
    )


TPCH_Q17_SMALL_QTY_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_weekly_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume orders: orders whose total quantity
    exceeds 300, with their customer — GROUP BY + HAVING feeding a
    join.

    The HAVING aggregate runs on lineitem alone (shuffle on orderkey,
    map-side partial sums), producing a tiny key set that then
    broadcast-joins against orders/customer — never the reverse order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            "total_qty",
        )
    )


TPCH_Q18_LARGE_ORDERS_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, total_qty
FROM orders
JOIN (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue: an OR-of-ANDs predicate spanning
    both join sides — the classic disjunctive join-filter that planners
    must NOT turn into three scans.

    part broadcasts; the disjunction evaluates as one row predicate
    post-join inside whole-stage codegen. One scan of lineitem, no
    shuffle before the scalar aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )


TPCH_Q19_DISJUNCTIVE_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no recent orders —
    scalar subquery (average balance) + LEFT ANTI join, grouped by
    segment.

    (Adapted: the reduced schema has no phone country codes, so the
    grouping key is c_mktsegment and "inactive" means no orders since
    2000-01-01.) The anti join shuffles custkeys only; the average is
    a broadcast single row. Balance sum rounded identically on both
    engines.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2000-01-01")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("ab")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("ab"))
    idle = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


TPCH_Q22_IDLE_CUSTOMERS_SQL = """
SELECT c_mktsegment, count(*) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c.c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_mktsegment
"""


def distinct_suppliers_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: DISTINCT-aggregation — distinct suppliers and
    parts actually shipped per brand (the reduced schema has no
    partsupp, so supply relationships come from lineitem).

    Spark executes multi-DISTINCT via Expand (one pass, no join);
    map-side dedup bounds the shuffle by |brand|·|distinct values|.
    DISTINCT aggregation is absent from the reference (§2.4 "Absent").
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.countDistinct("l_partkey").alias("part_cnt"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


DISTINCT_SUPPLIERS_BY_BRAND_SQL = """
SELECT p_brand,
       count(DISTINCT l_suppkey) AS supplier_cnt,
       count(DISTINCT l_partkey) AS part_cnt,
       round(sum(l_quantity), 2) AS total_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational set operations — UNION / INTERSECT / EXCEPT of two
    customer-key sets (BUILDING-segment vs 1996 buyers), reported as
    per-operation cardinalities.

    The reference has no set operations (mask algebra only, SURVEY.md
    §2.7); Spark's intersect/exceptAll/union are native. Each set op
    is a shuffle on the full row (here a single key column); counts
    are exact.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    buyers96 = (
        orders.filter(
            (F.col("o_orderdate") >= _ts("1996-01-01"))
            & (F.col("o_orderdate") < _ts("1997-01-01"))
        )
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    rows = [
        ("union", building.union(buyers96).distinct()),
        ("intersect", building.intersect(buyers96)),
        ("except", building.subtract(buyers96)),
    ]
    out = None
    for op, df in rows:
        one = df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), F.col("n")
        )
        out = one if out is None else out.unionByName(one)
    return out


SET_OPS_CUSTOMERS_SQL = """
WITH building AS (
  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
),
buyers96 AS (
  SELECT DISTINCT o_custkey AS k FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
)
SELECT 'union' AS op, count(*) AS n
  FROM (SELECT k FROM building UNION SELECT k FROM buyers96)
UNION ALL
SELECT 'intersect', count(*)
  FROM (SELECT k FROM building INTERSECT SELECT k FROM buyers96)
UNION ALL
SELECT 'except', count(*)
  FROM (SELECT k FROM building EXCEPT SELECT k FROM buyers96)
"""


def tpch_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-type profit by nation and year — a
    5-way join where every dimension (part with a name filter,
    supplier, nation) broadcasts and the only shuffle is
    lineitem⋈orders on orderkey. (Adapted: the reduced schema has no
    partsupp/ps_supplycost, so profit is discounted revenue.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        # per-row double product is engine-identical; summing it as
        # DECIMAL makes the aggregate order-independent, so the hash
        # can't flip on a .005 rounding boundary (it did at sf0.01
        # with a double sum)
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("profit")
        )
    )


# decimal accumulation + decimal rounding, then one cast: both
# engines round the identical exact value (see the Spark-side comment)
TPCH_Q9_PROFIT_SQL = """
SELECT
  n_name AS nation,
  year(o_orderdate) AS o_year,
  round(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6)), 2)::DOUBLE
    AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%widget%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


def tpch_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    finished multi-supplier order — correlated EXISTS and NOT EXISTS
    on the same fact table, the hardest decorrelation pattern in the
    suite. (Adapted: no receipt/commit dates, so "late" is shipping
    more than 30 days after the order date.)

    Plan shape: l1⋈orders is the orderkey shuffle; the EXISTS becomes
    a LEFT SEMI and the NOT EXISTS a LEFT ANTI join, both also on
    orderkey — AQE can stack all three on one exchange. Nothing here
    enumerates pairs of lineitems.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    sup = load_table(spark, sf_dir, "supplier")
    late1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("o3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    )
    waiting = (
        late1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3"))
            & (F.col("l_suppkey") != F.col("s3"))
            & (F.col("d3") > F.date_add(F.col("o_orderdate"), 30)),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(sup), waiting.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


TPCH_Q21_WAITING_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
"""


def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part traded value filtered against a
    fraction of the GLOBAL total — a grouped aggregate gated by a
    scalar subquery over itself. (Adapted: value is price×quantity
    from lineitem; the reduced schema has no partsupp.)

    The per-part aggregate is computed once and reused for both the
    rows and the threshold (self-referential scalar), which Spark
    expresses as agg → 1-row broadcast cross join → filter: the big
    side is never re-shuffled.
    """
    li = load_table(spark, sf_dir, "lineitem")
    val = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias("v")
    )
    # threshold relative to the AVERAGE part value (not a fixed total
    # fraction, which degenerates as the part count scales: every part
    # passes at sf0.001, none at sf0.01)
    total = val.agg((F.avg("v") * F.lit(1.2)).alias("__thr"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v") > F.col("__thr"))
        .select("partkey", F.round("v", 2).alias("value"))
        .orderBy(F.col("value").desc(), F.col("partkey").asc())
    )


TPCH_Q11_IMPORTANT_PARTS_SQL = """
WITH val AS (
  SELECT l_partkey AS partkey, sum(l_extendedprice * l_quantity) AS v
  FROM lineitem GROUP BY 1
)
SELECT partkey, round(v, 2) AS value
FROM val
WHERE v > (SELECT avg(v) * 1.2 FROM val)
ORDER BY value DESC, partkey ASC
"""
