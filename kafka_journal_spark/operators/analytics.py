"""Relational analytics over the synthetic star schema (SURVEY.md §2.7).

The reference has no relational algebra; this module is the engine's general
query surface demonstrating the classic operator categories (§2.7 table:
projection, filter, equi-join, broadcast choice, aggregation, distinct,
window, top-k, set ops, rollup) expressed declaratively so Catalyst owns the
physical strategy.

Determinism across engines: monetary doubles are cast to DECIMAL before
aggregation so sums are exact and independent of partial-aggregation order
(a float sum over 600k rows differs in the last ulp between engines/plans;
a decimal sum never does); the final aggregate is cast back to DOUBLE so the
result schema is identical in Spark and DuckDB regardless of their decimal
widening rules.

Scale notes per query are in each docstring; the common rules:
- dimension joins (region/nation/customer/supplier/part) are broadcast —
  at 100 TB the fact tables shuffle, the dims never should;
- aggregations are partial+final automatically (hash agg with map-side
  combine) since expressed as groupBy().agg();
- top-k is `orderBy().limit()` → Spark's TakeOrderedAndProject, which never
  fully sorts or collects the data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_journal_spark.functions.numeric import round6


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # footer-schema cache (guide §6): the TPC-H tables are immutable corpus
    # dirs, so schema is per-path metadata — the DATA is still read from
    # parquet on every run (see sources/tables.read_parquet_cached_schema)
    from kafka_journal_spark.sources.tables import read_parquet_cached_schema

    return read_parquet_cached_schema(spark, os.path.join(sf_dir, f"{name}.parquet"))


# exact money math staged through narrow decimals (no overflow in either
# engine): ep*(1-disc) -> DECIMAL(18,4); that * (1+tax) -> DECIMAL(24,6).
# These are functions (not module constants) because Column construction
# needs an active SparkContext.


def _EP():
    return F.col("l_extendedprice").cast("decimal(12,2)")


def _DISC_PRICE():
    d1 = F.lit(1).cast("decimal(6,2)") - F.col("l_discount").cast("decimal(6,2)")
    return (_EP() * d1).cast("decimal(18,4)")


def _CHARGE():
    t1 = F.lit(1).cast("decimal(6,2)") + F.col("l_tax").cast("decimal(6,2)")
    return (_DISC_PRICE() * t1).cast("decimal(24,6)")

_SQL_EP = "CAST(l_extendedprice AS DECIMAL(12,2))"
_SQL_DISC1 = "(CAST(1 AS DECIMAL(6,2)) - CAST(l_discount AS DECIMAL(6,2)))"
_SQL_TAX1 = "(CAST(1 AS DECIMAL(6,2)) + CAST(l_tax AS DECIMAL(6,2)))"
_SQL_DISC_PRICE = f"CAST({_SQL_EP} * {_SQL_DISC1} AS DECIMAL(18,4))"
_SQL_CHARGE = f"CAST({_SQL_DISC_PRICE} * {_SQL_TAX1} AS DECIMAL(24,6))"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregation over lineitem.

    Scale: pure map-side-combinable hash agg over 4 groups; the scan reads
    only the needed columns (check ReadSchema) and the date filter pushes
    down to the parquet scan.
    """
    li = _t(spark, sf_dir, "lineitem")
    # the low-selectivity filter keeps ~98% of lineitem, and the grouped
    # aggregation (8 decimal/double sums) is the query's CPU: when the
    # parquet layout cannot split (single row group — the split atom),
    # spread the rows so the partial aggregation parallelizes instead of
    # running on the scan's one core (guide §2.5; no-op whenever the
    # layout gives the scan >= cores row groups, i.e. at any real scale)
    from kafka_journal_spark.sources.tables import spread_unsplittable

    li = spread_unsplittable(
        spark, li, os.path.join(sf_dir, "lineitem.parquet")
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
            F.sum(_EP()).cast("double").alias("sum_base_price"),
            F.sum(_DISC_PRICE()).cast("double").alias("sum_disc_price"),
            F.sum(_CHARGE()).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-10.

    Scale: customer is filtered then broadcast; orders⋈lineitem is the only
    shuffle join; final top-10 is TakeOrderedAndProject (no full sort).
    """
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_DISC_PRICE()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way star join, grouped by nation.

    Scale: all dimension sides broadcast; one shuffle for the final agg.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .groupBy("n_name")
        .agg(F.sum(_DISC_PRICE()).cast("double").alias("revenue"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate — the pushdown
    showcase (every predicate reaches the parquet scan; zero shuffle
    beyond the final partial-agg merge)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (_EP() * F.col("l_discount").cast("decimal(6,2)")).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: customer revenue from returned items, top 20.

    Scale: filtered orders join lineitem (shuffle), customer+nation
    broadcast; TakeOrderedAndProject caps the result.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(_DISC_PRICE()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio (promo revenue share)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01"))
        & (F.col("l_shipdate") < F.lit("1995-10-01"))
    )
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type").startswith("PROMO"), _DISC_PRICE()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return joined.agg(
        (
            F.sum(promo).cast("double") * 100.0 / F.sum(_DISC_PRICE()).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of compound brand/size/quantity
    predicates over the join — tests complex-predicate handling (the OR of
    ANDs partially pushes per branch; the join stays a broadcast)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("l_quantity").between(1, 11)
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("l_quantity").between(10, 20)
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(20, 30)
            & F.col("p_size").between(1, 15)
        )
    )
    return j.filter(cond).agg(
        F.sum(_DISC_PRICE()).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-nation trade volume by year — the self-joined
    dimension pattern (nation joined twice under different roles).

    Scale: both nation sides broadcast; the fact chain shuffles once on
    orderkey for the orders join, then aggregates partial+final.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    # NATION_20/NATION_11 rather than TPC-H's FRANCE/GERMANY analogue:
    # the synthetic sf0.001 corpus has zero (NATION_1, NATION_2) trade
    # rows in the window, and a gate that can green on an empty result
    # is vacuous (tools/check_correctness.py now fails those)
    pair = (F.col("supp_nation") == "NATION_20") & (F.col("cust_nation") == "NATION_11")
    rev_pair = (F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_20")
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair | rev_pair)
        .filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_DISC_PRICE()).cast("double").alias("revenue"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's market share inside one region for one
    part type — 8-way join with a conditional-sum ratio.

    Scale: every dimension broadcasts; the ratio divides two exact decimal
    sums cast to double (bit-identical across engines).
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    region = _t(spark, sf_dir, "region")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .filter(
            (F.col("r_name") == "AMERICA")
            & (F.col("p_type") == "PROMO")
            & (F.col("o_orderdate") >= F.lit("1995-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .select(
            F.year("o_orderdate").alias("o_year"),
            _DISC_PRICE().alias("volume"),
            F.col("supp_nation"),
        )
    )
    target = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.sum(target).cast("double").alias("_t"),
            F.sum("volume").cast("double").alias("_v"),
        )
        .select(
            "o_year",
            round6(F.col("_t") / F.col("_v")).alias("mkt_share"),
        )
    )


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (full grouping-set lattice) over orders."""
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-correlated subquery -> left-semi join with a
    non-equi conjunct (late-shipping lineitem), priority counts.  The semi
    join shuffles on the equi key only; the date comparison rides as the
    join's residual condition."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: order-count-per-customer histogram — a left outer
    join (customers with zero orders count at 0) followed by a second
    aggregation over the counts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (sort-based; both engines
    use linear interpolation and agree bit-for-bit — verified empirically).
    approx_percentile is the 100 TB drop-in with identical query shape."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", 0.5).alias("p50"),
        F.percentile("o_totalprice", 0.9).alias("p90"),
        F.percentile("o_totalprice", 0.99).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer order total (window-function coverage).

    Scale: one shuffle on o_custkey; both windows share the same sort so
    Catalyst plans a single Window node.
    """
    orders = _t(spark, sf_dir, "orders")
    ws = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_total"),
        F.row_number().over(ws).alias("order_rank"),
    )


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation over orders by (status, priority)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with orders but no high-value order (semi + anti join).

    Scale: both sides of the semi/anti are key-only projections; at scale
    these become broadcast or shuffled hash joins per AQE's choice.
    """
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 400000)
    with_orders = cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
    return with_orders.join(
        big, with_orders.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (window top-k pattern).

    Scale: rank-based filter pushes the limit inside each partition — Spark
    inserts a WindowGroupLimit so no full materialization of ranks.
    """
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking/offset window-function family over one shared sort: lag,
    lead, ntile, percent_rank, cume_dist — all five share a single Window
    spec so Catalyst plans ONE Window node (one shuffle + one sort).
    percent_rank/cume_dist are exact rationals of row positions — bit-equal
    across engines."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.lag("o_orderkey", 1).over(w).alias("prev_key"),
        F.lead("o_orderkey", 1).over(w).alias("next_key"),
        F.ntile(4).over(w).alias("quartile"),
        round6(F.percent_rank().over(w)).alias("pct_rank"),
        round6(F.cume_dist().over(w)).alias("cume"),
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube: a hand-picked
    lattice) + grouping_id to disambiguate null-as-value from
    null-as-aggregate — via the SQL API, which is the only PySpark surface
    for arbitrary sets."""
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__q_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping__id AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM __q_gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (status x priority order counts): the DataFrame ``pivot`` API
    with an EXPLICIT value list — at scale the implicit variant adds a
    distinct-collect job just to discover the columns."""
    orders = _t(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    out = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)))
    )
    renames = {p: f"p{i + 1}" for i, p in enumerate(prios)}
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out.select(
        "o_orderstatus",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in renames.values()],
    )


ANALYTICS_ORACLES: dict[str, str] = {
    "q_window_funcs": """
        SELECT o_orderkey, o_orderstatus,
               LAG(o_orderkey, 1) OVER w AS prev_key,
               LEAD(o_orderkey, 1) OVER w AS next_key,
               CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
               (FLOOR(PERCENT_RANK() OVER w * 1000000.0 + 0.5) / 1000000.0) AS pct_rank,
               (FLOOR(CUME_DIST() OVER w * 1000000.0 + 0.5) / 1000000.0) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey)
    """,
    "q_grouping_sets": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(CASE WHEN GROUPING(o_orderstatus) = 0 AND GROUPING(o_orderpriority) = 1 THEN 1
                         WHEN GROUPING(o_orderstatus) = 1 AND GROUPING(o_orderpriority) = 0 THEN 2
                         ELSE 0 END AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
    """,
    "q_pivot": """
        SELECT o_orderstatus,
               COALESCE(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END), 0) AS p1,
               COALESCE(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END), 0) AS p2,
               COALESCE(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END), 0) AS p3,
               COALESCE(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END), 0) AS p4,
               COALESCE(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END), 0) AS p5
        FROM orders GROUP BY o_orderstatus
    """,
    "q1": f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM({_SQL_EP}) AS DOUBLE) AS sum_base_price,
               CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
               CAST(SUM({_SQL_CHARGE}) AS DOUBLE) AS sum_charge,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q3": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "q5": f"""
        SELECT n_name,
               CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE c_nationkey = s_nationkey
        GROUP BY n_name
    """,
    "q6": f"""
        SELECT CAST(SUM(CAST({_SQL_EP} * CAST(l_discount AS DECIMAL(6,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "q10": f"""
        SELECT c_custkey, c_name, n_name, c_acctbal,
               CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name, c_acctbal
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    "q14": f"""
        SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_SQL_DISC_PRICE}
                             ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100.0
               / CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS promo_revenue_pct,
               COUNT(*) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
    """,
    "q7": f"""
        SELECT supp_nation, cust_nation, l_year,
               CAST(SUM(volume) AS DOUBLE) AS revenue
        FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INTEGER) AS l_year,
                 {_SQL_DISC_PRICE} AS volume
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
                 OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
            AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "q8": f"""
        SELECT o_year,
               (FLOOR((CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                       / CAST(SUM(volume) AS DOUBLE)) * 1000000.0 + 0.5)
                / 1000000.0) AS mkt_share
        FROM (
          SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                 {_SQL_DISC_PRICE} AS volume,
                 n2.n_name AS supp_nation
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
            AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
            AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        )
        GROUP BY o_year
    """,
    "q19": f"""
        SELECT CAST(SUM({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
               COUNT(*) AS n_rows
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
           OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
           OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
    "q_cube": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "q_percentiles": """
        SELECT o_orderstatus,
               quantile_cont(o_totalprice, 0.5) AS p50,
               quantile_cont(o_totalprice, 0.9) AS p90,
               quantile_cont(o_totalprice, 0.99) AS p99,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus
    """,
    "q_window_running": """
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
               CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_rank
        FROM orders
    """,
    "q_rollup": """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "q_semi_anti": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
          AND c_custkey NOT IN (
              SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    """,
    "q_topk_per_group": """
        SELECT o_custkey, o_orderkey, o_totalprice, rk
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
            FROM orders
        ) WHERE rk <= 3
    """,
    "q4": """
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
    """,
    "q13": """
        WITH per_cust AS (
          SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey
        )
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM per_cust GROUP BY c_count
    """,
}

ANALYTICS_QUERIES = {
    "q_window_funcs": q_window_funcs,
    "q_grouping_sets": q_grouping_sets,
    "q_pivot": q_pivot,
    "q1": q1_pricing_summary,
    "q4": q4_order_priority,
    "q13": q13_customer_distribution,
    "q3": q3_shipping_priority,
    "q5": q5_local_volume,
    "q6": q6_forecast_revenue,
    "q10": q10_returned_revenue,
    "q14": q14_promo_effect,
    "q7": q7_volume_shipping,
    "q8": q8_market_share,
    "q19": q19_discounted_revenue,
    "q_percentiles": q_percentiles,
    "q_cube": q_cube,
    "q_window_running": q_window_running,
    "q_rollup": q_rollup,
    "q_semi_anti": q_semi_anti,
    "q_topk_per_group": q_topk_per_group,
}
