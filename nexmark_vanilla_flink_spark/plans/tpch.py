"""Batch-relational queries over the TPC-H-ish testdata tables.

The reference has no SQL/batch layer at all (SURVEY.md §2.5: "No distinct
aggregation … exists anywhere in the reference") — Spark gives us the full
relational surface for free, and these queries prove the engine exercises it
the way a 100 TB deployment would: multi-way joins with broadcast of the
small dimensions, decimal-exact aggregation, filter pushdown to the parquet
scan, AQE-coalesced shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..sources.tables import load_tables
from .registry import register

_DEC = "decimal(18,4)"


@register(
    "tpch_q1_pricing_summary",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-30 00:00:00'
GROUP BY 1, 2
""",
    tags=("tpch", "agg"),
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan-heavy single aggregation with
    decimal-exact sums and a pushed-down date filter (cutoff 1999-09-30)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    # type-matched literal (TIMESTAMP vs TIMESTAMP_NTZ) so the predicate
    # pushes down to the parquet scan instead of wrapping the column in casts
    ship_type = dict(li.dtypes)["l_shipdate"]
    cutoff = F.expr(f"CAST('2000-09-30 00:00:00' AS {ship_type})")
    return (
        li.filter(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(_DEC))
            .cast("double")
            .alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (F.lit(1) - F.col("l_discount")).cast(_DEC)
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    oracle="""
SELECT o.o_orderkey,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       epoch_ns(o.o_orderdate) // 1000000000 AS o_orderdate_s,
       o.o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY 1, 3, 4
""",
    tags=("tpch", "join", "agg"),
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dimension filter, fact-fact join, revenue
    aggregation. customer (small side) is broadcast — zero shuffle for the
    first join even at 100 TB lineitem."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "o_orderkey",
            F.expr("o_orderdate_ns DIV 1000000000").alias("o_orderdate_s"),
            "o_orderpriority",
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (F.lit(1) - F.col("l_discount")).cast(_DEC)
            )
            .cast("double")
            .alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate_s", "o_orderpriority")
    )


@register(
    "tpch_q5_local_volume",
    oracle="""
SELECT n.n_name,
       r.r_name,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l.l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
""",
    tags=("tpch", "join", "agg"),
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way star join: every dimension (supplier, customer,
    nation, region) broadcast against the lineitem fact; only the
    lineitem⋈orders fact join shuffles."""
    t = load_tables(
        spark, sf_dir, ("lineitem", "orders", "customer", "supplier", "nation", "region")
    )
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name", "r_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(_DEC)
                * (F.lit(1) - F.col("l_discount")).cast(_DEC)
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
""",
    tags=("tpch", "filter", "agg"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure filter+aggregate; predicates push to the parquet
    scan (verify with .explain → PushedFilters)."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    return (
        li.filter(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(_DEC) * F.col("l_discount").cast(_DEC))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
