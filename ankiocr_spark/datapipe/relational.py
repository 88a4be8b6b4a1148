"""Relational/warehouse operators over the TPC-H-shaped tables.

The reference implements no joins beyond its two rejoin forms, no sorts,
and no multi-table aggregates (SURVEY.md §2.1); the crawl warehouse around
the extraction engine needs the classic shapes. These queries demonstrate
them Catalyst-first — broadcast dimension joins, pushed-down date filters,
map-side partial aggregation, JSON scalar extraction — each with an exact
DuckDB oracle over the driver's TPC-H-ish tables.

Scale notes:
  - pricing_summary: one shuffle on a 6-value grouping key after map-side
    partials; the shipdate predicate reaches the parquet scan
    (PushedFilters), so a year's report reads a year's row groups.
  - regional_revenue: fact table shuffles ONCE on c_custkey for the
    customer join only if neither side is broadcastable — here customer
    (15k rows/SF) broadcasts under the 10 MB default at test SF, and at
    production SF the dims nation/region always broadcast while
    orders⋈customer resolves to SMJ via AQE. Join order (dims last) keeps
    the big side unshuffled until reduced.
  - json_props_histogram: JSON parse is a JVM-side scalar function
    (get_json_object) — no Python, codegen-compatible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


SHIP_CUTOFF = "1998-09-02"


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary with
    the shipdate predicate pushed to the scan."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit(SHIP_CUTOFF).cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_PRICING = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way dimension join (orders ⋈ customer ⋈ nation ⋈ region):
    revenue per nation within one region, dims broadcast. The fact side
    stays unshuffled until the joins reduce it."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(
        _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    )
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum("o_totalprice"), 4).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


ORACLE_REGIONAL = """
SELECT n_name, round(sum(o_totalprice), 4) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def q_json_props_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction (events.props is a JSON string): histogram
    of the `k` property — JVM-side get_json_object, no Python."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("int").alias("k_value")
        )
        .groupBy("k_value")
        .agg(F.count("*").alias("n"))
    )


ORACLE_JSON_PROPS = """
SELECT json_extract_string(props, '$.k')::int AS k_value, count(*) AS n
FROM events GROUP BY 1
"""


QUERIES = {
    "pricing_summary": q_pricing_summary,
    "regional_revenue": q_regional_revenue,
    "json_props_histogram": q_json_props_histogram,
}

ORACLE_SQL = {
    "pricing_summary": ORACLE_PRICING,
    "regional_revenue": ORACLE_REGIONAL,
    "json_props_histogram": ORACLE_JSON_PROPS,
}
