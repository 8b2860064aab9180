"""Scans, projections, filters, derived expressions (SURVEY.md §2.1-2.2).

Reference capability: every rule query begins by scanning entity/KB tables
and projecting/filtering columns (reference README.md:7-9; e.g. restrict
to one patient, README.md:69-71). Spark-first: plain ``select``/``where``
— Catalyst pushes both the predicate and the column pruning into the
parquet scan (PushedFilters / ReadSchema in the physical plan), which is
what keeps a 100 TB scan reading only the bytes it needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "q_scan_project",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    """,
    tags=("S1", "S2", "P1"),
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan: only 4 of 6 order columns are read."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24.0
    """,
    tags=("P2",),
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicate filter (TPC-H Q6 shape) — all four predicates
    are parquet-pushable; the scan skips row groups by min/max stats."""
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount",
    )


@query(
    "q_derived_expr",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      l_extendedprice * (1 - l_discount) AS revenue,
      l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
      CAST(l_quantity AS BIGINT) AS qty_int
    FROM lineitem
    WHERE l_returnflag = 'R'
    """,
    tags=("P3",),
)
def q_derived_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-column expressions (the reference's cost-delta shape,
    README.md:3,8-9). Pure per-row IEEE double arithmetic — identical in
    any engine, stays inside whole-stage codegen."""
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.where(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("revenue"),
        (disc * (F.lit(1) + F.col("l_tax"))).alias("charge"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
    )
