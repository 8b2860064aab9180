"""Date/time functions (SURVEY.md §2.8 F3).

Reference capability: ages from birth dates, interval-overlap arithmetic,
"as of" date cuts (reference README.md:3,9). All built-in temporal
expressions; results are cast to engine-neutral types (DATE / BIGINT) per
the compat conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "q_date_funcs",
    oracle="""
    SELECT
      o_orderkey,
      CAST(year(o_orderdate) AS INTEGER) AS order_year,
      CAST(month(o_orderdate) AS INTEGER) AS order_month,
      CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
      CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
           AS BIGINT) AS days_since_epoch_start,
      CAST(o_orderdate AS DATE) + 30 AS due_date
    FROM orders
    """,
    tags=("F3",),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal primitive family: year/month/quarter extraction, month
    truncation, day differences, date offsets (the age / as-of / interval
    arithmetic of README.md:3,9)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date")
        .alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint").alias("days_since_epoch_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
    )
