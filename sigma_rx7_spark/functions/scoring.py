"""Scoring + conditional logic (SURVEY.md §2.8 F4-F5, §2.10 X1).

Reference capability: payer-denial risk — "a simple logistic-style
function based on price, tier and prior authorisation" (reference
README.md:9,27,77 ``app/ml/denial.py``) — and CASE-style rule predicates
(README.md:9).

Spark-first: the "ML" scoring function is a pure Column expression —
codegen'd JVM arithmetic, NOT a UDF. At 100 TB that is the difference
between a scan-speed pipeline and a Python serialization wall. The same
builder is reused by the clinical domain layer (domain/rules.py).

Cross-engine note: ``exp`` is libm-dependent (last-ulp drift between JVM
and DuckDB), so any aggregated score goes through decimal quantization
(compat.py hazard #2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import o_davg, q
from ..io import load
from ..registry import query

# Published fixed weights for the denial-risk logistic (FIXTURES.md §B):
# intercept, price, tier, prior-auth.
DENIAL_WEIGHTS = (-2.0, 0.01, 0.4, 1.5)


def logistic_score(
    price: Column, tier: Column, prior_auth: Column,
    weights: tuple[float, float, float, float] = DENIAL_WEIGHTS,
) -> Column:
    """sigmoid(w0 + w1*price + w2*tier + w3*prior_auth) as a native
    Column expression (README.md:77)."""
    w0, w1, w2, w3 = weights
    z = (
        F.lit(w0)
        + F.lit(w1) * price
        + F.lit(w2) * tier
        + F.lit(w3) * prior_auth.cast("int")
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


_ORACLE_SCORE = """
      1.0 / (1.0 + exp(-(-2.0
        + 0.01 * (o_totalprice / 1000.0)
        + 0.4 * CAST(substr(o_orderpriority, 1, 1) AS INTEGER)
        + 1.5 * CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)))
"""


@query(
    "q_math_score",
    oracle=f"""
    SELECT
      o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(({_ORACLE_SCORE}) AS DECIMAL(20,6))) AS DOUBLE)
        AS sum_score,
      CAST(SUM(CAST(({_ORACLE_SCORE}) AS DECIMAL(20,6))) AS DOUBLE)
        / COUNT(*) AS avg_score
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("F4", "X1"),
)
def q_math_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denial-risk logistic scoring (README.md:9,77) over the harness
    shape: price = o_totalprice/1000, tier = priority digit, prior-auth =
    (status = 'F'); aggregated per priority with quantized sums."""
    o = load(spark, sf_dir, "orders")
    score = logistic_score(
        price=F.col("o_totalprice") / F.lit(1000.0),
        tier=F.substring("o_orderpriority", 1, 1).cast("int"),
        prior_auth=F.col("o_orderstatus") == "F",
    )
    qscore = q(score)
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(qscore).cast("double").alias("sum_score"),
        (F.sum(qscore).cast("double") / F.count(F.lit(1))).alias("avg_score"),
    )


@query(
    "q_conditional",
    oracle="""
    SELECT
      CASE
        WHEN l_discount = 0 THEN 'none'
        WHEN l_discount < 0.05 THEN 'low'
        WHEN l_discount < 0.08 THEN 'mid'
        ELSE 'high'
      END AS discount_band,
      CASE WHEN l_tax > 0.04 THEN 'taxed' ELSE 'light' END AS tax_band,
      COUNT(*) AS n_lines,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE)
        AS sum_price
    FROM lineitem
    GROUP BY 1, 2
    """,
    tags=("F5",),
)
def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN rule predicates (tier/PA/price threshold flags,
    README.md:9), grouped to a summary."""
    li = load(spark, sf_dir, "lineitem")
    discount_band = (
        F.when(F.col("l_discount") == 0, "none")
        .when(F.col("l_discount") < 0.05, "low")
        .when(F.col("l_discount") < 0.08, "mid")
        .otherwise("high")
    )
    tax_band = F.when(F.col("l_tax") > 0.04, "taxed").otherwise("light")
    return (
        li.select(
            discount_band.alias("discount_band"),
            tax_band.alias("tax_band"),
            "l_extendedprice",
        )
        .groupBy("discount_band", "tax_band")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(20,6)"))
            .cast("double").alias("sum_price"),
        )
    )
