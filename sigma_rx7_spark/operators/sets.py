"""Set operations (SURVEY.md §2.7).

Reference capability: merging the HL7 v2 and FHIR ingest paths into one
entity table (union; reference README.md:3,76), meds in history but absent
from formulary (except; README.md:8-9), consistency intersections
(README.md:76).

Spark-first: ``unionByName`` (schema-aligned, no positional surprises);
EXCEPT/INTERSECT with DISTINCT semantics to match ANSI defaults. At scale
union is free (no shuffle — just more partitions); except/intersect are
one hash-partition shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "q_set_union",
    oracle="""
    SELECT c_custkey AS entity_id, c_name AS name, 'customer' AS kind,
           c_acctbal AS acctbal
    FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_id, s_name AS name, 'supplier' AS kind,
           s_acctbal AS acctbal
    FROM supplier
    """,
    tags=("U1",),
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two differently-shaped sources into one entity table
    (the HL7-path ∪ FHIR-path merge, README.md:3,76)."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_id"),
        F.col("c_name").alias("name"),
        F.lit("customer").alias("kind"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_id"),
        F.col("s_name").alias("name"),
        F.lit("supplier").alias("kind"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s)


@query(
    "q_set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("U2",),
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): keys present in one period/source but not the
    other (in-history-but-not-on-formulary shape, README.md:8-9)."""
    o = load(spark, sf_dir, "orders")
    open_ = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey"))
    closed = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey"))
    return open_.distinct().exceptAll(closed.distinct())


@query(
    "q_set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    tags=("U3",),
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): keys present in both sources (cross-source
    consistency check, README.md:76)."""
    o = load(spark, sf_dir, "orders")
    open_ = o.where(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey"))
    closed = o.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey"))
    return open_.intersect(closed)
