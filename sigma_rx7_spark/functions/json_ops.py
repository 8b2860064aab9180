"""JSON + array/map functions, nested construction/extraction
(SURVEY.md §2.8 F6-F9, §2.1 S4/S6).

Reference capability: parse nested FHIR JSON input (reference
README.md:3,76) and construct draft FHIR ``MedicationRequest`` resources
(README.md:10,29,71). The full domain-shaped FHIR schemas live in
``domain/fhir.py``; this module exercises the primitive families on the
harness tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from ..registry import query


@query(
    "q_json_extract",
    oracle="""
    SELECT
      event_id,
      CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
    tags=("F7", "F9", "S4"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (FHIR-input parse shape,
    README.md:3,76): path extraction + typed cast, pure JVM."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select(
        "event_id",
        k.alias("k"),
        (k % 10).alias("k_bucket"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT
      vec_id,
      label,
      len(embedding) AS dim,
      embedding[1] AS first_val,
      list_max(embedding) AS max_val,
      list_min(embedding) AS min_val
    FROM embeddings
    """,
    tags=("F8",),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array primitive family over a vector column (the collected-set /
    FHIR-array shape, README.md:9-10): size, indexing, extrema — exact
    float comparisons, no summation, engine-safe."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("bigint").alias("dim"),
        F.element_at("embedding", 1).alias("first_val"),
        F.array_max("embedding").alias("max_val"),
        F.array_min("embedding").alias("min_val"),
    )


@query(
    "q_json_variant",
    oracle="""
    SELECT
      event_type,
      COUNT(*) AS n_events,
      CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
           AS BIGINT) AS sum_k,
      MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    tags=("F7", "S4", "variant"),
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-light JSON via Spark 4 VariantType (SURVEY §1.3): the props
    payload is parsed ONCE with ``parse_json`` into a binary Variant —
    no schema declaration, unlike ``from_json`` — and fields are pulled
    out with typed ``variant_get`` paths. This is the ingestion shape
    for schema-drifting FHIR payloads (reference README.md:3,76): the
    scan stays schema-free, the extraction is late-bound and codegen'd.
    At 100 TB Variant beats re-parsing JSON strings per access: the
    binary encoding is parsed once at load and every ``variant_get`` is
    a cheap binary probe, with shredding/pushdown improving as Spark's
    Variant support matures."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@query(
    "q_nested_export",
    oracle="""
    SELECT
      o_orderkey,
      'MedicationRequest' AS resource_type,
      'order-' || CAST(o_orderkey AS VARCHAR) AS resource_id,
      'draft' AS status,
      'Patient/' || CAST(o_custkey AS VARCHAR) AS subject_ref,
      'https://example.org/priority' AS coding_system,
      o_orderpriority AS coding_code,
      CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
        AS estimated_cost
    FROM orders
    """,
    tags=("F6", "S6"),
)
def q_nested_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-resource construction + JSON serialization — the draft FHIR
    ``MedicationRequest`` export (README.md:10,29,71) in harness shape:
    one nested resource per order. ``struct``/``to_json`` are codegen'd;
    at scale this is the write-path of a 100 TB JSON export sink.

    Oracle-gated through the serialized text: the JSON string itself is
    engine-specific (key order, spacing), so the query serializes with
    ``to_json`` and re-extracts every scalar leaf from that string with
    ``get_json_object`` — a full construct→serialize→parse round trip on
    the Spark side — while the oracle computes the same leaves directly.
    Any serialization defect (lost field, mangled nesting, number drift)
    breaks the leaf comparison."""
    o = load(spark, sf_dir, "orders")
    resource = F.struct(
        F.lit("MedicationRequest").alias("resourceType"),
        F.concat(F.lit("order-"), F.col("o_orderkey")).alias("id"),
        F.lit("draft").alias("status"),
        F.struct(
            F.concat(F.lit("Patient/"), F.col("o_custkey"))
            .alias("reference"),
        ).alias("subject"),
        F.struct(
            F.array(
                F.struct(
                    F.lit("https://example.org/priority").alias("system"),
                    F.col("o_orderpriority").alias("code"),
                )
            ).alias("coding"),
        ).alias("medicationCodeableConcept"),
        F.col("o_totalprice").alias("estimatedCost"),
    )
    j = F.to_json(resource)
    # One serialize, one top-level parse (r15, guide §1.2 step 2): the
    # old shape referenced the to_json expression in all seven
    # get_json_object extractions and Catalyst re-inlined it per
    # reference — seven serializations and seven full-document parses
    # per row (3.9 s at sf0.1). json_tuple is a generator, so its
    # input is evaluated ONCE; the two nested leaves re-parse only the
    # small sub-object strings. Leaf values identical (verified
    # in-session); the construct→serialize→parse round-trip contract
    # is unchanged — one serialization still feeds every extracted
    # leaf. 3.9 -> 2.4 s.
    base = o.select(
        "o_orderkey",
        F.json_tuple(j, "resourceType", "id", "status", "subject",
                     "medicationCodeableConcept", "estimatedCost")
        .alias("rt", "rid", "st", "subj", "mcc", "ec"))
    return base.select(
        "o_orderkey",
        F.col("rt").alias("resource_type"),
        F.col("rid").alias("resource_id"),
        F.col("st").alias("status"),
        F.get_json_object("subj", "$.reference").alias("subject_ref"),
        F.get_json_object("mcc", "$.coding[0].system")
        .alias("coding_system"),
        F.get_json_object("mcc", "$.coding[0].code").alias("coding_code"),
        F.col("ec").cast("decimal(12,2)").cast("double")
        .alias("estimated_cost"),
    )
