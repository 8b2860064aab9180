"""FHIR export/ingest (reference README.md:10,29,71 export; :3,76 ingest).

Export: recommendation rows → draft ``MedicationRequest`` resources
(nested struct → ``to_json``), per the golden shape in FIXTURES.md §B:
status=draft, ``medicationCodeableConcept.coding[0].{system,code,display}``,
``subject.reference='Patient/<id>'``.

Ingest: FHIR bundles (nested JSON) → entity rows via an explicit
StructType + ``from_json`` + ``explode`` of bundle entries — no schema
inference, bad documents surface as nulls to quarantine, and the parse
is a single codegen'd expression per row (100 TB-safe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RXNORM_SYSTEM = "http://www.nlm.nih.gov/research/umls/rxnorm"


def medication_request(patient_id: Column, rxcui: Column,
                       display: Column) -> Column:
    """One draft MedicationRequest resource as a nested struct column."""
    return F.struct(
        F.lit("MedicationRequest").alias("resourceType"),
        F.lit("draft").alias("status"),
        F.lit("proposal").alias("intent"),
        F.struct(
            F.array(
                F.struct(
                    F.lit(RXNORM_SYSTEM).alias("system"),
                    rxcui.cast("string").alias("code"),
                    display.cast("string").alias("display"),
                )
            ).alias("coding"),
        ).alias("medicationCodeableConcept"),
        F.struct(
            F.concat(F.lit("Patient/"), patient_id.cast("string"))
            .alias("reference"),
        ).alias("subject"),
    )


def export_medication_requests(subs: DataFrame) -> DataFrame:
    """Substitution suggestions → (patient_id, med_id, fhir_json) rows
    (the R:71 'generate a draft FHIR MedicationRequest' action)."""
    res = medication_request(
        F.col("patient_id"), F.col("generic_rxcui"),
        F.concat(F.col("drug_name"), F.lit(" (generic)")),
    )
    return subs.select(
        "patient_id", "med_id", F.to_json(res).alias("fhir_json"))


def export_bundles(subs: DataFrame) -> DataFrame:
    """Substitution suggestions → ONE FHIR ``Bundle`` JSON per patient,
    each entry a draft ``MedicationRequest`` (README.md:10,29 — the
    batch-export shape: a collection Bundle of per-prescription
    resources, array-of-struct nesting serialized with ``to_json``).

    Entries are array_sort-ed on med_id so the serialized bundle text
    is deterministic under any partitioning (collect_list order is
    not). The per-patient aggregation is one hash shuffle on
    patient_id; resource construction is pure column expressions."""
    res = medication_request(
        F.col("patient_id"), F.col("generic_rxcui"),
        F.concat(F.col("drug_name"), F.lit(" (generic)")),
    ).withField("id", F.col("med_id").cast("string")) \
     .withField("authoredOn", F.col("start_date").cast("string"))
    per = (
        subs.select(
            "patient_id",
            F.struct(F.col("med_id"), res.alias("r")).alias("s"))
        .groupBy("patient_id")
        .agg(F.array_sort(F.collect_list("s")).alias("ss"))
    )
    entries = F.transform("ss", lambda s: F.struct(s["r"].alias("resource")))
    bundle = F.struct(
        F.lit("Bundle").alias("resourceType"),
        F.lit("collection").alias("type"),
        entries.alias("entry"),
    )
    return per.select("patient_id", F.to_json(bundle).alias("bundle_json"))


# ---- ingest (README.md:3,76) --------------------------------------------

_CODING = T.StructType([
    T.StructField("system", T.StringType()),
    T.StructField("code", T.StringType()),
    T.StructField("display", T.StringType()),
])

MEDICATION_REQUEST_SCHEMA = T.StructType([
    T.StructField("resourceType", T.StringType()),
    T.StructField("id", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("intent", T.StringType()),
    T.StructField("medicationCodeableConcept", T.StructType([
        T.StructField("coding", T.ArrayType(_CODING)),
    ])),
    T.StructField("subject", T.StructType([
        T.StructField("reference", T.StringType()),
    ])),
    T.StructField("authoredOn", T.StringType()),
])

BUNDLE_SCHEMA = T.StructType([
    T.StructField("resourceType", T.StringType()),
    T.StructField("entry", T.ArrayType(T.StructType([
        T.StructField("resource", MEDICATION_REQUEST_SCHEMA),
    ]))),
])


def parse_medication_requests(bundles_json: DataFrame,
                              json_col: str = "bundle_json") -> DataFrame:
    """FHIR Bundle JSON strings → one row per MedicationRequest with the
    fields the meds schema needs ('Map … FHIR resources to the DuckDB
    schema', README.md:76)."""
    parsed = bundles_json.select(
        F.from_json(F.col(json_col), BUNDLE_SCHEMA).alias("bundle"))
    res = parsed.select(
        F.explode("bundle.entry").alias("entry")
    ).select(F.col("entry.resource").alias("r"))
    coding0 = F.element_at("r.medicationCodeableConcept.coding", 1)
    return (
        res.where(F.col("r.resourceType") == "MedicationRequest")
        .select(
            F.col("r.id").alias("source_id"),
            F.col("r.status").alias("status"),
            F.regexp_extract("r.subject.reference", r"Patient/(\d+)", 1)
            .cast("long").alias("patient_id"),
            coding0.getField("code").alias("rxcui"),
            coding0.getField("display").alias("drug_name"),
            F.to_date("r.authoredOn").alias("start_date"),
        )
    )
