"""Explicit schemas for the reference-domain tables.

Mirrors the fixed DuckDB schema the reference's bootstrap script creates
(reference README.md:7 entity tables, :8 KB tables, :75 seeding), per the
column specs in FIXTURES.md §B. Explicit StructTypes everywhere — schema
drift fails at plan time, and writers produce stable parquet footers.
"""

from __future__ import annotations

from pyspark.sql import types as T

patients = T.StructType([
    T.StructField("patient_id", T.LongType(), False),
    T.StructField("name", T.StringType()),
    T.StructField("birth_date", T.DateType()),
    T.StructField("gender", T.StringType()),
    T.StructField("nation", T.StringType()),
])

# Prescription intervals: stop_date NULL = open-ended (still active).
meds = T.StructType([
    T.StructField("med_id", T.LongType(), False),
    T.StructField("patient_id", T.LongType(), False),
    T.StructField("drug_name", T.StringType()),
    T.StructField("rxcui", T.StringType()),
    T.StructField("drug_class", T.StringType()),
    T.StructField("start_date", T.DateType()),
    T.StructField("stop_date", T.DateType(), True),
    T.StructField("daily_cost", T.DoubleType()),
    T.StructField("is_brand", T.BooleanType()),
])

conditions = T.StructType([
    T.StructField("condition_id", T.LongType(), False),
    T.StructField("patient_id", T.LongType(), False),
    T.StructField("icd10", T.StringType()),
    T.StructField("onset_date", T.DateType()),
])

allergies = T.StructType([
    T.StructField("allergy_id", T.LongType(), False),
    T.StructField("patient_id", T.LongType(), False),
    T.StructField("substance", T.StringType()),
    T.StructField("severity", T.StringType()),
])

coverage = T.StructType([
    T.StructField("coverage_id", T.LongType(), False),
    T.StructField("patient_id", T.LongType(), False),
    T.StructField("payer", T.StringType()),
    T.StructField("plan_id", T.StringType()),
    T.StructField("effective_date", T.DateType()),
])

drug_classes = T.StructType([
    T.StructField("rxcui", T.StringType(), False),
    T.StructField("drug_class", T.StringType()),
    T.StructField("class_system", T.StringType()),
])

orange_book = T.StructType([
    T.StructField("brand_rxcui", T.StringType(), False),
    T.StructField("generic_rxcui", T.StringType(), False),
    T.StructField("te_code", T.StringType()),
])

# Time-versioned prices => as-of join target (README.md:8).
prices = T.StructType([
    T.StructField("rxcui", T.StringType(), False),
    T.StructField("price", T.DoubleType()),
    T.StructField("effective_date", T.DateType()),
])

formulary = T.StructType([
    T.StructField("plan_id", T.StringType(), False),
    T.StructField("rxcui", T.StringType(), False),
    T.StructField("tier", T.IntegerType()),
    T.StructField("prior_auth", T.BooleanType()),
    T.StructField("covered", T.BooleanType()),
])
