"""Deterministic synthetic seed data for the reference-domain tables.

Plays the role of the reference's ``scripts/bootstrap_duckdb.py``
(reference README.md:36,55-58,75): create the fixed schema, insert sample
rows. Seeded (seed=42 convention, TESTDATA.md) and pure-Python generated,
then parallelized through ``spark.createDataFrame`` with the explicit
schemas — the bootstrap path a cluster deployment would replace with
Parquet staging reads.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, SparkSession

from . import schemas

SEED = 42
N_PATIENTS = 100
MEDS_PER_PATIENT = 8

# A small deterministic drug knowledge base: (brand rxcui, generic rxcui,
# drug name stem, class). The brand/generic split feeds orange_book.
_DRUGS = [
    (f"B{i:03d}", f"G{i:03d}", f"drug{i:03d}", cls)
    for i, cls in enumerate(
        ["statin", "ace_inhibitor", "ssri", "ppi", "nsaid",
         "beta_blocker", "biguanide", "sulfonylurea", "anticoagulant",
         "bronchodilator"] * 5
    )
]
_PLANS = ["plan_gold", "plan_silver", "plan_bronze"]
_EPOCH = dt.date(2023, 1, 1)


def _rows(rng: random.Random):
    patients, meds, conditions, allergies, coverage = [], [], [], [], []
    med_id = 0
    for pid in range(N_PATIENTS):
        patients.append((
            pid, f"patient_{pid:04d}",
            _EPOCH - dt.timedelta(days=rng.randint(20 * 365, 90 * 365)),
            rng.choice(["F", "M", "X"]),
            rng.choice(["AMERICA", "EUROPE", "ASIA"]),
        ))
        coverage.append((
            pid, pid, rng.choice(["acme_health", "unified_care"]),
            rng.choice(_PLANS),
            _EPOCH - dt.timedelta(days=rng.randint(0, 365)),
        ))
        if pid % 7 == 0:
            conditions.append((
                pid * 10, pid, rng.choice(["E11.9", "I10", "F32.9"]),
                _EPOCH - dt.timedelta(days=rng.randint(30, 1000)),
            ))
        # Every 4th patient: dense enough that the allergy-alert rule's
        # join and BOTH severity branches are exercised at fixture scale
        # (1-in-11 left the sulfa∩sulfonylurea intersection at ~1 row).
        if pid % 4 == 0:
            allergies.append((
                pid * 10, pid, rng.choice(["penicillin", "sulfa", "latex"]),
                rng.choice(["mild", "severe"]),
            ))
        for _ in range(MEDS_PER_PATIENT):
            brand_rxcui, generic_rxcui, stem, cls = rng.choice(_DRUGS)
            is_brand = rng.random() < 0.5
            rxcui = brand_rxcui if is_brand else generic_rxcui
            start = _EPOCH + dt.timedelta(days=rng.randint(0, 300))
            stop = (None if rng.random() < 0.25
                    else start + dt.timedelta(days=rng.randint(10, 120)))
            meds.append((
                med_id, pid,
                (stem + ("_br" if is_brand else "_gn")),
                rxcui, cls, start, stop,
                round(rng.uniform(0.5, 40.0), 2), is_brand,
            ))
            med_id += 1
    return patients, meds, conditions, allergies, coverage


def build_domain_tables(spark: SparkSession) -> dict[str, DataFrame]:
    """All nine reference-domain tables as DataFrames (README.md:7-8)."""
    rng = random.Random(SEED)
    patients, meds, conditions, allergies, coverage = _rows(rng)

    drug_classes = [(b, cls, "demo") for (b, g, stem, cls) in _DRUGS]
    drug_classes += [(g, cls, "demo") for (b, g, stem, cls) in _DRUGS]
    orange_book = [(b, g, "AB") for (b, g, stem, cls) in _DRUGS]
    # Time-versioned prices: brand ~3x generic, two price epochs each.
    prices = []
    for b, g, stem, cls in _DRUGS:
        base = rng.uniform(1.0, 30.0)
        for rxcui, mult in ((b, 3.0), (g, 1.0)):
            prices.append((rxcui, round(base * mult, 2), _EPOCH))
            prices.append((
                rxcui, round(base * mult * 1.1, 2),
                _EPOCH + dt.timedelta(days=180),
            ))
    formulary = []
    for plan in _PLANS:
        for b, g, stem, cls in _DRUGS:
            # generics always covered; brands covered on richer plans only
            formulary.append((plan, g, 1, False, True))
            if plan != "plan_bronze":
                formulary.append(
                    (plan, b, 3, rng.random() < 0.5, plan == "plan_gold"))

    return {
        "patients": spark.createDataFrame(patients, schemas.patients),
        "meds": spark.createDataFrame(meds, schemas.meds),
        "conditions": spark.createDataFrame(conditions, schemas.conditions),
        "allergies": spark.createDataFrame(allergies, schemas.allergies),
        "coverage": spark.createDataFrame(coverage, schemas.coverage),
        "drug_classes": spark.createDataFrame(
            drug_classes, schemas.drug_classes),
        "orange_book": spark.createDataFrame(
            orange_book, schemas.orange_book),
        "prices": spark.createDataFrame(prices, schemas.prices),
        "formulary": spark.createDataFrame(formulary, schemas.formulary),
    }
