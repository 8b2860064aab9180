"""Harness exposure of the clinical domain pipeline.

The domain tables are engine-generated fixtures (domain/fixtures.py), not
harness parquet, so these entries are rows-only (no DuckDB oracle view
exists for them); correctness is covered by tests/test_domain.py's unit +
differential tests. sf_dir is accepted for signature parity and ignored.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from . import fixtures, rules
from .fhir import export_medication_requests


@query("q_domain_recommendations", oracle=None,
       tags=("domain", "rows-only"))
def q_domain_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's E1 flow end-to-end (README.md:69-71): overlap
    alerts + generic substitutions + formulary flags + denial scores,
    ranked per patient, over the bootstrap fixtures."""
    return rules.recommendations(fixtures.build_domain_tables(spark))


@query("q_domain_fhir_export", oracle=None, tags=("domain", "rows-only"))
def q_domain_fhir_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Draft FHIR MedicationRequest export (README.md:10,29,71) for every
    substitution suggestion from the fixtures."""
    t = fixtures.build_domain_tables(spark)
    subs = rules.generic_substitutions(
        t["meds"], t["orange_book"], t["prices"])
    return export_medication_requests(subs)
