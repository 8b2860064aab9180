"""Round-9 regression tests for the round-8 advisor findings.

1. ``arrowpq`` Python DataSource: a partitionBy-written staging
   (key=value/ subdirectories) must be served, not silently treated as
   an empty relation; a non-empty directory with no parquet anywhere
   under it must raise, reserving the empty sentinel for genuinely
   empty stagings.
2. ``q_drift_ks``: when every event lands on one side of the cutoff
   the KS denominator is zero — the statistic must come back NULL on
   both engines, never an ANSI division error (the q_ab_mannwhitney
   posture).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _load_docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_arrowpq_serves_partitioned_staging(spark, sf_dir, tmp_path):
    from sigma_rx7_spark.sources.pydatasource import (_DS_NAME,
                                                      register_arrowpq)

    register_arrowpq(spark)
    docs = _load_docs(spark, sf_dir).select(
        "doc_id", "lang", "source", "n_chars",
        (F.col("doc_id") % 3).alias("part"))
    staged = str(tmp_path / "docs_partitioned")
    docs.write.partitionBy("part").parquet(staged)

    served = (spark.read.format(_DS_NAME).option("path", staged).load())
    assert served.count() == docs.count()
    # A full-fidelity check, not just cardinality: same per-lang sums.
    got = {r["lang"]: r["s"] for r in served.groupBy("lang")
           .agg(F.sum("n_chars").alias("s")).collect()}
    want = {r["lang"]: r["s"] for r in docs.groupBy("lang")
            .agg(F.sum("n_chars").alias("s")).collect()}
    assert got == want


def test_arrowpq_rejects_parquetless_directory(spark, tmp_path):
    from sigma_rx7_spark.sources.pydatasource import (_DS_NAME,
                                                      register_arrowpq)

    register_arrowpq(spark)
    bogus = tmp_path / "not_a_table"
    bogus.mkdir()
    (bogus / "data.csv").write_text("doc_id\n1\n")
    df = spark.read.format(_DS_NAME).option("path", str(bogus)).load()
    with pytest.raises(Exception, match="no .*parquet"):
        df.count()


def test_arrowpq_empty_staging_still_serves_empty(spark, tmp_path):
    from sigma_rx7_spark.sources.pydatasource import (_DS_NAME,
                                                      register_arrowpq)

    register_arrowpq(spark)
    empty = tmp_path / "empty_table"
    empty.mkdir()
    (empty / "_SUCCESS").write_text("")
    df = spark.read.format(_DS_NAME).option("path", str(empty)).load()
    assert df.count() == 0


def test_drift_ks_degenerate_one_sided_is_null(spark, sf_dir, tmp_path):
    from sigma_rx7_spark.operators.quality import _KS_CUTOFF, q_drift_ks

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    one_sided = ev.filter(
        F.col("ts") < F.lit(_KS_CUTOFF).cast("timestamp"))
    assert one_sided.count() > 0, "fixture: need events before the cutoff"
    fake_sf = str(tmp_path / "sf_one_sided")
    os.makedirs(fake_sf)
    one_sided.write.parquet(os.path.join(fake_sf, "events.parquet"))

    row = q_drift_ks(spark, fake_sf).collect()[0]
    assert row["n_b"] == 0
    assert row["ks_d"] is None and row["ks_stat"] is None
