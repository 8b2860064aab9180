"""Partition-layout independence of the oracle-gated sketch audits.

q_agg_approx / q_agg_approx_quantile (promoted from rows-only in round 5)
hash-compare a tolerance BOOLEAN against an oracle literal TRUE, so they
are only driver-safe if that boolean cannot flip under a different
cluster layout than the one we test on:

- HLL++ (approx_count_distinct) is fully partition-independent — the
  register relation is a data-derived max, merged commutatively — so the
  estimate itself is byte-stable under any repartitioning.
- GK (approx_percentile) merges are layout-SENSITIVE in the exact value
  returned, but the rank-error guarantee (≤ n/accuracy = 0.01% at
  accuracy 10000) holds under any merge order, and the gate checks a 5%
  VALUE tolerance — orders of magnitude of headroom on any
  non-degenerate distribution.

These tests pin that reasoning by executing both audits over adversarial
repartitionings of the same input and asserting the booleans (and, for
HLL, the estimate) are identical.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sigma_rx7_spark.io import load
from sigma_rx7_spark.registry import get


def test_hll_audit_layout_independent(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey")

    def audit(df):
        return {
            r["l_returnflag"]: (r["approx"], r["exact"])
            for r in df.groupBy("l_returnflag").agg(
                F.approx_count_distinct("l_orderkey", rsd=0.01)
                .alias("approx"),
                F.countDistinct("l_orderkey").alias("exact")).collect()
        }

    base = audit(li)
    for n_parts in (1, 3, 17):
        assert audit(li.repartition(n_parts)) == base, n_parts
    # and the 5% gate holds with rsd=0.01 headroom
    for approx, exact in base.values():
        assert abs(approx - exact) / exact <= 0.05


def test_gk_audit_tolerance_layout_independent(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice")
    pct = F.approx_percentile(
        "l_extendedprice",
        F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)), F.lit(10000))
    epct = F.percentile(
        "l_extendedprice",
        F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))

    def booleans(df):
        out = {}
        for r in df.groupBy("l_returnflag").agg(
                pct.alias("a"), epct.alias("e")).collect():
            out[r["l_returnflag"]] = tuple(
                abs(a - e) / e <= 0.05 for a, e in zip(r["a"], r["e"]))
        return out

    base = booleans(li)
    assert all(all(v) for v in base.values()), base
    for n_parts in (1, 3, 17):
        got = booleans(li.repartition(n_parts))
        assert got == base, (n_parts, got)


def test_registered_audit_queries_report_true(spark, sf_dir):
    """The actual registered queries output TRUE in every tolerance
    column at the test scale — the exact condition the driver's oracle
    asserts."""
    for name, cols in (
        ("q_agg_approx", ("within_5pct",)),
        ("q_agg_approx_quantile",
         ("p50_within_5pct", "p95_within_5pct", "p99_within_5pct")),
    ):
        for row in get(name).fn(spark, sf_dir).collect():
            for c in cols:
                assert row[c] is True, (name, c, row)
