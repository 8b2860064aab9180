"""Property-based tests for the round-8 operator cores (SURVEY.md §5.4).

Each property checks the factored library helper against an independent
pure-Python model on small adversarial inputs — ties, empty arms,
singleton sets, colliding keys — complementing the oracle mirror (which
proves engine parity on the fixed corpus, not input-space coverage).
"""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sigma_rx7_spark.llm.dedup import prefix_jaccard_pairs
from sigma_rx7_spark.operators.aggregates import (
    cms_estimates,
    cms_sketch,
    mannwhitney_u,
)

SETTINGS = settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)

# Documents as sets of shingle ids over a tiny vocabulary so overlaps
# (and exact-threshold boundary pairs) are common.
DOC_SETS = st.lists(
    st.frozensets(st.integers(0, 11), min_size=1, max_size=8),
    min_size=2, max_size=8)


@given(docs=DOC_SETS, t=st.sampled_from([(4, 5), (3, 5), (1, 2)]))
@SETTINGS
def test_prefix_join_equals_naive_jaccard(spark, docs, t):
    t_num, t_den = t
    sh = spark.createDataFrame(
        [(i, f"s{s}") for i, d in enumerate(docs) for s in d],
        "doc_id INT, shingle STRING")
    got = {
        (r.doc_a, r.doc_b, r.inter_size, r.union_size)
        for r in prefix_jaccard_pairs(sh, t_num, t_den).collect()
    }
    want = set()
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            it = len(docs[i] & docs[j])
            un = len(docs[i] | docs[j])
            if t_den * it >= t_num * un:
                want.add((i, j, it, un))
    assert got == want


KEYS = st.lists(st.integers(0, 40), min_size=1, max_size=60)


@given(keys=KEYS)
@SETTINGS
def test_cms_never_underestimates(spark, keys):
    kdf = spark.createDataFrame([(k,) for k in keys], "user_id BIGINT")
    sketch = cms_sketch(kdf, "user_id")
    probes = kdf.distinct()
    est = {r.user_id: r.cms_est
           for r in cms_estimates(sketch, probes, "user_id").collect()}
    exact = Counter(keys)
    assert set(est) == set(exact)
    for k, c in exact.items():
        assert est[k] >= c, (k, est[k], c)


@given(a=KEYS, b=KEYS)
@SETTINGS
def test_cms_sketches_merge_additively(spark, a, b):
    """union + re-aggregate of two sketches == sketch of the union —
    the property that lets per-day/per-source sketches combine."""
    da = spark.createDataFrame([(k,) for k in a], "user_id BIGINT")
    db = spark.createDataFrame([(k,) for k in b], "user_id BIGINT")
    merged = (
        cms_sketch(da, "user_id").unionByName(cms_sketch(db, "user_id"))
        .groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))
    )
    direct = cms_sketch(da.unionByName(db), "user_id")
    assert (sorted(map(tuple, merged.collect()))
            == sorted(map(tuple, direct.collect())))


# Tie-heavy values: small integer domain guarantees duplicated values
# across and within arms.
VALS = st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 1)),
    min_size=2, max_size=40)


@given(vals=VALS)
@SETTINGS
def test_mannwhitney_matches_naive_pairs(spark, vals):
    vdf = spark.createDataFrame(
        [(float(v), arm) for v, arm in vals], "v DOUBLE, arm INT")
    row = mannwhitney_u(vdf).collect()[0]
    a = sorted(v for v, arm in vals if arm == 0)
    b = sorted(v for v, arm in vals if arm == 1)
    u2 = sum(2 if x > y else 1 if x == y else 0 for x in a for y in b)
    assert row.n_a == len(a) and row.n_b == len(b)
    assert row.u2_a == u2
    n_a, n_b = len(a), len(b)
    n = n_a + n_b
    t = Counter(a + b)
    tie_sum = sum(c ** 3 - c for c in t.values())
    if n_a == 0 or n_b == 0:
        assert row.z_mwu is None
        return
    tie_adj = (n + 1) - tie_sum / (n * (n - 1))
    if tie_adj <= 0:
        assert row.z_mwu is None
        return
    var = n_a * n_b / 12.0 * tie_adj
    z = (u2 - n_a * n_b) / (2 * math.sqrt(var))
    assert row.z_mwu is not None
    assert abs(row.z_mwu - z) < 1e-6, (row.z_mwu, z)
