"""Round-12 property tests: naive-model checks for the planner-derived
SRP geometry and the round's guard fixes."""

import math

import pytest

from sigma_rx7_spark.llm.dedup import (
    SRP_PLAN_MISS,
    SRP_PLAN_THRESHOLD,
    srp_planned_geometry,
)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 17, 500, 2000, 20000,
                               10 ** 6, 10 ** 9])
def test_srp_planned_geometry_naive_model(n):
    # Naive re-derivation of the closed forms, independently coded.
    r, bands = srp_planned_geometry(n)
    # r is the smallest integer with 4^r >= max(n, 2).
    assert 4 ** r >= max(n, 2)
    assert r == 1 or 4 ** (r - 1) < max(n, 2)
    # bands holds the recall target at the plan threshold:
    # 1 - (1 - p^r)^bands >= 1 - SRP_PLAN_MISS, and bands is minimal
    # (the closed form is a ceil, so bands-1 must miss the target up to
    # the 6-dp quantization the helper applies before the ceil).
    p = 1.0 - math.acos(SRP_PLAN_THRESHOLD) / math.pi
    recall = 1.0 - (1.0 - p ** r) ** bands
    assert recall >= 1.0 - SRP_PLAN_MISS - 1e-6
    if bands > 1:
        assert 1.0 - (1.0 - p ** r) ** (bands - 1) \
            < 1.0 - SRP_PLAN_MISS + 1e-4


def test_srp_planned_candidates_subquadratic():
    # The whole point of the plan: expected random candidate volume
    # bands * (n choose 2) / 2^r grows strictly SLOWER than n^2 —
    # check the measured growth exponent over three decades stays
    # below 2 (the fixed 8x4 geometry is exactly 2).
    import itertools
    ns = [10 ** 3, 10 ** 4, 10 ** 5, 10 ** 6]
    vols = []
    for n in ns:
        r, bands = srp_planned_geometry(n)
        vols.append(bands * n * (n - 1) / 2 / 2 ** r)
    for (n1, v1), (n2, v2) in itertools.pairwise(zip(ns, vols)):
        exponent = math.log(v2 / v1) / math.log(n2 / n1)
        assert exponent < 1.8, (n1, n2, exponent)


def test_ljung_box_reject_nullable_on_short_series(spark):
    # A 3-day series has fewer surviving lags than LB_MAX_LAG: the
    # df=7 critical value is wrong there, so reject_5pct must be NULL
    # while lb_q itself still reports.
    import pyspark.sql.functions as F

    from sigma_rx7_spark.operators.timeseries import ACF_EVENT, q_ts_ljung_box

    df = spark.createDataFrame(
        [(i, i, ACF_EVENT, float(10 + (i % 3)), "{}",
          f"2024-01-0{i + 1} 00:00:00") for i in range(3)],
        "event_id long, user_id long, event_type string, value double,"
        " props string, ts_s string",
    ).select("event_id", "user_id", "event_type", "value", "props",
             F.col("ts_s").cast("timestamp").alias("ts"))
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        for t in ("events",):
            df.write.mode("overwrite").parquet(f"{d}/{t}.parquet")
        row = q_ts_ljung_box(spark, d).collect()[0]
    assert row["n_lags"] < 7
    assert row["reject_5pct"] is None


def test_lpa_modularity_beats_brand_partition(spark, sf_dir):
    # The maximization half must beat the evaluation half's reference
    # labeling on its own objective: Q(LPA partition) >= Q(brand
    # partition) on the same co-purchase graph, both scored by an
    # independently-coded naive Python model.
    import collections

    from sigma_rx7_spark.io import load as load_table
    from sigma_rx7_spark.operators.graph import (
        copurchase_edges,
        q_graph_communities,
    )

    edges = copurchase_edges(load_table(spark, sf_dir, "lineitem"))
    und = sorted({(a, b) for a, b in
                  ((r["src"], r["dst"]) for r in edges.collect())
                  if a < b})
    m = len(und)
    assert m > 0

    def q_of(lab):
        ec = collections.Counter()
        dc = collections.Counter()
        for a, b in und:
            if lab[a] == lab[b]:
                ec[lab[a]] += 1
            dc[lab[a]] += 1
            dc[lab[b]] += 1
        return sum(ec.get(c, 0) / m - (dc[c] / (2 * m)) ** 2 for c in dc)

    lpa = {r["node"]: r["community"]
           for r in q_graph_communities(spark, sf_dir).collect()}
    brand = {r["p_partkey"]: r["p_brand"]
             for r in load_table(spark, sf_dir, "part")
             .select("p_partkey", "p_brand").collect()}
    assert q_of(lpa) >= q_of(brand) - 1e-12
