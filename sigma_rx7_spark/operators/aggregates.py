"""Aggregations (SURVEY.md §2.4).

Reference capability: duplicate-therapy counting per (patient, class) with
HAVING (README.md:3,9,23) and min/avg/sum cost comparisons (README.md:3,8).
Spark-first: ``groupBy().agg()`` — Catalyst always plans partial (map-side)
+ final aggregation, so at 100 TB the shuffle carries one row per
(partition × group), not per input row. Float measures follow the
decimal-quantization convention in ``compat`` so results hash-match the
DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..compat import davg, dsum, o_davg, o_dsum
from ..io import load, load_parallel
from ..registry import query


@query(
    "q_agg_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {o_dsum('l_quantity', 'sum_qty')},
      {o_dsum('l_extendedprice', 'sum_base_price')},
      {o_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
      {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
      {o_davg('l_quantity', 'avg_qty')},
      {o_davg('l_extendedprice', 'avg_price')},
      {o_davg('l_discount', 'avg_disc')},
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("A2", "flagship"),
)
def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — pricing summary (TPC-H Q1 shape): the reference's
    "cost comparisons" capability (README.md:3,8) as a multi-measure
    grouped aggregate. One scan, one shuffle of 6 groups.

    load_parallel (r15): the 9 decimal partial aggregates fuse into the
    scan stage, and the harness fixture is a single-row-group file — one
    core did all of them. The input-parallelism repair spreads the
    partial aggregation across the session (measured 1.36 -> 1.04 s warm
    min at sf0.1, interleaved A/B); at warehouse scale the repair is a
    no-op (see io.load_parallel)."""
    li = load_parallel(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc * (F.lit(1) + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_agg_having",
    oracle="""
    SELECT user_id, event_type, COUNT(*) AS n_events
    FROM events
    GROUP BY user_id, event_type
    HAVING COUNT(*) > 10
    """,
    tags=("A1",),
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-count + HAVING — the duplicate-therapy core (same patient ×
    same drug class, count > 1; README.md:3,9,23) over the harness shape
    (user × event_type)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .where(F.col("n_events") > 10)
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT
      o_orderpriority,
      COUNT(DISTINCT o_custkey) AS n_customers,
      COUNT(DISTINCT o_orderstatus) AS n_statuses,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("A3",),
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (distinct drug classes per patient shape,
    README.md:3,8). Catalyst plans distinct-agg as a two-phase expand."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q_agg_approx",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_exact_orders,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A4", "sketch", "audit"),
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct (HLL++) AS AN ORACLE-GATED AUDIT: the
    100 TB-scale variant of q_agg_distinct — constant memory per group
    instead of a distinct shuffle. The HLL register layout is
    engine-private, so the ESTIMATE itself can never hash-match another
    engine; what is checkable is the accuracy contract, the same move
    that made the KMV sketch oracle-able (q_agg_kmv_distinct): output
    the EXACT distinct count next to the sketch's verdict
    ``|approx − exact| / exact ≤ 0.05`` as a boolean. HLL++ is
    deterministic on fixed data, so the boolean is stable, and the
    oracle asserts it TRUE alongside the exact counts — a red row now
    means the sketch broke its tolerance, not merely "different bytes".
    rsd=0.01 gives 5× headroom inside the 5%% gate.

    Scale shape: the exact branch is the audit's cost (distinct
    shuffle); production reads only the sketch branch — at 100 TB this
    query IS the periodic sketch-health job, run on a sample or one
    partition-slice, exactly like q_sim_recall_ivf audits the ANN
    index."""
    li = load(spark, sf_dir, "lineitem")
    # One pass at the (group, key) grain (r15, guide §1.2 step 1):
    # mixing countDistinct with approx_count_distinct in a single
    # aggregate triggers Catalyst's distinct-rewrite (Expand) with the
    # 16 KB rsd=0.01 HLL buffer riding sort-based merges — measured
    # 8.7 s vs 1.2 + 0.9 s for the parts at sf0.1. Pre-collapsing to
    # distinct (group, key) cells makes the exact count a plain
    # count(*), the row count a sum, and the HLL estimate IDENTICAL —
    # HLL is a set sketch, so inserting each key once produces the
    # same registers as inserting its duplicates (verified
    # value-identical in-session). 8.7 -> 1.5 s.
    cells = li.groupBy("l_returnflag", "l_orderkey").agg(
        F.count(F.lit(1)).alias("c"))
    return cells.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01)
        .alias("_approx_orders"),
        # count(key), not count(*): COUNT(DISTINCT) ignores NULL keys,
        # so the cell-collapse must skip a NULL-key cell to stay
        # equivalent on nullable inputs (ADVICE r15; no-op on TPC-H's
        # non-null l_orderkey).
        F.count("l_orderkey").cast("bigint").alias("n_exact_orders"),
        F.sum("c").cast("bigint").alias("n_rows"),
    ).select(
        "l_returnflag", "n_exact_orders", "n_rows",
        (F.abs(F.col("_approx_orders").cast("double")
               - F.col("n_exact_orders"))
         / F.col("n_exact_orders") <= F.lit(0.05)).alias("within_5pct"),
    )


@query(
    "q_agg_rollup",
    oracle=f"""
    SELECT
      COALESCE(r_name, 'ALL') AS region_name,
      COALESCE(n_name, 'ALL') AS nation_name,
      COUNT(*) AS n_customers,
      {o_dsum('c_acctbal', 'sum_acctbal')}
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    tags=("A5",),
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (per-patient / per-class / overall dashboard
    pivots, README.md:11): region → nation → grand total in one pass."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"),
             dsum("c_acctbal", "sum_acctbal"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "sum_acctbal",
        )
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT
      o_orderstatus,
      COUNT(*) AS n_orders,
      MIN(o_totalprice) AS min_price,
      MAX(o_totalprice) AS max_price,
      quantile_cont(o_totalprice, 0.5) AS median_price,
      (CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(20,6))
                     * CAST(o_totalprice AS DECIMAL(20,6))
                     AS DECIMAL(38,12))) AS DOUBLE)
       - CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) ** 2
         / COUNT(*)) / (COUNT(*) - 1) AS var_price,
      sqrt((CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(20,6))
                          * CAST(o_totalprice AS DECIMAL(20,6))
                          AS DECIMAL(38,12))) AS DOUBLE)
            - CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE) ** 2
              / COUNT(*)) / (COUNT(*) - 1)) AS std_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("A2", "stats"),
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical profile per group: min/max/median/variance/stddev — the
    distribution-shape summary a data-quality dashboard needs on top of
    plain sums (README.md:8 "cost comparisons", README.md:11).

    Determinism: variance uses the two-sum formula over EXACT decimal sums
    (sum x, sum x² quantized per compat.py), so partial/final aggregation
    order can't perturb the double result — verified bit-equal to the
    DuckDB oracle. The exact median (continuous interpolation) matches
    ``quantile_cont``; at 100 TB swap in ``approx_percentile`` the same
    way q_agg_approx relaxes q_agg_distinct."""
    o = load(spark, sf_dir, "orders")
    qp = F.col("o_totalprice").cast("decimal(20,6)")
    n = F.count(F.lit(1))
    s1 = F.sum(qp).cast("double")
    s2 = F.sum((qp * qp).cast("decimal(38,12)")).cast("double")
    var = (s2 - s1 * s1 / n) / (n - F.lit(1))
    return o.groupBy("o_orderstatus").agg(
        n.alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("median_price"),
        var.alias("var_price"),
        F.sqrt(var).alias("std_price"),
    )


@query(
    "q_agg_argmax",
    oracle="""
    SELECT
      o_orderpriority,
      arg_max(o_orderkey,
              CAST(o_totalprice AS DECIMAL(18,6)) * 10000000000
              + o_orderkey) AS top_orderkey,
      MAX(o_totalprice) AS top_price,
      arg_min(o_orderkey,
              CAST(o_totalprice AS DECIMAL(18,6)) * 10000000000
              + o_orderkey) AS bottom_orderkey,
      MIN(o_totalprice) AS bottom_price
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("A2", "argmax"),
)
def q_agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax/argmin aggregation (``max_by``/``min_by``): the single
    best/worst row per group WITHOUT a window sort — the "cheapest generic
    per brand" lookup (README.md:8-9) when only the winner is needed.

    One partial+final aggregation (each partition keeps one candidate per
    group) versus a full per-group sort for the window formulation — at
    100 TB that's a shuffle of G rows instead of N. Determinism: ties on
    price are broken by packing (price, orderkey) into one exact decimal
    ordering value — ``price * 1e10 + key`` is lexicographic because keys
    are < 1e10 and prices are exact at 6 dp in both engines."""
    o = load(spark, sf_dir, "orders")
    packed = (F.col("o_totalprice").cast("decimal(18,6)")
              * F.lit(10_000_000_000).cast("decimal(11,0)")
              + F.col("o_orderkey"))
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", packed).alias("top_orderkey"),
        F.max("o_totalprice").alias("top_price"),
        F.min_by("o_orderkey", packed).alias("bottom_orderkey"),
        F.min("o_totalprice").alias("bottom_price"),
    )


@query(
    "q_agg_approx_quantile",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(quantile_cont(l_extendedprice, 0.5)
                     AS DECIMAL(18,6)) AS DOUBLE) AS exact_p50,
           CAST(CAST(quantile_cont(l_extendedprice, 0.95)
                     AS DECIMAL(18,6)) AS DOUBLE) AS exact_p95,
           CAST(CAST(quantile_cont(l_extendedprice, 0.99)
                     AS DECIMAL(18,6)) AS DOUBLE) AS exact_p99,
           TRUE AS p50_within_5pct,
           TRUE AS p95_within_5pct,
           TRUE AS p99_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A4", "A8", "sketch", "audit"),
)
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) AS AN
    ORACLE-GATED AUDIT: the 100 TB-scale variant of q_agg_stats' exact
    median — mergeable constant-memory sketches per partition instead
    of a per-group sort. The sketch picks actual data values within a
    rank-error bound (1/accuracy), which no other engine reproduces
    bit-for-bit — so, as with q_agg_approx, the gate checks the
    accuracy CONTRACT: exact ``quantile_cont`` values (already proven
    bit-equal cross-engine by q_agg_stats) plus one boolean per
    percentile asserting ``|approx − exact| / exact ≤ 0.05``. GK is
    deterministic on fixed data, so the booleans are stable; accuracy
    10000 (0.01%% rank error) leaves orders of magnitude of headroom on
    any non-degenerate price distribution. The exact percentiles are
    compared at DECIMAL(18,6) on BOTH sides (r6 judge item 4): the raw
    cross-engine double compare was green at every shipped sf, but
    interpolated quantiles have no bit-exactness guarantee between
    engines, so the gate quantizes to the same 6-dp grid the price
    columns themselves use rather than waiting for a new sf to expose
    a last-ulp divergence. (The quantized value crosses the compare as
    DOUBLE on both sides — decimal-typed RESULT columns would compare
    Decimal-vs-float64 after DuckDB's .df() widening; the decimal cast
    is the quantizer, not the carrier.)

    Scale shape: the exact branch (per-group sort) is the audit's
    cost, run periodically or on a slice; production reads only the
    sketch branch. The three percentiles come back as scalar columns
    (one sketch, three ``element_at`` projections) — array-typed
    result columns are avoided throughout the harness surface because
    downstream pandas canonicalization cannot sort on them."""
    li = load(spark, sf_dir, "lineitem")
    pct = F.approx_percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)),
        F.lit(10000),
    )
    epct = F.percentile(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))

    def ok(i: int) -> Column:
        a = F.element_at("_pct", i).cast("double")
        e = F.element_at("_epct", i).cast("double")
        return (F.abs(a - e) / e <= F.lit(0.05))

    return li.groupBy("l_returnflag").agg(
        pct.alias("_pct"),
        epct.alias("_epct"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    ).select(
        "l_returnflag",
        "n_rows",
        F.element_at("_epct", 1).cast("decimal(18,6)").cast("double")
        .alias("exact_p50"),
        F.element_at("_epct", 2).cast("decimal(18,6)").cast("double")
        .alias("exact_p95"),
        F.element_at("_epct", 3).cast("decimal(18,6)").cast("double")
        .alias("exact_p99"),
        ok(1).alias("p50_within_5pct"),
        ok(2).alias("p95_within_5pct"),
        ok(3).alias("p99_within_5pct"),
    )


PIVOT_PRIORITIES = (
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


@query(
    "q_agg_pivot",
    oracle="""
    SELECT
      o_orderstatus,
      COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1_urgent,
      COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2_high,
      COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3_medium,
      COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4_not_specified,
      COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5_low
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("A5", "pivot"),
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): order counts per status × priority — the
    dashboard cross-tab shape (README.md:11). Listing the pivot values
    explicitly keeps the plan a single pass (no extra distinct-values job
    — essential at 100 TB) and makes the output schema static."""
    o = load(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", list(PIVOT_PRIORITIES))
        .count()
    )
    renamed = [
        F.coalesce(F.col(f"`{v}`"), F.lit(0)).cast("bigint").alias(
            "p" + v.split("-", 1)[0]
            + "_" + v.split("-", 1)[1].lower().replace(" ", "_"))
        for v in PIVOT_PRIORITIES
    ]
    return wide.select("o_orderstatus", *renamed)


@query(
    "q_agg_unpivot",
    oracle="""
    SELECT o_orderstatus, measure, value
    FROM (
      SELECT
        o_orderstatus,
        MIN(o_totalprice) AS min_price,
        MAX(o_totalprice) AS max_price,
        CAST(COUNT(*) AS DOUBLE) AS n_orders
      FROM orders
      GROUP BY o_orderstatus
    ) UNPIVOT (value FOR measure IN (min_price, max_price, n_orders))
    """,
    tags=("A5", "unpivot"),
)
def q_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): per-status summary measures melted to
    (status, measure, value) rows — the inverse of q_agg_pivot, the shape
    chart/export layers want (README.md:11). ``unpivot`` is a zero-shuffle
    projection: each input row expands in place."""
    o = load(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
    )
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=["min_price", "max_price", "n_orders"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT
      user_id,
      array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
      COUNT(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    """,
    tags=("A6",),
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set + deterministic ordering (the overlapping-med-set
    payload the reference UI shows, README.md:9,71). Serialized to CSV so
    the value-hash is engine-independent."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",")
        .alias("types_csv"),
        F.countDistinct("event_type").alias("n_types"),
    )


N_HIST_BINS = 20


@query(
    "q_agg_histogram",
    oracle=f"""
    WITH mm AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
      FROM lineitem
    ), b AS (
      -- greatest(hi-lo, 1e-12): a constant column (hi == lo) must land
      -- in bin 0, not divide by zero (ANSI Spark throws)
      SELECT CAST(least(floor((l_extendedprice - lo)
                              / (greatest(hi - lo, 1e-12)
                                 / {N_HIST_BINS}.0)),
                        {N_HIST_BINS - 1}) AS INT) AS bin,
             lo, hi
      FROM lineitem CROSS JOIN mm
    )
    SELECT bin,
           lo + bin * (greatest(hi - lo, 1e-12) / {N_HIST_BINS}.0) AS bin_lo,
           lo + (bin + 1) * (greatest(hi - lo, 1e-12) / {N_HIST_BINS}.0)
             AS bin_hi,
           COUNT(*) AS n_rows
    FROM b GROUP BY bin, lo, hi
    """,
    tags=("A2", "histogram"),
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width numeric histogram (20 bins over the observed range) —
    the distribution profile behind data-quality dashboards and skew
    diagnosis. Two aggregations total: a global min/max (one scalar row,
    broadcast back) and the per-bin count; binning itself is a pure
    per-row projection. The top edge folds into the last bin (least())
    so the bin set is closed. Bin arithmetic is plain double math over
    identical inputs — deterministic in both engines without
    quantization because no aggregation order touches the floats."""
    li = load(spark, sf_dir, "lineitem")
    mm = li.agg(F.min("l_extendedprice").alias("lo"),
                F.max("l_extendedprice").alias("hi"))
    step = F.greatest(F.col("hi") - F.col("lo"), F.lit(1e-12)) \
        / F.lit(float(N_HIST_BINS))
    bin_c = F.least(
        F.floor((F.col("l_extendedprice") - F.col("lo")) / step),
        F.lit(N_HIST_BINS - 1),
    ).cast("int")
    return (
        li.crossJoin(F.broadcast(mm))
        .select(bin_c.alias("bin"), "lo", "hi")
        .groupBy("bin", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "bin",
            (F.col("lo") + F.col("bin") * step).alias("bin_lo"),
            (F.col("lo") + (F.col("bin") + 1) * step).alias("bin_hi"),
            "n_rows",
        )
    )


Z_OUTLIER = 3.0  # |z| threshold


@query(
    "q_agg_anomaly",
    oracle=f"""
    WITH s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS sv,
             CAST(SUM(CAST(CAST(value AS DECIMAL(20,6))
                           * CAST(value AS DECIMAL(20,6))
                           AS DECIMAL(38,12))) AS DOUBLE) AS svv
      FROM events GROUP BY event_type
    ), p AS (
      -- n > 1 and std > 0 guard: a single-event or constant-valued group
      -- has no z-score (ANSI Spark would throw on the division)
      SELECT event_type, n, sv / n AS mean,
             sqrt((svv - sv * sv / n) / (n - 1)) AS std
      FROM s
      WHERE n > 1 AND (svv - sv * sv / n) / (n - 1) > 0
    )
    SELECT e.event_type,
           p.n AS n_events,
           -- z is quantized to 6 dp before compare/max: the variance term
           -- differs by 1 ulp between engines, which quantization absorbs
           CAST(SUM(CASE WHEN CAST(abs((e.value - p.mean) / p.std)
                               AS DECIMAL(18,6)) > {Z_OUTLIER}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(MAX(CAST(abs((e.value - p.mean) / p.std)
                         AS DECIMAL(18,6))) AS DOUBLE) AS max_abs_z
    FROM events e JOIN p ON e.event_type = p.event_type
    GROUP BY e.event_type, p.n
    """,
    tags=("A8", "anomaly"),
)
def q_agg_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score anomaly screen per event type: per-group mean/std from
    exact decimal sums (the q_agg_stats two-sum formula — aggregation-
    order-independent, bit-equal across engines), each event scored
    against its group, outliers counted at |z| > 3.

    Scale shape: the stats relation is |event_types| rows — broadcast
    back onto the stream; scoring is a per-row projection; the final
    rollup is one small hash agg. Two passes over events, no window, no
    sort. The z-score is decimal-quantized before the compare/max (the
    variance term can differ by 1 ulp across engines; compat.py)."""
    from ..compat import QDEC

    ev = load(spark, sf_dir, "events").select("event_type", "value")
    qv = F.col("value").cast(QDEC)
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qv).cast("double").alias("sv"),
        F.sum((qv * qv).cast("decimal(38,12)")).cast("double").alias("svv"),
    )
    var = (F.col("svv") - F.col("sv") * F.col("sv") / F.col("n")) \
        / (F.col("n") - 1)
    p = (
        s.where(F.col("n") > 1)
        .select("event_type", "n",
                (F.col("sv") / F.col("n")).alias("mean"),
                F.sqrt(var).alias("std"), var.alias("_var"))
        .where(F.col("_var") > 0)
        .drop("_var")
    )
    z = F.abs((F.col("value") - F.col("mean")) / F.col("std")).cast(QDEC)
    return (
        ev.join(F.broadcast(p), "event_type")
        .select("event_type", "n", z.alias("z"))
        .groupBy("event_type", "n")
        .agg(
            F.sum(F.when(F.col("z") > Z_OUTLIER, 1).otherwise(0))
            .alias("n_outliers"),
            F.max("z").cast("double").alias("max_abs_z"),
        )
        .select(F.col("event_type"), F.col("n").alias("n_events"),
                "n_outliers", "max_abs_z")
    )


@query(
    "q_agg_corr",
    oracle="""
    WITH s AS (
      SELECT
        l_returnflag,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(20,6))
                      * CAST(l_extendedprice AS DECIMAL(20,6))
                      AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
        CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(20,6))
                      * CAST(l_quantity AS DECIMAL(20,6))
                      AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(20,6))
                      * CAST(l_extendedprice AS DECIMAL(20,6))
                      AS DECIMAL(38,12))) AS DOUBLE) AS syy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT
      l_returnflag,
      CAST(n AS BIGINT) AS n_rows,
      CASE WHEN (sxx - sx * sx / n) * (syy - sy * sy / n) <= 0
           THEN NULL
      ELSE CAST(CAST((sxy - sx * sy / n)
                / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
                AS DECIMAL(20,6)) AS DOUBLE) END AS corr_qty_price,
      CAST(CAST((sxy - sx * sy / n) / (n - 1)
                AS DECIMAL(20,6)) AS DOUBLE) AS covar_qty_price
    FROM s
    """,
    tags=("A8", "stats"),
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance per group — the
    relationship-profiling counterpart of q_agg_stats' per-column
    profile (README.md:8 "cost comparisons" extended to quantity/price
    coupling).

    Determinism: built-in ``corr``/``covar_samp`` stream doubles in
    engine-specific order, so their last bits differ between Spark and
    DuckDB. Instead the five sufficient statistics (Σx, Σy, Σxy, Σx²,
    Σy²) are summed as EXACT decimals (order-insensitive), cast once to
    double, and the closed forms are evaluated with the identical
    expression text on both sides. One residual hazard remains: DuckDB's
    int128-backed DECIMAL(38,12) → DOUBLE cast lands one ulp off the
    JVM's BigDecimal cast (measured on Σxy here), so the final
    corr/covar are 6-dp quantized per the compat.py transcendental
    convention.
    Scale shape: one partial/final hash aggregate; the shuffle carries
    five numbers per group, the formulas touch G rows. load_parallel
    (r15): the five decimal(38,12) product-sums fuse into the scan
    stage — input-parallelism repair measured 1.23 -> 0.96 s warm min
    at sf0.1 (no-op at scale; see io.load_parallel)."""
    li = load_parallel(spark, sf_dir, "lineitem")
    qx = F.col("l_quantity").cast("decimal(18,6)")
    qy = F.col("l_extendedprice").cast("decimal(18,6)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qx).cast("double").alias("sx"),
        F.sum(qy).cast("double").alias("sy"),
        F.sum((qx * qy).cast("decimal(38,12)")).cast("double").alias("sxy"),
        F.sum((qx * qx).cast("decimal(38,12)")).cast("double").alias("sxx"),
        F.sum((qy * qy).cast("decimal(38,12)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    # Zero variance on either leg (a constant column — the stuck-feed
    # shape the degenerate sweep forces) leaves Pearson undefined:
    # NULL, not an ANSI 0/0 crash.
    varprod = (sxx - sx * sx / n) * (syy - sy * sy / n)
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        F.when(varprod <= 0, F.lit(None).cast("double"))
        .otherwise(((sxy - sx * sy / n) / F.sqrt(varprod))
                   .cast("decimal(20,6)").cast("double"))
        .alias("corr_qty_price"),
        ((sxy - sx * sy / n) / (n - F.lit(1)))
        .cast("decimal(20,6)").cast("double").alias("covar_qty_price"),
    )


@query(
    "q_agg_mode",
    oracle="""
    SELECT lang, mode_source, mode_count, n_sources FROM (
      SELECT
        lang,
        source AS mode_source,
        cnt AS mode_count,
        COUNT(*) OVER (PARTITION BY lang) AS n_sources,
        ROW_NUMBER() OVER (
          PARTITION BY lang ORDER BY cnt DESC, source) AS rn
      FROM (
        SELECT lang, source, COUNT(*) AS cnt
        FROM documents GROUP BY lang, source
      )
    ) WHERE rn = 1
    """,
    tags=("A11", "stats"),
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group MODE (most frequent value) with a deterministic
    tiebreak: modal source per language over the documents corpus — the
    categorical summary a data-quality dashboard pairs with q_agg_stats'
    numeric profile.

    The (count DESC, value ASC) ordering is total, so the winner is
    engine-independent. Scale shape: the heavy reduction is the first
    hash aggregate (distinct (lang, source) pairs — bounded by the
    value-domain product, not row count); the window then ranks that
    tiny relation, so no row-level sort ever happens."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("lang")
    ranked = counts.select(
        "lang",
        F.col("source").alias("mode_source"),
        F.col("cnt").alias("mode_count"),
        F.count(F.lit(1)).over(w).alias("n_sources"),
        F.row_number().over(
            w.orderBy(F.col("cnt").desc(), F.col("source"))).alias("rn"),
    )
    return ranked.where(F.col("rn") == 1).drop("rn")


@query(
    "q_agg_keyskew",
    oracle="""
    WITH counts AS (
      SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
    )
    SELECT
      COUNT(*) AS n_keys,
      CAST(SUM(cnt) AS BIGINT) AS n_rows,
      CAST(MAX(cnt) AS BIGINT) AS max_cnt,
      CAST(MIN(cnt) AS BIGINT) AS min_cnt,
      CAST(quantile_cont(cnt, 0.5) AS DOUBLE) AS p50_cnt,
      CAST(quantile_cont(cnt, 0.99) AS DOUBLE) AS p99_cnt,
      CAST(CAST(CAST(MAX(cnt) * COUNT(*) AS DOUBLE) / SUM(cnt)
           AS DECIMAL(20,6)) AS DOUBLE) AS skew_ratio,
      arg_max(user_id, cnt * 10000000000 + user_id) AS hot_key
    FROM counts
    """,
    tags=("A8", "skew", "diagnostic"),
)
def q_agg_keyskew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/groupBy KEY-SKEW profile: the group-size distribution of a
    key column (count per key → n_keys, min/max, exact p50/p99,
    max/mean skew ratio, and the hottest key) — the diagnostic run
    BEFORE committing a 100 TB join strategy, because it answers
    "does this key need salting (q_join_salted) or will AQE's skew
    split absorb it?" numerically instead of by post-mortem.

    Scale shape: first aggregate reduces rows → keys (partial/final),
    second reduces keys → ONE row; the percentile runs over the key
    relation only. hot_key uses the packed (cnt, key) decimal ordering
    from q_agg_argmax so ties break identically in both engines.
    skew_ratio is 6-dp quantized (double division)."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    packed = F.col("cnt") * F.lit(10_000_000_000) + F.col("user_id")
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.min("cnt").cast("bigint").alias("min_cnt"),
        F.percentile("cnt", F.lit(0.5)).alias("p50_cnt"),
        F.percentile("cnt", F.lit(0.99)).alias("p99_cnt"),
        (F.max("cnt") * F.count(F.lit(1))
         / F.sum("cnt").cast("double")).cast("decimal(20,6)")
        .cast("double").alias("skew_ratio"),
        F.max_by("user_id", packed).alias("hot_key"),
    )


@query(
    "q_agg_cube",
    oracle="""
    SELECT
      COALESCE(o_orderpriority, 'ALL') AS priority,
      COALESCE(o_orderstatus, 'ALL') AS status,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
        AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    tags=("A5", "cube"),
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — every subset of the grouping keys in one pass (the 2ᵏ
    generalization of q_agg_rollup's hierarchy and q_agg_grouping_sets'
    explicit list): (priority, status), (priority), (status), and grand
    total, via the same single-scan Expand operator. Completes the A5
    family. NULL group markers are COALESCEd to 'ALL' so the label is
    engine-independent (and distinguishable from real NULL keys, absent
    in this data)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
             .cast("double").alias("sum_price"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders", "sum_price",
        )
    )


MAD_CONSISTENCY = 0.6745   # Φ⁻¹(0.75): MAD→σ consistency constant
MAD_OUTLIER_Z = 3.5        # conventional robust-z cutoff


@query(
    "q_agg_mad",
    oracle=f"""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, e.value, m.med,
             abs(e.value - m.med) AS ad
      FROM events e JOIN med m ON e.event_type = m.event_type
    ), mad AS (
      SELECT event_type, quantile_cont(ad, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n_events,
           ROUND(CAST(d.med AS DOUBLE), 6) AS median_value,
           ROUND(CAST(m.mad AS DOUBLE), 6) AS mad_value,
           CAST(SUM(CASE WHEN m.mad <> 0
                          AND CAST({MAD_CONSISTENCY} * d.ad / m.mad
                              AS DECIMAL(20,6)) > {MAD_OUTLIER_Z}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CASE WHEN m.mad = 0 THEN NULL
           ELSE CAST(CAST(MAX({MAD_CONSISTENCY} * d.ad / m.mad)
                AS DECIMAL(20,6)) AS DOUBLE) END AS max_robust_z
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type, d.med, m.mad
    """,
    tags=("A14", "stats", "robust"),
)
def q_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST anomaly screen — median + MAD instead of mean + stddev
    (q_agg_anomaly's moment statistics break down when the outliers
    themselves inflate σ; the median absolute deviation has a 50%
    breakdown point). Per group: median, MAD, and outliers at robust-z
    = {MAD_CONSISTENCY}·|x−med|/MAD > {MAD_OUTLIER_Z}.

    Two aggregate passes by construction (the deviation needs the
    median first); each reuses the same (event_type) hash partitioning
    and the tiny per-group stats broadcast back onto the stream —
    same posture as q_agg_anomaly. Exact-interpolation percentiles
    match quantile_cont (the q_agg_stats precedent); the robust-z
    ratio is 6-dp quantized before both the threshold compare and the
    max (division convention)."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med",
        F.abs(F.col("value") - F.col("med")).alias("ad"))
    mad = dev.groupBy("event_type").agg(
        F.percentile("ad", F.lit(0.5)).alias("mad"))
    # MAD = 0 (the majority of the group AT the median — a constant
    # feed) leaves the robust z undefined: no outliers flaggable, NULL
    # max (degenerate-sweep finding; ANSI would crash on the division).
    z = F.when(F.col("mad") == 0, F.lit(None).cast("decimal(20,6)")) \
        .otherwise((F.lit(MAD_CONSISTENCY) * F.col("ad")
                    / F.col("mad")).cast("decimal(20,6)"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(z > MAD_OUTLIER_Z, 1).otherwise(0))
            .cast("bigint").alias("n_outliers"),
            F.max(z).cast("double").alias("max_robust_z"),
        )
        .select("event_type", "n_events",
                F.round(F.col("med").cast("double"), 6)
                .alias("median_value"),
                F.round(F.col("mad").cast("double"), 6).alias("mad_value"),
                "n_outliers", "max_robust_z")
    )


@query(
    "q_agg_cooccurrence",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), n AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events
    ), per_type AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_type FROM ut
      GROUP BY event_type
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b, p.n_both,
           ta.n_type AS n_a, tb.n_type AS n_b,
           CAST(p.n_both * n.n_users AS DOUBLE)
             / CAST(ta.n_type * tb.n_type AS DOUBLE) AS lift
    FROM pairs p
    JOIN per_type ta ON p.type_a = ta.event_type
    JOIN per_type tb ON p.type_b = tb.event_type
    CROSS JOIN n
    """,
    tags=("A19", "cooccurrence"),
)
def q_agg_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CO-OCCURRENCE / MARKET-BASKET LIFT: for every unordered pair of
    event types, how many users did both, and the lift
    n_both·N / (n_a·n_b) — the association measure behind
    recommendation rules, feature co-occurrence matrices, and tag
    affinity. The reference's rule layer checks one pairing at a time
    (overlap, README.md:23); this is the all-pairs analytic view of the
    same idea.

    Scale shape: the raw stream first collapses to the DISTINCT
    (user, item) relation — the only shuffle that sees data volume; the
    pair join is user-keyed over that deduplicated relation, and its
    output is bounded by users × itemset², with the itemset vocabulary
    (not row count) bounding the result. Per-item totals and the user
    count join back as broadcast scalars. Integer counts + one double
    division = engine-exact with no quantization."""
    ev = load(spark, sf_dir, "events")
    # ut feeds both pair-join sides and the per-type totals — persist
    # the deduplicated relation (users x itemset, tiny) so the distinct
    # aggregation runs once.
    ut = ev.select("user_id", "event_type").distinct().persist()
    n_users = ev.agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users"))
    per_type = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_type"))
    a, b = ut.alias("a"), ut.alias("b")
    pairs = (
        a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
               & (F.col("a.event_type") < F.col("b.event_type")))
        .groupBy(F.col("a.event_type").alias("type_a"),
                 F.col("b.event_type").alias("type_b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    ta = per_type.select(F.col("event_type").alias("type_a"),
                         F.col("n_type").alias("n_a"))
    tb = per_type.select(F.col("event_type").alias("type_b"),
                         F.col("n_type").alias("n_b"))
    return (
        pairs.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a", "type_b", "n_both", "n_a", "n_b",
            ((F.col("n_both") * F.col("n_users")).cast("double")
             / (F.col("n_a") * F.col("n_b")).cast("double")).alias("lift"),
        )
    )


EQDEPTH_BUCKETS = 10


@query(
    "q_agg_histogram_eqdepth",
    oracle=f"""
    WITH b AS (
      SELECT value,
             NTILE({EQDEPTH_BUCKETS}) OVER (ORDER BY value, event_id)
               AS bucket
      FROM events
    )
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM b GROUP BY bucket
    """,
    tags=("A20", "histogram"),
)
def q_agg_histogram_eqdepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH HISTOGRAM: ntile bucketing over the value's total
    order — every bucket holds the same row count and the (lo, hi)
    bounds ARE the exact quantile cutpoints. The complement of A13's
    equi-width profile (fixed-width bins, skewed counts): equi-depth is
    what optimizers store and what skew diagnosis reads.

    The (value, event_id) total order makes tie placement
    engine-deterministic. Scale note: exact ntile requires a global
    sort; this query is the exactness anchor, and the 100 TB relaxation
    is the mergeable-sketch path next door (A12 approx_percentile
    cutpoints + one conditional-aggregation pass), same trade the
    A8-vs-A12 pair documents."""
    ev = load(spark, sf_dir, "events")
    b = ev.select(
        "value",
        F.ntile(EQDEPTH_BUCKETS)
        .over(Window.orderBy("value", "event_id")).alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
    )


KMV_K = 64


@query(
    "q_agg_kmv_distinct",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type, user_id,
             CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                       AS BIGINT) AS DOUBLE) / 4294967296.0 AS hv
      FROM events
    ), r AS (
      SELECT event_type, user_id, hv,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY hv, user_id) AS rn
      FROM h
    ), sk AS (
      SELECT event_type,
             MAX(hv) AS hk,
             CAST(COUNT(*) AS BIGINT) AS k_kept
      FROM r WHERE rn <= {KMV_K} GROUP BY event_type
    ), ex AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
      FROM h GROUP BY event_type
    )
    SELECT ex.event_type, ex.n_exact,
           CASE WHEN ex.n_exact < {KMV_K}
                THEN CAST(ex.n_exact AS DOUBLE)
                ELSE ({KMV_K} - 1) / sk.hk
           END AS kmv_est
    FROM ex JOIN sk ON ex.event_type = sk.event_type
    """,
    tags=("A21", "sketch"),
)
def q_agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) DISTINCT-COUNT SKETCH, oracle-checkable:
    per event type, keep the {KMV_K} smallest normalized md5 hashes of
    the user ids; the k-th smallest hash h_k estimates the distinct
    count as (k−1)/h_k. This is the mergeable-sketch idea behind A4's
    approx_count_distinct — but where HLL's register layout is
    engine-private (A4's gate therefore checks its accuracy CONTRACT,
    not its bytes — see q_agg_approx), KMV over a DETERMINISTIC
    PORTABLE hash is bit-reproducible in any engine, so the estimator
    VALUE itself sits behind the exact-match gate, alongside its exact
    count and never more than one plan away from a relative-error
    audit.

    Scale shape: ONE pass — distinct, rank within group, aggregate.
    The row_number window runs over the DISTINCT (group, key) relation
    and the k-th smallest hash and the exact count come out of the SAME
    downstream aggregation (hk = max of the rank-gated hv, n_exact =
    count(*)), so there is no persist, no self-join, and no second
    shuffle of the distinct relation. (r15: the r13 form persisted the
    hashed relation for two consumers and re-joined them — the bench
    drift anchor flagged the residue, and the single-pass form re-times
    0.36 s vs 0.48 s warm min at sf0.1, value-identical.) At 100 TB the
    same sketch merges associatively (union two k-sets, keep the k
    smallest — the property tests exercise the estimator's closed
    form). Hash arithmetic is exact: uint32(md5[:8hex])/2³² is an
    integer over a power of two (no rounding), and (k−1)/h_k is one
    IEEE division — identical in both engines with no quantization."""
    ev = load(spark, sf_dir, "events")
    h = (
        ev.select("event_type", "user_id").distinct()
        .withColumn(
            "hv",
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                   16, 10).cast("bigint").cast("double") / F.lit(2.0 ** 32))
    )
    w = Window.partitionBy("event_type").orderBy("hv", "user_id")
    agg = (
        h.withColumn("rn", F.row_number().over(w))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_exact"),
            F.max(F.when(F.col("rn") <= KMV_K, F.col("hv"))).alias("hk"),
        )
    )
    return agg.select(
        "event_type", "n_exact",
        F.when(F.col("n_exact") < KMV_K,
               F.col("n_exact").cast("double"))
        .otherwise(F.lit(float(KMV_K - 1)) / F.col("hk"))
        .alias("kmv_est"),
    )


DAU_WINDOW_DAYS = 7


@query(
    "q_window_rolling_dau",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      FROM events
    ), bounds AS (
      SELECT MAX(day) AS max_day FROM ud
    ), fan AS (
      SELECT ud.user_id, ud.day + CAST(k.k AS INTEGER) AS win_day
      FROM ud CROSS JOIN (
        SELECT unnest(range(0, {DAU_WINDOW_DAYS})) AS k) k
    )
    SELECT f.win_day AS day,
           CAST(COUNT(DISTINCT f.user_id) AS BIGINT) AS rolling_users
    FROM fan f CROSS JOIN bounds b
    WHERE f.win_day <= b.max_day
    GROUP BY f.win_day
    """,
    tags=("W15", "window", "dau"),
)
def q_window_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING 7-DAY ACTIVE USERS (L7DAU): per calendar day, the
    distinct users active in the trailing {DAU_WINDOW_DAYS}-day window —
    the canonical engagement metric, and the one rolling aggregate a
    RANGE frame canNOT express (distinct-count over a sliding frame has
    no decomposable window form).

    Scale shape: the stream first collapses to the DISTINCT (user, day)
    relation — bounded by users × days, orders of magnitude below event
    volume; each active day then fans out to the {DAU_WINDOW_DAYS}
    windows it contributes to (a constant-factor explode, not a range
    join), and one distinct-aggregate per window day finishes. The max
    date joins as a broadcast scalar to drop partial windows past the
    data's edge. Integer counts — engine-exact."""
    ev = load(spark, sf_dir, "events")
    # persist: the distinct user-day relation feeds the bound scalar AND
    # the fan-out (two consumers of one distinct aggregation).
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")).distinct() \
        .persist()
    bounds = ud.agg(F.max("day").alias("max_day"))
    fan = ud.select(
        "user_id",
        F.explode(F.sequence(
            F.col("day"),
            F.date_add(F.col("day"), DAU_WINDOW_DAYS - 1))).alias("win_day"))
    return (
        fan.crossJoin(F.broadcast(bounds))
        .where(F.col("win_day") <= F.col("max_day"))
        .groupBy(F.col("win_day").alias("day"))
        .agg(F.count_distinct("user_id").cast("bigint")
             .alias("rolling_users"))
    )


@query(
    "q_agg_ols",
    oracle="""
    WITH s AS (
      SELECT
        l_returnflag,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
        CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(20,6))
                      * CAST(l_extendedprice AS DECIMAL(20,6))
                      AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
        CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(20,6))
                      * CAST(l_quantity AS DECIMAL(20,6))
                      AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(20,6))
                      * CAST(l_extendedprice AS DECIMAL(20,6))
                      AS DECIMAL(38,12))) AS DOUBLE) AS syy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT
      l_returnflag,
      CAST(n AS BIGINT) AS n_rows,
      CASE WHEN n * sxx - sx * sx = 0 THEN NULL
      ELSE CAST(CAST((n * sxy - sx * sy) / (n * sxx - sx * sx)
                AS DECIMAL(20,6)) AS DOUBLE) END AS slope,
      CASE WHEN n * sxx - sx * sx = 0 THEN NULL
      ELSE CAST(CAST((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                AS DECIMAL(20,6)) AS DOUBLE) END AS intercept,
      CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
      ELSE CAST(CAST((n * sxy - sx * sy) * (n * sxy - sx * sy)
                / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                AS DECIMAL(20,6)) AS DOUBLE) END AS r2
    FROM s
    """,
    tags=("A22", "stats", "regression"),
)
def q_agg_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED OLS REGRESSION: per return flag, the least-squares
    slope/intercept/R² of extended price on quantity — the per-segment
    trend line behind pricing elasticity and drift dashboards, and the
    natural next step from q_agg_corr (A15): same five exact-decimal
    sufficient statistics, different closed forms. Built-in
    ``regr_slope``/``regr_r2`` stream doubles in engine order and can't
    hash-match; the sufficient-statistic recipe makes the fit
    partitioning- and engine-exact (6-dp quantized against the wide
    decimal→double 1-ulp hazard).

    Scale shape: one partial/final hash aggregate; the shuffle carries
    five numbers per group and the formulas touch G rows."""
    li = load(spark, sf_dir, "lineitem")
    qx = F.col("l_quantity").cast("decimal(18,6)")
    qy = F.col("l_extendedprice").cast("decimal(18,6)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qx).cast("double").alias("sx"),
        F.sum(qy).cast("double").alias("sy"),
        F.sum((qx * qy).cast("decimal(38,12)")).cast("double").alias("sxy"),
        F.sum((qx * qx).cast("decimal(38,12)")).cast("double").alias("sxx"),
        F.sum((qy * qy).cast("decimal(38,12)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    # Constant regressor (n·Σx² = (Σx)²) leaves the fit undefined —
    # NULL row, not an ANSI 0/0 crash (degenerate-sweep finding); R²
    # additionally needs response variance.
    xden = n * sxx - sx * sx
    yden = n * syy - sy * sy
    slope = (n * sxy - sx * sy) / xden
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        F.when(xden == 0, F.lit(None).cast("double"))
        .otherwise(slope.cast("decimal(20,6)").cast("double"))
        .alias("slope"),
        F.when(xden == 0, F.lit(None).cast("double"))
        .otherwise(((sy - slope * sx) / n)
                   .cast("decimal(20,6)").cast("double"))
        .alias("intercept"),
        F.when((xden == 0) | (yden == 0), F.lit(None).cast("double"))
        .otherwise(((n * sxy - sx * sy) * (n * sxy - sx * sy)
                    / (xden * yden))
                   .cast("decimal(20,6)").cast("double")).alias("r2"),
    )


@query(
    "q_agg_winsorized",
    oracle="""
    WITH cut AS (
      SELECT o_orderstatus,
             CAST(quantile_cont(o_totalprice, 0.05) AS DECIMAL(18,6))
               AS p05,
             CAST(quantile_cont(o_totalprice, 0.95) AS DECIMAL(18,6))
               AS p95
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o.o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o.o_totalprice < CAST(c.p05 AS DOUBLE)
                           OR o.o_totalprice > CAST(c.p95 AS DOUBLE)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
           CAST(CAST(
             CAST(SUM(CAST(
               LEAST(GREATEST(o.o_totalprice, CAST(c.p05 AS DOUBLE)),
                     CAST(c.p95 AS DOUBLE)) AS DECIMAL(18,6)))
               AS DOUBLE) / COUNT(*)
             AS DECIMAL(18,6)) AS DOUBLE) AS winsorized_mean
    FROM orders o JOIN cut c ON o.o_orderstatus = c.o_orderstatus
    GROUP BY o.o_orderstatus
    """,
    tags=("A23", "stats", "robust"),
)
def q_agg_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZED MEAN (5%/95%): per order status, the mean after
    clamping values into the exact [p5, p95] percentile band — the
    robust center that keeps sample size (unlike trimming) while
    removing tail leverage; the A-family's third robustness tool next
    to the MAD screen (A18) and the exact median (A8).

    Determinism: the percentile cutpoints are 6-dp-QUANTIZED before the
    clamp on both sides — engines may interpolate quantiles a last-ulp
    apart, but comparisons against the identical quantized cutpoint are
    unambiguous; clamped values then sum as exact decimals. Scale
    shape: two passes over the group — a percentile aggregate (G rows
    out, broadcast back) and one conditional clamp+sum aggregate; the
    100 TB relaxation swaps pass one for approx_percentile exactly as
    A8→A12."""
    o = load(spark, sf_dir, "orders")
    cut = o.groupBy(F.col("o_orderstatus").alias("c_status")).agg(
        F.percentile("o_totalprice", F.lit(0.05))
        .cast("decimal(18,6)").alias("p05"),
        F.percentile("o_totalprice", F.lit(0.95))
        .cast("decimal(18,6)").alias("p95"),
    )
    j = o.join(F.broadcast(cut),
               F.col("o_orderstatus") == F.col("c_status"))
    lo, hi = F.col("p05").cast("double"), F.col("p95").cast("double")
    clamped = F.least(F.greatest(F.col("o_totalprice"), lo), hi)
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when((F.col("o_totalprice") < lo)
                     | (F.col("o_totalprice") > hi), 1).otherwise(0))
        .cast("bigint").alias("n_clamped"),
        (F.sum(clamped.cast("decimal(18,6)")).cast("double")
         / F.count(F.lit(1)))
        .cast("decimal(18,6)").cast("double").alias("winsorized_mean"),
    )


@query(
    "q_agg_chisq",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS cohort,
             COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ), margins AS (
      SELECT o.*,
             SUM(o.o) OVER (PARTITION BY o.event_type) AS row_tot,
             SUM(o.o) OVER (PARTITION BY o.cohort) AS col_tot,
             SUM(o.o) OVER () AS n
      FROM obs o
    )
    SELECT
      CAST(SUM(o) AS BIGINT) AS n_events,
      CAST(COUNT(*) AS BIGINT) AS n_cells,
      CAST(CAST(CAST(SUM(CAST(
        (CAST(o AS DOUBLE) - CAST(row_tot * col_tot AS DOUBLE) / n)
        * (CAST(o AS DOUBLE) - CAST(row_tot * col_tot AS DOUBLE) / n)
        / (CAST(row_tot * col_tot AS DOUBLE) / n)
        AS DECIMAL(18,6))) AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE)
        AS chi_square
    FROM margins
    """,
    tags=("A24", "stats", "chisq"),
)
def q_agg_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHI-SQUARE INDEPENDENCE TEST: is event type independent of a
    user cohort (even/odd id — a deterministic A/B split)? The
    contingency-table statistic Σ(O−E)²/E with E = row·col/N — the
    categorical-drift / A-B-difference screen a feature pipeline runs
    before trusting a split. Built entirely from one (type, cohort)
    hash aggregation; the margins ride windows over the CELLS relation
    (rows × cohorts, tiny), never the events.

    Determinism: counts are integer-exact; each cell's (O−E)²/E is one
    double expression over exact integers (row_tot·col_tot is bigint
    arithmetic, identical both engines), 6-dp-quantized per term before
    the final sum so the Σ is order-insensitive."""
    ev = load(spark, sf_dir, "events")
    obs = (
        ev.select(
            "event_type",
            F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd")
            .alias("cohort"))
        .groupBy("event_type", "cohort")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    row_tot = F.sum("o").over(Window.partitionBy("event_type"))
    col_tot = F.sum("o").over(Window.partitionBy("cohort"))
    n = F.sum("o").over(Window.partitionBy())
    m = obs.select(
        "o",
        row_tot.alias("row_tot"), col_tot.alias("col_tot"), n.alias("n"))
    e = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("n")
    term = ((F.col("o").cast("double") - e) * (F.col("o").cast("double") - e)
            / e).cast("decimal(18,6)")
    return m.agg(
        F.sum("o").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(term).cast("double").cast("decimal(18,6)").cast("double")
        .alias("chi_square"),
    )


@query(
    "q_window_streak",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
      FROM events
    ), flagged AS (
      SELECT user_id, day,
             CASE WHEN LAG(day) OVER (
                    PARTITION BY user_id ORDER BY day) = day - 1
                  THEN 0 ELSE 1 END AS brk
      FROM ud
    ), islands AS (
      SELECT user_id, day,
             SUM(brk) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS streak_id
      FROM flagged
    ), lens AS (
      SELECT user_id, streak_id,
             CAST(COUNT(*) AS BIGINT) AS len,
             MIN(day) AS streak_start
      FROM islands GROUP BY user_id, streak_id
    )
    SELECT user_id,
           MAX(len) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           MIN(streak_start) AS first_day
    FROM lens GROUP BY user_id
    """,
    tags=("W17", "streak"),
)
def q_window_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LONGEST DAILY ACTIVITY STREAK per user: gaps-and-islands at
    calendar-day grain — a break flag where the previous active day is
    not yesterday, a running sum of breaks as the island id, then
    per-island lengths and the per-user max. The engagement metric
    (GitHub-streak shape) that W8's time-gap sessionization becomes at
    daily grain, where the gap test is date arithmetic (day − 1), not a
    timestamp delta.

    Scale shape: the stream collapses to DISTINCT (user, day) first
    (bounded by users × days); the lag window, running sum, and BOTH
    grouped aggregations share one (user_id) hash partitioning —
    Catalyst plans a single Exchange. Integer/date arithmetic end to
    end: engine-exact with no quantization."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    flagged = ud.withColumn(
        "brk",
        F.when(F.lag("day").over(w) == F.date_sub("day", 1), 0)
        .otherwise(1))
    islands = flagged.withColumn(
        "streak_id",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    lens = islands.groupBy("user_id", "streak_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("len"),
        F.min("day").alias("streak_start"))
    return lens.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.min("streak_start").alias("first_day"),
    )


@query(
    "q_agg_gini",
    oracle="""
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus
               ORDER BY o_totalprice, o_orderkey) AS i
      FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(
             2.0 * CAST(SUM(CAST(i * CAST(o_totalprice AS DECIMAL(18,6))
                                 AS DECIMAL(38,6))) AS DOUBLE)
             / (COUNT(*)
                * CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE))
             - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*)
             AS DECIMAL(18,6)) AS DOUBLE) AS gini
    FROM ranked
    GROUP BY o_orderstatus
    """,
    tags=("A25", "stats", "gini"),
)
def q_agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI COEFFICIENT per group: the concentration/inequality measure
    of the value distribution — 0 = uniform, →1 = one row holds
    everything. In an LLM-data pipeline this is the corpus-balance
    audit (token share across sources/dumps: a Gini spike means one
    crawl dominates training); here computed over order values per
    status via the rank formulation G = 2·Σi·xᵢ/(n·Σx) − (n+1)/n on the
    ascending total order.

    Determinism: (value, key) total order fixes ranks; Σi·x and Σx run
    as exact decimals; the two closing divisions are over exact
    operands, 6-dp-quantized against the wide-decimal→double ulp
    hazard. Scale note: per-group ranking is one in-partition sort of
    the group's rows (the same (status) partitioning the aggregate
    reuses); the 100 TB relaxation buckets values through A12's sketch
    cutpoints and computes Gini on the binned histogram."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey")
    ranked = o.select(
        "o_orderstatus", "o_totalprice",
        F.row_number().over(w).alias("i"))
    si_x = F.sum((F.col("i") * F.col("o_totalprice").cast("decimal(18,6)"))
                 .cast("decimal(38,6)")).cast("double")
    sx = F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
    n = F.count(F.lit(1))
    return ranked.groupBy("o_orderstatus").agg(
        n.cast("bigint").alias("n_rows"),
        (F.lit(2.0) * si_x / (n * sx)
         - (n + F.lit(1)).cast("double") / n)
        .cast("decimal(18,6)").cast("double").alias("gini"),
    )


@query(
    "q_agg_transpose",
    oracle="""
    WITH m AS (
      SELECT o_orderstatus,
             CAST(COUNT(*) AS DOUBLE) AS n_orders,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                       AS DOUBLE) AS DOUBLE) AS sum_price,
             CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
      FROM orders GROUP BY o_orderstatus
    )
    SELECT 'max_price' AS key,
           (SELECT max_price FROM m WHERE o_orderstatus = 'F') AS "F",
           (SELECT max_price FROM m WHERE o_orderstatus = 'O') AS "O",
           (SELECT max_price FROM m WHERE o_orderstatus = 'P') AS "P"
    UNION ALL
    SELECT 'n_orders',
           (SELECT n_orders FROM m WHERE o_orderstatus = 'F'),
           (SELECT n_orders FROM m WHERE o_orderstatus = 'O'),
           (SELECT n_orders FROM m WHERE o_orderstatus = 'P')
    UNION ALL
    SELECT 'sum_price',
           (SELECT sum_price FROM m WHERE o_orderstatus = 'F'),
           (SELECT sum_price FROM m WHERE o_orderstatus = 'O'),
           (SELECT sum_price FROM m WHERE o_orderstatus = 'P')
    """,
    tags=("A26", "transpose"),
)
def q_agg_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DATAFRAME TRANSPOSE (Spark 4 API): flip a G-row × M-measure
    summary into an M-row × G-column matrix — the dashboard "measures
    as rows" orientation A9's pivot cannot produce (pivot widens by a
    VALUE domain; transpose swaps the axes themselves). Certifies the
    new ``DataFrame.transpose`` surface against a hand-written oracle.

    Scale contract (and why this is safe ONLY on aggregates): transpose
    materializes the frame's first column as the new header, so its
    input must be a small summary relation — here 3 status rows —
    never raw data; the grouped aggregate in front is what makes the
    operation bounded. Measures are cast to a common double type
    (transpose requires one type across each transposed row); counts
    and exact-decimal sums convert exactly."""
    o = load(spark, sf_dir, "orders")
    m = (
        o.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).cast("double").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double").alias("sum_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )
    return m.transpose()


@query(
    "q_agg_kmv_setops",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type, user_id,
             CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                       AS BIGINT) AS DOUBLE) / 4294967296.0 AS hv
      FROM events
    ), types AS (
      SELECT DISTINCT event_type FROM h
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM types a JOIN types b ON a.event_type < b.event_type
    ), pu AS (
      SELECT p.type_a, p.type_b, h.user_id,
             MIN(h.hv) AS hv,
             MAX(CASE WHEN h.event_type = p.type_a THEN 1 ELSE 0 END)
               AS in_a,
             MAX(CASE WHEN h.event_type = p.type_b THEN 1 ELSE 0 END)
               AS in_b
      FROM pairs p JOIN h
        ON h.event_type = p.type_a OR h.event_type = p.type_b
      GROUP BY p.type_a, p.type_b, h.user_id
    ), ranked AS (
      SELECT type_a, type_b, user_id, hv, in_a, in_b,
             ROW_NUMBER() OVER (
               PARTITION BY type_a, type_b ORDER BY hv, user_id) AS rn
      FROM pu
    ), sk AS (
      SELECT type_a, type_b,
             MAX(hv) AS hk,
             CAST(COUNT(*) AS BIGINT) AS k_kept,
             CAST(SUM(in_a * in_b) AS BIGINT) AS m_both
      FROM ranked WHERE rn <= {KMV_K} GROUP BY type_a, type_b
    ), ex AS (
      SELECT type_a, type_b,
             CAST(COUNT(*) AS BIGINT) AS n_union,
             CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter
      FROM pu GROUP BY type_a, type_b
    )
    SELECT ex.type_a, ex.type_b, ex.n_union, ex.n_inter,
           CASE WHEN ex.n_union < {KMV_K}
                THEN CAST(ex.n_union AS DOUBLE)
                ELSE ({KMV_K} - 1) / sk.hk END AS union_est,
           CASE WHEN ex.n_union < {KMV_K}
                THEN CAST(ex.n_inter AS DOUBLE)
                ELSE (CAST(sk.m_both AS DOUBLE) / sk.k_kept)
                     * (({KMV_K} - 1) / sk.hk) END AS inter_est
    FROM ex JOIN sk
      ON ex.type_a = sk.type_a AND ex.type_b = sk.type_b
    """,
    tags=("A21", "sketch"),
)
def q_agg_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV SKETCH SET OPERATIONS — the mergeability that makes sketches
    matter at cluster scale: for every event-type pair, the UNION
    sketch is the k smallest hashes of the combined key sets (merging
    two k-sets = keep k smallest, associative and order-free), the
    union estimate is (k−1)/h_k as usual, and the INTERSECTION estimate
    is Jaccard-via-sketch: the fraction of the union k-set present in
    both sides, scaled by the union estimate. Exact counts ride along
    so every estimate has its error audit in the same row.

    Scale shape: per-pair work runs over the DISTINCT (type, user)
    relation joined to a broadcast |types|² pair list — the heavy
    dedup happens ONCE, not per pair; everything after the k-window is
    |pairs| × k rows. Hash arithmetic is exact (uint32/2³²); estimates
    are bare IEEE divisions/products — no quantization needed."""
    ev = load(spark, sf_dir, "events")
    h = (
        ev.select("event_type", "user_id").distinct()
        .withColumn(
            "hv",
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
                   16, 10).cast("bigint").cast("double") / F.lit(2.0 ** 32))
    ).persist()
    types = h.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(types.select(F.col("event_type").alias("type_b")),
              F.col("type_a") < F.col("type_b"))
    )
    pu = (
        F.broadcast(pairs).join(
            h,
            (F.col("event_type") == F.col("type_a"))
            | (F.col("event_type") == F.col("type_b")))
        .groupBy("type_a", "type_b", "user_id")
        .agg(
            F.min("hv").alias("hv"),
            F.max(F.when(F.col("event_type") == F.col("type_a"), 1)
                  .otherwise(0)).alias("in_a"),
            F.max(F.when(F.col("event_type") == F.col("type_b"), 1)
                  .otherwise(0)).alias("in_b"),
        )
    ).persist()  # feeds the sketch window AND the exact counts
    w = Window.partitionBy("type_a", "type_b").orderBy("hv", "user_id")
    sk = (
        pu.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .groupBy("type_a", "type_b")
        .agg(F.max("hv").alias("hk"),
             F.count(F.lit(1)).cast("bigint").alias("k_kept"),
             F.sum(F.col("in_a") * F.col("in_b")).cast("bigint")
             .alias("m_both"))
    )
    ex = pu.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_union"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint")
        .alias("n_inter"))
    small = F.col("n_union") < KMV_K
    union_est = F.when(small, F.col("n_union").cast("double")) \
        .otherwise(F.lit(float(KMV_K - 1)) / F.col("hk"))
    inter_est = F.when(small, F.col("n_inter").cast("double")) \
        .otherwise((F.col("m_both").cast("double") / F.col("k_kept"))
                   * (F.lit(float(KMV_K - 1)) / F.col("hk")))
    return (
        ex.join(sk, ["type_a", "type_b"])
        .select("type_a", "type_b", "n_union", "n_inter",
                union_est.alias("union_est"), inter_est.alias("inter_est"))
    )


# ---- Exact distributed median (binned two-pass, no global sort) ----------

MEDIAN_BINS = 1024


@query(
    "q_agg_exact_median",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rk,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag, l_extendedprice AS median_price,
           CAST(n AS BIGINT) AS n_rows
    FROM ranked WHERE rk = (n + 1) // 2
    """,
    tags=("A12", "median", "two-pass"),
)
def q_agg_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT grouped median without a global sort — the 100 TB quantile
    recipe (sketches like q_agg_approx_quantile trade exactness for one
    pass; this keeps exactness and pays two):

    1. one aggregate for per-group (n, min, max);
    2. one aggregate for a {MEDIAN_BINS}-bin histogram; a window over
       the BIN relation (<= groups x bins rows, tiny) locates the bin
       holding the target rank and the residual offset inside it;
    3. a second scan keeps ONLY rows in each group's target bin
       (~n/bins rows), ranks them per group, and picks the offset row.

    Nothing ever sorts more than one bin's worth of a group, and every
    shuffle is either histogram-sized or bin-sized. The oracle global-
    sorts in DuckDB (fine at oracle scale) for the same lower-median
    definition: the value at rank (n+1)//2. Ties are harmless: rank
    permutations among equal values select the same VALUE, and only the
    value is emitted."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice")
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("v_lo"),
        F.max("l_extendedprice").alias("v_hi"))
    # localCheckpoint the two tiny relations (r15, guide §1.2 step 1):
    # stats (<= |groups| rows) feeds both binned references and the
    # rank targets, and target (<= |groups| rows) re-embedded the whole
    # binned subtree at the final join — 5 fact scans in one plan for a
    # 3-pass algorithm. Materialized, the plan takes exactly the three
    # passes the recipe needs (stats, histogram, bin-pick). Fresh
    # lineage per call keeps bench reps recomputing honestly.
    stats = stats.localCheckpoint(eager=True)
    span = F.col("v_hi") - F.col("v_lo")
    bin_of = F.when(span == 0, F.lit(0)).otherwise(F.least(
        F.floor((F.col("l_extendedprice") - F.col("v_lo"))
                * MEDIAN_BINS / span),
        F.lit(MEDIAN_BINS - 1))).cast("int")
    binned = li.join(F.broadcast(stats), "l_returnflag") \
        .select("l_returnflag", "l_extendedprice", bin_of.alias("bin"))
    hist = binned.groupBy("l_returnflag", "bin").agg(
        F.count(F.lit(1)).alias("cnt"))
    wcum = Window.partitionBy("l_returnflag").orderBy("bin") \
        .rowsBetween(Window.unboundedPreceding, 0)
    target = (
        hist.join(F.broadcast(stats.select(
            "l_returnflag", ((F.col("n") + 1) / 2).cast("bigint")
            .alias("rk"), "n")), "l_returnflag")
        .withColumn("cum", F.sum("cnt").over(wcum))
        .where((F.col("cum") >= F.col("rk"))
               & (F.col("cum") - F.col("cnt") < F.col("rk")))
        .select("l_returnflag", "bin",
                (F.col("rk") - (F.col("cum") - F.col("cnt")))
                .alias("offset"), "n")
    )
    target = target.localCheckpoint(eager=True)
    wbin = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    return (
        binned.join(F.broadcast(target), ["l_returnflag", "bin"])
        .withColumn("rk_in_bin", F.row_number().over(wbin))
        .where(F.col("rk_in_bin") == F.col("offset"))
        .select("l_returnflag",
                F.col("l_extendedprice").alias("median_price"),
                F.col("n").cast("bigint").alias("n_rows"))
    )


# ---- Mergeable aggregate states (incremental rollup primitive) -----------

STATE_BATCHES = 4


@query(
    "q_agg_state_merge",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE)
             / COUNT(*) AS mean_qty,
           -- DECIMAL(19,6) squares, exactly: p=19 forces the int128
           -- decimal path and (19,6)^2 -> (38,12) lands exactly on
           -- DuckDB's width cap. (18,6)^2 overflows the int64 path
           -- outright; (20,6)^2 wants width 40 and degrades with
           -- last-ulp drift. Both failure modes observed.
           (CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
                     * CAST(l_quantity AS DECIMAL(19,6)))
                 AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE)
              * CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE)
              / COUNT(*))
           / (COUNT(*) - 1) AS var_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("A7", "A8", "mergeable-state"),
)
def q_agg_state_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE AGGREGATE STATES: per-batch partial states
    (n, Σx, Σx², min, max) merged across batches by pure addition /
    min / max, then finalized to mean and variance — the algebraic-
    aggregate contract behind every incremental 100 TB rollup (compute
    states per ingest batch once, re-aggregate STATES forever; Catalyst
    runs the same partial/final split inside one query, this operator
    is that split made STORABLE across jobs).

    The moment sums are exact decimals (compat convention), which is
    what makes the textbook "unstable" Σx² − (Σx)²/n variance formula
    legitimate here: no floating cancellation can occur during
    accumulation, merge order is irrelevant, and the single
    double-precision finalization is identical in both engines. Batches
    are keyed by ``l_orderkey % {STATE_BATCHES}``; the oracle aggregates
    the raw table directly in one pass — equality of the two IS the
    merge-correctness proof.

    Cross-engine cast bound (measured, SCALE.md): the metric is
    ``l_quantity`` because a decimal→double cast is only engine-
    identical while the decimal holds <=15 significant digits — DuckDB
    converts as raw/10^scale in floating point, Spark via BigDecimal's
    correctly-rounded path, and a 25-digit Σx² (as l_extendedprice
    produces) drifts in the last ulp; DuckDB additionally overflows
    int64 on DECIMAL(18,6) squares and degrades width-40 products, so
    the oracle squares at DECIMAL(19,6) exactly on the 38-width cap.
    The operator itself has no such bound — only the cross-engine
    equality check does."""
    x = F.col("l_quantity")
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity",
        F.pmod(F.col("l_orderkey"), F.lit(STATE_BATCHES)).alias("batch"))
    from ..compat import q as qd
    states = li.groupBy("l_returnflag", "batch").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qd(x)).alias("s1"),
        F.sum(qd(x) * qd(x)).alias("s2"),
        F.min(x).alias("lo"),
        F.max(x).alias("hi"))
    merged = states.groupBy("l_returnflag").agg(
        F.sum("n").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
        F.min("lo").alias("lo"),
        F.max("hi").alias("hi"))
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    n = F.col("n")
    return merged.select(
        "l_returnflag",
        n.cast("bigint").alias("n_rows"),
        (s1d / n).alias("mean_qty"),
        ((s2d - s1d * s1d / n) / (n - 1)).alias("var_qty"),
        F.col("lo").alias("min_qty"),
        F.col("hi").alias("max_qty"))


# ---- Exact multi-quantile (binned two-pass, generalizes the median) ------

QUANTILE_PS = (0.5, 0.95, 0.99)


@query(
    "q_agg_exact_quantiles",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rk,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           MAX(CASE WHEN rk = CEIL(0.5 * n) THEN l_extendedprice END)
             AS p50,
           MAX(CASE WHEN rk = CEIL(0.95 * n) THEN l_extendedprice END)
             AS p95,
           MAX(CASE WHEN rk = CEIL(0.99 * n) THEN l_extendedprice END)
             AS p99,
           CAST(MAX(n) AS BIGINT) AS n_rows
    FROM ranked
    GROUP BY l_returnflag
    """,
    tags=("A12", "quantile", "two-pass"),
)
def q_agg_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT grouped p50/p95/p99 in two passes, no global sort — the
    scalable exact answer to the question A12's sketches approximate
    (and A27's single-median recipe generalized to a quantile VECTOR
    for one extra histogram-relation window, not one extra scan per
    quantile): all three target ranks (rank = CEIL(p·n), the discrete
    inverse-CDF definition — both engines evaluate the identical IEEE
    expression, so even a 0.95·n landing microscopically above an
    integer agrees) locate their bins in the SAME {MEDIAN_BINS}-bin
    histogram; the second scan keeps only rows in any group's target
    bins and ranks once per (group, quantile). Shuffle volume: one
    histogram, then ~3·n/bins rows."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice")
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("v_lo"),
        F.max("l_extendedprice").alias("v_hi"))
    # Same materialization discipline as A27 above: stats and located
    # are group-cardinality-bounded but each re-embedded a fact-scan
    # subtree per consumer (5 scans in-plan for the 3-pass recipe).
    stats = stats.localCheckpoint(eager=True)
    span = F.col("v_hi") - F.col("v_lo")
    bin_of = F.when(span == 0, F.lit(0)).otherwise(F.least(
        F.floor((F.col("l_extendedprice") - F.col("v_lo"))
                * MEDIAN_BINS / span),
        F.lit(MEDIAN_BINS - 1))).cast("int")
    binned = li.join(F.broadcast(stats), "l_returnflag") \
        .select("l_returnflag", "l_extendedprice", bin_of.alias("bin"))
    hist = binned.groupBy("l_returnflag", "bin").agg(
        F.count(F.lit(1)).alias("cnt"))
    targets = (
        stats.select(
            "l_returnflag", "n",
            F.explode(F.array(*[F.lit(p) for p in QUANTILE_PS]))
            .alias("p"))
        .select("l_returnflag", "p", "n",
                F.ceil(F.col("p") * F.col("n")).cast("bigint").alias("rk"))
    )
    wcum = Window.partitionBy("l_returnflag").orderBy("bin") \
        .rowsBetween(Window.unboundedPreceding, 0)
    located = (
        hist.withColumn("cum", F.sum("cnt").over(wcum))
        .join(F.broadcast(targets), "l_returnflag")
        .where((F.col("cum") >= F.col("rk"))
               & (F.col("cum") - F.col("cnt") < F.col("rk")))
        .select("l_returnflag", "p", "bin", "n",
                (F.col("rk") - (F.col("cum") - F.col("cnt")))
                .alias("offset"))
    )
    located = located.localCheckpoint(eager=True)
    wbin = Window.partitionBy("l_returnflag", "p") \
        .orderBy("l_extendedprice")
    hits = (
        binned.join(F.broadcast(located), ["l_returnflag", "bin"])
        .withColumn("rk_in_bin", F.row_number().over(wbin))
        .where(F.col("rk_in_bin") == F.col("offset"))
    )
    return (
        hits.groupBy("l_returnflag")
        .agg(*[F.max(F.when(F.col("p") == F.lit(p),
                            F.col("l_extendedprice")))
               .alias(f"p{str(p)[2:]}" if p != 0.5 else "p50")
               for p in QUANTILE_PS],
             F.max("n").cast("bigint").alias("n_rows"))
    )


# ---- Three-valued-logic / NULL-semantics parity suite --------------------


@query(
    "q_null_semantics",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE o_orderpriority END AS pri,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE o_totalprice END AS price
      FROM orders
    )
    SELECT COALESCE(pri, '(null)') AS pri_group,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(price) AS BIGINT) AS n_price_nonnull,
           CAST(COUNT(DISTINCT price) AS BIGINT) AS n_price_distinct,
           MIN(price) AS min_price,
           CAST(SUM(CASE WHEN price IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_price_null,
           CAST(SUM(CASE WHEN pri IS NOT DISTINCT FROM NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pri_nullsafe,
           BOOL_OR(price > 1e12) AS any_huge,
           BOOL_OR(price > 1e12) IS NULL AS any_huge_unknown
    FROM t
    GROUP BY pri
    """,
    tags=("A1", "null-semantics"),
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-VALUED-LOGIC PARITY SUITE: the NULL behaviors engines
    classically disagree on, in one hash-gated relation — NULL group
    keys aggregate as their own group; COUNT(*) vs COUNT(col) vs
    COUNT(DISTINCT col) over nulls; MIN skipping nulls (and returning
    NULL for an all-null group if one existed); IS NOT DISTINCT FROM as
    the null-safe comparator; and BOOL_OR over a predicate that is
    false-or-null everywhere (SQL's unknown-propagation: all-false
    gives false, but false+null gives... what each engine says — which
    is exactly why it's gated). A user migrating filters/rollups from
    the reference needs these semantics to be load-bearing, not
    folklore. One scan, one aggregate; NULL injection is deterministic
    key arithmetic."""
    o = load(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, None)
        .otherwise(F.col("o_orderpriority")).alias("pri"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_totalprice")).alias("price"))
    return (
        t.groupBy("pri")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
             F.count("price").cast("bigint").alias("n_price_nonnull"),
             F.countDistinct("price").cast("bigint")
             .alias("n_price_distinct"),
             F.min("price").alias("min_price"),
             F.sum(F.when(F.col("price").isNull(), 1).otherwise(0))
             .cast("bigint").alias("n_price_null"),
             F.sum(F.when(F.col("pri").eqNullSafe(F.lit(None)), 1)
                   .otherwise(0)).cast("bigint").alias("n_pri_nullsafe"),
             F.bool_or(F.col("price") > 1e12).alias("any_huge"),
             F.bool_or(F.col("price") > 1e12).isNull()
             .alias("any_huge_unknown"))
        .select(F.coalesce("pri", F.lit("(null)")).alias("pri_group"),
                "n_rows", "n_price_nonnull", "n_price_distinct",
                "min_price", "n_price_null", "n_pri_nullsafe",
                "any_huge", "any_huge_unknown")
    )


# ---- Hierarchical contribution rollup (share-of-parent) ------------------


@query(
    "q_agg_hierarchy_share",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
               AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    -- window sums re-quantize to decimal: double window sums are
    -- engine-order-sensitive (compat rule 1 applies to windows too)
    SELECT region, nation, revenue,
           revenue / CAST(SUM(CAST(revenue AS DECIMAL(18,6)))
                          OVER (PARTITION BY region) AS DOUBLE)
             AS share_of_region,
           CAST(SUM(CAST(revenue AS DECIMAL(18,6)))
                OVER (PARTITION BY region) AS DOUBLE)
             / CAST(SUM(CAST(revenue AS DECIMAL(18,6))) OVER ()
                    AS DOUBLE) AS region_share_of_total
    FROM rev
    """,
    tags=("A5", "W7", "hierarchy"),
)
def q_agg_hierarchy_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIERARCHICAL CONTRIBUTION: revenue per nation with its share of
    its region AND the region's share of the total, in one pass — the
    drill-down percent-of-parent layout every regional dashboard
    renders. The geography dims broadcast (region: 5 rows, nation: 25);
    the fact aggregates BEFORE any window, so both share windows run
    over the (region×nation) relation — at 100 TB the windows touch
    ~200 rows regardless of fact volume. Shares are single IEEE
    divisions from exact-decimal sums."""
    from ..compat import q as qd

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey")
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"),
                 F.col("n_name").alias("nation"))
        .agg(F.sum(qd("o_totalprice")).cast("double").alias("revenue"))
    )
    wr = Window.partitionBy("region")
    wa = Window.partitionBy(F.lit(1))
    rsum = F.sum(F.col("revenue").cast("decimal(18,6)")).over(wr) \
        .cast("double")
    tsum = F.sum(F.col("revenue").cast("decimal(18,6)")).over(wa) \
        .cast("double")
    return rev.select(
        "region", "nation", "revenue",
        (F.col("revenue") / rsum).alias("share_of_region"),
        (rsum / tsum).alias("region_share_of_total"))


# ---- Weighted median (running-weight threshold) --------------------------


@query(
    "q_agg_weighted_median",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice,
             CAST(l_quantity AS DECIMAL(18,6)) AS wt
      FROM lineitem
    ), ranked AS (
      SELECT l_returnflag, l_extendedprice,
             SUM(wt) OVER (PARTITION BY l_returnflag
                           ORDER BY l_extendedprice
                           ROWS UNBOUNDED PRECEDING) AS cum_wt,
             SUM(wt) OVER (PARTITION BY l_returnflag) AS tot_wt
      FROM w
    ), hit AS (
      SELECT l_returnflag, l_extendedprice, tot_wt,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY cum_wt, l_extendedprice) AS rn
      FROM ranked
      WHERE cum_wt * 2 >= tot_wt
    )
    SELECT l_returnflag,
           l_extendedprice AS weighted_median_price,
           CAST(tot_wt AS DOUBLE) AS total_weight
    FROM hit WHERE rn = 1
    """,
    tags=("A12", "weighted-median"),
)
def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED MEDIAN: the price at which half the QUANTITY mass sits
    on each side (per return flag) — the volume-weighted center a plain
    median misrepresents whenever line sizes vary (same statistic
    behind VWAP-style costing, next to W-family's TWAP). Defined as the
    smallest value whose running weight reaches half the total; weights
    accumulate as exact decimals so the running sum is order-exact.

    r12 rework (the Spearman/RFM distinct-value-grain collapse, third
    application): the running-weight window no longer sorts the FACT
    table per group — weights first collapse to the DISTINCT
    (flag, price) grain with one hash aggregate (map-side combinable),
    and the cumulative window runs over that value-cardinality-bounded
    relation; at the distinct grain each price appears once, so "the
    smallest value whose cum reaches half the total" is simply the
    first ordered hit, identical to the per-row spec the oracle keeps
    stating (same output, banked hash unchanged — re-proven at three
    scales)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice",
        F.col("l_quantity").cast("decimal(18,6)").alias("wt"))
    per_value = li.groupBy("l_returnflag", "l_extendedprice").agg(
        F.sum("wt").alias("vwt"))
    wcum = Window.partitionBy("l_returnflag").orderBy("l_extendedprice") \
        .rowsBetween(Window.unboundedPreceding, 0)
    wtot = Window.partitionBy("l_returnflag")
    ranked = per_value.select(
        "l_returnflag", "l_extendedprice",
        F.sum("vwt").over(wcum).alias("cum_wt"),
        F.sum("vwt").over(wtot).alias("tot_wt"))
    whit = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    return (
        ranked.where(F.col("cum_wt") * 2 >= F.col("tot_wt"))
        .withColumn("rn", F.row_number().over(whit))
        .where(F.col("rn") == 1)
        .select("l_returnflag",
                F.col("l_extendedprice").alias("weighted_median_price"),
                F.col("tot_wt").cast("double").alias("total_weight"))
    )


# ---- Backlog aging report ------------------------------------------------


@query(
    "q_agg_backlog_aging",
    oracle="""
    WITH h AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS today
               FROM orders),
    open_orders AS (
      SELECT o_orderpriority,
             date_diff('day', CAST(o_orderdate AS DATE),
                       (SELECT today FROM h)) AS age_days
      FROM orders WHERE o_orderstatus = 'O'
    )
    SELECT o_orderpriority,
           CASE WHEN age_days < 90 THEN '0-89'
                WHEN age_days < 365 THEN '90-364'
                WHEN age_days < 730 THEN '365-729'
                ELSE '730+' END AS age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MAX(age_days) AS INT) AS oldest_days
    FROM open_orders
    GROUP BY 1, 2
    """,
    tags=("A1", "backlog", "aging"),
)
def q_agg_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BACKLOG AGING: open orders bucketed by age against the corpus
    horizon (max order date — the deterministic "today"), per priority
    — the operations report that turns a backlog COUNT into a
    triage-able shape (a pile of fresh orders is throughput; a pile of
    730+ ones is a stuck-workflow alarm, priority class telling you
    who is owed first). One scan with the horizon as a broadcast
    1-row relation; bucket edges are integer day arithmetic."""
    o = load(spark, sf_dir, "orders")
    h = o.agg(F.max(F.to_date("o_orderdate")).alias("today"))
    age = F.datediff(F.col("today"), F.to_date("o_orderdate"))
    bucket = (F.when(age < 90, "0-89")
              .when(age < 365, "90-364")
              .when(age < 730, "365-729")
              .otherwise("730+"))
    return (
        o.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(h))
        .groupBy("o_orderpriority", bucket.alias("age_bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
             F.max(age).cast("int").alias("oldest_days"))
    )


# ---- 2-D histogram (joint distribution grid) -----------------------------


@query(
    "q_agg_histogram2d",
    oracle="""
    SELECT CASE WHEN l_quantity <= 10 THEN 'q1-10'
                WHEN l_quantity <= 25 THEN 'q11-25'
                ELSE 'q26-50' END AS qty_bucket,
           CASE WHEN l_extendedprice < 25000 THEN 'p<25k'
                WHEN l_extendedprice < 50000 THEN 'p25-50k'
                WHEN l_extendedprice < 75000 THEN 'p50-75k'
                ELSE 'p75k+' END AS price_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM lineitem) AS share
    FROM lineitem
    GROUP BY 1, 2
    """,
    tags=("A13", "histogram-2d"),
)
def q_agg_histogram2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOINT-DISTRIBUTION GRID: lineitem counts over (quantity bucket ×
    price bucket) with corpus share — the density grid a scatter
    dashboard bins server-side (A13/A20 profile one dimension; the 2-D
    grid is where "big orders are cheap per unit" correlations show as
    off-diagonal mass, the visual companion to A15's single-number
    correlation). One scan, a 12-cell aggregate, total broadcast; all
    bucket edges are literals so both engines cut identically."""
    li = load(spark, sf_dir, "lineitem")
    qb = (F.when(F.col("l_quantity") <= 10, "q1-10")
          .when(F.col("l_quantity") <= 25, "q11-25")
          .otherwise("q26-50"))
    pb = (F.when(F.col("l_extendedprice") < 25000, "p<25k")
          .when(F.col("l_extendedprice") < 50000, "p25-50k")
          .when(F.col("l_extendedprice") < 75000, "p50-75k")
          .otherwise("p75k+"))
    tot = li.agg(F.count(F.lit(1)).alias("t"))
    return (
        li.groupBy(qb.alias("qty_bucket"), pb.alias("price_bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_items"))
        .crossJoin(F.broadcast(tot))
        .select("qty_bucket", "price_bucket", "n_items",
                (F.col("n_items").cast("double") / F.col("t"))
                .alias("share"))
    )


@query(
    "q_agg_discount_bands",
    oracle="""
    SELECT CASE WHEN l_discount = 0 THEN 'none'
                WHEN l_discount <= 0.05 THEN 'low'
                ELSE 'high' END AS discount_band,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE)
             / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice * l_discount
                         AS DECIMAL(20,6))) AS DOUBLE) AS discount_cost,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(20,6))) AS DOUBLE) AS net_revenue
    FROM lineitem
    GROUP BY 1
    """,
    tags=("A2", "discount"),
)
def q_agg_discount_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCOUNT EFFECTIVENESS: volume and revenue per discount band —
    whether discounted lines actually move more units (avg quantity by
    band) and what the discounts cost against the net revenue they
    rode on: the promotion-ROI cut of TPC-H Q6's revenue-impact
    question. One scan, a 3-band aggregate; products quantize to
    exact decimals before summation (both operands ≤ 2 dp, so the
    6-dp quantization is lossless)."""
    li = load(spark, sf_dir, "lineitem")
    band = (F.when(F.col("l_discount") == 0, "none")
            .when(F.col("l_discount") <= 0.05, "low")
            .otherwise("high"))
    from ..compat import q as qd
    return (
        li.groupBy(band.alias("discount_band"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_items"),
             (F.sum(qd("l_quantity")).cast("double")
              / F.count(F.lit(1))).alias("avg_qty"),
             F.sum(qd(F.col("l_extendedprice") * F.col("l_discount")))
             .cast("double").alias("discount_cost"),
             F.sum(qd(F.col("l_extendedprice")
                      * (1 - F.col("l_discount"))))
             .cast("double").alias("net_revenue"))
    )


# ---- Count-min sketch frequency estimation (A40) ---------------------------

CMS_P = 2147483647  # Mersenne prime 2^31-1: the universal-hash modulus
CMS_W = 16          # buckets per row (tiny on purpose: collisions visible)
CMS_HASHES = ((1103515245, 12345), (1299709, 7919), (15485863, 104729))
CMS_PROBES = 10     # report the top-N exact keys' estimates


def _cms_oracle() -> str:
    rows = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(CMS_HASHES))
    return f"""
    WITH hashes(j, a, b) AS (VALUES {rows}),
    keyed AS (
      SELECT e.user_id, h.j,
             ((h.a * (e.user_id % {CMS_P}) + h.b) % {CMS_P}) % {CMS_W}
               AS bucket
      FROM events e CROSS JOIN hashes h
    ),
    sketch AS (
      SELECT j, bucket, COUNT(*) AS cnt FROM keyed GROUP BY j, bucket
    ),
    exact AS (
      SELECT user_id, COUNT(*) AS exact_cnt
      FROM events GROUP BY user_id
      ORDER BY exact_cnt DESC, user_id
      LIMIT {CMS_PROBES}
    ),
    probes AS (
      SELECT x.user_id, x.exact_cnt, h.j,
             ((h.a * (x.user_id % {CMS_P}) + h.b) % {CMS_P}) % {CMS_W}
               AS bucket
      FROM exact x CROSS JOIN hashes h
    )
    SELECT p.user_id,
           CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(MIN(s.cnt) AS BIGINT) AS cms_est,
           CAST(MIN(s.cnt) - p.exact_cnt AS BIGINT) AS overestimate
    FROM probes p JOIN sketch s ON p.j = s.j AND p.bucket = s.bucket
    GROUP BY p.user_id, p.exact_cnt
    """


@query(
    "q_agg_cms",
    oracle=_cms_oracle(),
    tags=("A40", "sketch", "count-min"),
)
def q_agg_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN SKETCH frequency estimation with an exactness audit:
    build a d=3 x w=16 CMS over event user_ids as a RELATION of
    (hash_row, bucket, count) cells, then answer point queries for the
    top-10 exact keys and report estimate vs truth. The sketch relation
    is the distributed form of the classic array: per-partition partial
    counts merge by (j, bucket) addition — exactly the CMS merge
    property — so a 1000-executor build is one partial/final aggregate
    producing d*w rows no matter the input size, and sketches from
    different days/sources union+re-aggregate into the combined sketch.
    The deliberately tiny width makes collisions visible at test scale:
    the audit columns show the one-sided overestimate bias (estimate >=
    truth always; never under).

    Hashing is the universal family h(u) = ((a*u + b) mod P) mod w with
    P = 2^31-1 and fixed (a, b) pairs — pure bigint arithmetic, bit-equal
    in any engine (no reliance on engine-specific hash functions). Probe
    keys join the d*w-row sketch via broadcast; MIN over the d rows is
    the CMS point estimate."""
    e = load(spark, sf_dir, "events").select("user_id")
    sketch = cms_sketch(e, "user_id")
    exact = (
        e.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "user_id")
        .limit(CMS_PROBES)
    )
    return (
        cms_estimates(sketch, exact, "user_id")
        .select(
            "user_id",
            F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") - F.col("exact_cnt")).cast("bigint")
            .alias("overestimate"))
    )


def _cms_hashes(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(j, a, b) for j, (a, b) in enumerate(CMS_HASHES)],
        "j INT, a BIGINT, b BIGINT")


def _cms_bucket(key_col: str):
    return (
        F.pmod(F.pmod(F.col("a") * F.pmod(F.col(key_col), F.lit(CMS_P))
                      + F.col("b"), F.lit(CMS_P)), F.lit(CMS_W))
    ).alias("bucket")


def cms_sketch(keys: DataFrame, key_col: str) -> DataFrame:
    """Build the (j, bucket, cnt) count-min relation over a bigint key
    column. Mergeable: sketches over disjoint inputs union + re-agg into
    the combined sketch (property-tested in tests/test_properties_r8.py
    along with the never-underestimates invariant)."""
    hashes = _cms_hashes(keys.sparkSession)
    return (
        keys.crossJoin(F.broadcast(hashes))
        .select("j", _cms_bucket(key_col))
        .groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimates(sketch: DataFrame, probes: DataFrame,
                  key_col: str) -> DataFrame:
    """Point-query a CMS relation: MIN over the d rows' bucket counts.
    ``probes`` keeps its other columns; adds ``cms_est``."""
    hashes = _cms_hashes(sketch.sparkSession)
    others = [c for c in probes.columns if c != key_col]
    keyed = probes.crossJoin(F.broadcast(hashes)).select(
        key_col, *others, "j", _cms_bucket(key_col))
    return (
        keyed.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(key_col, *others)
        .agg(F.min("cnt").alias("cms_est"))
    )


# ---- Two-proportion A/B z-test (A41) ---------------------------------------

AB_CONVERT_EVENT = "purchase"
AB_BASELINE_EVENT = "click"


@query(
    "q_ab_proportions",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             CASE WHEN SUM(CASE WHEN event_type = '{AB_CONVERT_EVENT}'
                           THEN 1 ELSE 0 END)
                     > SUM(CASE WHEN event_type = '{AB_BASELINE_EVENT}'
                           THEN 1 ELSE 0 END)
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT
        SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
        SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS conv_a,
        SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b,
        SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS conv_b
      FROM per_user
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
           CASE WHEN n_a = 0 THEN NULL
                ELSE CAST(conv_a AS DOUBLE) / n_a END AS p_a,
           CASE WHEN n_b = 0 THEN NULL
                ELSE CAST(conv_b AS DOUBLE) / n_b END AS p_b,
           CASE WHEN n_a = 0 OR n_b = 0
                     OR conv_a + conv_b = 0
                     OR conv_a + conv_b = n_a + n_b
                THEN NULL
                ELSE CAST(CAST(
             (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
             / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b))
             AS DECIMAL(18,6)) AS DOUBLE) END AS zscore
    FROM arms
    """,
    tags=("A41", "abtest", "inference"),
)
def q_ab_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-PROPORTION Z-TEST for an A/B experiment: users split into
    arms by id parity, conversion = the user's purchase events outnumber
    their clicks (a scale-free per-user criterion: an any-occurrence
    flag saturates to 100% once users average a handful of events),
    and the pooled-variance z statistic decides whether the
    conversion-rate gap is noise — the primitive behind every
    experimentation platform's significance column. Two hash aggregates
    (events -> per-user flag -> single pooled row); the per-user
    reduction means duplicate events never inflate conversions, and the
    final statistic is computed on ONE row, so the whole test adds one
    shuffle over user_id regardless of event volume.

    Determinism: every term is integer-ratio IEEE arithmetic
    (add/sub/mul/div/sqrt are correctly rounded and engine-identical);
    the z-score is still 6-dp-quantized on both sides as a belt (the
    division chain is longer than most)."""
    e = load(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == AB_CONVERT_EVENT, 1)
                  .otherwise(0)).alias("n_conv_events"),
            F.sum(F.when(F.col("event_type") == AB_BASELINE_EVENT, 1)
                  .otherwise(0)).alias("n_base_events"))
        .select(
            F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
            F.when(F.col("n_conv_events") > F.col("n_base_events"), 1)
            .otherwise(0).alias("converted"))
    )
    arms = per_user.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0))
        .alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0))
        .alias("conv_b"),
    )
    n_a, conv_a = F.col("n_a"), F.col("conv_a")
    n_b, conv_b = F.col("n_b"), F.col("conv_b")
    # an EMPTY arm (every user on one parity — the single_key
    # degenerate profile) has no conversion rate: NULL, not an ANSI
    # crash. Per-arm guards on the 1-row aggregate; dead on harness
    # data (both parities populated); mirrored in the oracle.
    null_d = F.lit(None).cast("double")
    p_a = F.when(n_a == 0, null_d).otherwise(conv_a.cast("double") / n_a)
    p_b = F.when(n_b == 0, null_d).otherwise(conv_b.cast("double") / n_b)
    pooled = (conv_a + conv_b).cast("double") / (n_a + n_b)
    degenerate = (
        (n_a == 0) | (n_b == 0) | (conv_a + conv_b == 0)
        | (conv_a + conv_b == n_a + n_b))
    z = F.when(degenerate, F.lit(None).cast("double")).otherwise(
        (p_a - p_b) / F.sqrt(
            pooled * (1.0 - pooled) * (1.0 / n_a + 1.0 / n_b)))
    from ..compat import QDEC
    return arms.select(
        n_a.cast("bigint").alias("n_a"),
        conv_a.cast("bigint").alias("conv_a"),
        n_b.cast("bigint").alias("n_b"),
        conv_b.cast("bigint").alias("conv_b"),
        p_a.alias("p_a"), p_b.alias("p_b"),
        z.cast(QDEC).cast("double").alias("zscore"),
    )


# ---- HBOS histogram-based outlier score (A42) -------------------------------

HBOS_BINS = 10
HBOS_TOP = 20
_HBOS_FEATS = ("l_quantity", "l_extendedprice", "l_discount")


def _hbos_oracle() -> str:
    mins = ", ".join(f"MIN({f}) AS min_{f}, MAX({f}) AS max_{f}"
                     for f in _HBOS_FEATS)
    def bin_expr(f: str) -> str:
        return (f"CASE WHEN max_{f} = min_{f} THEN 0 ELSE "
                f"LEAST(CAST(floor(({f} - min_{f}) / (max_{f} - min_{f})"
                f" * {HBOS_BINS}) AS BIGINT), {HBOS_BINS - 1}) END")
    bins = ", ".join(f"{bin_expr(f)} AS bin_{f}" for f in _HBOS_FEATS)
    hists = ", ".join(
        f"h_{f} AS (SELECT bin_{f} AS b, COUNT(*) AS c FROM binned"
        f" GROUP BY bin_{f})" for f in _HBOS_FEATS)
    score = " + ".join(
        f"CAST(CAST(-ln(CAST(h_{f}.c AS DOUBLE) / tot.n) AS DECIMAL(18,6))"
        f" AS DOUBLE)" for f in _HBOS_FEATS)
    joins = " ".join(
        f"JOIN h_{f} ON binned.bin_{f} = h_{f}.b" for f in _HBOS_FEATS)
    return f"""
    WITH stats AS (SELECT {mins}, COUNT(*) AS n FROM lineitem),
    binned AS (
      SELECT l_orderkey, l_linenumber, {bins}
      FROM lineitem, stats
    ),
    {hists},
    tot AS (SELECT n FROM stats)
    SELECT binned.l_orderkey, binned.l_linenumber,
           {score} AS hbos_score
    FROM binned {joins} CROSS JOIN tot
    ORDER BY hbos_score DESC, binned.l_orderkey, binned.l_linenumber
    LIMIT {HBOS_TOP}
    """


@query(
    "q_agg_hbos",
    oracle=_hbos_oracle(),
    tags=("A42", "anomaly", "hbos"),
)
def q_agg_hbos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBOS (HISTOGRAM-BASED OUTLIER SCORE) anomaly triage: per line
    item, the sum over features of -ln(bin density) for its
    (quantity, price, discount) histogram bins — the classic
    linear-time unsupervised outlier screen (Goldstein & Dengel 2012):
    a row is anomalous exactly when several of its attributes sit in
    thin histogram bins, and unlike z-scores it needs no normality
    assumption. Returns the top-20 triage list.

    Scale shape: one pass for global min/max/count (broadcast 1-row),
    one pass to bin (pure expressions), three O(bins)-row histogram
    aggregates joined back by BROADCAST (the fact table never
    shuffles), and a TakeOrdered top-k — HBOS is embarrassingly
    parallel, which is why it's the standard first screen at data
    scale. The z-score twin (q_agg_anomaly) flags per-group numeric
    deviation; HBOS composes multiple features into one
    distribution-free score. Determinism: bin edges are
    min/max-derived IEEE (engine-identical); each -ln(density) is
    6-dp-quantized (compat rule 2) and the 3-term sum is a fixed-order
    expression, not an aggregate."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", *_HBOS_FEATS)
    stats = li.agg(
        *[m for f in _HBOS_FEATS
          for m in (F.min(f).alias(f"min_{f}"), F.max(f).alias(f"max_{f}"))],
        F.count(F.lit(1)).alias("n"))

    def bin_col(f: str):
        lo, hi = F.col(f"min_{f}"), F.col(f"max_{f}")
        raw = F.floor((F.col(f) - lo) / (hi - lo) * HBOS_BINS)
        return (F.when(hi == lo, F.lit(0).cast("bigint"))
                .otherwise(F.least(raw.cast("bigint"),
                                   F.lit(HBOS_BINS - 1)))).alias(f"bin_{f}")

    # localCheckpoint stats (1 row, lazy — it materializes inside the
    # cells job below, avoiding a third blocking job) and the joint
    # bin-cell grid (<= HBOS_BINS^3 rows, eager) — r15, guide §1.2
    # step 1: the binned relation fed the probe pass AND the three
    # marginal histograms, each re-deriving the fact scan + stats
    # aggregate (8 scans in one plan). One fact pass now builds the
    # joint cells; the marginals are integer sums of cell counts
    # (bit-identical to the direct counts); the probe pass is the only
    # other fact touch.
    stats = stats.localCheckpoint(eager=False)
    binned = li.crossJoin(F.broadcast(stats)).select(
        "l_orderkey", "l_linenumber", "n",
        *[bin_col(f) for f in _HBOS_FEATS])

    cells = (binned.groupBy(*[f"bin_{f}" for f in _HBOS_FEATS])
             .agg(F.count(F.lit(1)).alias("cc"))
             .localCheckpoint(eager=True))
    out = binned
    for f in _HBOS_FEATS:
        hist = (cells.groupBy(f"bin_{f}")
                .agg(F.sum("cc").alias(f"c_{f}")))
        out = out.join(F.broadcast(hist), f"bin_{f}")
    score = None
    for f in _HBOS_FEATS:
        term = ((-F.log(F.col(f"c_{f}").cast("double") / F.col("n")))
                .cast("decimal(18,6)").cast("double"))
        score = term if score is None else score + term
    return (
        out.select("l_orderkey", "l_linenumber",
                   score.alias("hbos_score"))
        .orderBy(F.col("hbos_score").desc(), "l_orderkey", "l_linenumber")
        .limit(HBOS_TOP)
    )


# ---- Welch's unequal-variance t-test (A43) ----------------------------------

WELCH_EVENT = "purchase"


@query(
    "q_ab_welch",
    oracle=f"""
    WITH arms AS (
      SELECT user_id % 2 AS arm,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(CAST(value AS DECIMAL(20,6))
                           * CAST(value AS DECIMAL(20,6))
                           AS DECIMAL(38,12))) AS DOUBLE) AS s2
      FROM events
      WHERE event_type = '{WELCH_EVENT}'
      GROUP BY 1
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN arm = 0 THEN n END) AS n_a,
        MAX(CASE WHEN arm = 0 THEN s1 END) AS s1_a,
        MAX(CASE WHEN arm = 0 THEN s2 END) AS s2_a,
        MAX(CASE WHEN arm = 1 THEN n END) AS n_b,
        MAX(CASE WHEN arm = 1 THEN s1 END) AS s1_b,
        MAX(CASE WHEN arm = 1 THEN s2 END) AS s2_b
      FROM arms
    ),
    mom AS (
      SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             s1_a / n_a AS mean_a, s1_b / n_b AS mean_b,
             (s2_a - s1_a * s1_a / n_a) / (n_a - 1) / n_a AS va,
             (s2_b - s1_b * s1_b / n_b) / (n_b - 1) / n_b AS vb
      FROM wide
    )
    SELECT n_a, n_b, mean_a, mean_b,
           CASE WHEN va + vb <= 0 THEN NULL
           ELSE CAST(CAST((mean_a - mean_b) / sqrt(va + vb)
                AS DECIMAL(18,6)) AS DOUBLE) END AS t_welch,
           CASE WHEN va + vb <= 0 THEN NULL
           ELSE CAST(CAST((va + vb) * (va + vb)
                / (va * va / (n_a - 1) + vb * vb / (n_b - 1))
                AS DECIMAL(18,6)) AS DOUBLE) END AS df_welch
    FROM mom
    """,
    tags=("A43", "abtest", "inference"),
)
def q_ab_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S UNEQUAL-VARIANCE T-TEST on a continuous metric (purchase
    value) between the two id-parity arms — the companion to the
    proportion z-test (q_ab_proportions) for revenue-per-event /
    latency-style metrics, with the Welch-Satterthwaite degrees of
    freedom that stay honest when arm variances differ (the classic
    failure of pooled Student's t on experiment data). One conditional
    aggregate computes both arms' exact-decimal moments (the q_agg_stats
    two-sum discipline: sum and sum-of-squares quantized, so
    partial/final order never perturbs them); the statistic is assembled
    on ONE row and both outputs are 6-dp-quantized because each passes
    through a division chain and sqrt."""
    e = load(spark, sf_dir, "events").where(
        F.col("event_type") == WELCH_EVENT)
    qv = F.col("value").cast("decimal(20,6)")
    arms = (
        e.select(F.pmod(F.col("user_id"), F.lit(2)).alias("arm"), "value")
        .groupBy("arm")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(qv).cast("double").alias("s1"),
             F.sum((qv * qv).cast("decimal(38,12)")).cast("double")
             .alias("s2"))
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 0, F.col("s1"))).alias("s1_a"),
        F.max(F.when(F.col("arm") == 0, F.col("s2"))).alias("s2_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 1, F.col("s1"))).alias("s1_b"),
        F.max(F.when(F.col("arm") == 1, F.col("s2"))).alias("s2_b"))
    n_a, n_b = F.col("n_a"), F.col("n_b")
    mean_a, mean_b = F.col("s1_a") / n_a, F.col("s1_b") / n_b
    va = (F.col("s2_a") - F.col("s1_a") * F.col("s1_a") / n_a) \
        / (n_a - 1) / n_a
    vb = (F.col("s2_b") - F.col("s1_b") * F.col("s1_b") / n_b) \
        / (n_b - 1) / n_b
    from ..compat import QDEC
    # Both arms constant (zero sample variance — the stuck-feed shape
    # the degenerate sweep forces) leaves t and the Welch-Satterthwaite
    # df undefined: NULL, not an ANSI 0/0 crash.
    t = F.when(va + vb <= 0, F.lit(None).cast("double")) \
        .otherwise((mean_a - mean_b) / F.sqrt(va + vb))
    df = F.when(va + vb <= 0, F.lit(None).cast("double")) \
        .otherwise((va + vb) * (va + vb) / (va * va / (n_a - 1)
                                            + vb * vb / (n_b - 1)))
    return wide.select(
        n_a.cast("bigint").alias("n_a"), n_b.cast("bigint").alias("n_b"),
        mean_a.alias("mean_a"), mean_b.alias("mean_b"),
        t.cast(QDEC).cast("double").alias("t_welch"),
        df.cast(QDEC).cast("double").alias("df_welch"))


# ---- Mann-Whitney U test (A44) ----------------------------------------------

MWU_EVENT = "purchase"


@query(
    "q_ab_mannwhitney",
    oracle=f"""
    WITH vals AS (
      SELECT value AS v, user_id % 2 AS arm
      FROM events WHERE event_type = '{MWU_EVENT}'
    ),
    per_value AS (
      SELECT v,
             SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS c_a,
             SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c_b
      FROM vals GROUP BY v
    ),
    pref AS (
      SELECT v, c_a, c_b,
             COALESCE(SUM(c_b) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cb_less,
             c_a + c_b AS t
      FROM per_value
    ),
    agg AS (
      SELECT SUM(c_a * (2 * cb_less + c_b)) AS u2_a,
             SUM(c_a) AS n_a, SUM(c_b) AS n_b,
             SUM(t * t * t - t) AS tie_sum
      FROM pref
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(u2_a AS BIGINT) AS u2_a,
           CASE WHEN n_a = 0 OR n_b = 0
                     OR (n_a + n_b + 1)
                        - CAST(tie_sum AS DOUBLE)
                          / ((n_a + n_b) * (n_a + n_b - 1)) <= 0
                THEN NULL
                ELSE CAST(CAST(
                  (CAST(u2_a AS DOUBLE) - CAST(n_a AS DOUBLE) * n_b)
                  / (2 * sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
                      * ((n_a + n_b + 1)
                         - CAST(tie_sum AS DOUBLE)
                           / ((n_a + n_b) * (n_a + n_b - 1)))))
                  AS DECIMAL(18,6)) AS DOUBLE) END AS z_mwu
    FROM agg
    """,
    tags=("A44", "abtest", "nonparametric"),
)
def q_ab_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-WHITNEY U TEST (rank-sum) on purchase value between the two
    id-parity arms — the NONPARAMETRIC member of the A/B family
    (q_ab_proportions: binary; q_ab_welch: parametric means; this:
    distribution-free location shift, robust to the heavy-tailed
    revenue distributions that break t-tests). The U statistic is
    computed WITHOUT ranking rows: collapse to DISTINCT VALUES with
    per-arm counts, one prefix-sum window over the value-level relation
    (bounded by value cardinality, not row count), and
    2*U_a = sum c_a*(2*C_b(<v) + c_b(v)) — the cross-pair count with
    half-credit ties, kept as an exact INTEGER by the factor-2 scaling.
    The tie-corrected normal approximation divides exact integer
    moments once in double (quantized, degenerate-variance NULL guard).

    At 100 TB the value-level collapse is the entire trick: ranks need
    a global sort of rows, but U only needs per-value pair counts, so
    the shuffle carries (value, c_a, c_b) — metric value cardinality —
    and the window runs on that bounded relation."""
    e = load(spark, sf_dir, "events").where(
        F.col("event_type") == MWU_EVENT)
    vals = e.select(F.col("value").alias("v"),
                    F.pmod(F.col("user_id"), F.lit(2)).alias("arm"))
    return mannwhitney_u(vals)


def mannwhitney_u(vals: DataFrame) -> DataFrame:
    """Mann-Whitney U over a (v, arm) relation (arm 0/1): the
    rank-free value-level computation documented in q_ab_mannwhitney.
    Library form, property-tested against naive pair counting on
    tie-heavy random inputs (tests/test_properties_r8.py)."""
    from pyspark.sql import Window

    per_value = (
        vals.groupBy("v")
        .agg(F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("c_a"),
             F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("c_b"))
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    pref = per_value.select(
        "c_a", "c_b",
        F.coalesce(F.sum("c_b").over(wv), F.lit(0)).alias("cb_less"),
        (F.col("c_a") + F.col("c_b")).alias("t"))
    agg = pref.agg(
        F.sum(F.col("c_a") * (2 * F.col("cb_less") + F.col("c_b")))
        .alias("u2_a"),
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .alias("tie_sum"))
    n_a, n_b, u2a = F.col("n_a"), F.col("n_b"), F.col("u2_a")
    n = n_a + n_b
    tie_adj = (n + 1) - F.col("tie_sum").cast("double") / (n * (n - 1))
    var = n_a.cast("double") * n_b / 12.0 * tie_adj
    degenerate = (n_a == 0) | (n_b == 0) | (tie_adj <= 0)
    z = F.when(degenerate, F.lit(None).cast("double")).otherwise(
        (u2a.cast("double") - n_a.cast("double") * n_b)
        / (2 * F.sqrt(var)))
    from ..compat import QDEC
    return agg.select(
        n_a.cast("bigint").alias("n_a"),
        n_b.cast("bigint").alias("n_b"),
        u2a.cast("bigint").alias("u2_a"),
        z.cast(QDEC).cast("double").alias("z_mwu"))


# ---- CUPED variance reduction (A45) -----------------------------------------

CUPED_CUTOFF = "2024-01-16 00:00:00"  # pre/post split (= incremental cutoff)
CUPED_EVENT = "purchase"


@query(
    "q_ab_cuped",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
                                < TIMESTAMP '{CUPED_CUTOFF}'
                      THEN CAST(value AS DECIMAL(20,6)) ELSE 0 END)
                  AS DOUBLE) AS x,
             CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
                                >= TIMESTAMP '{CUPED_CUTOFF}'
                      THEN CAST(value AS DECIMAL(20,6)) ELSE 0 END)
                  AS DOUBLE) AS y
      FROM events
      WHERE event_type = '{CUPED_EVENT}'
      GROUP BY user_id
    ),
    mom AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(x * x AS DECIMAL(27,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(x * y AS DECIMAL(27,6))) AS DOUBLE) AS sxy
      FROM per_user
    ),
    theta AS (
      SELECT n, sx / n AS mean_x,
             CASE WHEN sxx - sx * sx / n = 0 THEN 0.0
                  ELSE (sxy - (SELECT
                                 CAST(SUM(CAST(y AS DECIMAL(20,6)))
                                      AS DOUBLE) FROM per_user)
                              * sx / n)
                       / (sxx - sx * sx / n) END AS th
      FROM mom
    ),
    adj AS (
      SELECT arm, y, y - th * (x - mean_x) AS y_adj
      FROM per_user, theta
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CAST(y AS DECIMAL(20,6))) AS DOUBLE)
             / COUNT(*) AS mean_y,
           CAST(SUM(CAST(y_adj AS DECIMAL(20,6))) AS DOUBLE)
             / COUNT(*) AS mean_y_adj,
           CASE WHEN COUNT(*) = 1 THEN NULL
           ELSE CAST(CAST(
             (CAST(SUM(CAST(CAST(y AS DECIMAL(20,6))
                            * CAST(y AS DECIMAL(20,6))
                            AS DECIMAL(38,12))) AS DOUBLE)
              - CAST(SUM(CAST(y AS DECIMAL(20,6))) AS DOUBLE) ** 2
                / COUNT(*)) / (COUNT(*) - 1)
             AS DECIMAL(18,6)) AS DOUBLE) END AS var_y,
           CASE WHEN COUNT(*) = 1 THEN NULL
           ELSE CAST(CAST(
             (CAST(SUM(CAST(CAST(y_adj AS DECIMAL(20,6))
                            * CAST(y_adj AS DECIMAL(20,6))
                            AS DECIMAL(38,12))) AS DOUBLE)
              - CAST(SUM(CAST(y_adj AS DECIMAL(20,6))) AS DOUBLE) ** 2
                / COUNT(*)) / (COUNT(*) - 1)
             AS DECIMAL(18,6)) AS DOUBLE) END AS var_y_adj
    FROM adj
    GROUP BY arm
    """,
    tags=("A45", "abtest", "cuped"),
)
def q_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED VARIANCE REDUCTION (controlled-experiment using pre-period
    data): each user's post-period purchase value is adjusted by their
    PRE-period value, y_adj = y - theta*(x - mean(x)) with theta =
    cov(x,y)/var(x) — the standard experimentation-platform trick that
    shrinks metric variance (so experiments reach significance with a
    fraction of the traffic) without biasing the arm means, because the
    pre-period covariate is independent of assignment. Reports per-arm
    raw and adjusted means and variances: var_y_adj / var_y is the
    realized variance-reduction factor the platform monitors.

    Shape: one pass over purchase events -> per-user (pre, post) sums;
    one 1-row pooled moment aggregate (broadcast); one map-side adjust;
    one per-arm aggregate. theta's moments and all variances use the
    exact-decimal two-sum discipline end to end, and both variance
    outputs are 6-dp-quantized (they sit at the end of the longest
    division chains). Degenerate var(x)=0 (no pre-period signal) pins
    theta to 0 — CUPED degrades gracefully to the unadjusted metric."""
    e = load(spark, sf_dir, "events").where(
        F.col("event_type") == CUPED_EVENT)
    cutoff = F.lit(CUPED_CUTOFF).cast("timestamp")
    qv = F.col("value").cast("decimal(20,6)")
    zero = F.lit(0).cast("decimal(20,6)")
    per_user = (
        e.groupBy("user_id")
        .agg(F.sum(F.when(F.col("ts") < cutoff, qv).otherwise(zero))
             .cast("double").alias("x"),
             F.sum(F.when(F.col("ts") >= cutoff, qv).otherwise(zero))
             .cast("double").alias("y"))
        .select(F.pmod(F.col("user_id"), F.lit(2)).alias("arm"), "x", "y")
    )
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(20,6)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(20,6)")).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(27,6)"))
        .cast("double").alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(27,6)"))
        .cast("double").alias("sxy"))
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    varx = sxx - sx * sx / n
    th = F.when(varx == 0, F.lit(0.0)).otherwise(
        (sxy - sy * sx / n) / varx)
    theta = mom.select(n.alias("n"), (sx / n).alias("mean_x"),
                       th.alias("th"))
    adj = per_user.crossJoin(F.broadcast(theta)).select(
        "arm", "y",
        (F.col("y") - F.col("th") * (F.col("x") - F.col("mean_x")))
        .alias("y_adj"))

    def var_of(col: str):
        # a single-user arm (total key collapse — the single_key
        # degenerate profile) has no sample variance: NULL, not an
        # ANSI crash on the n-1 divisor. Per-arm aggregate row, dead
        # on harness data; mirrored in the oracle.
        qy = F.col(col).cast("decimal(20,6)")
        s1 = F.sum(qy).cast("double")
        s2 = F.sum((qy * qy).cast("decimal(38,12)")).cast("double")
        cnt = F.count(F.lit(1))
        return F.when(cnt == 1, F.lit(None).cast("double")).otherwise(
            ((s2 - s1 * s1 / cnt) / (cnt - F.lit(1)))
            .cast("decimal(18,6)").cast("double"))

    return (
        adj.groupBy("arm")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"),
             (F.sum(F.col("y").cast("decimal(20,6)")).cast("double")
              / F.count(F.lit(1))).alias("mean_y"),
             (F.sum(F.col("y_adj").cast("decimal(20,6)")).cast("double")
              / F.count(F.lit(1))).alias("mean_y_adj"),
             var_of("y").alias("var_y"),
             var_of("y_adj").alias("var_y_adj"))
        .select(F.col("arm").cast("bigint").alias("arm"),
                "n_users", "mean_y", "mean_y_adj", "var_y", "var_y_adj")
    )


# ---- Poisson-bootstrap confidence interval (A46) ----------------------------

BOOT_REPS = 40
BOOT_EVENT = "purchase"
# Poisson(1) inverse-CDF thresholds (cumulative e^-1 * sum 1/k!): the
# per-(user, replicate) resample weight is how many times the user's
# metric enters that replicate — the only bootstrap that works without
# materializing N resampled copies of the data.
_POIS_CUM = (0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
             0.9810118431238462, 0.9963401531726563, 0.9994058151824183)


def _boot_weight_sql(u: str) -> str:
    branches = "".join(
        f" WHEN {u} < CAST({c!r} AS DOUBLE) THEN {k}"
        for k, c in enumerate(_POIS_CUM))
    return f"CASE{branches} ELSE {len(_POIS_CUM)} END"


@query(
    "q_ab_bootstrap",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS y
      FROM events WHERE event_type = '{BOOT_EVENT}'
      GROUP BY user_id
    ),
    reps AS (
      SELECT p.user_id, p.arm, p.y, g.b,
             {_boot_weight_sql(
                 f"CAST(((p.user_id * {BOOT_REPS} + g.b)"
                 f" % {2147483648}) * {2654435761}"
                 f" % {4294967296} AS DOUBLE) / {4294967296}")} AS w
      FROM per_user p, range(0, {BOOT_REPS}) g(b)
    ),
    rep_arm AS (
      SELECT b, arm, SUM(w) AS wsum,
             CAST(SUM(CAST(w * y AS DECIMAL(27,6))) AS DOUBLE) AS wy
      FROM reps GROUP BY b, arm
    ),
    rep_diff AS (
      SELECT b,
             MAX(CASE WHEN arm = 0 AND wsum > 0 THEN wy / wsum END)
             - MAX(CASE WHEN arm = 1 AND wsum > 0 THEN wy / wsum END)
               AS diff
      FROM rep_arm GROUP BY b
    ),
    point AS (
      SELECT CAST(SUM(CASE WHEN arm = 0
                      THEN CAST(y AS DECIMAL(20,6)) END) AS DOUBLE)
             / SUM(CASE WHEN arm = 0 THEN 1 END)
             - CAST(SUM(CASE WHEN arm = 1
                        THEN CAST(y AS DECIMAL(20,6)) END) AS DOUBLE)
               / SUM(CASE WHEN arm = 1 THEN 1 END) AS point_diff
      FROM per_user
    )
    SELECT point.point_diff,
           CAST(COUNT(rep_diff.diff) AS BIGINT) AS n_reps,
           quantile_cont(rep_diff.diff, 0.025) AS ci_lo,
           quantile_cont(rep_diff.diff, 0.975) AS ci_hi
    FROM rep_diff CROSS JOIN point
    GROUP BY point.point_diff
    """,
    tags=("A46", "abtest", "bootstrap"),
)
def q_ab_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON-BOOTSTRAP CONFIDENCE INTERVAL for the arm-mean difference
    of per-user purchase value: every (user, replicate) pair draws a
    Poisson(1) resample weight from a DETERMINISTIC hash, each replicate
    computes the weighted mean difference, and the 2.5/97.5 percentiles
    of the replicate diffs are the CI — the bootstrap that scales,
    because no replicate ever materializes a resampled copy of the data
    (the classic with-replacement bootstrap cannot be expressed as a
    scan; the Poisson approximation is exchangeable with it at n >> 1
    and is the standard at-scale formulation). Complements the closed-
    form tests (z/t/U): the bootstrap makes no distributional
    assumption and generalizes to any plug-in statistic.

    Scale shape: one event pass -> per-user sums; the replicate grid
    multiplies USERS x B (not events x B) and immediately collapses to
    B x 2 weighted moments in one partial/final aggregate; everything
    after is O(B) rows. Weights come from the house Knuth-hash
    uniform (sampling.uniform_unit semantics inlined over the combined
    (user, replicate) key) so any engine draws identical weights;
    weighted sums are decimal-quantized; the percentile runs over B
    identical doubles (same interpolation as quantile_cont, proven by
    q_agg_stats). Empty arms yield NULL replicate diffs, excluded
    identically by both percentile implementations."""
    from ..llm.sampling import uniform_unit

    e = load(spark, sf_dir, "events").where(
        F.col("event_type") == BOOT_EVENT)
    per_user = (
        e.groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(20,6)")).cast("double")
             .alias("y"))
        .select("user_id", F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
                "y")
    )
    b_ids = spark.range(BOOT_REPS).select(F.col("id").alias("b"))
    u = uniform_unit(F.col("user_id") * BOOT_REPS + F.col("b"))
    w = F.lit(len(_POIS_CUM))
    for k in range(len(_POIS_CUM) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS_CUM[k]), F.lit(k)).otherwise(w)
    reps = per_user.crossJoin(F.broadcast(b_ids)).select(
        "arm", "y", "b", w.alias("w"))
    rep_arm = reps.groupBy("b", "arm").agg(
        F.sum("w").alias("wsum"),
        F.sum((F.col("w") * F.col("y")).cast("decimal(27,6)"))
        .cast("double").alias("wy"))
    mean_of = [
        F.max(F.when((F.col("arm") == a) & (F.col("wsum") > 0),
                     F.col("wy") / F.col("wsum")))
        for a in (0, 1)]
    rep_diff = rep_arm.groupBy("b").agg(
        (mean_of[0] - mean_of[1]).alias("diff"))
    point = per_user.agg(
        (F.sum(F.when(F.col("arm") == 0,
                      F.col("y").cast("decimal(20,6)"))).cast("double")
         / F.sum(F.when(F.col("arm") == 0, 1))
         - F.sum(F.when(F.col("arm") == 1,
                        F.col("y").cast("decimal(20,6)"))).cast("double")
         / F.sum(F.when(F.col("arm") == 1, 1))).alias("point_diff"))
    return (
        rep_diff.crossJoin(F.broadcast(point))
        .groupBy("point_diff")
        .agg(F.count("diff").cast("bigint").alias("n_reps"),
             F.percentile("diff", F.lit(0.025)).alias("ci_lo"),
             F.percentile("diff", F.lit(0.975)).alias("ci_hi"))
        .select("point_diff", "n_reps", "ci_lo", "ci_hi")
    )


# ---- Sequential A/B monitoring with an O'Brien-Fleming boundary (A47) -------

SEQ_EVENT = "purchase"
Z_ALPHA_2 = 1.959964  # two-sided alpha = 0.05
Z_POWER_80 = 0.841621  # 80% power


@query(
    "q_ab_sequential",
    oracle=f"""
    WITH per_day AS (
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE)
               AS day,
             user_id % 2 AS arm,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(CAST(value AS DECIMAL(20,6))
                           * CAST(value AS DECIMAL(20,6))
                           AS DECIMAL(38,12))) AS DOUBLE) AS s2
      FROM events WHERE event_type = '{SEQ_EVENT}'
      GROUP BY 1, 2
    ),
    daily AS (
      SELECT day,
             COALESCE(MAX(CASE WHEN arm = 0 THEN n END), 0) AS dn_a,
             COALESCE(MAX(CASE WHEN arm = 0 THEN s1 END), 0) AS ds1_a,
             COALESCE(MAX(CASE WHEN arm = 0 THEN s2 END), 0) AS ds2_a,
             COALESCE(MAX(CASE WHEN arm = 1 THEN n END), 0) AS dn_b,
             COALESCE(MAX(CASE WHEN arm = 1 THEN s1 END), 0) AS ds1_b,
             COALESCE(MAX(CASE WHEN arm = 1 THEN s2 END), 0) AS ds2_b
      FROM per_day GROUP BY day
    ),
    cum AS (
      SELECT day,
             SUM(dn_a) OVER w AS n_a, SUM(ds1_a) OVER w AS s1_a,
             SUM(ds2_a) OVER w AS s2_a,
             SUM(dn_b) OVER w AS n_b, SUM(ds1_b) OVER w AS s1_b,
             SUM(ds2_b) OVER w AS s2_b,
             SUM(dn_a + dn_b) OVER () AS n_total
      FROM daily
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    mom AS (
      SELECT day, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
             CAST(n_a + n_b AS DOUBLE) / n_total AS info_frac,
             s1_a / n_a AS mean_a, s1_b / n_b AS mean_b,
             CASE WHEN n_a > 1
                  THEN (s2_a - s1_a * s1_a / n_a) / (n_a - 1) / n_a END
               AS va,
             CASE WHEN n_b > 1
                  THEN (s2_b - s1_b * s1_b / n_b) / (n_b - 1) / n_b END
               AS vb
      FROM cum
    )
    SELECT day, n_a, n_b,
           CAST(CAST(info_frac AS DECIMAL(18,6)) AS DOUBLE) AS info_frac,
           CASE WHEN va IS NULL OR vb IS NULL OR va + vb <= 0 THEN NULL
                ELSE CAST(CAST((mean_a - mean_b) / sqrt(va + vb)
                     AS DECIMAL(18,6)) AS DOUBLE) END AS z,
           CAST(CAST({Z_ALPHA_2} AS DOUBLE) / sqrt(info_frac)
                AS DECIMAL(18,6)) AS z_bound,
           CASE WHEN va IS NULL OR vb IS NULL OR va + vb <= 0 THEN NULL
                ELSE abs((mean_a - mean_b) / sqrt(va + vb))
                     >= CAST({Z_ALPHA_2} AS DOUBLE) / sqrt(info_frac) END
             AS crossed
    FROM mom
    """,
    tags=("A47", "abtest", "sequential"),
)
def q_ab_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-SEQUENTIAL A/B MONITORING: the Welch z of the purchase-value
    metric recomputed at every daily look, each compared against an
    O'Brien-Fleming-style spending boundary z_bound = z_alpha/2 /
    sqrt(information fraction) — the always-peeking discipline that lets
    an experimenter stop early without inflating false positives (naive
    daily peeking at a flat 1.96 roughly triples alpha). One row per
    look: cumulative per-arm counts, information fraction, the z
    statistic, the boundary, and the crossing flag.

    Shape for 100 TB: the raw stream collapses to per-(day, arm) moments
    in ONE hash aggregate (the same two-sum discipline as q_ab_welch —
    sums decimal-quantized so partial/final order never perturbs them);
    all cumulative arithmetic then runs over the day-cardinality-bounded
    relation (~30 rows here, <=3650 for a decade), so the unpartitioned
    window is a deliberate bounded-metadata pass, not a data-scale sort.
    Early looks with n<2 in either arm yield NULL z (insufficient
    variance information), mirrored exactly in the oracle; boundary and
    z are 6-dp-quantized on both sides (division + sqrt chains).

    The boundary shape is the standard OBF approximation (Lan-DeMets
    alpha-spending family); the z_alpha/2 constant is pinned so both
    engines compare against identical bytes."""
    from ..compat import QDEC

    e = load(spark, sf_dir, "events").where(
        F.col("event_type") == SEQ_EVENT)
    qv = F.col("value").cast("decimal(20,6)")
    per_day = (
        e.select(
            F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
            F.pmod(F.col("user_id"), F.lit(2)).alias("arm"), "value")
        .groupBy("day", "arm")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(qv).cast("double").alias("s1"),
             F.sum((qv * qv).cast("decimal(38,12)")).cast("double")
             .alias("s2"))
    )
    def arm_col(a: int, c: str):
        return F.coalesce(
            F.max(F.when(F.col("arm") == a, F.col(c))), F.lit(0))
    daily = per_day.groupBy("day").agg(
        arm_col(0, "n").alias("dn_a"), arm_col(0, "s1").alias("ds1_a"),
        arm_col(0, "s2").alias("ds2_a"),
        arm_col(1, "n").alias("dn_b"), arm_col(1, "s1").alias("ds1_b"),
        arm_col(1, "s2").alias("ds2_b"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy(F.lit(1))
    cum = daily.select(
        "day",
        F.sum("dn_a").over(w).alias("n_a"),
        F.sum("ds1_a").over(w).alias("s1_a"),
        F.sum("ds2_a").over(w).alias("s2_a"),
        F.sum("dn_b").over(w).alias("n_b"),
        F.sum("ds1_b").over(w).alias("s1_b"),
        F.sum("ds2_b").over(w).alias("s2_b"),
        F.sum(F.col("dn_a") + F.col("dn_b")).over(wall).alias("n_total"))
    n_a, n_b = F.col("n_a"), F.col("n_b")
    info = (n_a + n_b).cast("double") / F.col("n_total")
    mean_a, mean_b = F.col("s1_a") / n_a, F.col("s1_b") / n_b
    va = F.when(n_a > 1, (F.col("s2_a") - F.col("s1_a") * F.col("s1_a")
                          / n_a) / (n_a - 1) / n_a)
    vb = F.when(n_b > 1, (F.col("s2_b") - F.col("s1_b") * F.col("s1_b")
                          / n_b) / (n_b - 1) / n_b)
    z_raw = (mean_a - mean_b) / F.sqrt(va + vb)
    bound = F.lit(Z_ALPHA_2) / F.sqrt(info)
    bad = va.isNull() | vb.isNull() | (va + vb <= 0)
    z = F.when(bad, F.lit(None).cast("double")).otherwise(z_raw)
    crossed = F.when(bad, F.lit(None).cast("boolean")).otherwise(
        F.abs(z_raw) >= bound)
    return cum.select(
        "day", n_a.cast("bigint").alias("n_a"),
        n_b.cast("bigint").alias("n_b"),
        info.cast(QDEC).cast("double").alias("info_frac"),
        z.cast(QDEC).cast("double").alias("z"),
        bound.cast(QDEC).cast("double").alias("z_bound"),
        crossed.alias("crossed"))


# ---- Sample-ratio-mismatch guardrail (A48) ----------------------------------

SRM_CHI2_95 = 3.841459  # chi-square 95th percentile, 1 df


@query(
    "q_ab_srm",
    oracle="""
    WITH users AS (
      SELECT DISTINCT user_id, user_id % 2 AS arm FROM events
    ),
    counts AS (
      SELECT SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b
      FROM users
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CASE WHEN n_a + n_b = 0 THEN NULL
                ELSE CAST(CAST(
                  CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / (n_a + n_b)
                  AS DECIMAL(18,6)) AS DOUBLE) END AS chi2,
           CASE WHEN n_a + n_b = 0 THEN NULL
                ELSE CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
                     / (n_a + n_b) > 3.841459 END AS srm_detected
    FROM counts
    """,
    tags=("A48", "abtest", "guardrail"),
)
def q_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO-MISMATCH GUARDRAIL: chi-square goodness-of-fit of
    the observed arm assignment against the designed 50/50 split — the
    first check every experimentation platform runs, because a biased
    assignment (bot filtering, logging loss, redirect bugs) silently
    invalidates every downstream statistic no matter how significant it
    looks. For an even split the statistic reduces to the exact integer
    form (n_a - n_b)^2 / (n_a + n_b), so the only float op is one final
    division: engine-identical by construction, belt-quantized anyway.
    One distinct-users aggregate + one single-row assembly; the distinct
    is the same user_id shuffle every A/B query here already pays."""
    from ..compat import QDEC

    e = load(spark, sf_dir, "events")
    users = e.select("user_id").distinct().select(
        F.pmod(F.col("user_id"), F.lit(2)).alias("arm"))
    counts = users.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"))
    n_a, n_b = F.col("n_a"), F.col("n_b")
    chi2 = ((n_a - n_b) * (n_a - n_b)).cast("double") / (n_a + n_b)
    empty = (n_a + n_b) == 0
    return counts.select(
        n_a.cast("bigint").alias("n_a"), n_b.cast("bigint").alias("n_b"),
        F.when(empty, F.lit(None).cast("double"))
        .otherwise(chi2.cast(QDEC).cast("double")).alias("chi2"),
        F.when(empty, F.lit(None).cast("boolean"))
        .otherwise(chi2 > SRM_CHI2_95).alias("srm_detected"))


# ---- Minimum detectable effect / sizing report (A49) -------------------------


@query(
    "q_ab_power",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END)
                     > SUM(CASE WHEN event_type = 'click'
                           THEN 1 ELSE 0 END)
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
             SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b,
             SUM(converted) AS conv
      FROM per_user
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CASE WHEN n_a + n_b = 0 THEN NULL
                ELSE CAST(conv AS DOUBLE) / (n_a + n_b) END AS p_pooled,
           CASE WHEN n_a = 0 OR n_b = 0 OR conv = 0
                     OR conv = n_a + n_b THEN NULL
                ELSE CAST(CAST(
                  ({Z_ALPHA_2} + {Z_POWER_80})
                  * sqrt(CAST(conv AS DOUBLE) / (n_a + n_b)
                         * (1.0 - CAST(conv AS DOUBLE) / (n_a + n_b))
                         * (1.0 / n_a + 1.0 / n_b))
                  AS DECIMAL(18,6)) AS DOUBLE) END AS mde_abs,
           CASE WHEN n_a = 0 OR n_b = 0 OR conv = 0
                     OR conv = n_a + n_b THEN NULL
                ELSE CAST(CAST(
                  ({Z_ALPHA_2} + {Z_POWER_80})
                  * sqrt(CAST(conv AS DOUBLE) / (n_a + n_b)
                         * (1.0 - CAST(conv AS DOUBLE) / (n_a + n_b))
                         * (1.0 / n_a + 1.0 / n_b))
                  / (CAST(conv AS DOUBLE) / (n_a + n_b))
                  AS DECIMAL(18,6)) AS DOUBLE) END AS mde_rel
    FROM arms
    """,
    tags=("A49", "abtest", "sizing"),
)
def q_ab_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXPERIMENT SIZING REPORT: the minimum detectable effect (MDE) of
    the running conversion experiment at 80% power / two-sided 5% alpha,
    from the observed pooled rate and arm sizes — the number a reviewer
    reads BEFORE the significance column ('a 2% lift is invisible at
    this traffic; only >= mde_rel would have been detectable'). Uses the
    standard normal-approximation sizing identity
    mde = (z_alpha/2 + z_power) * sqrt(p(1-p)(1/n_a + 1/n_b)); both z
    constants are pinned literals so the arithmetic is byte-identical
    across engines, and the outputs are 6-dp-quantized (division + sqrt
    chain). Same per-user conversion reduction as q_ab_proportions (one
    user_id shuffle), one-row assembly after."""
    from ..compat import QDEC

    e = load(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == AB_CONVERT_EVENT, 1)
                  .otherwise(0)).alias("nc"),
            F.sum(F.when(F.col("event_type") == AB_BASELINE_EVENT, 1)
                  .otherwise(0)).alias("nb"))
        .select(
            F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
            F.when(F.col("nc") > F.col("nb"), 1).otherwise(0)
            .alias("converted")))
    arms = per_user.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum("converted").alias("conv"))
    n_a, n_b, conv = F.col("n_a"), F.col("n_b"), F.col("conv")
    p = conv.cast("double") / (n_a + n_b)
    mde = F.lit(Z_ALPHA_2 + Z_POWER_80) * F.sqrt(
        p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b))
    degenerate = ((n_a == 0) | (n_b == 0) | (conv == 0)
                  | (conv == n_a + n_b))
    null_d = F.lit(None).cast("double")
    return arms.select(
        n_a.cast("bigint").alias("n_a"), n_b.cast("bigint").alias("n_b"),
        F.when((n_a + n_b) == 0, null_d).otherwise(p).alias("p_pooled"),
        F.when(degenerate, null_d)
        .otherwise(mde.cast(QDEC).cast("double")).alias("mde_abs"),
        F.when(degenerate, null_d)
        .otherwise((mde / p).cast(QDEC).cast("double")).alias("mde_rel"))


# ---- Delta-method ratio-metric test (A50) ------------------------------------


@query(
    "q_ab_delta",
    oracle="""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN CAST(value AS DECIMAL(20,6)) ELSE 0 END)
                  AS DOUBLE) AS y,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS d
      FROM events GROUP BY user_id
    ),
    mom AS (
      SELECT arm, COUNT(*) AS k,
             CAST(SUM(CAST(y AS DECIMAL(20,6))) AS DOUBLE) AS sy,
             CAST(SUM(d) AS DOUBLE) AS sd,
             CAST(SUM(CAST(CAST(y AS DECIMAL(20,6))
                           * CAST(y AS DECIMAL(20,6))
                           AS DECIMAL(38,12))) AS DOUBLE) AS syy,
             CAST(SUM(d * d) AS DOUBLE) AS sdd,
             CAST(SUM(CAST(CAST(y AS DECIMAL(20,6)) * d
                           AS DECIMAL(38,12))) AS DOUBLE) AS syd
      FROM per_user GROUP BY arm
    ),
    stats AS (
      SELECT arm, k, sy / sd AS r,
             (syy - sy * sy / k) / (k - 1) AS vyy,
             (sdd - sd * sd / k) / (k - 1) AS vdd,
             (syd - sy * sd / k) / (k - 1) AS vyd,
             sd / k AS dbar
      FROM mom WHERE k > 1 AND sd > 0
    ),
    var_r AS (
      SELECT arm, k, r,
             (vyy - 2 * r * vyd + r * r * vdd) / (k * dbar * dbar)
               AS vr
      FROM stats
    ),
    wide AS (
      SELECT MAX(CASE WHEN arm = 0 THEN k END) AS k_a,
             MAX(CASE WHEN arm = 0 THEN r END) AS r_a,
             MAX(CASE WHEN arm = 0 THEN vr END) AS vr_a,
             MAX(CASE WHEN arm = 1 THEN k END) AS k_b,
             MAX(CASE WHEN arm = 1 THEN r END) AS r_b,
             MAX(CASE WHEN arm = 1 THEN vr END) AS vr_b
      FROM var_r
    )
    SELECT CAST(k_a AS BIGINT) AS k_a, CAST(k_b AS BIGINT) AS k_b,
           CAST(CAST(r_a AS DECIMAL(18,6)) AS DOUBLE) AS ratio_a,
           CAST(CAST(r_b AS DECIMAL(18,6)) AS DOUBLE) AS ratio_b,
           CASE WHEN k_a IS NULL OR k_b IS NULL
                     OR vr_a + vr_b <= 0 THEN NULL
                ELSE CAST(CAST((r_a - r_b) / sqrt(vr_a + vr_b)
                     AS DECIMAL(18,6)) AS DOUBLE) END AS z_delta
    FROM wide
    """,
    tags=("A50", "abtest", "ratio-metric"),
)
def q_ab_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELTA-METHOD RATIO-METRIC TEST: revenue-per-click compared
    between arms with the variance computed by the delta method over
    USER-level aggregates — the correct treatment of ratio metrics
    whose numerator and denominator are correlated within a user
    (naive per-event variance understates it badly and overcalls
    significance; randomization is by user, so the user is the i.i.d.
    unit). Var(Y/D) ~ (s_yy - 2R*s_yd + R^2*s_dd) / (k * dbar^2) per
    arm, then a two-sample z on the ratio difference.

    One user_id hash aggregate reduces events to per-user (y, d); one
    conditional aggregate per arm computes the five exact-decimal
    moments; the statistic assembles on ONE row. Arms with k<=1 users
    or zero denominator yield NULL (the guard matches the oracle
    term for term). Ratios and z are 6-dp-quantized (division/sqrt
    chains); all sums are decimal-quantized so partial/final
    aggregation order never perturbs them."""
    from ..compat import QDEC

    e = load(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == AB_CONVERT_EVENT,
                         F.col("value").cast("decimal(20,6)"))
                  .otherwise(F.lit(0).cast("decimal(20,6)")))
            .cast("double").alias("y"),
            F.sum(F.when(F.col("event_type") == AB_BASELINE_EVENT, 1)
                  .otherwise(0)).alias("d"))
        .select(F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
                "y", "d"))
    qy = F.col("y").cast("decimal(20,6)")
    mom = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(qy).cast("double").alias("sy"),
        F.sum("d").cast("double").alias("sd"),
        F.sum((qy * qy).cast("decimal(38,12)")).cast("double")
        .alias("syy"),
        F.sum(F.col("d") * F.col("d")).cast("double").alias("sdd"),
        F.sum((qy * F.col("d")).cast("decimal(38,12)")).cast("double")
        .alias("syd"))
    k, sy, sd = F.col("k"), F.col("sy"), F.col("sd")
    stats = mom.where((k > 1) & (sd > 0)).select(
        "arm", "k",
        (sy / sd).alias("r"),
        ((F.col("syy") - sy * sy / k) / (k - 1)).alias("vyy"),
        ((F.col("sdd") - sd * sd / k) / (k - 1)).alias("vdd"),
        ((F.col("syd") - sy * sd / k) / (k - 1)).alias("vyd"),
        (sd / k).alias("dbar"))
    r = F.col("r")
    var_r = stats.select(
        "arm", "k", "r",
        ((F.col("vyy") - 2 * r * F.col("vyd") + r * r * F.col("vdd"))
         / (F.col("k") * F.col("dbar") * F.col("dbar"))).alias("vr"))
    wide = var_r.agg(
        F.max(F.when(F.col("arm") == 0, F.col("k"))).alias("k_a"),
        F.max(F.when(F.col("arm") == 0, F.col("r"))).alias("r_a"),
        F.max(F.when(F.col("arm") == 0, F.col("vr"))).alias("vr_a"),
        F.max(F.when(F.col("arm") == 1, F.col("k"))).alias("k_b"),
        F.max(F.when(F.col("arm") == 1, F.col("r"))).alias("r_b"),
        F.max(F.when(F.col("arm") == 1, F.col("vr"))).alias("vr_b"))
    r_a, r_b = F.col("r_a"), F.col("r_b")
    vr_sum = F.col("vr_a") + F.col("vr_b")
    bad = (F.col("k_a").isNull() | F.col("k_b").isNull()
           | (vr_sum <= 0))
    z = F.when(bad, F.lit(None).cast("double")).otherwise(
        (r_a - r_b) / F.sqrt(vr_sum))
    return wide.select(
        F.col("k_a").cast("bigint").alias("k_a"),
        F.col("k_b").cast("bigint").alias("k_b"),
        r_a.cast(QDEC).cast("double").alias("ratio_a"),
        r_b.cast(QDEC).cast("double").alias("ratio_b"),
        z.cast(QDEC).cast("double").alias("z_delta"))


# ---- Bloom-filter membership audit (A51) -------------------------------------

BLOOM_BITS = 4096
BLOOM_HASHES = 3  # md5 hex slices (1-8, 9-16, 17-24) mod BLOOM_BITS


def _bloom_pos_sql(key_expr: str) -> list[str]:
    return [
        f"CAST(concat('0x', substr(md5(CAST({key_expr} AS VARCHAR)), "
        f"{1 + 8 * i}, 8)) AS BIGINT) % {BLOOM_BITS}"
        for i in range(BLOOM_HASHES)
    ]


@query(
    "q_agg_bloom",
    oracle=f"""
    WITH built AS (
      SELECT DISTINCT pos FROM (
        SELECT unnest([{", ".join(_bloom_pos_sql("o_custkey"))}]) AS pos
        FROM (SELECT DISTINCT o_custkey FROM orders)
      )
    ),
    probe AS (
      SELECT c_custkey,
             unnest([{", ".join(_bloom_pos_sql("c_custkey"))}]) AS pos
      FROM customer
    ),
    verdicts AS (
      SELECT p.c_custkey,
             CASE WHEN COUNT(b.pos) = {BLOOM_HASHES}
                  THEN 1 ELSE 0 END AS bloom_pos
      FROM probe p LEFT JOIN built b ON p.pos = b.pos
      GROUP BY p.c_custkey
    ),
    truth AS (
      SELECT c.c_custkey,
             CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END
               AS member
      FROM customer c
      LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
        ON c.c_custkey = o.o_custkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(t.member) AS BIGINT) AS n_members,
           CAST(SUM(v.bloom_pos) AS BIGINT) AS n_bloom_positive,
           CAST(SUM(CASE WHEN v.bloom_pos = 1 AND t.member = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positive,
           CAST(SUM(CASE WHEN v.bloom_pos = 0 AND t.member = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_false_negative,
           CASE WHEN SUM(1 - t.member) = 0 THEN NULL
                ELSE CAST(CAST(
                  CAST(SUM(CASE WHEN v.bloom_pos = 1 AND t.member = 0
                           THEN 1 ELSE 0 END) AS DOUBLE)
                  / SUM(1 - t.member)
                  AS DECIMAL(18,6)) AS DOUBLE) END AS false_positive_rate
    FROM verdicts v JOIN truth t ON v.c_custkey = t.c_custkey
    """,
    tags=("A51", "sketch", "bloom"),
)
def q_agg_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-FILTER MEMBERSHIP AUDIT: an m={BLOOM_BITS}-bit / k=
    {BLOOM_HASHES}-hash Bloom filter built over the customers who hold
    orders, probed with EVERY customer, and scored against exact
    membership — n_false_negative MUST be 0 (the Bloom guarantee,
    asserted by a property test) while the measured false-positive rate
    is the number a join-pruning deployment reads before trusting the
    filter (the sketch behind runtime row-group skipping and semi-join
    pushdown in every warehouse engine). Hash positions are md5 hex
    slices mod m — engine-identical by the repo's md5 convention, so
    the filter the oracle builds is bit-for-bit the Spark one.

    Scale shape: the filter materializes as a DISTINCT-position
    relation (<= m = {BLOOM_BITS} rows regardless of input size — the
    'bitmap as a tiny relation' trick), broadcast into the probe join;
    probes explode to k rows each, aggregate back to one verdict per
    probe, and join the broadcast exact-membership dimension. No
    driver-side state; the filter build is one distinct + one projection
    over the build side."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")

    def bloom_pos(key) -> list:
        h = F.md5(key.cast("string"))
        return [
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("bigint")
            % BLOOM_BITS
            for i in range(BLOOM_HASHES)
        ]

    build_keys = o.select("o_custkey").distinct()
    # localCheckpoint (r15, guide §1.2 step 1): the distinct build-key
    # relation feeds BOTH the filter build and the exact-membership
    # truth join; without a materialization point each consumer re-ran
    # the orders scan + distinct (2 fact scans -> 1). It is broadcast
    # downstream, so it is bounded by assumption already.
    build_keys = build_keys.localCheckpoint(eager=True)
    built = (
        build_keys.select(
            F.explode(F.array(*bloom_pos(F.col("o_custkey"))))
            .alias("pos"))
        .distinct())
    # Exact membership rides the probe rows (r15): attach member BEFORE
    # the position explode, so one customer scan serves both the Bloom
    # verdict and the truth column and the former verdicts|x|truth join
    # disappears. member is constant per c_custkey (max() restores it
    # after the per-key aggregate); bloom_pos is unchanged.
    cm = (
        c.select("c_custkey")
        .join(F.broadcast(build_keys.withColumn("m", F.lit(1))),
              F.col("c_custkey") == F.col("o_custkey"), "left")
        .select("c_custkey",
                F.coalesce(F.col("m"), F.lit(0)).alias("member")))
    probe = cm.select(
        "c_custkey", "member",
        F.explode(F.array(*bloom_pos(F.col("c_custkey")))).alias("pos"))
    joined = (
        probe.join(F.broadcast(built.withColumn("hit", F.lit(1))),
                   "pos", "left")
        .groupBy("c_custkey")
        .agg(F.max("member").alias("member"),
             F.when(F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                    == BLOOM_HASHES, 1).otherwise(0).alias("bloom_pos")))
    from ..compat import QDEC
    n_nonmem = F.sum(1 - F.col("member"))
    n_fp = F.sum(F.when((F.col("bloom_pos") == 1)
                        & (F.col("member") == 0), 1).otherwise(0))
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum("member").cast("bigint").alias("n_members"),
        F.sum("bloom_pos").cast("bigint").alias("n_bloom_positive"),
        n_fp.cast("bigint").alias("n_false_positive"),
        F.sum(F.when((F.col("bloom_pos") == 0) & (F.col("member") == 1),
                     1).otherwise(0)).cast("bigint")
        .alias("n_false_negative"),
        F.when(n_nonmem == 0, F.lit(None).cast("double"))
        .otherwise((n_fp.cast("double") / n_nonmem).cast(QDEC)
                   .cast("double")).alias("false_positive_rate"))


# ---- Paired (before/after) t-test (A52) --------------------------------------

PAIRED_CUTOFF = "2024-01-16 00:00:00"  # the drift family's midpoint split


@query(
    "q_ab_paired",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             SUM(CASE WHEN CAST(ts AS TIMESTAMP)
                           < TIMESTAMP '{PAIRED_CUTOFF}'
                      THEN 1 ELSE 0 END) AS n_before,
             SUM(CASE WHEN CAST(ts AS TIMESTAMP)
                           >= TIMESTAMP '{PAIRED_CUTOFF}'
                      THEN 1 ELSE 0 END) AS n_after,
             CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
                                < TIMESTAMP '{PAIRED_CUTOFF}'
                      THEN CAST(value AS DECIMAL(20,6)) ELSE 0 END)
                  AS DOUBLE) AS s_before,
             CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
                                >= TIMESTAMP '{PAIRED_CUTOFF}'
                      THEN CAST(value AS DECIMAL(20,6)) ELSE 0 END)
                  AS DOUBLE) AS s_after
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    diffs AS (
      SELECT CAST(CAST(s_after / n_after - s_before / n_before
                  AS DECIMAL(18,6)) AS DOUBLE) AS d
      FROM per_user WHERE n_before > 0 AND n_after > 0
    ),
    mom AS (
      SELECT COUNT(*) AS k,
             CAST(SUM(CAST(d AS DECIMAL(20,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(CAST(d AS DECIMAL(20,6))
                           * CAST(d AS DECIMAL(20,6))
                           AS DECIMAL(38,12))) AS DOUBLE) AS s2
      FROM diffs
    )
    SELECT CAST(k AS BIGINT) AS n_pairs,
           CASE WHEN k = 0 THEN NULL
                ELSE CAST(CAST(s1 / k AS DECIMAL(18,6)) AS DOUBLE) END
             AS mean_diff,
           CASE WHEN k < 2 OR s2 - s1 * s1 / k <= 0 THEN NULL
                ELSE CAST(CAST(
                  (s1 / k) / sqrt((s2 - s1 * s1 / k) / (k - 1) / k)
                  AS DECIMAL(18,6)) AS DOUBLE) END AS t_paired,
           CASE WHEN k < 2 THEN NULL
                ELSE CAST(k - 1 AS BIGINT) END AS df
    FROM mom
    """,
    tags=("A52", "abtest", "paired"),
)
def q_ab_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIRED T-TEST on per-user mean purchase value before vs after
    the drift family's cutoff — "did the SAME users change", the
    within-subject design whose pairing removes between-user variance
    entirely (the reason it detects shifts the two-sample tests miss on
    heterogeneous populations). Only users active in BOTH periods
    contribute a pair; the statistic is t = d̄ / (s_d/√k) with k−1
    degrees of freedom.

    One user_id hash aggregate computes both periods' sums in the same
    pass (conditional aggregation — no self-join of two period scans);
    per-user diffs quantize to the 6-dp grid before the moment
    aggregate so the paired relation is engine-exact; k<2 or
    zero-variance diffs report NULL on both engines."""
    from ..compat import QDEC

    e = load(spark, sf_dir, "events").where(
        F.col("event_type") == AB_CONVERT_EVENT)
    cut = F.lit(PAIRED_CUTOFF).cast("timestamp")
    qv = F.col("value").cast("decimal(20,6)")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, 1).otherwise(0))
        .alias("n_before"),
        F.sum(F.when(F.col("ts") >= cut, 1).otherwise(0))
        .alias("n_after"),
        F.sum(F.when(F.col("ts") < cut, qv)
              .otherwise(F.lit(0).cast("decimal(20,6)")))
        .cast("double").alias("s_before"),
        F.sum(F.when(F.col("ts") >= cut, qv)
              .otherwise(F.lit(0).cast("decimal(20,6)")))
        .cast("double").alias("s_after"))
    diffs = per_user.where(
        (F.col("n_before") > 0) & (F.col("n_after") > 0)).select(
        (F.col("s_after") / F.col("n_after")
         - F.col("s_before") / F.col("n_before"))
        .cast(QDEC).cast("double").alias("d"))
    qd = F.col("d").cast("decimal(20,6)")
    mom = diffs.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(qd).cast("double").alias("s1"),
        F.sum((qd * qd).cast("decimal(38,12)")).cast("double")
        .alias("s2"))
    k, s1, s2 = F.col("k"), F.col("s1"), F.col("s2")
    var_num = s2 - s1 * s1 / k
    t = (s1 / k) / F.sqrt(var_num / (k - 1) / k)
    null_d = F.lit(None).cast("double")
    return mom.select(
        k.cast("bigint").alias("n_pairs"),
        F.when(k == 0, null_d).otherwise(
            (s1 / k).cast(QDEC).cast("double")).alias("mean_diff"),
        F.when((k < 2) | (var_num <= 0), null_d).otherwise(
            t.cast(QDEC).cast("double")).alias("t_paired"),
        F.when(k < 2, F.lit(None).cast("bigint")).otherwise(
            (k - 1).cast("bigint")).alias("df"))


# ---- One-way ANOVA across k groups (A53) --------------------------------------


@query(
    "q_ab_anova",
    oracle="""
    WITH grp AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(CAST(value AS DECIMAL(20,6))
                           * CAST(value AS DECIMAL(20,6))
                           AS DECIMAL(38,12))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    ),
    tot AS (
      SELECT COUNT(*) AS k,
             SUM(n) AS n_total,
             CAST(SUM(CAST(s1 AS DECIMAL(27,6))) AS DOUBLE) AS st,
             CAST(SUM(CAST(s1 * s1 / n AS DECIMAL(27,6))) AS DOUBLE)
               AS sb_raw,
             CAST(SUM(CAST(s2 - s1 * s1 / n AS DECIMAL(27,6)))
                  AS DOUBLE) AS ssw
      FROM grp
    )
    SELECT CAST(k AS BIGINT) AS n_groups,
           CAST(n_total AS BIGINT) AS n_total,
           CASE WHEN k < 2 OR n_total <= k THEN NULL
                ELSE CAST(CAST(sb_raw - st * st / n_total
                     AS DECIMAL(18,3)) AS DOUBLE) END AS ss_between,
           CASE WHEN k < 2 OR n_total <= k THEN NULL
                ELSE CAST(CAST(ssw AS DECIMAL(18,3)) AS DOUBLE) END
             AS ss_within,
           CASE WHEN k < 2 OR n_total <= k OR ssw <= 0 THEN NULL
                ELSE CAST(CAST(
                  ((sb_raw - st * st / n_total) / (k - 1))
                  / (ssw / (n_total - k))
                  AS DECIMAL(18,6)) AS DOUBLE) END AS f_stat
    FROM tot
    """,
    tags=("A53", "abtest", "anova"),
)
def q_ab_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE-WAY ANOVA across the event-type groups on the value metric:
    F = (SSB/(k−1)) / (SSW/(N−k)) — the k-group generalization that
    closes the parametric family (A41: two proportions, A43: two
    means, A44: two distributions, this: k means at once, the
    variance-decomposition identity every multi-variant experiment
    report starts from). SSB/SSW are assembled from per-group
    sufficient statistics only (n, Σx, Σx² — the A28 mergeable-state
    discipline), so the whole test is ONE per-group hash aggregate
    plus a k-row fold: no second scan, no per-row deviation pass.

    Decimal-quantized sums keep the group moments
    aggregation-order-exact; SS terms and F quantize after their
    division chains. Degenerate inputs (k<2 groups, N≤k rows, zero
    within-variance) report NULL identically on both engines."""
    from ..compat import QDEC

    e = load(spark, sf_dir, "events")
    qv = F.col("value").cast("decimal(20,6)")
    grp = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(qv).cast("double").alias("s1"),
        F.sum((qv * qv).cast("decimal(38,12)")).cast("double")
        .alias("s2"))
    tot = grp.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_total"),
        F.sum(F.col("s1").cast("decimal(27,6)")).cast("double")
        .alias("st"),
        F.sum((F.col("s1") * F.col("s1") / F.col("n"))
              .cast("decimal(27,6)")).cast("double").alias("sb_raw"),
        F.sum((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
              .cast("decimal(27,6)")).cast("double").alias("ssw"))
    k, n_tot = F.col("k"), F.col("n_total")
    ssb = F.col("sb_raw") - F.col("st") * F.col("st") / n_tot
    ssw = F.col("ssw")
    f_stat = (ssb / (k - 1)) / (ssw / (n_tot - k))
    bad = (k < 2) | (n_tot <= k)
    null_d = F.lit(None).cast("double")
    return tot.select(
        k.cast("bigint").alias("n_groups"),
        n_tot.cast("bigint").alias("n_total"),
        # SS magnitudes cross 15 significant digits at bench scale on
        # the 6-dp grid (the round-4 decimal->double hazard: engine tie
        # rules diverge past ~15 sig digits); 3 dp keeps the cast exact
        # at any realistic scale and costs nothing semantically.
        F.when(bad, null_d).otherwise(
            ssb.cast("decimal(18,3)").cast("double"))
        .alias("ss_between"),
        F.when(bad, null_d).otherwise(
            ssw.cast("decimal(18,3)").cast("double"))
        .alias("ss_within"),
        F.when(bad | (ssw <= 0), null_d)
        .otherwise(f_stat.cast(QDEC).cast("double")).alias("f_stat"))


# ---- Higher central moments: skewness / kurtosis (A54) ------------------------


@query(
    "q_agg_moments",
    oracle="""
    WITH pow AS (
      SELECT event_type,
             CAST(value AS DOUBLE) AS x,
             CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                  AS DECIMAL(38,6)) AS x2,
             CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                  * CAST(value AS DOUBLE) AS DECIMAL(38,6)) AS x3,
             CAST(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                  * CAST(value AS DOUBLE) * CAST(value AS DOUBLE)
                  AS DECIMAL(38,6)) AS x4
      FROM events
    ),
    mom AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE) AS s1,
             CAST(SUM(x2) AS DOUBLE) AS s2,
             CAST(SUM(x3) AS DOUBLE) AS s3,
             CAST(SUM(x4) AS DOUBLE) AS s4
      FROM pow GROUP BY event_type
    ),
    central AS (
      SELECT event_type, n, s1 / n AS m,
             s2 / n - (s1 / n) * (s1 / n) AS v,
             s3 / n - 3 * (s1 / n) * s2 / n
               + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4 * (s1 / n) * s3 / n
               + 6 * (s1 / n) * (s1 / n) * s2 / n
               - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM mom
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(CAST(m AS DECIMAL(18,6)) AS DOUBLE) AS mean,
           CASE WHEN n < 2 OR v <= 0 THEN NULL
                ELSE CAST(CAST(m3 / (v * sqrt(v)) AS DECIMAL(18,6))
                     AS DOUBLE) END AS skewness,
           CASE WHEN n < 2 OR v <= 0 THEN NULL
                ELSE CAST(CAST(m4 / (v * v) - 3.0 AS DECIMAL(18,6))
                     AS DOUBLE) END AS excess_kurtosis
    FROM central
    """,
    tags=("A54", "stats", "moments"),
)
def q_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKEWNESS AND EXCESS KURTOSIS per event family — the 3rd/4th
    standardized central moments that complete the A8/A15 moment family
    (mean/var/corr stop at order 2; tail asymmetry and heavy-tailedness
    are what decide whether a t-test is even appropriate — the reading
    that routes a metric to A43 vs A44). Population-moment convention
    (g1, g2 = m4/v² − 3).

    Mergeable-state discipline: everything derives from the four raw
    power sums (n, Σx, Σx², Σx³, Σx⁴) in ONE hash aggregate — the
    power terms are deterministic IEEE per row and quantized to the
    6-dp decimal grid BEFORE summation, so partial/final order can
    never perturb the sums at any partition count. Degenerate groups
    (n<2 or zero variance) report NULL on both engines."""
    from ..compat import QDEC

    e = load(spark, sf_dir, "events")
    x = F.col("value").cast("double")
    pow_ = e.select(
        "event_type", x.alias("x"),
        (x * x).cast("decimal(38,6)").alias("x2"),
        (x * x * x).cast("decimal(38,6)").alias("x3"),
        (x * x * x * x).cast("decimal(38,6)").alias("x4"))
    mom = pow_.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(20,6)")).cast("double")
        .alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum("x3").cast("double").alias("s3"),
        F.sum("x4").cast("double").alias("s4"))
    n = F.col("n")
    m = F.col("s1") / n
    v = F.col("s2") / n - m * m
    m3 = F.col("s3") / n - 3 * m * F.col("s2") / n + 2 * m * m * m
    m4 = (F.col("s4") / n - 4 * m * F.col("s3") / n
          + 6 * m * m * F.col("s2") / n - 3 * m * m * m * m)
    bad = (n < 2) | (v <= 0)
    null_d = F.lit(None).cast("double")
    return mom.select(
        "event_type", n.cast("bigint").alias("n"),
        m.cast(QDEC).cast("double").alias("mean"),
        F.when(bad, null_d).otherwise(
            (m3 / (v * F.sqrt(v))).cast(QDEC).cast("double"))
        .alias("skewness"),
        F.when(bad, null_d).otherwise(
            (m4 / (v * v) - 3.0).cast(QDEC).cast("double"))
        .alias("excess_kurtosis"))


# ---- Benjamini-Hochberg FDR report across the A/B family (A55) ---------------

FDR_Q = 0.05
# Abramowitz-Stegun 26.2.17 tail polynomial: pure +,*,exp — correctly
# rounded primitives only, so both engines evaluate it bit-identically.
_AS_B = (0.319381530, -0.356563782, 1.781477937,
         -1.821255978, 1.330274429)
_AS_T = 0.2316419

# (test name, registered query, its statistic column); every statistic
# is treated as standard normal (the t members at these df are within
# the polynomial's own 7.5e-8 accuracy envelope — documented approx).
_FDR_TESTS = (
    ("proportions_z", "q_ab_proportions", "zscore"),
    ("welch_t", "q_ab_welch", "t_welch"),
    ("mannwhitney_z", "q_ab_mannwhitney", "z_mwu"),
    ("delta_z", "q_ab_delta", "z_delta"),
    ("paired_t", "q_ab_paired", "t_paired"),
)


def _fdr_oracle() -> str:
    """Composes the five member oracles VERBATIM from the registry (the
    q_domain_alert_inbox discipline: the report can never drift from
    the tests it corrects), then applies the identical p-value
    polynomial and BH step-up in SQL."""
    from ..registry import _REGISTRY
    b1, b2, b3, b4, b5 = _AS_B
    members = ",\n".join(
        f"m_{name} AS ({_REGISTRY[q].oracle})"
        for name, q, _ in _FDR_TESTS)
    stats = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS test, {col} AS z FROM m_{name}"
        for name, q, col in _FDR_TESTS)
    return f"""
    WITH {members},
    stats AS ({stats}),
    live AS (SELECT test, z FROM stats WHERE z IS NOT NULL),
    pv AS (
      SELECT test, z,
             CAST(2.0 * (exp(-abs(z) * abs(z) / 2.0) / sqrt(2.0 * pi())
               * ((1.0 / (1.0 + {_AS_T} * abs(z)))
                  * ({b1} + (1.0 / (1.0 + {_AS_T} * abs(z)))
                     * ({b2} + (1.0 / (1.0 + {_AS_T} * abs(z)))
                        * ({b3} + (1.0 / (1.0 + {_AS_T} * abs(z)))
                           * ({b4} + (1.0 / (1.0 + {_AS_T} * abs(z)))
                              * {b5}))))))
               AS DECIMAL(18,9)) AS p
      FROM live
    ),
    ranked AS (
      SELECT test, z, p,
             ROW_NUMBER() OVER (ORDER BY p, test) AS i,
             COUNT(*) OVER () AS m
      FROM pv
    ),
    dec AS (
      SELECT *,
             MAX(CASE WHEN CAST(p AS DOUBLE) * m
                           <= i * CAST({FDR_Q} AS DOUBLE)
                      THEN i ELSE 0 END) OVER () AS max_ok
      FROM ranked
    )
    SELECT test,
           CAST(CAST(z AS DECIMAL(18,6)) AS DOUBLE) AS z,
           CAST(p AS DOUBLE) AS p_value,
           CAST(i AS BIGINT) AS p_rank,
           CAST(CAST(CAST(i AS DOUBLE) / m * {FDR_Q}
                AS DECIMAL(18,9)) AS DOUBLE) AS bh_threshold,
           i <= max_ok AS reject
    FROM dec
    """


@query("q_ab_fdr", oracle=_fdr_oracle(),
       tags=("A55", "abtest", "multiple-testing"))
def q_ab_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENJAMINI-HOCHBERG FDR REPORT across the experiment family: the
    five z-valued tests the repo runs on this experiment (proportions,
    Welch, Mann-Whitney, delta-method ratio, paired) corrected TOGETHER
    at q={FDR_Q} — the multiple-testing discipline every metrics
    platform applies before anyone reads a significance column (five
    5%-level looks at one experiment are a ~23% family-wise false-alarm
    machine uncorrected). Two-sided p-values come from the
    Abramowitz-Stegun normal-tail polynomial (pure +,*,exp — the first
    p-VALUE, not just statistic, the engine emits, unlocked by the
    polynomial being engine-exact); BH is the step-up rule p(i) <=
    (i/m)q with the largest-passing-rank acceptance.

    Composition discipline: the Spark side CALLS the five registered
    member queries and the oracle splices their registered SQL texts
    verbatim (the alert-inbox pattern), so the corrected report can
    never drift from the tests it corrects. Degenerate members (NULL
    statistic) drop out and shrink m. Everything after the members is
    a <=5-row relation; the windows are metadata-scale."""
    from ..compat import QDEC
    from ..registry import get as get_query

    parts = []
    for name, qname, col in _FDR_TESTS:
        parts.append(
            get_query(qname).fn(spark, sf_dir)
            .select(F.lit(name).alias("test"), F.col(col).alias("z")))
    stats = parts[0]
    for df in parts[1:]:
        stats = stats.unionAll(df)
    live = stats.where(F.col("z").isNotNull())
    az = F.abs(F.col("z"))
    t = 1.0 / (1.0 + _AS_T * az)
    b1, b2, b3, b4, b5 = _AS_B
    poly = t * (b1 + t * (b2 + t * (b3 + t * (b4 + t * b5))))
    pdf = F.exp(-az * az / 2.0) / math.sqrt(2.0 * math.pi)
    p = (2.0 * pdf * poly).cast("decimal(18,9)")
    pv = live.select("test", "z", p.alias("p"))
    wrank = Window.orderBy("p", "test")
    wall = Window.partitionBy(F.lit(1))
    ranked = pv.select(
        "test", "z", "p",
        F.row_number().over(wrank).alias("i"),
        F.count(F.lit(1)).over(wall).alias("m"))
    ok_rank = F.when(
        F.col("p").cast("double") * F.col("m")
        <= F.col("i") * F.lit(FDR_Q), F.col("i")).otherwise(0)
    dec = ranked.withColumn("max_ok", F.max(ok_rank).over(wall))
    return dec.select(
        "test",
        F.col("z").cast(QDEC).cast("double").alias("z"),
        F.col("p").cast("double").alias("p_value"),
        F.col("i").cast("bigint").alias("p_rank"),
        (F.col("i").cast("double") / F.col("m") * FDR_Q)
        .cast("decimal(18,9)").cast("double").alias("bh_threshold"),
        (F.col("i") <= F.col("max_ok")).alias("reject"))


# ---- Spearman rank correlation (A56) -----------------------------------------


@query(
    "q_agg_spearman",
    oracle="""
    WITH base AS (
      SELECT l_returnflag AS g,
             CAST(l_quantity AS DOUBLE) AS x,
             CAST(l_extendedprice AS DOUBLE) AS y
      FROM lineitem
    ),
    ranked AS (
      SELECT g,
             RANK() OVER (PARTITION BY g ORDER BY x)
               + (COUNT(*) OVER (PARTITION BY g, x) - 1) / 2.0 AS rx,
             RANK() OVER (PARTITION BY g ORDER BY y)
               + (COUNT(*) OVER (PARTITION BY g, y) - 1) / 2.0 AS ry
      FROM base
    ),
    sums AS (
      SELECT g, COUNT(*) AS n,
             CAST(SUM(CAST(rx AS DECIMAL(20,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ry AS DECIMAL(20,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(rx * ry AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(rx * rx AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(ry * ry AS DECIMAL(38,6))) AS DOUBLE) AS syy
      FROM ranked GROUP BY g
    )
    SELECT g AS l_returnflag,
           CAST(n AS BIGINT) AS n,
           CASE WHEN (n * sxx - sx * sx) <= 0
                  OR (n * syy - sy * sy) <= 0 THEN NULL
                ELSE CAST(CAST(
                  (n * sxy - sx * sy)
                  / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                  AS DECIMAL(18,6)) AS DOUBLE) END AS spearman_rho
    FROM sums
    """,
    tags=("A56", "stats", "rank"),
)
def q_agg_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPEARMAN RANK CORRELATION per return-flag group (quantity vs
    extended price) — the monotonic-association complement of A15's
    Pearson: invariant to any monotone transform and robust to the
    outliers that dominate a raw-value covariance, which is why drift
    and feature screens quote rho next to r. Ties get textbook AVERAGE
    ranks — but NO row ever gets ranked: the fact table collapses to
    the (group, x, y) distinct-pair grain first, and the average rank
    of value v is derived ARITHMETICALLY from per-(group, value) counts
    + a prefix sum: rx(v) = C(<v) + (c(v)+1)/2 — the exact A44
    Mann-Whitney recipe. The oracle keeps the textbook raw-row RANK()
    formulation, so the driver hash-proves the collapse is identity.

    Determinism: average ranks are exact halves (prefix-count int +
    (c+1)/2), so every rank, product, and 6-dp-quantized sum is
    bit-identical across engines and partitionings; the final
    Pearson-over-ranks is one deterministic IEEE expression over those
    exact sums. Degenerate groups (all-tied x or y: zero rank
    variance) report NULL.

    Scale (the r10 verdict's "what's wrong #1", fixed): the old shape
    ran two rank windows over RAW ROWS — the one production-path window
    whose input scaled with the fact table. Now both rank derivations
    run at the DISTINCT-VALUE grain: the tiny x-rank relation (≤50
    quantity values per group) broadcasts onto the fact rows map-side,
    the enriched rows collapse in ONE partial+final hash aggregate to
    the (group, y) grain carrying (count, Σrank), and the y ranks are a
    prefix sum over THAT relation — the joint term folds as
    Σ rx·ry = ry·Σ_cell rx, so the y ranks never join back to rows at
    all; the x-marginal moments fold over the tiny x relation alone.
    Total: one value-grain shuffle, windows only over distinct-value
    relations, zero row-grain sorts or joins.

    Arithmetic: all ranks are exact halves, so the plan carries DOUBLED
    ranks as integers (rx2 = 2·C(<v) + c + 1) and folds integer
    products through scale-0 decimals (exact 128-bit, no rescaling —
    measured 3× cheaper than decimal(20,6) multiplies); the final /2
    and /4 divisions are exact (halves/quarters), so every emitted sum
    is the same rational — hence the same double — as the oracle's
    per-row decimal(20,6)/(38,6) quantized sums."""
    li = load(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast("double").alias("x"),
        F.col("l_extendedprice").cast("double").alias("y"))
    # x ranks at the (g, x) grain — A44 prefix sum over distinct
    # values, doubled: rx2(v) = 2·C(<v) + c(v) + 1 == 2·avg-rank.
    px = base.groupBy("g", "x").agg(F.count(F.lit(1)).alias("cx"))
    wx = (Window.partitionBy("g").orderBy("x")
          .rowsBetween(Window.unboundedPreceding, -1))
    xr = px.select(
        "g", "x", "cx",
        (2 * F.coalesce(F.sum("cx").over(wx), F.lit(0))
         + F.col("cx") + 1).alias("rx2"))
    # r15: materialize the tiny x-rank relation once (groups × ≤~50
    # distinct quantities). Its TWO consumers (the x-marginal fold and
    # the ycell broadcast) otherwise each re-derive the full lineitem
    # scan + (g, x) aggregate behind it — 4 fact scans instead of 2.
    # localCheckpoint, not persist: fresh lineage per call keeps bench
    # reps honest (the BPE-merge discipline). Measured 1.75 -> 1.53 s
    # warm min at sf0.1, value-identical; repairing the remaining two
    # scans' input parallelism was also A/B'd here and LOSES
    # (1.42 -> 1.64: the repair shuffle exceeds the fused-agg win on
    # both the (g,x) and (g,y) passes).
    # LAZY (r16): same truncation, no pre-scheduled job (interleaved
    # A/B 1.98 -> 1.85 warm min, rows identical).
    xr = xr.localCheckpoint(eager=False)
    # The x-marginal moments need ONLY the tiny x-rank relation:
    # Σ_rows rx = Σ_cells cx·rx2/2, Σ_rows rx² = Σ_cells cx·rx2²/4.
    # decimal(20,0) products keep every fold exact past int64 range.
    rx2d = F.col("rx2").cast("decimal(20,0)")
    xstats = xr.groupBy("g").agg(
        (F.sum(F.col("cx") * rx2d) / 2).cast("double").alias("sx"),
        (F.sum(F.col("cx") * rx2d * rx2d) / 4).cast("double")
        .alias("sxx"))
    # One pass over the fact table: attach rx2 map-side (broadcast),
    # collapse to the (g, y) grain carrying (count, Σrx2).
    ycell = (base.join(F.broadcast(xr.select("g", "x", "rx2")),
                       ["g", "x"])
             .groupBy("g", "y")
             .agg(F.count(F.lit(1)).alias("cv"),
                  F.sum(F.col("rx2").cast("decimal(20,0)"))
                  .alias("srx2")))
    wy = (Window.partitionBy("g").orderBy("y")
          .rowsBetween(Window.unboundedPreceding, -1))
    yr = ycell.withColumn(
        "ry2",
        2 * F.coalesce(F.sum("cv").over(wy), F.lit(0)) + F.col("cv") + 1)
    # Per-cell folds of the oracle's per-row sums:
    #   Σ_rows ry    = cv·ry2/2          Σ_rows ry² = cv·ry2²/4
    #   Σ_rows rx·ry = ry2·Σ_cell rx2/4  (ties fold exactly)
    ry2d = F.col("ry2").cast("decimal(20,0)")
    ysums = yr.groupBy("g").agg(
        F.sum("cv").alias("n"),
        (F.sum(F.col("cv") * ry2d) / 2).cast("double").alias("sy"),
        (F.sum(ry2d * F.col("srx2")) / 4).cast("double").alias("sxy"),
        (F.sum(F.col("cv") * ry2d * ry2d) / 4).cast("double")
        .alias("syy"))
    sums = ysums.join(F.broadcast(xstats), "g")
    n = F.col("n")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    rho = ((n * F.col("sxy") - F.col("sx") * F.col("sy"))
           / F.sqrt(vx * vy))
    return sums.select(
        F.col("g").alias("l_returnflag"),
        n.cast("bigint").alias("n"),
        F.when((vx <= 0) | (vy <= 0), F.lit(None).cast("double"))
        .otherwise(rho.cast("decimal(18,6)").cast("double"))
        .alias("spearman_rho"))


# ---- Cramér's V association strength (A57) -----------------------------------


@query(
    "q_agg_cramers_v",
    oracle="""
    WITH obs AS (
      SELECT o_orderstatus AS r, o_orderpriority AS c, COUNT(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    margins AS (
      SELECT o.*,
             SUM(o.o) OVER (PARTITION BY o.r) AS row_tot,
             SUM(o.o) OVER (PARTITION BY o.c) AS col_tot,
             SUM(o.o) OVER () AS n
      FROM obs o
    ),
    agg AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             COUNT(DISTINCT r) AS n_r,
             COUNT(DISTINCT c) AS n_c,
             CAST(SUM(CAST(
               (CAST(o AS DOUBLE) - CAST(row_tot * col_tot AS DOUBLE) / n)
               * (CAST(o AS DOUBLE) - CAST(row_tot * col_tot AS DOUBLE) / n)
               / (CAST(row_tot * col_tot AS DOUBLE) / n)
               AS DECIMAL(18,6))) AS DOUBLE) AS chi2
      FROM margins
    )
    SELECT n,
           CAST(n_r AS BIGINT) AS n_rows,
           CAST(n_c AS BIGINT) AS n_cols,
           CAST(CAST(chi2 AS DECIMAL(18,6)) AS DOUBLE) AS chi_square,
           CASE WHEN n_r < 2 OR n_c < 2 OR n = 0 THEN NULL
                ELSE CAST(CAST(sqrt(chi2 / (n * CAST(
                  CASE WHEN n_r - 1 < n_c - 1 THEN n_r - 1
                       ELSE n_c - 1 END AS DOUBLE)))
                  AS DECIMAL(18,6)) AS DOUBLE) END AS cramers_v
    FROM agg
    """,
    tags=("A57", "stats", "association"),
)
def q_agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMÉR'S V between order status and priority — the [0, 1]
    NORMALIZATION of A24's chi-square (V = sqrt(chi2 / (n·min(r−1,
    c−1)))), the number a feature-selection pass can actually compare
    across column pairs with different cardinalities (raw chi-square
    grows with n and table size; V does not). Same contingency shape
    as A24: one hash aggregate to cells, margin windows over the tiny
    cells relation, per-cell (O−E)²/E 6-dp-quantized before the sum.
    Degenerate tables (a single row or column category) report NULL
    V — no divide-by-zero path on either engine."""
    o = load(spark, sf_dir, "orders")
    obs = (o.select(F.col("o_orderstatus").alias("r"),
                    F.col("o_orderpriority").alias("c"))
           .groupBy("r", "c").agg(F.count(F.lit(1)).alias("o")))
    m = obs.select(
        "r", "c", "o",
        F.sum("o").over(Window.partitionBy("r")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("c")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"))
    e = (F.col("row_tot") * F.col("col_tot")).cast("double") / F.col("n")
    term = ((F.col("o").cast("double") - e)
            * (F.col("o").cast("double") - e) / e).cast("decimal(18,6)")
    agg = m.agg(
        F.max("n").cast("bigint").alias("n"),
        F.countDistinct("r").alias("n_r"),
        F.countDistinct("c").alias("n_c"),
        F.sum(term).cast("double").alias("chi2"))
    mindim = F.when(F.col("n_r") - 1 < F.col("n_c") - 1,
                    F.col("n_r") - 1).otherwise(F.col("n_c") - 1)
    return agg.select(
        "n",
        F.col("n_r").cast("bigint").alias("n_rows"),
        F.col("n_c").cast("bigint").alias("n_cols"),
        F.col("chi2").cast("decimal(18,6)").cast("double")
        .alias("chi_square"),
        F.when((F.col("n_r") < 2) | (F.col("n_c") < 2) | (F.col("n") == 0),
               F.lit(None).cast("double"))
        .otherwise(F.sqrt(F.col("chi2")
                          / (F.col("n") * mindim.cast("double")))
                   .cast("decimal(18,6)").cast("double"))
        .alias("cramers_v"))


# ---- Mutual information between categoricals (A58) ---------------------------


@query(
    "q_agg_mutual_info",
    oracle="""
    WITH obs AS (
      SELECT o_orderstatus AS r, o_orderpriority AS c, COUNT(*) AS o
      FROM orders GROUP BY 1, 2
    ),
    margins AS (
      SELECT o.*,
             SUM(o.o) OVER (PARTITION BY o.r) AS row_tot,
             SUM(o.o) OVER (PARTITION BY o.c) AS col_tot,
             SUM(o.o) OVER () AS n
      FROM obs o
    ),
    agg AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             COUNT(*) AS n_cells,
             CAST(SUM(CAST(
               (CAST(o AS DOUBLE) / n)
               * ln(CAST(o * n AS DOUBLE) / CAST(row_tot * col_tot
                                                 AS DOUBLE))
               AS DECIMAL(18,9))) AS DOUBLE) AS mi
      FROM margins
    )
    SELECT n,
           CAST(n_cells AS BIGINT) AS n_cells,
           CAST(CAST(mi AS DECIMAL(18,6)) AS DOUBLE) AS mi_nats,
           CAST(CAST(mi / ln(CAST(2 AS DOUBLE)) AS DECIMAL(18,6))
                AS DOUBLE) AS mi_bits
    FROM agg
    """,
    tags=("A58", "stats", "information"),
)
def q_agg_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MUTUAL INFORMATION between order status and priority — the
    information-theoretic dependence measure (Σ p_xy·ln(p_xy/(p_x·p_y)))
    that catches NON-monotonic association chi-square only gestures at
    and Spearman misses entirely; the standard relevance score for
    categorical feature selection. Zero iff independent; reported in
    nats and bits.

    Same cells+margins shape as A24/A57: the per-cell term is one
    deterministic IEEE expression over exact integer counts (o·n and
    row_tot·col_tot stay in bigint before the ONE double division),
    9-dp-quantized before summation so partial/final order never
    perturbs the total. Empty-cell terms cannot occur (cells exist only
    where o >= 1), so the log argument is always positive."""
    o = load(spark, sf_dir, "orders")
    obs = (o.select(F.col("o_orderstatus").alias("r"),
                    F.col("o_orderpriority").alias("c"))
           .groupBy("r", "c").agg(F.count(F.lit(1)).alias("o")))
    m = obs.select(
        "o",
        F.sum("o").over(Window.partitionBy("r")).alias("row_tot"),
        F.sum("o").over(Window.partitionBy("c")).alias("col_tot"),
        F.sum("o").over(Window.partitionBy()).alias("n"))
    term = ((F.col("o").cast("double") / F.col("n"))
            * F.log((F.col("o") * F.col("n")).cast("double")
                    / (F.col("row_tot") * F.col("col_tot")).cast("double"))
            ).cast("decimal(18,9)")
    agg = m.agg(
        F.max("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(term).cast("double").alias("mi"))
    return agg.select(
        "n", "n_cells",
        F.col("mi").cast("decimal(18,6)").cast("double").alias("mi_nats"),
        (F.col("mi") / F.log(F.lit(2.0).cast("double")))
        .cast("decimal(18,6)").cast("double").alias("mi_bits"))


# ---- Lorenz concentration curve (A61) ----------------------------------------


@query(
    "q_agg_lorenz",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
               AS spend
      FROM orders GROUP BY o_custkey
    ),
    tiled AS (
      SELECT spend,
             NTILE(10) OVER (ORDER BY spend, o_custkey) AS decile
      FROM spend
    ),
    per AS (
      SELECT decile, COUNT(*) AS n_customers,
             SUM(CAST(spend AS DECIMAL(27,6))) AS dec_spend
      FROM tiled GROUP BY decile
    ),
    cum AS (
      SELECT decile, n_customers, dec_spend,
             SUM(dec_spend) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_spend,
             SUM(dec_spend) OVER () AS total_spend
      FROM per
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(n_customers AS BIGINT) AS n_customers,
           CAST(CAST(dec_spend AS DECIMAL(18,6)) AS DOUBLE)
             AS decile_spend,
           CAST(CAST(CAST(cum_spend AS DOUBLE)
                / CAST(total_spend AS DOUBLE) AS DECIMAL(18,6))
                AS DOUBLE) AS cum_share
    FROM cum
    """,
    tags=("A61", "concentration", "lorenz"),
)
def q_agg_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LORENZ CURVE of customer spend by decile — the curve A25's Gini
    coefficient integrates: customers sorted by lifetime spend, cut
    into NTILE(10) deciles (custkey tiebreak = a total order, so tile
    boundaries are deterministic), each reporting its spend mass and
    the cumulative share — the "bottom 50% hold X%" reading
    concentration reviews actually quote, where the scalar Gini can't
    distinguish a barbell from a smooth gradient.

    Shape: one keyed aggregate to per-customer spend, ONE global sort
    for the tiling (unavoidable for exact deciles and bounded by the
    CUSTOMER count, not order rows — the A30/A27 exact-quantile
    posture), then windows over the 10-row decile relation. Decimal
    sums end-to-end; the share division is one IEEE op quantized to
    6 dp."""
    o = load(spark, sf_dir, "orders")
    spend = (o.groupBy("o_custkey")
             .agg(F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
                  .cast("double").alias("spend")))
    tiled = spend.select(
        "spend",
        F.ntile(10).over(Window.orderBy("spend", "o_custkey"))
        .alias("decile"))
    per = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("spend").cast("decimal(27,6)")).alias("dec_spend"))
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0)
    wall = Window.partitionBy(F.lit(1))
    cum = per.select(
        "decile", "n_customers", "dec_spend",
        F.sum("dec_spend").over(wcum).alias("cum_spend"),
        F.sum("dec_spend").over(wall).alias("total_spend"))
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_customers").cast("bigint").alias("n_customers"),
        F.col("dec_spend").cast("decimal(18,6)").cast("double")
        .alias("decile_spend"),
        (F.col("cum_spend").cast("double")
         / F.col("total_spend").cast("double"))
        .cast("decimal(18,6)").cast("double").alias("cum_share"))


# ---- Theil inequality decomposition (A62) ------------------------------------


@query(
    "q_agg_theil",
    oracle="""
    WITH spend AS (
      SELECT o.o_custkey, c.c_nationkey AS nation,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
               AS x
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS sx
      FROM spend
    ),
    terms AS (
      SELECT CAST(
               (x / (sx / n)) * ln(x / (sx / n)) AS DECIMAL(27,9)) AS t
      FROM spend, tot WHERE x > 0
    ),
    grp AS (
      SELECT nation, COUNT(*) AS n_g,
             CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) AS sx_g
      FROM spend GROUP BY nation
    ),
    between_terms AS (
      SELECT CAST(
               (CAST(g.n_g AS DOUBLE) / t.n)
               * ((g.sx_g / g.n_g) / (t.sx / t.n))
               * ln((g.sx_g / g.n_g) / (t.sx / t.n))
               AS DECIMAL(27,9)) AS t
      FROM grp g, tot t WHERE g.sx_g > 0
    ),
    th AS (
      SELECT (SELECT CAST(n AS BIGINT) FROM tot) AS n_customers,
             (SELECT COUNT(*) FROM grp) AS n_groups,
             (SELECT CAST(COALESCE(SUM(t), 0) AS DOUBLE) / MAX(t.n)
              FROM terms, tot t) AS theil_total,
             (SELECT CAST(COALESCE(SUM(t), 0) AS DOUBLE)
              FROM between_terms) AS theil_between
    )
    SELECT n_customers,
           CAST(n_groups AS BIGINT) AS n_groups,
           CAST(CAST(theil_total AS DECIMAL(18,6)) AS DOUBLE)
             AS theil_total,
           CAST(CAST(theil_between AS DECIMAL(18,6)) AS DOUBLE)
             AS theil_between,
           CAST(CAST(theil_total AS DECIMAL(18,6))
                - CAST(theil_between AS DECIMAL(18,6)) AS DOUBLE)
             AS theil_within
    FROM th
    """,
    tags=("A62", "stats", "inequality"),
)
def q_agg_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THEIL T INDEX of customer-spend inequality, DECOMPOSED by nation
    — the inequality measure A25's Gini cannot decompose: T = T_between
    + T_within additively, so the report answers "is concentration
    driven by rich nations or rich customers within nations" in one
    row. T = (1/n)·Σ (x/μ)·ln(x/μ); between-term = Σ_g (n_g/n)·
    (μ_g/μ)·ln(μ_g/μ); within reported as the exact difference of the
    two 6-dp-quantized totals (the additive identity, enforced rather
    than re-derived).

    Determinism: per-term ratios are single IEEE expressions over
    decimal-exact sums, 9-dp-quantized before summation; zero-spend
    customers (x = 0, where x·ln x → 0 in the limit) are excluded on
    both engines identically. Scale: one join + two keyed aggregates
    (customer, nation) and a 1-row/25-row reduction — nothing sorts,
    nothing driver-side."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    spend = (
        o.join(F.broadcast(c.select("c_custkey", "c_nationkey")),
               o["o_custkey"] == c["c_custkey"])
        .groupBy("o_custkey", F.col("c_nationkey").alias("nation"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
             .cast("double").alias("x")))
    # localCheckpoint (r15, guide §1.2 step 1): the per-customer spend
    # relation feeds four consumers (tot, the T terms, the per-nation
    # aggregate, n_customers via tot); without a materialization point
    # each re-derived the orders|x|customer join + aggregate — 5 fact
    # scans in one plan for a one-join algorithm. Customer-cardinality
    # — the staging relation a real report would materialize anyway.
    spend = spend.localCheckpoint(eager=True)
    tot = spend.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(27,6)")).cast("double").alias("sx"))
    mu = F.col("sx") / F.col("n")
    t_term = ((F.col("x") / mu) * F.log(F.col("x") / mu)) \
        .cast("decimal(27,9)")
    terms = (spend.crossJoin(F.broadcast(tot)).where(F.col("x") > 0)
             .select(t_term.alias("t"), "n"))
    theil_total = terms.agg(
        (F.coalesce(F.sum("t"), F.lit(0).cast("decimal(27,9)"))
         .cast("double") / F.max("n")).alias("theil_total"))
    grp = spend.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum(F.col("x").cast("decimal(27,6)")).cast("double")
        .alias("sx_g"))
    mu_g = F.col("sx_g") / F.col("n_g")
    b_term = ((F.col("n_g").cast("double") / F.col("n"))
              * (mu_g / mu) * F.log(mu_g / mu)).cast("decimal(27,9)")
    between = (grp.crossJoin(F.broadcast(tot)).where(F.col("sx_g") > 0)
               .select(b_term.alias("t")))
    theil_between = between.agg(
        F.coalesce(F.sum("t"), F.lit(0).cast("decimal(27,9)"))
        .cast("double").alias("theil_between"))
    n_groups = grp.agg(F.count(F.lit(1)).cast("bigint").alias("n_groups"))
    n_customers = tot.select(F.col("n").cast("bigint").alias("n_customers"))
    out = (n_customers.crossJoin(n_groups)
           .crossJoin(theil_total).crossJoin(theil_between))
    tt = F.col("theil_total").cast("decimal(18,6)")
    tb = F.col("theil_between").cast("decimal(18,6)")
    return out.select(
        "n_customers", "n_groups",
        tt.cast("double").alias("theil_total"),
        tb.cast("double").alias("theil_between"),
        (tt - tb).cast("double").alias("theil_within"))


# ---- Bayesian A/B read-out via normal approximation (A63) --------------------


def _bayes_oracle() -> str:
    b1, b2, b3, b4, b5 = _AS_B
    # One-sided upper tail Q(x) via the same A&S 26.2.17 polynomial the
    # FDR report uses (engine-exact primitives only).
    def q_of(x):
        return (f"(exp(-({x}) * ({x}) / 2.0) / sqrt(2.0 * pi())"
                f" * ((1.0 / (1.0 + {_AS_T} * ({x})))"
                f" * ({b1} + (1.0 / (1.0 + {_AS_T} * ({x})))"
                f" * ({b2} + (1.0 / (1.0 + {_AS_T} * ({x})))"
                f" * ({b3} + (1.0 / (1.0 + {_AS_T} * ({x})))"
                f" * ({b4} + (1.0 / (1.0 + {_AS_T} * ({x})))"
                f" * {b5}))))))")
    return f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             CASE WHEN SUM(CASE WHEN event_type = '{AB_CONVERT_EVENT}'
                           THEN 1 ELSE 0 END)
                     > SUM(CASE WHEN event_type = '{AB_BASELINE_EVENT}'
                           THEN 1 ELSE 0 END)
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT
        SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n_a,
        SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS conv_a,
        SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n_b,
        SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS conv_b
      FROM per_user
    ),
    stat AS (
      SELECT n_a, conv_a, n_b, conv_b,
             CAST(conv_a AS DOUBLE) / n_a AS p_a,
             CAST(conv_b AS DOUBLE) / n_b AS p_b,
             sqrt((CAST(conv_a AS DOUBLE) / n_a)
                  * (1.0 - CAST(conv_a AS DOUBLE) / n_a) / n_a
                  + (CAST(conv_b AS DOUBLE) / n_b)
                  * (1.0 - CAST(conv_b AS DOUBLE) / n_b) / n_b) AS se
      FROM arms WHERE n_a > 0 AND n_b > 0
    )
    SELECT CAST(n_a AS BIGINT) AS n_a,
           CAST(conv_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b,
           CAST(conv_b AS BIGINT) AS conv_b,
           CAST(CAST(p_a AS DECIMAL(18,6)) AS DOUBLE) AS p_a,
           CAST(CAST(p_b AS DECIMAL(18,6)) AS DOUBLE) AS p_b,
           CAST(CAST(p_b - p_a AS DECIMAL(18,6)) AS DOUBLE) AS lift_abs,
           CASE WHEN se = 0 THEN NULL
                ELSE CAST(CAST((p_b - p_a) / se AS DECIMAL(18,6))
                     AS DOUBLE) END AS z_unpooled,
           CASE WHEN se = 0 THEN NULL
                WHEN (p_b - p_a) / se >= 0
                  THEN CAST(CAST(1.0 - {q_of('(p_b - p_a) / se')}
                       AS DECIMAL(18,9)) AS DOUBLE)
                ELSE CAST(CAST({q_of('-((p_b - p_a) / se)')}
                       AS DECIMAL(18,9)) AS DOUBLE) END
             AS prob_b_beats_a
    FROM stat
    """


@query("q_ab_bayes", oracle=_bayes_oracle(), tags=("A63", "ab", "bayes"))
def q_ab_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAYESIAN A/B READ-OUT: P(B beats A) under the large-sample
    normal approximation of the posterior on the conversion-rate
    difference (flat prior) — the "94% chance B is better" number
    product teams actually act on, complementing the frequentist
    family (A41's z answers "is the gap noise"; this answers "how
    likely is B better, given the data"). Unpooled variance (the
    posterior's, not the null's — the same split as A41 vs A43), Phi
    via the A&S 26.2.17 tail polynomial the FDR report certified
    engine-exact.

    Same two-hash-aggregate shape as A41 (events -> per-user flag ->
    one row); the probability passes the longest division chain in the
    family, so it is 9-dp-quantized; a degenerate posterior (se = 0:
    both arms at 0% or 100%) reports NULL rather than a fake
    certainty."""
    e = load(spark, sf_dir, "events")
    per_user = (
        e.groupBy("user_id")
        .agg(F.when(
            F.sum(F.when(F.col("event_type") == AB_CONVERT_EVENT, 1)
                  .otherwise(0))
            > F.sum(F.when(F.col("event_type") == AB_BASELINE_EVENT, 1)
                    .otherwise(0)), 1).otherwise(0).alias("converted"))
        .select(F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
                "converted"))
    arms = per_user.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted"))
              .otherwise(0)).alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted"))
              .otherwise(0)).alias("conv_b"))
    stat = arms.where((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        "n_a", "conv_a", "n_b", "conv_b",
        (F.col("conv_a").cast("double") / F.col("n_a")).alias("p_a"),
        (F.col("conv_b").cast("double") / F.col("n_b")).alias("p_b"))
    se = F.sqrt(F.col("p_a") * (1.0 - F.col("p_a")) / F.col("n_a")
                + F.col("p_b") * (1.0 - F.col("p_b")) / F.col("n_b"))
    stat = stat.withColumn("se", se)
    z = (F.col("p_b") - F.col("p_a")) / F.col("se")

    def q_tail(x):
        t = 1.0 / (1.0 + _AS_T * x)
        b1, b2, b3, b4, b5 = _AS_B
        poly = t * (b1 + t * (b2 + t * (b3 + t * (b4 + t * b5))))
        return F.exp(-x * x / 2.0) / math.sqrt(2.0 * math.pi) * poly

    prob = F.when(z >= 0, 1.0 - q_tail(z)).otherwise(q_tail(-z))
    null_d = F.lit(None).cast("double")
    return stat.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("conv_a").cast("bigint").alias("conv_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("conv_b").cast("bigint").alias("conv_b"),
        F.col("p_a").cast("decimal(18,6)").cast("double").alias("p_a"),
        F.col("p_b").cast("decimal(18,6)").cast("double").alias("p_b"),
        (F.col("p_b") - F.col("p_a")).cast("decimal(18,6)")
        .cast("double").alias("lift_abs"),
        F.when(F.col("se") == 0, null_d)
        .otherwise(z.cast("decimal(18,6)").cast("double"))
        .alias("z_unpooled"),
        F.when(F.col("se") == 0, null_d)
        .otherwise(prob.cast("decimal(18,9)").cast("double"))
        .alias("prob_b_beats_a"))


# ---- Association rules over co-purchase baskets (A60) ------------------------

ASSOC_MIN_SUPPORT = 3  # minimum co-occurrence count for a rule to emit


def _assoc_oracle() -> str:
    from .graph import _capped_li_sql
    return f"""
    WITH li AS ({_capped_li_sql()}
    ),
    n_orders AS (
      SELECT COUNT(DISTINCT o) AS n FROM li
    ),
    item AS (
      SELECT p, COUNT(*) AS supp_i FROM li GROUP BY p
    ),
    pair AS (
      SELECT a.p AS ante, b.p AS cons, COUNT(*) AS supp
      FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p
      GROUP BY 1, 2
    )
    SELECT pair.ante, pair.cons,
           CAST(pair.supp AS BIGINT) AS support,
           CAST(ia.supp_i AS BIGINT) AS support_ante,
           CAST(ic.supp_i AS BIGINT) AS support_cons,
           CAST(CAST(CAST(pair.supp AS DOUBLE) / ia.supp_i
                AS DECIMAL(18,6)) AS DOUBLE) AS confidence,
           CAST(CAST(CAST(pair.supp AS DOUBLE) * n.n
                / (CAST(ia.supp_i AS DOUBLE) * ic.supp_i)
                AS DECIMAL(18,6)) AS DOUBLE) AS lift
    FROM pair
    JOIN item ia ON ia.p = pair.ante
    JOIN item ic ON ic.p = pair.cons
    CROSS JOIN n_orders n
    WHERE pair.supp >= {ASSOC_MIN_SUPPORT}
    """


@query("q_agg_assoc_rules", oracle=_assoc_oracle(),
       tags=("A60", "association", "basket"))
def q_agg_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASSOCIATION RULES over order baskets: every DIRECTED part pair
    co-bought in >= {ASSOC_MIN_SUPPORT} orders, with support,
    confidence = supp(a,b)/supp(a) and lift = supp(a,b)·N/(supp(a)·
    supp(b)) — the full rule read A19's symmetric co-occurrence stops
    short of: confidence is directional (bread→butter and butter→bread
    differ), which is what a recommender actually ranks by; lift > 1
    separates real affinity from popularity coincidence.

    Scale: pair generation runs over capped_order_lines (the r10
    hot-basket guard — one 10⁴-item order is bounded at K² pairs);
    item supports come from the SAME capped relation so
    confidence <= 1 holds by construction. One self-join + three hash
    aggregates; the support threshold prunes the tail before the
    broadcast item-support joins."""
    from .graph import capped_order_lines

    li = capped_order_lines(load(spark, sf_dir, "lineitem"))
    # localCheckpoint (r15, guide §1.2 step 1): the capped-basket
    # relation feeds four consumers (order count, item supports, both
    # self-join sides); without a materialization point each re-ran
    # the distinct + per-order ranking window over the fact scan — the
    # most expensive stage of the query, four times. Fresh lineage per
    # call keeps bench reps recomputing honestly.
    li = li.localCheckpoint(eager=True)
    n_orders = li.agg(F.countDistinct("o").alias("n"))
    item = li.groupBy("p").agg(F.count(F.lit(1)).alias("supp_i"))
    a = li.select("o", F.col("p").alias("ante"))
    b = li.select("o", F.col("p").alias("cons"))
    pair = (a.join(b, "o").where(F.col("ante") != F.col("cons"))
            .groupBy("ante", "cons").agg(F.count(F.lit(1)).alias("supp"))
            .where(F.col("supp") >= ASSOC_MIN_SUPPORT))
    ia = item.select(F.col("p").alias("ante"),
                     F.col("supp_i").alias("support_ante"))
    ic = item.select(F.col("p").alias("cons"),
                     F.col("supp_i").alias("support_cons"))
    out = (pair.join(F.broadcast(ia), "ante")
           .join(F.broadcast(ic), "cons")
           .crossJoin(F.broadcast(n_orders)))
    return out.select(
        "ante", "cons",
        F.col("supp").cast("bigint").alias("support"),
        F.col("support_ante").cast("bigint").alias("support_ante"),
        F.col("support_cons").cast("bigint").alias("support_cons"),
        (F.col("supp").cast("double") / F.col("support_ante"))
        .cast("decimal(18,6)").cast("double").alias("confidence"),
        (F.col("supp").cast("double") * F.col("n")
         / (F.col("support_ante").cast("double")
            * F.col("support_cons")))
        .cast("decimal(18,6)").cast("double").alias("lift"))


# ---- Kendall tau-b rank correlation (A66) -------------------------------------


@query(
    "q_agg_kendall_tau",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag AS g, l_quantity AS x, l_discount AS y,
             COUNT(*) AS c
      FROM lineitem GROUP BY 1, 2, 3
    ),
    pairs AS (
      SELECT a.g,
             SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
                        OR (a.x > b.x AND a.y > b.y)
                 THEN CAST(a.c AS DECIMAL(20,0)) * b.c ELSE 0 END) AS cc,
             SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
                        OR (a.x > b.x AND a.y < b.y)
                 THEN CAST(a.c AS DECIMAL(20,0)) * b.c ELSE 0 END) AS dd
      FROM cells a JOIN cells b
        ON a.g = b.g AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))
      GROUP BY a.g
    ),
    ties AS (
      SELECT g, SUM(c) AS n,
             SUM(CAST(c AS DECIMAL(20,0)) * (c - 1)) AS t_xy2
      FROM cells GROUP BY g
    ),
    tx AS (
      SELECT g, SUM(CAST(cx AS DECIMAL(20,0)) * (cx - 1)) AS t_x2
      FROM (SELECT g, x, SUM(c) AS cx FROM cells GROUP BY g, x) t
      GROUP BY g
    ),
    ty AS (
      SELECT g, SUM(CAST(cy AS DECIMAL(20,0)) * (cy - 1)) AS t_y2
      FROM (SELECT g, y, SUM(c) AS cy FROM cells GROUP BY g, y) t
      GROUP BY g
    )
    SELECT t.g AS l_returnflag,
           CAST(t.n AS BIGINT) AS n,
           CAST(p.cc AS BIGINT) AS concordant,
           CAST(p.dd AS BIGINT) AS discordant,
           CASE WHEN (CAST(t.n AS DECIMAL(38,0)) * (t.n - 1) - tx.t_x2)
                     * (CAST(t.n AS DECIMAL(38,0)) * (t.n - 1) - ty.t_y2)
                     <= 0 THEN NULL
                ELSE CAST(CAST(
                  2.0 * (CAST(p.cc AS DOUBLE) - CAST(p.dd AS DOUBLE))
                  / sqrt(CAST((CAST(t.n AS DECIMAL(38,0)) * (t.n - 1)
                               - tx.t_x2) AS DOUBLE)
                         * CAST((CAST(t.n AS DECIMAL(38,0)) * (t.n - 1)
                                 - ty.t_y2) AS DOUBLE))
                  AS DECIMAL(18,6)) AS DOUBLE) END AS kendall_tau_b
    FROM ties t
    JOIN pairs p ON p.g = t.g
    JOIN tx ON tx.g = t.g
    JOIN ty ON ty.g = t.g
    """,
    tags=("A66", "stats", "rank"),
)
def q_agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL TAU-B per return-flag group (quantity vs discount) — the
    pair-concordance member of the rank-correlation family: where A56's
    Spearman measures monotonic association through average ranks,
    tau-b counts CONCORDANT vs DISCORDANT pairs directly and carries a
    cleaner interpretation (P(concord) − P(discord)) plus the textbook
    tie correction: τ_b = (C−D)/√((n0−n1)(n0−n2)) with n0 = n(n−1)/2,
    n1/n2 = Σ t(t−1)/2 over x/y tie blocks (carried doubled — the
    factor 2 re-enters the numerator, validated vs the naive model).

    Both metrics are LOW-CARDINALITY (50 quantities × 11 discounts), so
    the whole computation collapses to the joint distinct-cell grain:
    ONE hash aggregate of the fact table to ≤550 cells per group, then
    a cell-pair self-join bounded by cardinality² — never rows² — with
    every pair contributing c_a·c_b to C or D as an exact 128-bit
    integer. Doubling both tie terms (t·(t−1), n·(n−1)) keeps every
    intermediate integral — no /2 ever happens; the halves cancel in
    the ratio. The scale contract: pair enumeration cost is a function
    of value cardinality only, the fact table is touched once.

    Determinism: C, D, and all tie sums are exact integers; τ_b is one
    quantized IEEE expression; degenerate groups (all-tied x or y)
    report NULL."""
    li = load(spark, sf_dir, "lineitem")
    cells = (li.groupBy(F.col("l_returnflag").alias("g"),
                        F.col("l_quantity").alias("x"),
                        F.col("l_discount").alias("y"))
             .agg(F.count(F.lit(1)).alias("c")))
    cells = cells.persist()
    a, b = cells.alias("a"), cells.alias("b")
    ax, ay, bx, by = (F.col("a.x"), F.col("a.y"),
                      F.col("b.x"), F.col("b.y"))
    prod = F.col("a.c").cast("decimal(20,0)") * F.col("b.c")
    pairs = (a.join(b, (F.col("a.g") == F.col("b.g"))
                    & ((ax < bx) | ((ax == bx) & (ay < by))))
             .groupBy(F.col("a.g").alias("g"))
             .agg(F.sum(F.when(((ax < bx) & (ay < by))
                               | ((ax > bx) & (ay > by)), prod)
                        .otherwise(F.lit(0))).alias("cc"),
                  F.sum(F.when(((ax < bx) & (ay > by))
                               | ((ax > bx) & (ay < by)), prod)
                        .otherwise(F.lit(0))).alias("dd")))
    cd = F.col("c").cast("decimal(20,0)")
    ties = cells.groupBy("g").agg(
        F.sum("c").alias("n"),
        F.sum(cd * (F.col("c") - 1)).alias("t_xy2"))
    tx = (cells.groupBy("g", "x").agg(F.sum("c").alias("cx"))
          .groupBy("g").agg(F.sum(F.col("cx").cast("decimal(20,0)")
                                  * (F.col("cx") - 1)).alias("t_x2")))
    ty = (cells.groupBy("g", "y").agg(F.sum("c").alias("cy"))
          .groupBy("g").agg(F.sum(F.col("cy").cast("decimal(20,0)")
                                  * (F.col("cy") - 1)).alias("t_y2")))
    j = (ties.join(pairs, "g").join(tx, "g").join(ty, "g"))
    n0x = (F.col("n").cast("decimal(38,0)") * (F.col("n") - 1)
           - F.col("t_x2"))
    n0y = (F.col("n").cast("decimal(38,0)") * (F.col("n") - 1)
           - F.col("t_y2"))
    # n0x/n0y are the DOUBLED (n0-n1)/(n0-n2): their product carries a
    # factor 4, so the numerator needs the compensating factor 2
    # (caught by the naive-model property test, invisible to the
    # mirror - the oracle shared the derivation).
    tau = (2.0 * (F.col("cc").cast("double") - F.col("dd").cast("double"))
           / F.sqrt(n0x.cast("double") * n0y.cast("double")))
    return j.select(
        F.col("g").alias("l_returnflag"),
        F.col("n").cast("bigint").alias("n"),
        F.col("cc").cast("bigint").alias("concordant"),
        F.col("dd").cast("bigint").alias("discordant"),
        F.when((n0x * n0y) <= 0, F.lit(None).cast("double"))
        .otherwise(tau.cast("decimal(18,6)").cast("double"))
        .alias("kendall_tau_b"))


# ---- Per-segment Benford chi-square screen (A67) -------------------------------

# chi-square 95th percentile, 8 degrees of freedom (9 digits - 1): the
# textbook reject threshold for a first-digit goodness-of-fit test.
BENFORD_CHI2_CRIT = "15.507313"


@query(
    "q_agg_benford",
    oracle=f"""
    WITH digits AS (
      SELECT o_orderpriority AS segment,
             CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    obs AS (
      SELECT segment, digit, COUNT(*) AS n_obs
      FROM digits GROUP BY segment, digit
    ),
    tot AS (
      SELECT segment, SUM(n_obs) AS n FROM obs GROUP BY segment
    ),
    terms AS (
      SELECT o.segment, t.n,
             CAST(CAST(
               (CAST(o.n_obs AS DOUBLE)
                - CAST(CAST(ln(1.0 + CAST(1.0 AS DOUBLE) / o.digit)
                            / ln(10.0) AS DECIMAL(18,9)) AS DOUBLE)
                  * t.n)
               * (CAST(o.n_obs AS DOUBLE)
                  - CAST(CAST(ln(1.0 + CAST(1.0 AS DOUBLE) / o.digit)
                              / ln(10.0) AS DECIMAL(18,9)) AS DOUBLE)
                    * t.n)
               / (CAST(CAST(ln(1.0 + CAST(1.0 AS DOUBLE) / o.digit)
                            / ln(10.0) AS DECIMAL(18,9)) AS DOUBLE)
                  * t.n)
               AS DECIMAL(18,6)) AS DOUBLE) AS term
      FROM obs o JOIN tot t ON t.segment = o.segment
    )
    SELECT segment,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_digits_seen,
           CAST(CAST(SUM(CAST(term AS DECIMAL(18,6)))
                     AS DECIMAL(18,6)) AS DOUBLE) AS chi2,
           SUM(CAST(term AS DECIMAL(18,6)))
             > CAST({BENFORD_CHI2_CRIT} AS DOUBLE) AS flagged
    FROM terms GROUP BY segment
    """,
    tags=("A67", "quality", "fraud"),
)
def q_agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-SEGMENT BENFORD χ² SCREEN: the first-digit
    goodness-of-fit statistic computed PER ORDER-PRIORITY SEGMENT with
    the df=8 95% reject decision — where q_quality_benford (the
    corpus-level sibling) prints observed-vs-expected shares for a
    human to eyeball, this is the automatable form fraud pipelines
    run: fabricated numbers rarely contaminate a whole feed, they
    contaminate a SEGMENT (one clerk, one channel, one priority
    class), and the per-segment χ² localizes which one to audit.
    χ² = Σ_d (O_d − e_d·n)²/(e_d·n) with e_d = log10(1+1/d).

    Determinism: digit extraction is string-exact off the
    DECIMAL(18,2) rendering (no float-log boundary, the
    q_quality_benford discipline); the Benford constant is the only
    transcendental (9-dp quantized); each χ² term is quantized at 6 dp
    before the decimal sum, so engine aggregation order is moot; the
    flag compares that exact decimal to the critical literal.

    Scale: one hash aggregate to ≤ 9·|segments| cells, then
    segment-grain algebra; the fact table is scanned once."""
    o = load(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(18,2)").cast("string"),
        1, 1).cast("bigint")
    obs = (o.select(F.col("o_orderpriority").alias("segment"),
                    digit.alias("digit"))
           .groupBy("segment", "digit")
           .agg(F.count(F.lit(1)).alias("n_obs")))
    tot = obs.groupBy("segment").agg(F.sum("n_obs").alias("n"))
    benford = (F.log(1.0 + F.lit(1.0) / F.col("digit"))
               / F.log(F.lit(10.0))).cast("decimal(18,9)").cast("double")
    exp_n = benford * F.col("n")
    dev = F.col("n_obs").cast("double") - exp_n
    terms = (obs.join(tot, "segment")
             .select("segment", "n",
                     (dev * dev / exp_n).cast("decimal(18,6)")
                     .alias("term")))
    agg = terms.groupBy("segment").agg(
        F.max("n").alias("n_orders"),
        F.count(F.lit(1)).alias("n_digits_seen"),
        F.sum("term").alias("chi2_dec"))
    return agg.select(
        "segment",
        F.col("n_orders").cast("bigint").alias("n_orders"),
        F.col("n_digits_seen").cast("bigint").alias("n_digits_seen"),
        F.col("chi2_dec").cast("decimal(18,6)").cast("double")
        .alias("chi2"),
        (F.col("chi2_dec") > F.lit(float(BENFORD_CHI2_CRIT)))
        .alias("flagged"))


# ---- Cochran-Armitage trend test (A68) ----------------------------------------

# Outcome: a HIGH-VALUE purchase. Plain purchase penetration is 100% in
# the harness corpus (every arm converts -> zero trend variance, NULL z
# at every sf); the value floor puts conversion ~45% so the statistic
# is live at all scales.
TREND_VALUE_FLOOR = 150


@query(
    "q_ab_trend",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, user_id % 3 AS arm,
             MAX(CASE WHEN event_type = '{MWU_EVENT}'
                       AND value > {TREND_VALUE_FLOOR}
                 THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT arm, COUNT(*) AS n_g, SUM(conv) AS r_g
      FROM per_user GROUP BY arm
    ),
    tot AS (
      SELECT SUM(n_g) AS n, SUM(r_g) AS r,
             SUM(arm * r_g) AS wr, SUM(arm * n_g) AS wn,
             SUM(arm * arm * n_g) AS wwn
      FROM arms
    ),
    z AS (
      SELECT n, r,
             CAST(wr AS DOUBLE)
               - CAST(r AS DOUBLE) / n * wn AS t_stat,
             CAST(r AS DOUBLE) / n * (1.0 - CAST(r AS DOUBLE) / n)
               * (CAST(wwn AS DOUBLE)
                  - CAST(wn AS DOUBLE) * wn / n) AS var_t
      FROM tot
    )
    SELECT CAST(a.arm AS BIGINT) AS arm,
           CAST(a.n_g AS BIGINT) AS n_users,
           CAST(a.r_g AS BIGINT) AS responders,
           CAST(CAST(CAST(a.r_g AS DOUBLE) / a.n_g AS DECIMAL(18,6))
                AS DOUBLE) AS resp_rate,
           CASE WHEN z.var_t <= 0 THEN NULL
                ELSE CAST(CAST(z.t_stat / sqrt(z.var_t)
                     AS DECIMAL(18,6)) AS DOUBLE) END AS z_trend
    FROM arms a, z
    """,
    tags=("A68", "abtest", "trend"),
)
def q_ab_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCHRAN-ARMITAGE TREND TEST across the three id-residue arms
    (dose scores w = 0, 1, 2): does the HIGH-VALUE-purchase conversion
    rate (value > {TREND_VALUE_FLOOR}) rise MONOTONICALLY
    with the dose? The A/B family's ordered-groups member — A41's
    two-proportion z can't see a trend across 3+ arms and A46's ANOVA
    ignores their ordering; this weights each arm by its dose:
    T = Σw·r_g − p̄·Σw·n_g,  Var = p̄(1−p̄)(Σw²n_g − (Σw·n_g)²/N),
    z = T/√Var. Emits per-arm rates plus the shared trend z.

    Scale: ONE user-grain aggregate (conversion = MAX over the user's
    events, partial-aggregatable) then a 3-row arm relation; every
    moment is an exact integer until the final quantized IEEE
    expression. Degenerate variance (all-converted, single arm)
    reports NULL."""
    e = load(spark, sf_dir, "events")
    per_user = (e.groupBy("user_id")
                .agg(F.max(F.when((F.col("event_type") == MWU_EVENT)
                                  & (F.col("value") > TREND_VALUE_FLOOR),
                                  1)
                           .otherwise(0)).alias("conv"))
                .select(F.pmod(F.col("user_id"), F.lit(3)).alias("arm"),
                        "conv"))
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_g"), F.sum("conv").alias("r_g"))
    arms = arms.persist()
    tot = arms.agg(
        F.sum("n_g").alias("n"), F.sum("r_g").alias("r"),
        F.sum(F.col("arm") * F.col("r_g")).alias("wr"),
        F.sum(F.col("arm") * F.col("n_g")).alias("wn"),
        F.sum(F.col("arm") * F.col("arm") * F.col("n_g")).alias("wwn"))
    p = F.col("r").cast("double") / F.col("n")
    z = tot.select(
        (F.col("wr").cast("double") - p * F.col("wn")).alias("t_stat"),
        (p * (1.0 - p)
         * (F.col("wwn").cast("double")
            - F.col("wn").cast("double") * F.col("wn") / F.col("n")))
        .alias("var_t"))
    out = arms.crossJoin(F.broadcast(z))
    return out.select(
        F.col("arm").cast("bigint").alias("arm"),
        F.col("n_g").cast("bigint").alias("n_users"),
        F.col("r_g").cast("bigint").alias("responders"),
        (F.col("r_g").cast("double") / F.col("n_g"))
        .cast("decimal(18,6)").cast("double").alias("resp_rate"),
        F.when(F.col("var_t") <= 0, F.lit(None).cast("double"))
        .otherwise((F.col("t_stat") / F.sqrt(F.col("var_t")))
                   .cast("decimal(18,6)").cast("double"))
        .alias("z_trend"))


# ---- Exact trimmed mean (A69) --------------------------------------------------

TRIM_DEN = 10   # trim floor(n/10) rows from each tail (10%)
TRIM_BINS = 256


@query(
    "q_agg_trimmed_mean",
    oracle=f"""
    WITH ranked AS (
      SELECT l_returnflag AS g, l_extendedprice AS x,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rk,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    kept AS (
      SELECT g, x, n, n // {TRIM_DEN} AS k
      FROM ranked
      WHERE rk > n // {TRIM_DEN} AND rk <= n - n // {TRIM_DEN}
    )
    SELECT g AS l_returnflag,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(CAST(CAST(SUM(CAST(x AS DECIMAL(20,6))) AS DOUBLE)
                     / COUNT(*) AS DECIMAL(18,6)) AS DOUBLE)
             AS trimmed_mean
    FROM kept GROUP BY g
    """,
    tags=("A69", "A30", "robust"),
)
def q_agg_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT 10%-TRIMMED MEAN per return-flag group — the robust-center
    statistic between A36's median and the raw mean (drop the
    floor(n/10) smallest and largest values, average the rest), and
    the A27/A30 binning recipe EXTENDED from rank lookup to a trimmed
    AGGREGATE: interior bins (entirely inside the kept rank range)
    contribute their pre-aggregated (count, Σx) WITHOUT any per-row
    ranking; only the two boundary-straddling bins rank their own rows
    (window per (group, bin) partition — parallel, bounded by ~n/bins
    rows). Nothing ever globally sorts: the 100 TB trimmed mean costs
    two scans plus two bin-local sorts.

    Ties at a trim boundary are harmless: any rank permutation among
    equal values keeps the same multiset, so the sum is identical.
    Sums ride exact decimal(20,6); the final mean is one quantized
    IEEE division. Oracle = textbook global-sort rank filter."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("x"))
    # localCheckpoint the two tiny relations (r15, guide §1.2 step 1 /
    # §3.3 "materialise an intermediate to truncate the plan"): stats
    # (<= |groups| rows) and spans (<= |groups|*bins rows) each feed
    # multiple consumers; without a materialization point every
    # broadcast(stats)/spans reference re-derived the whole fact-scan
    # subtree (14 parquet hits in one plan) and the duplicated tree
    # made query construction itself cost more than execution.
    # localCheckpoint, not persist: fresh lineage per call keeps bench
    # reps recomputing honestly. Values are bit-identical — the same
    # aggregates, just computed once.
    #
    # LAZY, not eager (r16 — the VERDICT item 5 adjudication REPRODUCED
    # this query's driver regression: alternating cold-process mins
    # 1.40-1.45 HEAD vs 1.09-1.18 r14): eager=True paid two extra
    # scheduled jobs before the main one. eager=False keeps the
    # single-derivation truncation (both variants return a LogicalRDD;
    # consumers share ONE RDD materialized inside the first consuming
    # job) without the job-scheduling cost. Same-session A/B over 3
    # rounds: eager/eager 1.49-1.82, lazy/lazy 1.20-1.39, no-checkpoint
    # (r14 shape) 1.42-1.67 — lazy wins every round, rows identical.
    stats = li.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x").alias("lo"), F.max("x").alias("hi"))
    stats = stats.localCheckpoint(eager=False)
    span = F.col("hi") - F.col("lo")
    bin_of = F.when(span == 0, F.lit(0)).otherwise(F.least(
        F.floor((F.col("x") - F.col("lo")) * TRIM_BINS / span),
        F.lit(TRIM_BINS - 1))).cast("int")
    binned = li.join(F.broadcast(stats), "g").select(
        "g", "x", "n", bin_of.alias("bin"))
    hist = binned.groupBy("g", "bin").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("x").cast("decimal(20,6)")).alias("s"),
        F.max("n").alias("n"))
    wcum = (Window.partitionBy("g").orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, -1))
    spans = hist.select(
        "g", "bin", "cnt", "s", "n",
        F.coalesce(F.sum("cnt").over(wcum), F.lit(0)).alias("off"),
        F.expr(f"n div {TRIM_DEN}").alias("k"))
    spans = spans.localCheckpoint(eager=False)
    lo_keep, hi_keep = F.col("k") + 1, F.col("n") - F.col("k")
    start, end = F.col("off") + 1, F.col("off") + F.col("cnt")
    interior = spans.where((start >= lo_keep) & (end <= hi_keep)) \
        .select("g", "s", F.col("cnt").alias("m"))
    boundary_bins = spans.where(
        ~((start >= lo_keep) & (end <= hi_keep))
        & (end >= lo_keep) & (start <= hi_keep)) \
        .select("g", "bin", "off", "k", F.col("n").alias("nb"))
    wbin = Window.partitionBy("g", "bin").orderBy("x")
    brows = (binned.join(F.broadcast(boundary_bins), ["g", "bin"])
             .withColumn("rk", F.col("off") + F.row_number().over(wbin))
             .where((F.col("rk") > F.col("k"))
                    & (F.col("rk") <= F.col("nb") - F.col("k")))
             .groupBy("g").agg(
                 F.sum(F.col("x").cast("decimal(20,6)")).alias("s"),
                 F.count(F.lit(1)).alias("m")))
    parts = interior.unionByName(brows)
    agg = parts.groupBy("g").agg(
        F.sum("s").alias("total"), F.sum("m").alias("kept"))
    out = agg.join(F.broadcast(stats.select("g", "n")), "g")
    return out.select(
        F.col("g").alias("l_returnflag"),
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("kept").cast("bigint").alias("n_kept"),
        (F.col("total").cast("double") / F.col("kept"))
        .cast("decimal(18,6)").cast("double").alias("trimmed_mean"))


# ---- Wilson score interval (A70) ------------------------------------------------

WILSON_Z = "1.959963985"  # 97.5th normal quantile (95% two-sided CI)


@query(
    "q_ab_wilson",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id, user_id % 2 AS arm,
             MAX(CASE WHEN event_type = '{MWU_EVENT}'
                       AND value > {TREND_VALUE_FLOOR}
                 THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT arm, COUNT(*) AS n, SUM(conv) AS x
      FROM per_user GROUP BY arm
    ),
    w AS (
      SELECT arm, n, x,
             CAST(x AS DOUBLE) / n AS ph,
             CAST({WILSON_Z} AS DOUBLE) AS z
      FROM arms
    )
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(n AS BIGINT) AS n_users,
           CAST(x AS BIGINT) AS responders,
           CAST(CAST(ph AS DECIMAL(18,6)) AS DOUBLE) AS rate,
           CAST(CAST(
             ((ph + z * z / (2 * n))
              - z * sqrt(ph * (1 - ph) / n + z * z / (4.0 * n * n)))
             / (1 + z * z / n) AS DECIMAL(18,6)) AS DOUBLE) AS wilson_lo,
           CAST(CAST(
             ((ph + z * z / (2 * n))
              + z * sqrt(ph * (1 - ph) / n + z * z / (4.0 * n * n)))
             / (1 + z * z / n) AS DECIMAL(18,6)) AS DOUBLE) AS wilson_hi
    FROM w
    """,
    tags=("A70", "abtest", "interval"),
)
def q_ab_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WILSON SCORE INTERVAL (95%) for each arm's high-value-purchase
    conversion rate — the interval every proportions dashboard should
    use instead of the Wald ±z√(p̂q̂/n) it usually ships: Wilson stays
    inside [0,1], behaves at p̂ near 0/1, and never collapses to a
    zero-width interval on x = 0 — exactly the regimes funnel-step and
    rare-conversion rates live in. Complements A41 (the test) with the
    estimate-quality read.

    Scale: one user-grain aggregate → 2-row arm relation → closed-form
    IEEE expression from exact integer (n, x) per arm, quantized at
    6 dp. z is the 97.5th normal quantile as a double literal (cast
    explicitly — a bare decimal literal arithmetic chain is the
    classic DuckDB drift)."""
    e = load(spark, sf_dir, "events")
    per_user = (e.groupBy("user_id")
                .agg(F.max(F.when((F.col("event_type") == MWU_EVENT)
                                  & (F.col("value") > TREND_VALUE_FLOOR),
                                  1)
                           .otherwise(0)).alias("conv"))
                .select(F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
                        "conv"))
    arms = per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("x"))
    n, x = F.col("n"), F.col("x")
    ph = x.cast("double") / n
    z = F.lit(float(WILSON_Z))
    center = ph + z * z / (2 * n)
    half = z * F.sqrt(ph * (1 - ph) / n + z * z / (4.0 * n * n))
    denom = 1 + z * z / n
    return arms.select(
        F.col("arm").cast("bigint").alias("arm"),
        n.cast("bigint").alias("n_users"),
        x.cast("bigint").alias("responders"),
        ph.cast("decimal(18,6)").cast("double").alias("rate"),
        ((center - half) / denom).cast("decimal(18,6)").cast("double")
        .alias("wilson_lo"),
        ((center + half) / denom).cast("decimal(18,6)").cast("double")
        .alias("wilson_hi"))


# ---- Cochran-Mantel-Haenszel stratified 2x2 test (A71) --------------------

CMH_HI_VALUE = 250000  # high-value order cutoff (~median o_totalprice)


@query(
    "q_ab_cmh",
    oracle=f"""
    WITH cells AS (
      SELECT c.c_mktsegment AS stratum,
             CAST(o.o_custkey % 2 AS BIGINT) AS arm,
             SUM(CASE WHEN o.o_totalprice > {CMH_HI_VALUE}
                 THEN 1 ELSE 0 END) AS hi,
             COUNT(*) AS n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, o.o_custkey % 2
    ),
    strata AS (
      SELECT stratum,
             SUM(CASE WHEN arm = 1 THEN hi ELSE 0 END) AS a,
             SUM(CASE WHEN arm = 1 THEN n - hi ELSE 0 END) AS b,
             SUM(CASE WHEN arm = 0 THEN hi ELSE 0 END) AS c,
             SUM(CASE WHEN arm = 0 THEN n - hi ELSE 0 END) AS d,
             SUM(CASE WHEN arm = 1 THEN n ELSE 0 END) AS n1,
             SUM(CASE WHEN arm = 0 THEN n ELSE 0 END) AS n2,
             SUM(hi) AS m1, SUM(n) AS nn
      FROM cells GROUP BY stratum
    ),
    terms AS (
      SELECT
        CAST(a - CAST(n1 AS DOUBLE) * m1 / nn AS DECIMAL(27,9)) AS dev,
        CAST(CAST(n1 AS DOUBLE) * n2 * m1 * (nn - m1)
             / (CAST(nn AS DOUBLE) * nn * (nn - 1))
             AS DECIMAL(27,9)) AS v,
        CAST(CAST(a AS DOUBLE) * d / nn AS DECIMAL(27,9)) AS ad,
        CAST(CAST(b AS DOUBLE) * c / nn AS DECIMAL(27,9)) AS bc
      FROM strata WHERE nn > 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CASE WHEN CAST(SUM(v) AS DOUBLE) = 0 THEN NULL
           ELSE CAST(CAST(CAST(SUM(dev) AS DOUBLE) * CAST(SUM(dev) AS DOUBLE)
                / CAST(SUM(v) AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE)
             END AS cmh_chi2,
           CASE WHEN CAST(SUM(v) AS DOUBLE) = 0 THEN NULL
           ELSE CAST(CAST(SUM(dev) AS DOUBLE) * CAST(SUM(dev) AS DOUBLE)
                / CAST(SUM(v) AS DOUBLE) AS DECIMAL(18,6))
             > 3.841459 END AS reject_5pct,
           CASE WHEN SUM(bc) = 0 THEN NULL
                ELSE CAST(CAST(CAST(SUM(ad) AS DOUBLE)
                     / CAST(SUM(bc) AS DOUBLE) AS DECIMAL(18,6))
                     AS DOUBLE) END AS or_mh
    FROM terms
    """,
    tags=("A71", "abtest", "stratified"),
)
def q_ab_cmh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COCHRAN-MANTEL-HAENSZEL stratified 2x2 test + Mantel-Haenszel
    common odds ratio: does the arm (custkey parity, the house
    randomization) shift the high-value-order rate AFTER controlling
    for market segment? The confounder-aware member the A/B family
    lacked: A41's pooled z answers the marginal question and is
    Simpson's-paradox-prone when strata differ in both mix and base
    rate; CMH tests the common conditional effect (df=1 regardless of
    stratum count) and OR_MH estimates it.

    Uncorrected (no Yates 0.5) — the large-sample form both engines can
    hold bit-identical; reject flag at the 95% chi2(1) critical value.

    Scale shape: the fact table is touched by ONE hash agg keyed
    (segment, arm) after a broadcast dimension join; everything after is
    a 10-row cell relation folded to 5 stratum rows and one final
    reduction. Per-stratum deviation/variance/OR terms are ratios of
    exact integers computed in DOUBLE and 9-dp-quantized BEFORE the
    order-insensitive decimal sum (compat rule 1); the three final
    divisions happen once, quantized at 6 dp."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    cells = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("stratum"),
                 F.pmod(F.col("o_custkey"), F.lit(2)).alias("arm"))
        .agg(F.sum(F.when(F.col("o_totalprice") > CMH_HI_VALUE, 1)
                   .otherwise(0)).alias("hi"),
             F.count(F.lit(1)).alias("n"))
    )
    strata = cells.groupBy("stratum").agg(
        F.sum(F.when(F.col("arm") == 1, F.col("hi")).otherwise(0))
        .alias("a"),
        F.sum(F.when(F.col("arm") == 1, F.col("n") - F.col("hi"))
              .otherwise(0)).alias("b"),
        F.sum(F.when(F.col("arm") == 0, F.col("hi")).otherwise(0))
        .alias("c"),
        F.sum(F.when(F.col("arm") == 0, F.col("n") - F.col("hi"))
              .otherwise(0)).alias("d"),
        F.sum(F.when(F.col("arm") == 1, F.col("n")).otherwise(0))
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 0, F.col("n")).otherwise(0))
        .alias("n2"),
        F.sum("hi").alias("m1"), F.sum("n").alias("nn"))
    nn = F.col("nn").cast("double")
    terms = strata.where(F.col("nn") > 1).select(
        (F.col("a") - F.col("n1").cast("double") * F.col("m1")
         / F.col("nn")).cast("decimal(27,9)").alias("dev"),
        (F.col("n1").cast("double") * F.col("n2") * F.col("m1")
         * (F.col("nn") - F.col("m1")) / (nn * nn * (F.col("nn") - 1)))
        .cast("decimal(27,9)").alias("v"),
        (F.col("a").cast("double") * F.col("d") / F.col("nn"))
        .cast("decimal(27,9)").alias("ad"),
        (F.col("b").cast("double") * F.col("c") / F.col("nn"))
        .cast("decimal(27,9)").alias("bc"))
    sdev = F.sum("dev").cast("double")
    sv = F.sum("v").cast("double")
    chi2 = (sdev * sdev / sv).cast("decimal(18,6)")
    # Zero pooled variance (every stratum all-success or all-failure):
    # the statistic is undefined — NULL, not an ANSI 0/0 crash.
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.when(sv == 0, F.lit(None).cast("double"))
        .otherwise(chi2.cast("double")).alias("cmh_chi2"),
        F.when(sv == 0, F.lit(None).cast("boolean"))
        .otherwise(chi2 > 3.841459).alias("reject_5pct"),
        F.when(F.sum("bc") == 0, F.lit(None).cast("double"))
        .otherwise((F.sum("ad").cast("double")
                    / F.sum("bc").cast("double"))
                   .cast("decimal(18,6)").cast("double")).alias("or_mh"))


# ---- Kruskal-Wallis H test (A72) -------------------------------------------


@query(
    "q_ab_kruskal",
    oracle="""
    WITH cells AS (
      SELECT l_returnflag AS g, l_quantity AS v, COUNT(*) AS cnt
      FROM lineitem GROUP BY l_returnflag, l_quantity
    ),
    vals AS (
      SELECT v, SUM(cnt) AS cv FROM cells GROUP BY v
    ),
    ranked AS (
      SELECT v, cv,
             2 * COALESCE(SUM(cv) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + cv + 1 AS r2
      FROM vals
    ),
    groups AS (
      SELECT g, SUM(c.cnt) AS ng, SUM(c.cnt * r.r2) AS r2g
      FROM cells c JOIN ranked r ON c.v = r.v
      GROUP BY g
    ),
    nrel AS (
      SELECT SUM(ng) AS n, COUNT(*) AS k FROM groups
    ),
    tot AS (
      SELECT n, k,
             SUM(CAST((CAST(r2g AS DOUBLE) / (2.0 * n))
                 * (CAST(r2g AS DOUBLE) / (2.0 * n)) / ng
                 AS DECIMAL(27,9))) AS svs
      FROM groups, nrel
      GROUP BY n, k
    ),
    ties AS (
      SELECT SUM(cv * cv * cv - cv) AS t3 FROM vals
    )
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(k AS BIGINT) AS n_groups,
           CAST(CAST(12.0 * CAST(n AS DOUBLE) * CAST(svs AS DOUBLE)
                / (n + 1) - 3.0 * (n + 1) AS DECIMAL(18,6)) AS DOUBLE)
             AS h_stat,
           CASE WHEN CAST(t3 AS DOUBLE)
                     >= CAST(n AS DOUBLE) * n * n - n THEN NULL
           ELSE CAST(CAST((12.0 * CAST(n AS DOUBLE) * CAST(svs AS DOUBLE)
                / (n + 1) - 3.0 * (n + 1))
                / (1.0 - CAST(t3 AS DOUBLE)
                   / (CAST(n AS DOUBLE) * n * n - n))
                AS DECIMAL(18,6)) AS DOUBLE) END AS h_tie_corrected
    FROM tot, ties
    """,
    tags=("A72", "abtest", "rank"),
)
def q_ab_kruskal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL-WALLIS H: the k-group rank test of quantity across the
    three return-flag populations — the nonparametric sibling of A53's
    ANOVA (which assumes normal-ish tails) and the k-group
    generalization of A44's Mann-Whitney. Reported raw AND with the
    standard tie correction 1 - sum(t^3 - t)/(N^3 - N) — l_quantity has
    50 distinct values over ~N rows, so ties dominate and the
    uncorrected H understates significance.

    Scale shape (the A44/A56 distinct-value discipline): the fact table
    is touched by ONE hash agg to (group, value) cells — bounded by
    3 x 50 regardless of row count; pooled AVERAGE ranks fall out of a
    prefix window over the 50-row value relation as exact DOUBLED
    integers (2*prefix + count + 1 — no halves, no floats); per-group
    rank sums are exact integer dot products over the cell relation.
    H is assembled from those exact integers with per-group terms
    9-dp-quantized before the 3-row fold; no row-grain sort or window
    anywhere (the oracle mirrors the same collapse — the naive-model
    property test, not the mirror, proves the rank arithmetic)."""
    li = load(spark, sf_dir, "lineitem")
    cells = li.groupBy(F.col("l_returnflag").alias("g"),
                       F.col("l_quantity").alias("v")) \
        .agg(F.count(F.lit(1)).alias("cnt"))
    # localCheckpoint the cell relation (r15, guide §1.2 step 1): it is
    # bounded by |groups| x |distinct quantities| (~150 rows) but feeds
    # a three-level diamond (vals -> ranked/ties, cells |x| ranked ->
    # groups -> nrel/tot) whose expansion re-derived the fact scan +
    # aggregate 5 times in one plan. One fact pass computes the cells;
    # every statistic below is integer arithmetic over the tiny
    # relation. localCheckpoint, not persist: fresh lineage per call
    # keeps bench reps recomputing honestly.
    # LAZY (r16): eager paid a scheduled job before the main pass;
    # eager=False keeps the same LogicalRDD single-derivation
    # truncation with the materialization inside the consuming job
    # (interleaved A/B 0.84 -> 0.76 warm min, rows identical).
    cells = cells.localCheckpoint(eager=False)
    vals = cells.groupBy("v").agg(F.sum("cnt").alias("cv"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.select(
        "v", "cv",
        (2 * F.coalesce(F.sum("cv").over(wv), F.lit(0))
         + F.col("cv") + 1).alias("r2"))
    groups = (cells.join(F.broadcast(ranked), "v")
              .groupBy("g")
              .agg(F.sum("cnt").alias("ng"),
                   F.sum(F.col("cnt") * F.col("r2")).alias("r2g")))
    nrel = groups.agg(F.sum("ng").alias("n"),
                      F.count(F.lit(1)).alias("k"))
    # Per-group term in AVERAGE-RANK space: v = (r2g/2n)^2 / ng =
    # R_g^2/(n^2 ng), bounded by ng <= n — the raw R_g^2/ng form
    # overflowed decimal(27,9) at the ~sf1 decade rung (R_g ~ n^2/k
    # makes the term ~n^3; measured 1.8e19 at 6M rows). Identity:
    # H = 12 n Σv/(n+1) − 3(n+1).
    v = ((F.col("r2g").cast("double") / (2.0 * F.col("n")))
         * (F.col("r2g").cast("double") / (2.0 * F.col("n")))
         / F.col("ng")).cast("decimal(27,9)")
    tot = (groups.crossJoin(F.broadcast(nrel))
           .select("n", "k", v.alias("v"))
           .groupBy("n", "k")
           .agg(F.sum("v").alias("svs")))
    ties = vals.agg(
        F.sum(F.col("cv").cast("decimal(19,0)") * F.col("cv")
              * F.col("cv") - F.col("cv"))
        .alias("t3"))
    nd = F.col("n").cast("double")
    h = (12.0 * nd * F.col("svs").cast("double") / (F.col("n") + 1)
         - 3.0 * (F.col("n") + 1))
    # All-tied sample (t3 = n^3 - n, which subsumes n = 1): the tie
    # denominator is 0 and the corrected statistic is undefined —
    # report NULL instead of dividing (ANSI mode turns 0/0 into a
    # crash; found by the degenerate-input suite, not the harness).
    all_tied = (F.col("t3").cast("double")
                >= nd * F.col("n") * F.col("n") - F.col("n"))
    tie_den = 1.0 - F.col("t3").cast("double") / (nd * F.col("n")
                                                  * F.col("n") - F.col("n"))
    return tot.crossJoin(F.broadcast(ties)).select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("k").cast("bigint").alias("n_groups"),
        h.cast("decimal(18,6)").cast("double").alias("h_stat"),
        F.when(all_tied, F.lit(None).cast("double"))
        .otherwise((h / tie_den).cast("decimal(18,6)").cast("double"))
        .alias("h_tie_corrected"))


# ---- Herfindahl-Hirschman concentration index (A73) ------------------------


@query(
    "q_agg_hhi",
    oracle=f"""
    WITH rev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             {o_dsum('l_extendedprice * (1 - l_discount)', 'r')}
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    ),
    tot AS (
      SELECT s_nationkey, SUM(CAST(r AS DECIMAL(20,6))) AS t,
             COUNT(*) AS n_suppliers
      FROM rev GROUP BY s_nationkey
    ),
    terms AS (
      SELECT r.s_nationkey,
             CAST(10000.0 * (r.r / CAST(t.t AS DOUBLE))
                  * (r.r / CAST(t.t AS DOUBLE))
                  AS DECIMAL(27,9)) AS h
      FROM rev r JOIN tot t ON r.s_nationkey = t.s_nationkey
      WHERE t.t <> 0
    )
    SELECT t.s_nationkey,
           CAST(t.n_suppliers AS BIGINT) AS n_suppliers,
           CAST(CAST(CAST(SUM(h) AS DOUBLE) AS DECIMAL(18,6)) AS DOUBLE)
             AS hhi,
           CASE WHEN CAST(CAST(SUM(h) AS DOUBLE) AS DECIMAL(18,6))
                     > 2500 THEN 'high'
                WHEN CAST(CAST(SUM(h) AS DOUBLE) AS DECIMAL(18,6))
                     > 1500 THEN 'moderate'
                ELSE 'unconcentrated' END AS concentration
    FROM terms h JOIN tot t ON h.s_nationkey = t.s_nationkey
    GROUP BY t.s_nationkey, t.n_suppliers
    ORDER BY t.s_nationkey
    """,
    tags=("A73", "concentration", "hhi"),
)
def q_agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HERFINDAHL-HIRSCHMAN INDEX of supplier revenue concentration per
    nation — Σ (100·share)² on the antitrust scale (10000 = monopoly),
    with the DOJ's 1500/2500 'moderate/high' bands as a read-to-act
    column. The market-structure member of the concentration family:
    A25's Gini reads inequality, A34's Pareto reads the top tail, A62's
    Theil decomposes BETWEEN vs WITHIN — HHI is the one regulators and
    procurement-risk dashboards actually threshold ('if our top
    supplier fails, is the market concentrated enough to price-gouge
    the re-sourcing?').

    Scale shape: one fact-table hash agg keyed (nation, supplier)
    through the exact-decimal revenue sum; per-nation totals are a
    second agg over the supplier-grain relation; each supplier's
    squared-share term is 9-dp-quantized before the order-insensitive
    per-nation fold (25-row output). The share division happens once
    per supplier — never per fact row."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    rev = (li.join(F.broadcast(s),
                   li.l_suppkey == s.s_suppkey)
           .groupBy("s_nationkey", "l_suppkey")
           .agg(dsum(F.col("l_extendedprice")
                     * (1 - F.col("l_discount")), "r")))
    tot = rev.groupBy("s_nationkey").agg(
        F.sum(F.col("r").cast("decimal(20,6)")).alias("t"),
        F.count(F.lit(1)).alias("n_suppliers"))
    share = F.col("r") / F.col("t").cast("double")
    terms = (rev.join(F.broadcast(tot), "s_nationkey")
             .where(F.col("t") != 0)
             .select("s_nationkey", "n_suppliers",
                     (10000.0 * share * share).cast("decimal(27,9)")
                     .alias("h")))
    hhi = F.sum("h").cast("double").cast("decimal(18,6)")
    return (terms.groupBy("s_nationkey", "n_suppliers")
            .agg(hhi.cast("double").alias("hhi"),
                 F.when(hhi > 2500, "high")
                 .when(hhi > 1500, "moderate")
                 .otherwise("unconcentrated").alias("concentration"))
            .select(F.col("s_nationkey"),
                    F.col("n_suppliers").cast("bigint")
                    .alias("n_suppliers"),
                    "hhi", "concentration")
            .orderBy("s_nationkey"))


# ---- Fisher's exact test (A74) ---------------------------------------------

FISHER_REGION = 1  # the region whose nations form the 'treatment' row


@query(
    "q_ab_fisher",
    oracle=f"""
    WITH percust AS (
      SELECT n.n_nationkey, n.n_regionkey, COUNT(c.c_custkey) AS nc
      FROM nation n LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_nationkey, n.n_regionkey
    ),
    med AS (
      SELECT nc AS m FROM percust ORDER BY nc, n_nationkey
      LIMIT 1 OFFSET (SELECT (COUNT(*) - 1) // 2 FROM percust)
    ),
    flags AS (
      SELECT CASE WHEN n_regionkey = {FISHER_REGION} THEN 1 ELSE 0 END
               AS in_region,
             CASE WHEN nc > (SELECT m FROM med) THEN 1 ELSE 0 END
               AS above
      FROM percust
    ),
    cells AS (
      SELECT SUM(in_region * above) AS a,
             SUM(in_region) AS n1,
             SUM(above) AS m1,
             COUNT(*) AS nn
      FROM flags
    ),
    lf AS (
      SELECT i, SUM(CAST(CASE WHEN i = 0 THEN 0
                    ELSE CAST(ln(CAST(i AS DOUBLE)) AS DECIMAL(18,9))
                    END AS DECIMAL(27,9)))
               OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS lnf
      FROM (SELECT UNNEST(range(0, 2001)) AS i)
      WHERE i <= (SELECT nn FROM cells)
    ),
    terms AS (
      SELECT c.a, c.n1, c.m1, c.nn, k.k,
             CAST(CAST(exp(CAST(
               (SELECT lnf FROM lf WHERE i = c.m1)
               - (SELECT lnf FROM lf WHERE i = k.k)
               - (SELECT lnf FROM lf WHERE i = c.m1 - k.k)
               + (SELECT lnf FROM lf WHERE i = c.nn - c.m1)
               - (SELECT lnf FROM lf WHERE i = c.n1 - k.k)
               - (SELECT lnf FROM lf WHERE i = c.nn - c.m1 - c.n1 + k.k)
               - (SELECT lnf FROM lf WHERE i = c.nn)
               + (SELECT lnf FROM lf WHERE i = c.n1)
               + (SELECT lnf FROM lf WHERE i = c.nn - c.n1)
               AS DOUBLE)) AS DECIMAL(18,12)) AS DECIMAL(18,12)) AS t
      FROM cells c,
           (SELECT UNNEST(range(0, 2001)) AS k) k
      WHERE k.k <= c.nn AND k.k >= c.a AND k.k <= least(c.n1, c.m1)
        AND c.n1 - k.k >= 0 AND c.nn - c.m1 - c.n1 + k.k >= 0
    )
    SELECT CAST(MAX(a) AS BIGINT) AS a,
           CAST(MAX(n1) AS BIGINT) AS n1,
           CAST(MAX(m1) AS BIGINT) AS m1,
           CAST(MAX(nn) AS BIGINT) AS n_total,
           CAST(CAST(CAST(SUM(t) AS DOUBLE) AS DECIMAL(18,9)) AS DOUBLE)
             AS p_one_sided
    FROM terms
    """,
    tags=("A74", "abtest", "exact-test"),
)
def q_ab_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FISHER'S EXACT TEST (one-sided, over-representation): are
    region-{FISHER_REGION} nations over-represented among
    above-median-customer-count nations? The SMALL-TABLE member of the
    test family, stated honestly: exact hypergeometric enumeration is
    THE right tool when cells are single digits (A24's chi-square
    needs expected counts ≥5; A41's z needs CLT) and the WRONG tool at
    scale — its cost grows with the margin, so the engine routes big
    tables to chi-square and keeps Fisher for bounded relations like
    the 25-nation dimension used here.

    Engine-grade numeric discipline (no lgamma builtin exists in
    either engine): an IN-ENGINE log-factorial table — cumulative
    exact-decimal sums of 9-dp-quantized ln(i) over range(0, N) — makes
    every log-hypergeometric term an EXACT decimal expression, so both
    engines exponentiate identical rationals (exp is the A55/A63
    engine-exact precedent), each term is 12-dp-quantized, and the
    tail sum is exact. The median split uses the lower-median order
    statistic with a nationkey tiebreak (total order, engine-free)."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    percust = (n.join(c, c.c_nationkey == n.n_nationkey, "left")
               .groupBy("n_nationkey", "n_regionkey")
               .agg(F.count("c_custkey").alias("nc")))
    percust = percust.persist()
    wmed = Window.orderBy("nc", "n_nationkey")
    wall = Window.partitionBy(F.lit(1))
    med = (percust
           .select("nc", F.row_number().over(wmed).alias("rk"),
                   F.count(F.lit(1)).over(wall).alias("cnt"))
           .where(F.col("rk") == F.floor((F.col("cnt") + 1) / 2))
           .select(F.col("nc").alias("m")))
    flags = percust.crossJoin(F.broadcast(med)).select(
        F.when(F.col("n_regionkey") == FISHER_REGION, 1).otherwise(0)
        .alias("in_region"),
        F.when(F.col("nc") > F.col("m"), 1).otherwise(0).alias("above"))
    cells = flags.agg(
        F.sum(F.col("in_region") * F.col("above")).alias("a"),
        F.sum("in_region").alias("n1"),
        F.sum("above").alias("m1"),
        F.count(F.lit(1)).alias("nn"))
    nn = cells.collect()[0]["nn"]  # dimension-bounded (25 nations)
    wlf = Window.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    lf = (spark.range(0, nn + 1).select(F.col("id").alias("i"))
          .select("i", F.sum(
              F.when(F.col("i") == 0, F.lit(0).cast("decimal(18,9)"))
              .otherwise(F.log(F.col("i").cast("double"))
                         .cast("decimal(18,9)")).cast("decimal(27,9)"))
              .over(wlf).alias("lnf")))
    ks = spark.range(0, nn + 1).select(F.col("id").alias("k"))
    g = (cells.crossJoin(F.broadcast(ks))
         .where((F.col("k") <= F.col("nn"))
                & (F.col("k") >= F.col("a"))
                & (F.col("k") <= F.least("n1", "m1"))
                & (F.col("n1") - F.col("k") >= 0)
                & (F.col("nn") - F.col("m1") - F.col("n1")
                   + F.col("k") >= 0)))

    # nine lookups into the 26-row lnf relation via broadcast joins
    g = (g.join(F.broadcast(lf.withColumnRenamed("lnf", "l_m1")),
                F.col("i") == F.col("m1")).drop("i")
         .join(F.broadcast(lf.withColumnRenamed("lnf", "l_k")),
               F.col("i") == F.col("k")).drop("i")
         .join(F.broadcast(lf.withColumnRenamed("lnf", "l_m1k")),
               F.col("i") == F.col("m1") - F.col("k")).drop("i")
         .join(F.broadcast(lf.withColumnRenamed("lnf", "l_nm1")),
               F.col("i") == F.col("nn") - F.col("m1")).drop("i")
         .join(F.broadcast(lf.withColumnRenamed("lnf", "l_n1k")),
               F.col("i") == F.col("n1") - F.col("k")).drop("i")
         .join(F.broadcast(lf.withColumnRenamed("lnf", "l_rest")),
               F.col("i") == F.col("nn") - F.col("m1") - F.col("n1")
               + F.col("k")).drop("i")
         .join(F.broadcast(lf.withColumnRenamed("lnf", "l_nn")),
               F.col("i") == F.col("nn")).drop("i")
         .join(F.broadcast(lf.withColumnRenamed("lnf", "l_n1")),
               F.col("i") == F.col("n1")).drop("i")
         .join(F.broadcast(lf.withColumnRenamed("lnf", "l_nn1")),
               F.col("i") == F.col("nn") - F.col("n1")).drop("i"))
    # downcast each lookup to decimal(18,9) BEFORE the 9-term fold: the
    # window SUM makes lnf decimal(37,9), and chaining nine (37,9) adds
    # overflows Spark's 38-digit cap, which silently clamps the scale
    # toward 6 (measured: lt lost its last three digits). (18,9) holds
    # ln(10^9!) with room and keeps the chain exact.
    def l9(name):
        return F.col(name).cast("decimal(18,9)")

    lt = (l9("l_m1") - l9("l_k") - l9("l_m1k")
          + l9("l_nm1") - l9("l_n1k") - l9("l_rest")
          - l9("l_nn") + l9("l_n1") + l9("l_nn1"))
    terms = g.select(
        "a", "n1", "m1", "nn",
        F.exp(lt.cast("double")).cast("decimal(18,12)").alias("t"))
    return terms.agg(
        F.max("a").cast("bigint").alias("a"),
        F.max("n1").cast("bigint").alias("n1"),
        F.max("m1").cast("bigint").alias("m1"),
        F.max("nn").cast("bigint").alias("n_total"),
        F.sum("t").cast("double").cast("decimal(18,9)").cast("double")
        .alias("p_one_sided"))


# ---- Jarque-Bera normality test (A75) ----------------------------------------

JB_CRIT_5PCT = 5.991465  # chi-square 95th percentile, df = 2


@query(
    "q_ab_jarque_bera",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag AS g,
             COUNT(*) AS n,
             SUM(CAST(l_extendedprice AS DECIMAL(20,6))) AS s1,
             SUM(CAST(l_extendedprice AS DECIMAL(19,6))
                 * CAST(l_extendedprice AS DECIMAL(19,6))) AS s2,
             SUM(CAST(CAST(l_extendedprice AS DOUBLE)
                      * l_extendedprice * l_extendedprice
                      AS DECIMAL(38,6))) AS s3,
             SUM(CAST(CAST(l_extendedprice AS DOUBLE)
                      * l_extendedprice * l_extendedprice
                      * l_extendedprice AS DECIMAL(38,2))) AS s4
      FROM lineitem GROUP BY l_returnflag
    ),
    mom AS (
      SELECT g, n,
             CAST(s1 AS DOUBLE) / n AS m1,
             CAST(s2 AS DOUBLE) / n AS r2,
             CAST(s3 AS DOUBLE) / n AS r3,
             CAST(s4 AS DOUBLE) / n AS r4
      FROM s
    ),
    ctr AS (
      SELECT g, n,
             r2 - m1 * m1 AS c2,
             r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1 AS c3,
             r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2
               - 3 * m1 * m1 * m1 * m1 AS c4
      FROM mom
    ),
    sk AS (
      SELECT g, n,
             CAST(CAST(c3 / (c2 * sqrt(c2)) AS DECIMAL(18,9)) AS DOUBLE)
               AS skew,
             CAST(CAST(c4 / (c2 * c2) - 3.0 AS DECIMAL(18,9)) AS DOUBLE)
               AS exkurt
      FROM ctr WHERE c2 > 0
    )
    SELECT g AS l_returnflag,
           CAST(n AS BIGINT) AS n_rows,
           CAST(CAST(skew AS DECIMAL(18,6)) AS DOUBLE) AS skewness,
           CAST(CAST(exkurt AS DECIMAL(18,6)) AS DOUBLE) AS excess_kurtosis,
           CAST(CAST(n / 6.0 * (skew * skew + exkurt * exkurt / 4.0)
                AS DECIMAL(18,6)) AS DOUBLE) AS jb_stat,
           CAST(n / 6.0 * (skew * skew + exkurt * exkurt / 4.0)
                AS DECIMAL(18,6)) > {JB_CRIT_5PCT} AS reject_normal_5pct
    FROM sk
    ORDER BY g
    """,
    tags=("A75", "abtest", "normality"),
)
def q_ab_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JARQUE-BERA NORMALITY TEST per return-flag group: JB =
    n/6·(S² + K²/4) against chi²(2) — the gate that DECIDES between the
    parametric family (A43/A52/A53 assume roughly normal tails) and
    the rank family (A44/A72): A54 ships the skewness/kurtosis
    READINGS, this turns them into the accept/reject the router needs.
    Heavily skewed revenue should reject loudly; that is the point —
    'your t-test p-value on this metric is fiction, use ranks'.

    Same mergeable raw-power-sum discipline as A54 (ONE hash agg,
    n/Σx/Σx²/Σx³/Σx⁴; the decimal types hold exact sums for the cube
    and quartic magnitudes at fact-table counts), central moments by
    binomial expansion in IEEE from exact sums, S and K 9-dp-quantized
    before squaring so both engines square identical rationals, final
    JB quantized at 6 dp with the df=2 critical flag."""
    li = load(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice")
    s = li.groupBy(F.col("l_returnflag").alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("decimal(20,6)")).alias("s1"),
        F.sum(x.cast("decimal(19,6)") * x.cast("decimal(19,6)"))
        .alias("s2"),
        F.sum((x.cast("double") * x * x).cast("decimal(38,6)"))
        .alias("s3"),
        F.sum((x.cast("double") * x * x * x).cast("decimal(38,2)"))
        .alias("s4"))
    n = F.col("n")
    m1 = F.col("s1").cast("double") / n
    r2 = F.col("s2").cast("double") / n
    r3 = F.col("s3").cast("double") / n
    r4 = F.col("s4").cast("double") / n
    c2 = r2 - m1 * m1
    c3 = r3 - 3 * m1 * r2 + 2 * m1 * m1 * m1
    c4 = r4 - 4 * m1 * r3 + 6 * m1 * m1 * r2 - 3 * m1 * m1 * m1 * m1
    skew = (c3 / (c2 * F.sqrt(c2))).cast("decimal(18,9)").cast("double")
    exk = (c4 / (c2 * c2) - 3.0).cast("decimal(18,9)").cast("double")
    mom = s.where(c2 > 0).select(
        F.col("g"), n, skew.alias("skew"), exk.alias("exkurt"))
    jb = (F.col("n") / 6.0 * (F.col("skew") * F.col("skew")
                              + F.col("exkurt") * F.col("exkurt") / 4.0)) \
        .cast("decimal(18,6)")
    return mom.select(
        F.col("g").alias("l_returnflag"),
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("skew").cast("decimal(18,6)").cast("double")
        .alias("skewness"),
        F.col("exkurt").cast("decimal(18,6)").cast("double")
        .alias("excess_kurtosis"),
        jb.cast("double").alias("jb_stat"),
        (jb > JB_CRIT_5PCT).alias("reject_normal_5pct")
    ).orderBy("l_returnflag")


# ---- Simpson's-paradox screen (A76) -----------------------------------------

SIMPSON_DISCOUNT_CUT = "0.05"  # high-discount = l_discount >= this grid value


@query(
    "q_agg_simpson",
    oracle=f"""
    WITH cells AS (
      SELECT n.n_name AS segment,
             SUM(CASE WHEN l.l_discount >= {SIMPSON_DISCOUNT_CUT}
                      THEN 1 ELSE 0 END) AS n_high,
             SUM(CASE WHEN l.l_discount >= {SIMPSON_DISCOUNT_CUT}
                       AND l.l_returnflag = 'R' THEN 1 ELSE 0 END)
               AS r_high,
             SUM(CASE WHEN l.l_discount < {SIMPSON_DISCOUNT_CUT}
                      THEN 1 ELSE 0 END) AS n_low,
             SUM(CASE WHEN l.l_discount < {SIMPSON_DISCOUNT_CUT}
                       AND l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS r_low
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      GROUP BY n.n_name
    ),
    pooled AS (
      SELECT SUM(n_high) AS n_high, SUM(r_high) AS r_high,
             SUM(n_low) AS n_low, SUM(r_low) AS r_low
      FROM cells
    ),
    allrows AS (
      SELECT segment, n_high, r_high, n_low, r_low FROM cells
      UNION ALL
      SELECT '(pooled)', n_high, r_high, n_low, r_low FROM pooled
    ),
    rated AS (
      SELECT segment,
             CAST(n_high AS BIGINT) AS n_high,
             CAST(n_low AS BIGINT) AS n_low,
             CASE WHEN n_high = 0 THEN NULL
                  ELSE CAST(CAST(CAST(r_high AS DOUBLE) / n_high
                       AS DECIMAL(18,6)) AS DOUBLE) END AS rate_high,
             CASE WHEN n_low = 0 THEN NULL
                  ELSE CAST(CAST(CAST(r_low AS DOUBLE) / n_low
                       AS DECIMAL(18,6)) AS DOUBLE) END AS rate_low
      FROM allrows
    ),
    withdiff AS (
      SELECT *, rate_high - rate_low AS diff FROM rated
    )
    SELECT w.segment, w.n_high, w.n_low, w.rate_high, w.rate_low,
           w.diff,
           w.segment <> '(pooled)'
             AND w.diff IS NOT NULL AND p.diff IS NOT NULL
             AND ((w.diff > 0 AND p.diff < 0)
                  OR (w.diff < 0 AND p.diff > 0)) AS reversed
    FROM withdiff w
    CROSS JOIN (SELECT diff FROM withdiff
                WHERE segment = '(pooled)') p
    """,
    tags=("A76", "aggregate", "simpson"),
)
def q_agg_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMPSON'S-PARADOX SCREEN on the discount→return association:
    return rate of high-discount vs low-discount lines, POOLED and PER
    SEGMENT (supplier nation, via two broadcast dimension joins), with
    a per-segment reversal flag — the
    aggregation-trap audit every experiment readout and BI rollup
    needs before anyone acts on a pooled rate (a pooled "discounts
    reduce returns" can invert inside every segment when discount
    propensity correlates with the segment mix; A45's CUPED and A71's
    CMH are the corrections, THIS op is the detector that says one is
    needed).

    Everything is exact integer cells (one fact-table aggregate at the
    segment grain, then a 25-row fold for the pooled margin — map-side
    combinable, no second fact pass); rates are one quantized division
    each, the diff subtracts identical quantized doubles, and the
    reversal test compares SIGNS of quantized values (no epsilon).
    NULL discipline: a segment missing either arm reports NULL rates;
    the flag itself is never NULL — it asserts a PROVEN reversal, so
    undefined diffs and the pooled row's self-comparison read FALSE."""
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    seg = (li.join(F.broadcast(sup),
                   li.l_suppkey == sup.s_suppkey)
           .join(F.broadcast(nat),
                 F.col("s_nationkey") == F.col("n_nationkey")))
    hi = F.col("l_discount") >= float(SIMPSON_DISCOUNT_CUT)
    ret = F.col("l_returnflag") == "R"
    cells = seg.groupBy(F.col("n_name").alias("segment")).agg(
        F.sum(F.when(hi, 1).otherwise(0)).alias("n_high"),
        F.sum(F.when(hi & ret, 1).otherwise(0)).alias("r_high"),
        F.sum(F.when(~hi, 1).otherwise(0)).alias("n_low"),
        F.sum(F.when(~hi & ret, 1).otherwise(0)).alias("r_low"))
    # the pooled-diff reference branch re-executes this relation's plan
    # (plan audit: the '(pooled)' filter was pushed into a SECOND fact
    # scan); the 25-row cell relation is persisted so the fact table is
    # scanned exactly once per call.
    cells = cells.persist()
    pooled = cells.agg(
        F.sum("n_high").alias("n_high"), F.sum("r_high").alias("r_high"),
        F.sum("n_low").alias("n_low"), F.sum("r_low").alias("r_low")) \
        .select(F.lit("(pooled)").alias("segment"),
                "n_high", "r_high", "n_low", "r_low")
    allrows = cells.unionByName(pooled)
    rate = lambda r, n: F.when(  # noqa: E731 — local rate quantizer
        F.col(n) == 0, F.lit(None).cast("double")).otherwise(
        (F.col(r).cast("double") / F.col(n))
        .cast("decimal(18,6)").cast("double"))
    rated = allrows.select(
        "segment",
        F.col("n_high").cast("bigint").alias("n_high"),
        F.col("n_low").cast("bigint").alias("n_low"),
        rate("r_high", "n_high").alias("rate_high"),
        rate("r_low", "n_low").alias("rate_low"))
    withdiff = rated.withColumn(
        "diff", F.col("rate_high") - F.col("rate_low"))
    pdiff = withdiff.where(F.col("segment") == "(pooled)") \
        .select(F.col("diff").alias("p_diff"))
    return (withdiff.crossJoin(F.broadcast(pdiff))
            .select("segment", "n_high", "n_low", "rate_high", "rate_low",
                    "diff",
                    ((F.col("segment") != "(pooled)")
                     & F.col("diff").isNotNull()
                     & F.col("p_diff").isNotNull()
                     & (((F.col("diff") > 0) & (F.col("p_diff") < 0))
                        | ((F.col("diff") < 0) & (F.col("p_diff") > 0))))
                    .alias("reversed")))


# ---- Second frequency moment / exact self-join size (A77) -------------------


@query(
    "q_agg_f2",
    oracle="""
    WITH counts AS (
      SELECT event_type, user_id, COUNT(*) AS c
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
                AS BIGINT) AS self_join_size,
           CAST(CAST(
             CAST(SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
                  AS DOUBLE) * COUNT(*)
             / (CAST(SUM(c) AS DOUBLE) * SUM(c))
             AS DECIMAL(18,6)) AS DOUBLE) AS amplification
    FROM counts
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("A77", "sketch-family", "self-join-size"),
)
def q_agg_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SECOND FREQUENCY MOMENT F₂ = Σ c_k² per event_type — the EXACT
    self-join size on user_id, the number a join planner needs before
    committing a self-join or a key-equality shuffle (A17's keyskew
    profile reads the top keys; F₂ is the one-number integral of the
    whole skew curve, and the quantity the AMS sketch estimates when
    exact counting is too dear). amplification = F₂·d / n² is the
    blow-up factor vs a uniform key distribution (1.0 = uniform;
    10× means the self-join output is 10× what uniform keys would
    produce — the salting trigger).

    Exactness at scale: one partial/final count aggregate to the
    (type, key) grain, then an edge-count-bounded fold; c² multiplies
    in DECIMAL(19,0) (exact int128 path in both engines — a bigint c²
    sum overflows at ~3·10⁹ rows/key, decimal never does at any
    realistic corpus). One quantized division for the amplification."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c"))
    cd = F.col("c").cast("decimal(19,0)")
    return (counts.groupBy("event_type")
            .agg(F.sum("c").cast("bigint").alias("n_rows"),
                 F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                 F.sum(cd * cd).cast("bigint").alias("self_join_size"))
            .select("event_type", "n_rows", "n_keys", "self_join_size",
                    (F.col("self_join_size").cast("double")
                     * F.col("n_keys")
                     / (F.col("n_rows").cast("double")
                        * F.col("n_rows")))
                    .cast("decimal(18,6)").cast("double")
                    .alias("amplification"))
            .orderBy("event_type"))


# ---- Value-at-risk / conditional tail expectation (A78) ----------------------

CVAR_P_NUM = 95   # tail quantile as the exact rational 95/100 —
CVAR_P_DEN = 100  # rank = ceil(p*n) stays in integer arithmetic


@query(
    "q_agg_cvar",
    oracle=f"""
    WITH ranked AS (
      SELECT l_returnflag AS segment, l_extendedprice AS v,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rk,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    var AS (
      SELECT segment, MAX(n) AS n,
             MAX(CASE WHEN rk * {CVAR_P_DEN} >= {CVAR_P_NUM} * n
                       AND (rk - 1) * {CVAR_P_DEN} < {CVAR_P_NUM} * n
                      THEN v END) AS var_p
      FROM ranked GROUP BY segment
    )
    SELECT v.segment,
           CAST(v.n AS BIGINT) AS n_rows,
           CAST(v.var_p AS DOUBLE) AS var95,
           CAST(COUNT(*) AS BIGINT) AS tail_n,
           CAST(SUM(CAST(r.v AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*)
             AS cvar95
    FROM var v JOIN ranked r
      ON r.segment = v.segment AND r.v >= v.var_p
    GROUP BY v.segment, v.n, v.var_p
    ORDER BY v.segment
    """,
    tags=("A78", "risk", "two-pass"),
)
def q_agg_cvar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUE-AT-RISK + CONDITIONAL VaR (expected shortfall) per
    segment: the exact {CVAR_P_NUM}th-percentile price (discrete
    inverse-CDF rank, the A27/A30 definition) and the mean of the tail
    at or above it — the pair every risk/SLA dashboard draws (VaR says
    where the tail STARTS, CVaR says how bad it is ON AVERAGE once
    entered; quantile alone under-states a heavy tail, which is CVaR's
    whole reason to exist as the coherent risk measure).

    Exactness at scale: the percentile comes from the A27/A30 two-pass
    binning (one {{IQR_BINS}}-bin histogram per segment, rank-in-bin
    selection on only the target bin's rows — no global sort); the
    rank compare rk·{CVAR_P_DEN} ≥ {CVAR_P_NUM}·n stays in integer
    arithmetic (no float quantile index). The tail mean is a second
    fact aggregate against the broadcast 3-row VaR relation with the
    standing decimal-sum discipline."""
    from .quality import IQR_BINS

    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("segment"),
        F.col("l_extendedprice").alias("v"))
    stats = li.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("v_lo"), F.max("v").alias("v_hi"))
    # A27/A30 materialization discipline (r15, guide §1.2 step 1):
    # stats, located and the 3-row VaR relation each fed multiple
    # consumers and re-embedded fact-scan subtrees (6 scans in one
    # plan for a 4-pass algorithm: stats, histogram, rank-in-bin pick,
    # tail aggregate). Checkpointed, the plan takes exactly those four
    # passes.
    stats = stats.localCheckpoint(eager=True)
    span = F.col("v_hi") - F.col("v_lo")
    bin_of = F.when(span == 0, F.lit(0)).otherwise(F.least(
        F.floor((F.col("v") - F.col("v_lo")) * IQR_BINS / span),
        F.lit(IQR_BINS - 1))).cast("int")
    binned = li.join(F.broadcast(stats), "segment") \
        .select("segment", "v", bin_of.alias("bin"))
    # rank = ceil(n·NUM/DEN) computed as (n·NUM + DEN − 1) div DEN —
    # PURE bigint arithmetic (ADVICE r13: F.ceil over `/` goes through
    # double division, exact for 95/100 today but fragile if the
    # quantile constants change to a ratio that rounds across an
    # integer boundary; the oracle's rk·DEN ≥ NUM·n compare is integer,
    # so the engine side must be too)
    targets = stats.select(
        "segment", "n",
        F.expr(f"CAST((n * {CVAR_P_NUM} + {CVAR_P_DEN - 1}) "
               f"DIV {CVAR_P_DEN} AS BIGINT)").alias("rk"))
    hist = binned.groupBy("segment", "bin").agg(
        F.count(F.lit(1)).alias("cnt"))
    wcum = Window.partitionBy("segment").orderBy("bin") \
        .rowsBetween(Window.unboundedPreceding, 0)
    located = (hist.withColumn("cum", F.sum("cnt").over(wcum))
               .join(F.broadcast(targets), "segment")
               .where((F.col("cum") >= F.col("rk"))
                      & (F.col("cum") - F.col("cnt") < F.col("rk")))
               .select("segment", "bin", "n",
                       (F.col("rk") - (F.col("cum") - F.col("cnt")))
                       .alias("offset")))
    located = located.localCheckpoint(eager=True)
    wbin = Window.partitionBy("segment").orderBy("v")
    var_rel = (binned.join(F.broadcast(located), ["segment", "bin"])
               .withColumn("rk_in_bin", F.row_number().over(wbin))
               .where(F.col("rk_in_bin") == F.col("offset"))
               .select("segment", "n", F.col("v").alias("var_p")))
    var_rel = var_rel.localCheckpoint(eager=True)
    return (li.join(F.broadcast(var_rel), "segment")
            .where(F.col("v") >= F.col("var_p"))
            .groupBy("segment")
            .agg(F.max("n").cast("bigint").alias("n_rows"),
                 F.max("var_p").cast("double").alias("var95"),
                 F.count(F.lit(1)).cast("bigint").alias("tail_n"),
                 (F.sum(F.col("v").cast("decimal(20,6)")).cast("double")
                  / F.count(F.lit(1))).alias("cvar95"))
            .select("segment", "n_rows", "var95", "tail_n", "cvar95")
            .orderBy("segment"))
