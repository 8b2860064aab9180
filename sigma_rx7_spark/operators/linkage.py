"""Record linkage / entity resolution (SURVEY.md §2.11 family: the
cross-feed identity problem every enrichment ingest hits — reference
README.md:8 joins brand/generic/pricing feeds that name the same entity
differently).

Fellegi-Sunter in miniature, Spark-first:

1. **Blocking** — candidate pairs come only from equal
   ``(nationkey, mktsegment)`` blocks, so pair count is
   sum(|A_b|·|B_b|) ≈ linear for bounded block sizes, never n². At
   100 TB this is the same discipline as LSH banding: the shuffle key
   IS the blocking key, and each reducer sees one block.
2. **Multi-evidence scoring** — agreement weights over independent
   field comparisons (exact id-string match, bounded edit distance,
   balance proximity), summed to a match score; every comparator is a
   native JVM expression (``levenshtein`` included), no UDF.
3. **Best-match resolution** — one winner per left record via a
   window over (score desc, distance asc, id asc), the deterministic
   tiebreak the hash gate needs.

The right-hand feed is derived from the SAME customers by a
deterministic "other system" rewrite (different id format, rounded
balances) plus seeded corruptions (shifted nation -> blocking miss,
reversed digits -> fuzzy-only match, inflated balance -> weak
evidence), so ground truth is known and the query can report
``is_correct`` per link — precision is part of the result, not prose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load, load_parallel
from ..registry import query

# Agreement weights (integer, engine-exact).
W_EXACT = 3    # id digit-string exact
W_FUZZY = 1    # id digit-string within edit distance 2
W_BAL = 2      # balance within rounding drift
MATCH_MIN = 4  # accept threshold: exact id (3+1) or fuzzy id + balance

_B_OFFSET = 500000  # feed-B key space


def dirty_feed(customers: DataFrame) -> DataFrame:
    """The 'other system' view of the same customers.

    - ids re-keyed and renamed ``cust-<n>`` (no padding);
    - balances rounded down to tens (their ledger granularity);
    - every 7th record books under the NEXT nation (blocking miss);
    - every 11th record has its id digits reversed (typo family);
    - every 5th record's balance is inflated 1000 (weak evidence).
    """
    num = F.regexp_extract("c_name", r"(\d+)$", 1).cast("bigint")
    digits = F.when(num % 11 == 0, F.reverse(num.cast("string"))) \
        .otherwise(num.cast("string"))
    return customers.select(
        (F.col("c_custkey") + _B_OFFSET).alias("b_id"),
        F.concat(F.lit("cust-"), digits).alias("b_name"),
        F.when(num % 7 == 0, (F.col("c_nationkey") + 1) % 25)
        .otherwise(F.col("c_nationkey")).alias("b_nationkey"),
        F.col("c_mktsegment").alias("b_mktsegment"),
        (F.floor(F.col("c_acctbal") / 10.0) * 10
         + F.when(num % 5 == 0, 1000).otherwise(0)).alias("b_bal"),
    )


# DuckDB mirror of dirty_feed (same expressions, SQL dialect).
_O_DIRTY = f"""
  SELECT c_custkey + {_B_OFFSET} AS b_id,
         'cust-' || CASE WHEN num % 11 = 0
                         THEN reverse(CAST(num AS VARCHAR))
                         ELSE CAST(num AS VARCHAR) END AS b_name,
         CASE WHEN num % 7 = 0 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END AS b_nationkey,
         c_mktsegment AS b_mktsegment,
         FLOOR(c_acctbal / 10.0) * 10
           + CASE WHEN num % 5 = 0 THEN 1000 ELSE 0 END AS b_bal
  FROM (SELECT *, CAST(regexp_extract(c_name, '(\\d+)$', 1) AS BIGINT)
                    AS num
        FROM customer)
"""


# Shared linkage CTE prefix: feeds -> blocked candidates -> scored ->
# best-match-per-left. Both linkage queries compose on top of it.
_O_BEST = f"""
    b AS ({_O_DIRTY}),
    a AS (
      SELECT c_custkey AS a_id, c_nationkey, c_mktsegment,
             CAST(CAST(regexp_extract(c_name, '(\\d+)$', 1) AS BIGINT)
                  AS VARCHAR) AS a_digits,
             c_acctbal AS a_bal
      FROM customer
    ),
    scored AS (
      SELECT a_id, b_id,
             levenshtein(a_digits, substr(b_name, 6)) AS lev,
             CASE WHEN a_digits = substr(b_name, 6)
                  THEN {W_EXACT} ELSE 0 END
           + CASE WHEN levenshtein(a_digits, substr(b_name, 6)) <= 2
                  THEN {W_FUZZY} ELSE 0 END
           + CASE WHEN abs(a_bal - b_bal) <= 10 THEN {W_BAL} ELSE 0 END
               AS score
      FROM a JOIN b
        ON a.c_nationkey = b.b_nationkey
       AND a.c_mktsegment = b.b_mktsegment
    ),
    best AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY a_id
               ORDER BY score DESC, lev ASC, b_id ASC) AS rn
      FROM scored WHERE score >= {MATCH_MIN}
    ),
    matched AS (SELECT * FROM best WHERE rn = 1)
"""


@query(
    "q_link_entities",
    oracle=f"""
    WITH {_O_BEST}
    SELECT a_id, b_id, CAST(score AS INT) AS score,
           CAST(lev AS INT) AS lev,
           (b_id - {_B_OFFSET} = a_id) AS is_correct
    FROM matched
    """,
    tags=("linkage", "J1", "blocking"),
)
def q_link_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked record linkage with known ground truth: candidates only
    inside (nation, segment) blocks, additive agreement weights over
    levenshtein / exact-id / balance comparators, window-resolved best
    match per left record, ``is_correct`` carried in the output so the
    achieved precision is hash-gated, not asserted. Scale shape: one
    shuffle keyed by the blocking key, per-block pair enumeration
    bounded by block size, one window keyed by a_id."""
    return link_best_matches(spark, sf_dir).select(
        "a_id", "b_id",
        F.col("score").cast("int").alias("score"),
        F.col("lev").cast("int").alias("lev"),
        (F.col("b_id") - _B_OFFSET == F.col("a_id")).alias("is_correct"))


def link_best_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(a_id, b_id, score, lev): the resolved best match per left
    record — the shared stage both linkage queries build on.

    The left feed loads through the input-parallelism repair
    (io.load_parallel, r15): the blocked join plans as a broadcast
    hash join probed FROM the left scan, so every per-pair comparator
    (levenshtein × ~block-size candidates per row) evaluates in the
    scan stage — single-threaded on the one-row-group fixture.
    Repairing only the probe side parallelizes the comparators without
    putting an exchange under the broadcast build (measured
    q_link_entities 1.39 -> 0.86 s warm min at sf0.1; no-op at scale)."""
    cust = load(spark, sf_dir, "customer")
    a = load_parallel(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("a_id"),
        "c_nationkey", "c_mktsegment",
        F.regexp_extract("c_name", r"(\d+)$", 1).cast("bigint")
        .cast("string").alias("a_digits"),
        F.col("c_acctbal").alias("a_bal"),
    )
    b = dirty_feed(cust)
    lev = F.levenshtein("a_digits", F.expr("substr(b_name, 6)"))
    score = (
        F.when(F.col("a_digits") == F.expr("substr(b_name, 6)"),
               W_EXACT).otherwise(0)
        + F.when(lev <= 2, W_FUZZY).otherwise(0)
        + F.when(F.abs(F.col("a_bal") - F.col("b_bal")) <= 10,
                 W_BAL).otherwise(0)
    )
    scored = (
        a.join(b, (a.c_nationkey == b.b_nationkey)
               & (a.c_mktsegment == b.b_mktsegment))
        .select("a_id", "b_id", lev.alias("lev"), score.alias("score"))
        .where(F.col("score") >= MATCH_MIN)
    )
    w = Window.partitionBy("a_id").orderBy(
        F.col("score").desc(), F.col("lev").asc(), F.col("b_id").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "q_link_survivorship",
    oracle=f"""
    WITH {_O_BEST}
    SELECT a.c_custkey AS a_id,
           a.c_name AS golden_name,
           a.c_nationkey AS nationkey,
           CASE WHEN m.b_id IS NOT NULL
                     AND abs(a.c_acctbal - b.b_bal) > 10
                THEN NULL ELSE a.c_acctbal END AS golden_bal,
           CAST(CASE WHEN m.b_id IS NULL THEN 1 ELSE 2 END AS INT)
             AS n_sources,
           COALESCE(m.lev > 0, FALSE) AS id_fuzzy,
           COALESCE(abs(a.c_acctbal - b.b_bal) > 10, FALSE)
             AS bal_conflict
    FROM customer a
    LEFT JOIN matched m ON a.c_custkey = m.a_id
    LEFT JOIN b ON m.b_id = b.b_id
    """,
    tags=("linkage", "survivorship"),
)
def q_link_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GOLDEN-RECORD SURVIVORSHIP over the resolved links: one output
    row per left-feed entity carrying the merged canonical record —
    field-level survivor rules (feed A's name format and full-precision
    balance are authoritative; a balance disagreeing with the matched
    source beyond rounding drift is NULLED and flagged for review —
    conflicts are surfaced, never silently averaged), source count, and
    per-field conflict flags. The MDM merge step that consumes record
    linkage, as one plan: matches (window-resolved, bounded per block)
    left-joined back to both feeds by id — every join key is an id or
    the block key, so the merge adds no new shuffle shape beyond
    linkage itself."""
    cust = load(spark, sf_dir, "customer")
    m = link_best_matches(spark, sf_dir)
    b = dirty_feed(cust)
    g = (
        cust.join(m, cust.c_custkey == m.a_id, "left")
        .join(b, "b_id", "left")
    )
    conflict = F.col("b_id").isNotNull() \
        & (F.abs(F.col("c_acctbal") - F.col("b_bal")) > 10)
    return g.select(
        F.col("c_custkey").alias("a_id"),
        F.col("c_name").alias("golden_name"),
        F.col("c_nationkey").alias("nationkey"),
        F.when(conflict, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal")).alias("golden_bal"),
        F.when(F.col("b_id").isNull(), 1).otherwise(2).cast("int")
        .alias("n_sources"),
        F.coalesce(F.col("lev") > 0, F.lit(False)).alias("id_fuzzy"),
        F.coalesce(F.abs(F.col("c_acctbal") - F.col("b_bal")) > 10,
                   F.lit(False)).alias("bal_conflict"))


# ---- Blocking-quality audit (L7c) ---------------------------------------------


@query(
    "q_link_blocking_audit",
    oracle=f"""
    WITH b AS ({_O_DIRTY}),
    a AS (
      SELECT c_custkey AS a_id, c_nationkey, c_mktsegment
      FROM customer
    ),
    truth AS (
      SELECT a.a_id,
             CASE WHEN a.c_nationkey = b.b_nationkey
                   AND a.c_mktsegment = b.b_mktsegment
                  THEN 1 ELSE 0 END AS blocked
      FROM a JOIN b ON b.b_id = a.a_id + {_B_OFFSET}
    ),
    blocks AS (
      SELECT COALESCE(SUM(na * nb), 0) AS n_candidates
      FROM (
        SELECT COUNT(*) AS na, c_nationkey AS nk, c_mktsegment AS seg
        FROM a GROUP BY 2, 3) x
      JOIN (
        SELECT COUNT(*) AS nb, b_nationkey AS nk, b_mktsegment AS seg
        FROM b GROUP BY 2, 3) y
        ON x.nk = y.nk AND x.seg = y.seg
    ),
    sizes AS (
      SELECT (SELECT COUNT(*) FROM a) AS n_a,
             (SELECT COUNT(*) FROM b) AS n_b
    )
    SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true_pairs,
           CAST((SELECT SUM(blocked) FROM truth) AS BIGINT)
             AS n_blocked_true,
           CASE WHEN (SELECT COUNT(*) FROM truth) = 0 THEN NULL
                ELSE CAST(CAST(
                  CAST((SELECT SUM(blocked) FROM truth) AS DOUBLE)
                  / (SELECT COUNT(*) FROM truth)
                  AS DECIMAL(18,6)) AS DOUBLE) END AS pair_completeness,
           CAST((SELECT n_candidates FROM blocks) AS BIGINT)
             AS n_candidates,
           CAST((SELECT n_a * n_b FROM sizes) AS BIGINT) AS n_cross,
           CASE WHEN (SELECT n_a * n_b FROM sizes) = 0 THEN NULL
                ELSE CAST(CAST(
                  1.0 - CAST((SELECT n_candidates FROM blocks) AS DOUBLE)
                        / (SELECT n_a * n_b FROM sizes)
                  AS DECIMAL(18,6)) AS DOUBLE) END AS reduction_ratio
    """,
    tags=("L7c", "linkage", "blocking-audit"),
)
def q_link_blocking_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCKING-QUALITY AUDIT: the two numbers every blocking scheme is
    judged by — PAIR COMPLETENESS (what fraction of true matches share
    a block; the seeded every-7th nation shift makes the ceiling ~6/7
    here, so the audit measures a real loss, not a tautology) and the
    REDUCTION RATIO (1 − candidates/cross-product; how much work
    blocking saves). This is the linkage twin of the dedup family's
    measured-recall audits (q_dedup_recall_lsh, q_sim_recall_ivf): the
    blocking decision gets a measured trade-off curve point, not an
    assertion.

    Exactness without pair enumeration: completeness joins the feeds on
    the KNOWN truth key (one equi-join, no candidate generation), and
    the candidate count is Σ|A_block|·|B_block| from two per-block
    COUNT aggregates — the audit itself never materializes a pair, so
    it runs at any corpus size."""
    cust = load(spark, sf_dir, "customer")
    a = cust.select(
        F.col("c_custkey").alias("a_id"), "c_nationkey", "c_mktsegment")
    b = dirty_feed(cust)
    truth = a.join(b, F.col("b_id") == F.col("a_id") + _B_OFFSET) \
        .select(
            F.when((F.col("c_nationkey") == F.col("b_nationkey"))
                   & (F.col("c_mktsegment") == F.col("b_mktsegment")),
                   1).otherwise(0).alias("blocked"))
    tr = truth.agg(
        F.count(F.lit(1)).alias("n_true"),
        F.sum("blocked").alias("n_blocked"))
    ablk = a.groupBy(F.col("c_nationkey").alias("nk"),
                     F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("na"))
    bblk = b.groupBy(F.col("b_nationkey").alias("nk"),
                     F.col("b_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).alias("nb"))
    cand = ablk.join(bblk, ["nk", "seg"]).agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0))
        .alias("n_candidates"))
    sizes = a.agg(F.count(F.lit(1)).alias("n_a")).crossJoin(
        b.agg(F.count(F.lit(1)).alias("n_b")))
    from ..compat import QDEC
    j = tr.crossJoin(F.broadcast(cand)).crossJoin(F.broadcast(sizes))
    return j.select(
        F.col("n_true").cast("bigint").alias("n_true_pairs"),
        F.col("n_blocked").cast("bigint").alias("n_blocked_true"),
        F.when(F.col("n_true") == 0, F.lit(None).cast("double"))
        .otherwise((F.col("n_blocked").cast("double") / F.col("n_true"))
                   .cast(QDEC).cast("double"))
        .alias("pair_completeness"),
        F.col("n_candidates").cast("bigint").alias("n_candidates"),
        (F.col("n_a") * F.col("n_b")).cast("bigint").alias("n_cross"),
        F.when(F.col("n_a") * F.col("n_b") == 0,
               F.lit(None).cast("double"))
        .otherwise((1.0 - F.col("n_candidates").cast("double")
                    / (F.col("n_a") * F.col("n_b")))
                   .cast(QDEC).cast("double"))
        .alias("reduction_ratio"))
