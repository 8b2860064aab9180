"""Deterministic sampling / dataset splits (north-star training-pipeline
operator, BASELINE.json mandate).

A training corpus needs reproducible train/val/test assignment that (a)
never depends on row order or partitioning, (b) needs no global state or
shuffle, and (c) gives the same answer on every engine that touches the
data. The standard construction: hash a stable key, bucket the digest.
``md5`` is used (not ``xxhash64``) because the digest must be identical in
Spark and in the DuckDB oracle — determinism across *engines* is the
point of the operator, and the gate proves it.

Scale: split assignment is a pure per-row projection — zero shuffle, runs
at scan speed, and the same expression works as a partition column for
`write.partitionBy("split")` so downstream training jobs read only their
split's files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query

# 16 hex buckets on the first digest nibble: 12/2/2 => 75% / 12.5% / 12.5%.
TRAIN_NIBBLES = tuple("0123456789ab")
VAL_NIBBLES = ("c", "d")


def hash_split(key: Column) -> Column:
    """Stable split label from a key column (engine-independent)."""
    nib = F.substring(F.md5(key.cast("string")), 1, 1)
    return (
        F.when(nib.isin(*TRAIN_NIBBLES), "train")
        .when(nib.isin(*VAL_NIBBLES), "val")
        .otherwise("test")
    )


@query(
    "q_split_train_test",
    oracle="""
    SELECT
      CASE
        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
             IN ('0','1','2','3','4','5','6','7','8','9','a','b')
          THEN 'train'
        WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d')
          THEN 'val'
        ELSE 'test'
      END AS split,
      lang,
      COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
    tags=("L5", "sampling"),
)
def q_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 train/val/test split by key digest,
    summarized per (split, language). Assignment is row-order- and
    partitioning-independent, so a 1000-executor run reproduces this
    byte-for-byte — the property that makes dataset versioning possible
    without materializing membership lists."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(hash_split(F.col("doc_id")).alias("split"),
                 "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("total_chars"))
    )



# Per-stratum keep thresholds over the first two hex digits of the key
# digest (lexicographic compare: "00".."ff"; "g" sorts after every hex
# digit = keep all). Rebalances the corpus: downsample the dominant
# language hard, keep the rest dense.
STRATUM_KEEP_HEX: dict[str, str] = {
    "en": "40",   # 64/256  = 25%
    "de": "c0",   # 192/256 = 75%
    "fr": "c0",   # 192/256 = 75%
    "es": "g",    # 100%
}
DEFAULT_KEEP_HEX = "80"  # 50% for unlisted strata


def stratified_keep(key: Column, stratum: Column) -> Column:
    """Deterministic per-stratum Bernoulli filter: keep iff the first two
    hex digits of md5(key) sort below the stratum's threshold. Same
    digest and same ASCII compare in every engine and at every
    partitioning — membership is a pure function of (key, stratum)."""
    prefix = F.substring(F.md5(key.cast("string")), 1, 2)
    thresh = F.lit(DEFAULT_KEEP_HEX)
    for s, keep in STRATUM_KEEP_HEX.items():
        thresh = F.when(stratum == s, F.lit(keep)).otherwise(thresh)
    return prefix < thresh


@query(
    "q_sample_stratified",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
          < CASE lang
              WHEN 'en' THEN '{STRATUM_KEEP_HEX["en"]}'
              WHEN 'de' THEN '{STRATUM_KEEP_HEX["de"]}'
              WHEN 'fr' THEN '{STRATUM_KEEP_HEX["fr"]}'
              WHEN 'es' THEN '{STRATUM_KEEP_HEX["es"]}'
              ELSE '{DEFAULT_KEEP_HEX}' END
    GROUP BY lang
    """,
    tags=("L5", "sampling", "stratified"),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language keep rates (corpus
    rebalancing — downsample the dominant language, keep the tail dense),
    summarized per stratum. Like q_split_train_test this is a zero-shuffle
    per-row projection over a stable digest, so a 1000-executor run keeps
    EXACTLY the same documents as this one — no sampling seed, no
    row-order dependence, and the filter composes with partition pruning
    because it's an ordinary predicate."""
    d = load(spark, sf_dir, "documents")
    return (
        d.where(stratified_keep(F.col("doc_id"), F.col("lang")))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"),
             F.sum("n_chars").alias("kept_chars"))
    )


# Temperature-balanced mixture: keep probability per source is
# sqrt(n_min / n_source) — the tau=0.5 point between "as-is" (tau=1) and
# "fully balanced" (tau=0 -> every source capped at n_min). sqrt of a
# ratio of exact integers is IEEE-correctly-rounded in both engines, so
# the per-source rates are bit-identical without decimal quantization.
KNUTH_MULT = 2654435761   # Knuth multiplicative hash constant (2^32 / phi)
HASH_MOD = 4294967296     # 2^32


KEY_MASK_MOD = 2147483648  # 2^31: pre-fold keys so key*mult fits int64


def uniform_unit(key: Column) -> Column:
    """Deterministic uniform-ish value in [0, 1) from an integer key via
    the Knuth multiplicative hash — exact bigint arithmetic plus one
    exact int->double conversion, so every engine computes the identical
    double (md5-prefix gates can't serve here: the keep threshold is
    data-DEPENDENT, and hex->int parsing isn't portable to the oracle
    dialect). The key is folded mod 2^31 FIRST so the multiply peaks at
    (2^31-1)*2654435761 < 2^63 — no int64 overflow at any key scale
    (ANSI Spark throws on overflow; non-ANSI would silently bias the
    gate)."""
    folded = key.cast("bigint") % F.lit(KEY_MASK_MOD)
    return ((folded * F.lit(KNUTH_MULT)) % F.lit(HASH_MOD)
            ).cast("double") / F.lit(float(HASH_MOD))


@query(
    "q_sample_mixture",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source
    ), rates AS (
      SELECT source, n_total,
             sqrt(CAST((SELECT MIN(n_total) FROM counts) AS DOUBLE)
                  / n_total) AS p_keep
      FROM counts
    ), kept AS (
      SELECT d.source, d.n_chars
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE CAST(((d.doc_id % {KEY_MASK_MOD}) * {KNUTH_MULT})
                 % {HASH_MOD} AS DOUBLE)
              / {HASH_MOD} < r.p_keep
    )
    SELECT r.source, r.n_total, r.p_keep,
           COUNT(k.source) AS n_kept,
           CAST(COALESCE(SUM(k.n_chars), 0) AS BIGINT) AS kept_chars
    FROM rates r LEFT JOIN kept k ON r.source = k.source
    GROUP BY r.source, r.n_total, r.p_keep
    """,
    tags=("L5", "sampling", "mixture"),
)
def q_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture rebalancing: downsample over-represented sources
    toward the smallest one at temperature 0.5 (keep probability
    sqrt(n_min/n_source)) — the data-mixing step that sets source
    proportions for a training run, with membership a pure function of
    doc_id so every engine/partitioning keeps the same documents.

    Scale shape: the rate table is one tiny aggregate (|sources| rows,
    broadcast back); the keep filter is a per-row projection — zero
    extra shuffle on the corpus beyond the final per-source summary."""
    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    ref = counts.agg(F.min("n_total").alias("n_ref"))
    rates = counts.crossJoin(F.broadcast(ref)).select(
        "source", "n_total",
        F.sqrt(F.col("n_ref").cast("double") / F.col("n_total"))
        .alias("p_keep"),
    )
    kept = (
        d.join(F.broadcast(rates.select("source", "p_keep")), "source")
        .where(uniform_unit(F.col("doc_id")) < F.col("p_keep"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"),
             F.sum("n_chars").alias("kept_chars"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source", "n_total", "p_keep",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("kept_chars"), F.lit(0)).alias("kept_chars"),
        )
    )


RESERVOIR_K = 40  # fixed per-stratum sample budget


@query(
    "q_sample_reservoir",
    oracle=f"""
    WITH ranked AS (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sample_chars,
           -- identity checksum: proves the SAME documents were chosen,
           -- not merely the same number of them
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM ranked WHERE rn <= {RESERVOIR_K}
    GROUP BY lang
    """,
    tags=("L5", "sampling", "reservoir"),
)
def q_sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE deterministic sample: exactly K=40 documents per
    language, chosen as the K smallest key digests — the reproducible
    stand-in for reservoir sampling when the budget is per-stratum rows
    (eval-set construction) rather than a keep rate. Unlike a true
    reservoir, membership is a pure function of the key set: stable
    under reordering, re-partitioning, and engine choice; the summary's
    id_checksum pins the exact membership, not just its size.

    Scale shape: one window per stratum over (digest, id) — a top-K per
    group; at warehouse scale the same selection runs as min_by-style
    partial top-K so the shuffle carries K rows per stratum, not the
    corpus."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        d.select("lang", "doc_id", "n_chars",
                 F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= RESERVOIR_K)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sample_chars"),
            F.sum("doc_id").alias("id_checksum"),
        )
    )


WEIGHTED_K = 25        # per-stratum weighted sample budget
_U_DENOM = 16 ** 15    # 15 md5 hex chars -> uniform u in (0, 1]


@query(
    "q_sample_weighted",
    oracle=f"""
    WITH scored AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY CAST(ln(
                   (CAST(concat('0x',
                      substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                    AS BIGINT) + 1) / {_U_DENOM}.0
                 ) / n_chars AS DECIMAL(18,9)) DESC, doc_id) AS rn
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sample_chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_checksum
    FROM scored WHERE rn <= {WEIGHTED_K}
    GROUP BY source
    """,
    tags=("L5", "sampling", "weighted"),
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED sampling without replacement (Efraimidis–Spirakis):
    each doc draws u from its key digest and scores ln(u)/weight; the
    top-K scores per stratum are a weighted-without-replacement sample
    with inclusion probability proportional to weight (here n_chars —
    longer docs oversampled, the "sample by token mass" policy a
    training mixture uses). Deterministic: u is a pure function of the
    key (15 md5 hex chars → uniform in (0,1]), so membership is stable
    under reordering, re-partitioning, and engine choice, and the
    id_checksum pins it exactly.

    The ln passes through libm, so the score is decimal-quantized at
    9 dp before ranking (compat.py convention); (score, doc_id) is a
    total order, so both engines select the identical K rows. Scale
    shape: identical to q_sample_reservoir — one per-stratum top-K
    window, K rows per stratum past the shuffle."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    raw = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
        16, 10).cast("bigint")
    u = (raw + 1) / F.lit(float(_U_DENOM))
    # zero-weight documents (n_chars = 0) get a NULL score — they sort
    # NULLS LAST under the desc rank, i.e. are drawn only after every
    # positive-weight doc, the Efraimidis-Spirakis limit behavior —
    # instead of an ANSI crash (flat_corpus profile, r13)
    score = F.when(F.col("n_chars") == 0,
                   F.lit(None).cast("decimal(18,9)")) \
        .otherwise((F.log(u) / F.col("n_chars")).cast("decimal(18,9)"))
    w = Window.partitionBy("source").orderBy(score.desc(), "doc_id")
    return (
        d.select("source", "doc_id", "n_chars",
                 F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= WEIGHTED_K)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").alias("sample_chars"),
            F.sum("doc_id").alias("id_checksum"),
        )
    )


NEG_PER_DOC = 4


@query(
    "q_sample_negatives",
    oracle=f"""
    WITH n AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
    ), fan AS (
      SELECT d.doc_id, k.k,
             CAST(CAST('0x' || substr(
               md5(CAST(d.doc_id AS VARCHAR) || '|' || CAST(k.k AS VARCHAR)),
               1, 8) AS BIGINT) % n.n_docs AS BIGINT) AS h
      FROM documents d
      CROSS JOIN (SELECT unnest(range(0, {NEG_PER_DOC})) AS k) k
      CROSS JOIN n
    )
    SELECT fan.doc_id,
           CAST(fan.k AS INT) AS k,
           CAST(CASE WHEN fan.h = fan.doc_id
                     THEN (fan.h + 1) % n.n_docs
                     ELSE fan.h END AS BIGINT) AS neg_doc_id
    FROM fan CROSS JOIN n
    """,
    tags=("L5", "sampling", "negatives"),
)
def q_sample_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC NEGATIVE SAMPLING: {NEG_PER_DOC} pseudo-uniform
    negative partners per document — md5(doc_id|k) mod corpus size,
    self-collisions bumped to the next id — the contrastive-pair
    generator (embedding training, reranker hard-negative seeding)
    made reproducible: the pairing depends only on ids and corpus size,
    never on row order, partitioning, or an RNG seed, so any re-run of
    the pipeline regenerates the identical training pairs (the L5
    digest-bucketing contract applied to pair construction).

    PRECONDITION (asserted by the harness tables, FIXTURES.md): doc_id
    is dense over [0, n_docs) — the modulo lands on a real document.
    For sparse ids, remap through a row_number index relation first
    (one extra window over the id column only). Scale shape: pure
    per-row hash arithmetic plus one broadcast scalar; zero shuffles.
    Bias note: the +1 bump makes id (h+1) marginally more likely —
    acceptable for negatives; rejection-resampling (k', k'', …) is the
    unbiased variant, at the cost of a variable expression depth."""
    d = load(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    fan = (
        d.select("doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "n_docs",
            F.explode(F.sequence(
                F.lit(0), F.lit(NEG_PER_DOC - 1))).alias("k"))
    )
    h = (
        F.conv(F.substring(F.md5(F.concat_ws(
            "|", F.col("doc_id").cast("string"),
            F.col("k").cast("string"))), 1, 8), 16, 10)
        .cast("bigint") % F.col("n_docs")
    )
    return fan.select(
        "doc_id",
        F.col("k").cast("int").alias("k"),
        F.when(h == F.col("doc_id"), (h + 1) % F.col("n_docs"))
        .otherwise(h).cast("bigint").alias("neg_doc_id"),
    )


# ---- Exact-budget mixture apportionment ----------------------------------

BUDGET_N = 200     # total document budget to apportion across sources
BUDGET_TEMP = 0.5  # temperature: per-source weight = n_total ** temp


@query(
    "q_sample_budget",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source
    ), weighted AS (
      SELECT source, n_total,
             CAST(CAST(sqrt(CAST(n_total AS DOUBLE)) AS DECIMAL(18,6))
                  AS DOUBLE) AS w
      FROM counts
    ), shared AS (
      SELECT source, n_total, w,
             w / (SELECT CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE)
                  FROM weighted) * {BUDGET_N} AS ideal
      FROM weighted
    ), based AS (
      SELECT source, n_total, ideal,
             CAST(floor(ideal) AS BIGINT) AS base,
             ideal - floor(ideal) AS rem
      FROM shared
    ), quota AS (
      SELECT source, n_total,
             base + CASE WHEN ROW_NUMBER() OVER (
                             ORDER BY rem DESC, source)
                         <= {BUDGET_N} - (SELECT SUM(base) FROM based)
                    THEN 1 ELSE 0 END AS quota
      FROM based
    ), ranked AS (
      SELECT d.source, d.doc_id, d.n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
      FROM documents d
    )
    SELECT q.source, CAST(q.n_total AS BIGINT) AS n_total,
           CAST(q.quota AS BIGINT) AS quota,
           COUNT(r.doc_id) AS n_sampled,
           CAST(COALESCE(SUM(r.doc_id), 0) AS BIGINT) AS id_checksum
    FROM quota q LEFT JOIN ranked r
      ON q.source = r.source AND r.rn <= q.quota
    GROUP BY q.source, q.n_total, q.quota
    """,
    tags=("L5", "sampling", "mixture"),
)
def q_sample_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-BUDGET mixture apportionment: split a fixed document budget
    (N={BUDGET_N}) across sources with temperature-scaled weights
    (w = n^{BUDGET_TEMP}) via largest-remainder rounding — quotas sum to
    exactly N — then deterministically draw each source's quota as its
    smallest-digest documents. This is the step that turns mixture
    WEIGHTS (q_sample_mixture's keep rates) into a concrete fixed-size
    training mix; id_checksum pins the exact membership.

    Determinism: the weight sum is an exact-decimal sum of 6-dp
    quantized weights (a bare double sum over sources would be
    order-sensitive); everything after is IEEE division/floor, identical
    across engines; both windows carry total orders (rem DESC, source /
    digest, doc_id).

    Scale shape: counts/quotas are |sources|-row relations (one
    aggregate + broadcast back); the draw is one top-K-per-stratum
    window, shuffle keyed by source; quota comparison joins map-side.
    The apportionment windows run over the tiny quota relation only."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    weighted = counts.select(
        "source", "n_total",
        F.sqrt(F.col("n_total").cast("double"))
        .cast("decimal(18,6)").cast("double").alias("w"))
    total_w = weighted.agg(
        F.sum(F.col("w").cast("decimal(18,6)")).cast("double").alias("tw"))
    based = (
        weighted.crossJoin(F.broadcast(total_w))
        .select(
            "source", "n_total",
            (F.col("w") / F.col("tw") * BUDGET_N).alias("ideal"))
        .select(
            "source", "n_total",
            F.floor("ideal").cast("bigint").alias("base"),
            (F.col("ideal") - F.floor("ideal")).alias("rem"))
    )
    deficit = based.agg((F.lit(BUDGET_N) - F.sum("base")).alias("deficit"))
    wq = Window.orderBy(F.desc("rem"), F.asc("source"))
    quota = (
        based.crossJoin(F.broadcast(deficit))
        .select(
            "source", "n_total",
            (F.col("base")
             + F.when(F.row_number().over(wq) <= F.col("deficit"), 1)
             .otherwise(0)).alias("quota"))
    )
    wr = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = d.select(
        "source", "doc_id",
        F.row_number().over(wr).alias("rn"))
    return (
        quota.alias("q").join(
            ranked.alias("r"),
            (F.col("q.source") == F.col("r.source"))
            & (F.col("r.rn") <= F.col("q.quota")), "left")
        .groupBy(F.col("q.source").alias("source"),
                 F.col("q.n_total").alias("n_total"),
                 F.col("q.quota").alias("quota"))
        .agg(F.count(F.col("r.doc_id")).alias("n_sampled"),
             F.coalesce(F.sum(F.col("r.doc_id")), F.lit(0))
             .cast("bigint").alias("id_checksum"))
        .select("source", F.col("n_total").cast("bigint").alias("n_total"),
                F.col("quota").cast("bigint").alias("quota"),
                "n_sampled", "id_checksum")
    )


# ---- Approximate query processing: sampled estimate with error bound -----

AQP_RATE = 1.0 / 16  # Bernoulli inclusion probability (one md5 nibble)


@query(
    "q_sample_estimate",
    oracle="""
    WITH s AS (
      SELECT l_returnflag, l_quantity
      FROM lineitem
      WHERE substr(md5(CAST(l_orderkey * 8 + l_linenumber AS VARCHAR)),
                   1, 1) = '0'
    ), est AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_sampled,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               AS s1,
             CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))
                      * CAST(l_quantity AS DECIMAL(19,6))) AS DOUBLE)
               AS s2
      FROM s GROUP BY l_returnflag
    ), ex AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE)
               AS true_total
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT est.l_returnflag, n_sampled,
           s1 * 16 AS est_total,
           sqrt(s2 * (1 - 0.0625)) * 16 AS se_total,
           true_total,
           abs(s1 * 16 - true_total) / true_total AS rel_err
    FROM est JOIN ex ON est.l_returnflag = ex.l_returnflag
    """,
    tags=("L5", "aqp", "sampling"),
)
def q_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPROXIMATE QUERY PROCESSING with a design-based error bound:
    per-group total quantity estimated from a deterministic Bernoulli
    1/16 sample (one md5 nibble over the row key — the repo's
    engine-portable sampling convention), with the Horvitz-Thompson
    standard error se(T̂) = (1/p)·√((1−p)·Σ_s x²) computed from the
    SAME exact-decimal sufficient statistics discipline as
    q_agg_state_merge (√ is IEEE-correctly-rounded, so unlike exp/ln it
    needs no post-quantization). The true total and realized relative
    error ride along AUDIT-style (the q_sim_recall_ivf posture): the
    estimator's claim is hash-gated together with how good it actually
    was. At 100 TB the sample scan is the only full-data pass an
    interactive estimate pays, and the md5 gate pushes into the scan as
    a deterministic filter."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity",
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("_k"))
    nib = F.substring(F.md5(F.col("_k").cast("string")), 1, 1)
    s = li.where(nib == "0")
    from ..compat import q as qd
    est = s.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum(qd("l_quantity")).cast("double").alias("s1"),
        F.sum(F.col("l_quantity").cast("decimal(19,6)")
              * F.col("l_quantity").cast("decimal(19,6)"))
        .cast("double").alias("s2"))
    ex = li.groupBy("l_returnflag").agg(
        F.sum(qd("l_quantity")).cast("double").alias("true_total"))
    p = AQP_RATE
    return (
        est.join(ex, "l_returnflag")
        .select("l_returnflag", "n_sampled",
                (F.col("s1") * 16).alias("est_total"),
                (F.sqrt(F.col("s2") * (1 - p)) * 16).alias("se_total"),
                "true_total",
                (F.abs(F.col("s1") * 16 - F.col("true_total"))
                 / F.col("true_total")).alias("rel_err"))
    )


# ---- Group-aware split (leakage-safe holdout) ----------------------------

GROUP_FOLDS = 5


@query(
    "q_split_grouped",
    oracle=f"""
    WITH assigned AS (
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(concat('0x', substr(md5(CAST(l_orderkey AS
                  VARCHAR)), 1, 8)) AS BIGINT) % {GROUP_FOLDS} AS INT)
               AS fold
      FROM lineitem
    )
    SELECT fold,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_groups,
           CAST(MAX(straddle) AS INT) AS max_folds_per_group
    FROM assigned
    JOIN (
      SELECT l_orderkey AS k2,
             CAST(COUNT(DISTINCT fold) AS INT) AS straddle
      FROM assigned GROUP BY 1
    ) s ON assigned.l_orderkey = s.k2
    GROUP BY fold
    """,
    tags=("L5", "split", "leakage"),
)
def q_split_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-AWARE k-fold split: every lineitem of one ORDER lands in
    the same fold (fold = md5(orderkey) prefix mod {GROUP_FOLDS}), the
    leakage guard a row-wise split breaks — rows of one entity
    straddling train/test lets the model memorize the entity. The
    no-leakage property is IN THE OUTPUT, not prose:
    ``max_folds_per_group`` is computed from the data and hash-gated
    at 1. Fold assignment is the repo's engine-portable md5 recipe —
    row-order- and partition-independent, reproducible on any cluster.
    Scale shape: one orderkey-keyed aggregate for the straddle audit
    (the assignment itself is a pure projection); at 100 TB the audit
    is optional and the projection is free."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber")
    fold = (F.conv(F.substring(F.md5(F.col("l_orderkey").cast("string")),
                               1, 8), 16, 10).cast("bigint")
            % GROUP_FOLDS).cast("int")
    assigned = li.select("l_orderkey", "l_linenumber",
                         fold.alias("fold"))
    # One fact pass (r15, guide §1.2 step 1): the old shape aggregated
    # the straddle audit per order and joined it back onto the row
    # relation — two fact derivations plus an orderkey-grain join.
    # fold is a deterministic function of l_orderkey, so a single
    # per-order aggregate carries the row count, the straddle audit
    # (still COMPUTED via countDistinct, not assumed), and the group's
    # fold; the per-fold report is a tiny second aggregate. Values
    # identical by construction (every row of an order shares its
    # fold).
    per_order = assigned.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("c"),
        F.countDistinct("fold").cast("int").alias("straddle"),
        F.max("fold").alias("fold"))
    return per_order.groupBy("fold").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.max("straddle").cast("int").alias("max_folds_per_group"))


# ---- Temperature-sweep mixture audit -------------------------------------

SWEEP_TEMPS = (0.5, 0.7, 1.0)


@query(
    "q_sample_temp_sweep",
    oracle=f"""
    WITH n AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), mn AS (SELECT MIN(n_docs) AS n_min FROM n),
    sweep AS (
      SELECT source, n_docs, t.temp,
             CAST(CAST(pow(CAST((SELECT n_min FROM mn) AS DOUBLE)
                           / n_docs, t.temp)
                       AS DECIMAL(18,6)) AS DOUBLE) AS keep_prob
      FROM n CROSS JOIN (
        -- CAST: duckdb types a decimal-literal array as DECIMAL(2,1);
        -- Spark's lit() temps are DOUBLE
        SELECT CAST(unnest(ARRAY{list(SWEEP_TEMPS)}) AS DOUBLE)
          AS temp) t
    )
    SELECT source, temp,
           CAST(n_docs AS BIGINT) AS n_docs,
           keep_prob,
           CAST(floor(n_docs * keep_prob) AS BIGINT) AS expected_kept
    FROM sweep
    """,
    tags=("L5", "mixture", "temperature"),
)
def q_sample_temp_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE SWEEP for mixture rebalancing: the per-source keep
    probability (n_min/n_source)^T and resulting corpus composition at
    T = {SWEEP_TEMPS} — the planning table a curator reads BEFORE
    committing to one temperature (T→0 keeps everything as-is, T=1
    fully equalizes; q_sample_mixture then executes the chosen row's
    policy). Source counts are one aggregate; the sweep is a 3-row
    literal cross join over the SOURCES relation — planning costs
    metadata, not data. pow() is transcendental, so probabilities pass
    through the 6-dp quantization before the expected-count floor
    (compat rule 2; floor AFTER quantization is then engine-exact)."""
    d = load(spark, sf_dir, "documents")
    n = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    mn = n.agg(F.min("n_docs").alias("n_min"))
    temps = F.explode(F.array(
        *[F.lit(t) for t in SWEEP_TEMPS])).alias("temp")
    keep = F.pow(F.col("n_min").cast("double") / F.col("n_docs"),
                 F.col("temp")).cast("decimal(18,6)").cast("double")
    return (
        n.crossJoin(F.broadcast(mn))
        .select("source", "n_docs", "n_min", temps)
        .select("source", "temp",
                F.col("n_docs").cast("bigint").alias("n_docs"),
                keep.alias("keep_prob"))
        .withColumn("expected_kept",
                    F.floor(F.col("n_docs") * F.col("keep_prob"))
                    .cast("bigint"))
    )


# ---- Deterministic source interleave (training order) --------------------


@query(
    "q_pipeline_interleave",
    oracle="""
    WITH src AS (
      SELECT source,
             ROW_NUMBER() OVER (ORDER BY source) - 1 AS source_idx,
             COUNT(*) OVER () AS n_sources
      FROM (SELECT DISTINCT source FROM documents)
    ), ranked AS (
      SELECT d.doc_id, d.source, s.source_idx, s.n_sources,
             ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
               AS within_rank
      FROM documents d JOIN src s ON d.source = s.source
    )
    SELECT doc_id, source,
           CAST(within_rank AS INT) AS within_rank,
           CAST((within_rank - 1) * n_sources + source_idx AS BIGINT)
             AS position
    FROM ranked
    """,
    tags=("L5", "interleave", "ordering"),
)
def q_pipeline_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC SOURCE INTERLEAVE: a reproducible global training
    order that round-robins sources — docs shuffle within their source
    by md5 digest (the engine-portable pseudo-random order), then
    position = (within_rank−1)·K + source_idx, so any consecutive K
    positions touch every source once: the anti-clumping guarantee
    batch-level mixing needs (a plain global digest shuffle leaves
    Poisson clumps of one source; this construction cannot). Per-source
    windows partition by the source key (never one global window);
    the source index comes from a sources-sized broadcast relation.
    Positions are unique by construction across the corpus — the gate
    checks the exact assignment, not just the property."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    srcs = d.select("source").distinct()
    wsrc = W.orderBy("source")  # sources-sized relation only
    src = srcs.select(
        "source", (F.row_number().over(wsrc) - 1).alias("source_idx"),
        F.count(F.lit(1)).over(W.partitionBy(F.lit(1)))
        .alias("n_sources"))
    wr = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        d.select("doc_id", "source")
        .join(F.broadcast(src), "source")
        .withColumn("within_rank", F.row_number().over(wr))
        .select("doc_id", "source",
                F.col("within_rank").cast("int").alias("within_rank"),
                ((F.col("within_rank") - 1) * F.col("n_sources")
                 + F.col("source_idx")).cast("bigint").alias("position"))
    )


# ---- Effective sample size of weighted sampling (L5h) ------------------------


@query(
    "q_sample_ess",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_w,
           CAST(SUM(n_chars * n_chars) AS BIGINT) AS sum_w2,
           CAST(SUM(n_chars) AS DOUBLE) * SUM(n_chars)
             / SUM(n_chars * n_chars) AS ess,
           (CAST(SUM(n_chars) AS DOUBLE) * SUM(n_chars)
             / SUM(n_chars * n_chars)) / COUNT(*) AS ess_ratio
    FROM documents
    GROUP BY source
    """,
    tags=("L5", "sampling", "diagnostics"),
)
def q_sample_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EFFECTIVE SAMPLE SIZE of length-weighted sampling per source:
    ESS = (sum w)^2 / sum w^2 (Kish) — how many EFFECTIVE documents a
    weighted draw over this source really carries. A source whose
    weight mass concentrates on a few long documents has ess_ratio
    << 1: a mixture planner (q_sample_mixture) that targets it by raw
    document count will oversample those few documents, so this audit
    is the diagnostic read BEFORE committing weights (the same role
    q_agg_keyskew plays for join keys, here for sampling weights).

    Integer weights (n_chars) keep both moments exact bigints under
    one partial/final aggregate; the two closing divisions are
    deterministic IEEE. Output is O(#sources)."""
    d = load(spark, sf_dir, "documents")
    sum_w = F.sum("n_chars")
    sum_w2 = F.sum(F.col("n_chars") * F.col("n_chars"))
    # all-zero weights in a source: ESS undefined (0/0) -> NULL, not an
    # ANSI crash (flat_corpus profile, r13; dead on harness data)
    ess = F.when(sum_w2 == 0, F.lit(None).cast("double")) \
        .otherwise(sum_w.cast("double") * sum_w / sum_w2)
    return (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
             sum_w.cast("bigint").alias("sum_w"),
             sum_w2.cast("bigint").alias("sum_w2"),
             ess.alias("ess"),
             (ess / F.count(F.lit(1))).alias("ess_ratio"))
    )


# ---- Stratified systematic sampling (L5i) ----------------------------------

SYSTEMATIC_K = 10  # keep every k-th document per stratum


@query(
    "q_sample_systematic",
    oracle=f"""
    WITH ranked AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rn % {SYSTEMATIC_K} = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_sampled,
           CAST(SUM(CASE WHEN rn % {SYSTEMATIC_K} = 1 THEN n_chars
                    ELSE 0 END) AS BIGINT) AS sampled_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM ranked
    GROUP BY lang
    """,
    tags=("L5i", "sampling", "systematic"),
)
def q_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED SYSTEMATIC SAMPLING: within each language stratum,
    order documents by key digest and keep every {SYSTEMATIC_K}-th —
    the evenly-spaced design that guarantees EXACT per-stratum sample
    sizes (ceil(n/k), no binomial wobble) where the Bernoulli hash gates
    (q_split_train_test, q_sample_stratified) only hit their rate in
    expectation. The digest ordering makes the systematic frame a
    pseudo-random permutation, so even spacing over it is a defensible
    probability sample, and the whole assignment is row-order- and
    partition-count-independent (digest order is a property of the
    keys, not the layout).

    Scale shape: ONE window partitioned by the stratum key (keyed
    shuffle, no global sort — the rank never crosses strata), then the
    same keyed aggregate; at 100 TB the per-stratum sort is the one
    real cost, which is why the hash-gate samplers exist alongside this
    exact-count design. Reported per stratum: population and sample
    sizes plus character mass on both sides (integer-exact)."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = d.select("lang", "n_chars",
                      F.row_number().over(w).alias("rn"))
    picked = F.col("rn") % SYSTEMATIC_K == 1
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(picked, 1).otherwise(0)).cast("bigint")
        .alias("n_sampled"),
        F.sum(F.when(picked, F.col("n_chars")).otherwise(0))
        .cast("bigint").alias("sampled_chars"),
        F.sum("n_chars").cast("bigint").alias("total_chars"))


# ---- Exact class-balance downsampling (L5j) ----------------------------------


@query(
    "q_sample_class_balance",
    oracle="""
    WITH sizes AS (
      SELECT lang, COUNT(*) AS n_total FROM documents GROUP BY lang
    ),
    target AS (
      SELECT MIN(n_total) AS n_keep FROM sizes
    ),
    ranked AS (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ),
    kept AS (
      SELECT r.lang, r.doc_id, r.n_chars
      FROM ranked r, target t WHERE r.rn <= t.n_keep
    )
    SELECT s.lang,
           CAST(s.n_total AS BIGINT) AS n_total,
           CAST(COUNT(k.doc_id) AS BIGINT) AS n_kept,
           CAST(CAST(CAST(COUNT(k.doc_id) AS DOUBLE) / s.n_total
                AS DECIMAL(18,6)) AS DOUBLE) AS keep_rate,
           CAST(SUM(k.n_chars) AS BIGINT) AS kept_chars,
           CAST(SUM(k.doc_id) AS BIGINT) AS kept_id_checksum
    FROM sizes s LEFT JOIN kept k ON k.lang = s.lang
    GROUP BY s.lang, s.n_total
    """,
    tags=("L5j", "sampling", "balance"),
)
def q_sample_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT CLASS-BALANCE DOWNSAMPLING: every language class cut to
    EXACTLY the minority class's count by deterministic digest rank
    (md5(doc_id) order — the L5 split discipline, so membership is
    row-order- and partitioning-independent and reproducible on a
    1000-executor run). The report carries per-class kept counts, the
    keep rate, and a kept-id CHECKSUM — the gate proves the exact
    MEMBERSHIP, not just the sizes, which is what makes the sample a
    versionable dataset artifact. L5's stratified sampler takes a RATE
    per stratum; this takes the exact-count cut a balanced classifier
    training set needs (every class equal, no fractional rounding
    drift).

    Shape: one per-class count, a 1-row global min, ONE rank window
    per class (class-cardinality partitioning — each partition sorts
    its own class only), and a keyed rollup. Nothing driver-side."""
    d = load(spark, sf_dir, "documents")
    sizes = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    target = sizes.agg(F.min("n_total").alias("n_keep"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id")
    ranked = d.select("lang", "doc_id", "n_chars",
                      F.row_number().over(w).alias("rn"))
    kept = (ranked.crossJoin(F.broadcast(target))
            .where(F.col("rn") <= F.col("n_keep"))
            .select("lang", "doc_id", "n_chars"))
    out = (sizes.join(kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("kept_chars"),
        F.sum("doc_id").alias("kept_id_checksum")), "lang", "left"))
    return out.select(
        "lang",
        F.col("n_total").cast("bigint").alias("n_total"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint")
        .alias("n_kept"),
        (F.coalesce(F.col("n_kept"), F.lit(0)).cast("double")
         / F.col("n_total")).cast("decimal(18,6)").cast("double")
        .alias("keep_rate"),
        F.col("kept_chars").cast("bigint").alias("kept_chars"),
        F.col("kept_id_checksum").cast("bigint")
        .alias("kept_id_checksum"))


# ---- Neyman-allocation stratified sampling plan (L5k) ------------------------

NEYMAN_BUDGET = 500  # total sample budget to apportion across strata


@query(
    "q_sample_neyman",
    oracle=f"""
    WITH strata AS (
      SELECT o_orderpriority AS stratum,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
               AS s1,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(19,6))
                      * CAST(o_totalprice AS DECIMAL(19,6))) AS DOUBLE)
               AS s2
      FROM orders GROUP BY o_orderpriority
    ),
    sig AS (
      SELECT stratum, n,
             CASE WHEN n < 2
                    OR s2 - n * (s1 / n) * (s1 / n) <= 0 THEN 0.0
             ELSE CAST(CAST(sqrt((s2 - n * (s1 / n) * (s1 / n))
                                 / (n - 1))
                  AS DECIMAL(18,6)) AS DOUBLE) END AS sigma
      FROM strata
    ),
    wtd AS (
      SELECT stratum, n, sigma,
             CAST(CAST(n * sigma AS DECIMAL(27,6)) AS DOUBLE) AS w
      FROM sig
    ),
    shared AS (
      SELECT stratum, n, sigma, w,
             CASE WHEN (SELECT CAST(SUM(CAST(w AS DECIMAL(27,6)))
                        AS DOUBLE) FROM wtd) = 0 THEN NULL
                  ELSE w / (SELECT CAST(SUM(CAST(w AS DECIMAL(27,6)))
                            AS DOUBLE) FROM wtd) * {NEYMAN_BUDGET}
             END AS ideal
      FROM wtd
    ),
    based AS (
      SELECT stratum, n, sigma, ideal,
             CAST(floor(ideal) AS BIGINT) AS base,
             ideal - floor(ideal) AS rem
      FROM shared
    )
    SELECT stratum,
           CAST(n AS BIGINT) AS n_rows,
           sigma,
           CAST(CAST(ideal AS DECIMAL(18,6)) AS DOUBLE) AS ideal,
           base + CASE WHEN ROW_NUMBER() OVER (
                           ORDER BY rem DESC, stratum)
                       <= {NEYMAN_BUDGET} - (SELECT SUM(base) FROM based)
                  THEN 1 ELSE 0 END AS alloc,
           (base + CASE WHEN ROW_NUMBER() OVER (
                            ORDER BY rem DESC, stratum)
                        <= {NEYMAN_BUDGET} - (SELECT SUM(base)
                                              FROM based)
                   THEN 1 ELSE 0 END) > n AS exceeds_stratum
    FROM based
    """,
    tags=("L5k", "sampling", "neyman"),
)
def q_sample_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN-ALLOCATION sampling plan: split a fixed budget
    (N={NEYMAN_BUDGET}) across strata (order priority) proportionally
    to N_h·σ_h — the variance-MINIMIZING allocation for estimating the
    population mean from a stratified sample (Neyman 1934), and the
    planner L5i's proportional systematic draw should consult when
    strata have very different spreads: a high-variance stratum earns
    MORE than its headcount share, a constant stratum needs almost
    none. The estimator-design half of the sampling family; L5's
    digest draws are the execution half.

    Determinism: σ_h from raw decimal moments with the one sqrt
    quantized (the ln/sqrt rule) and n−1 in the denominator (sample
    std); weights N_h·σ_h quantized before the shared-total division;
    integer quotas by largest-remainder rounding (the L5 budget
    recipe: floor + top-remainder bonus, ties to the stratum key), so
    allocations SUM TO EXACTLY N on both engines. Zero-variance or
    singleton strata weigh 0 (they need one row in practice — the
    exceeds/zero reading is the analyst's signal, not hidden). Scale:
    one fact-table aggregate to the 5-row stratum grain; everything
    after is a 5-row fold."""
    o = load(spark, sf_dir, "orders")
    strata = o.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(20,6)"))
        .cast("double").alias("s1"),
        F.sum(F.col("o_totalprice").cast("decimal(19,6)")
              * F.col("o_totalprice").cast("decimal(19,6)"))
        .cast("double").alias("s2"))
    mean = F.col("s1") / F.col("n")
    ss = F.col("s2") - F.col("n") * mean * mean
    sig = strata.select(
        "stratum", "n",
        F.when((F.col("n") < 2) | (ss <= 0), F.lit(0.0))
        .otherwise(F.sqrt(ss / (F.col("n") - 1))
                   .cast("decimal(18,6)").cast("double"))
        .alias("sigma"))
    wtd = sig.select(
        "stratum", "n", "sigma",
        (F.col("n") * F.col("sigma")).cast("decimal(27,6)")
        .cast("double").alias("w"))
    tot = wtd.agg(F.sum(F.col("w").cast("decimal(27,6)"))
                  .cast("double").alias("tw"))
    # every-stratum-degenerate corpus (all prices constant): the weight
    # total is 0 and the shares are undefined — NULL plan rows on BOTH
    # engines (an unguarded decimal division is an ANSI crash here),
    # the analyst's signal to fall back to proportional allocation.
    based = (wtd.crossJoin(F.broadcast(tot))
             .select("stratum", "n", "sigma",
                     F.when(F.col("tw") == 0, F.lit(None).cast("double"))
                     .otherwise(F.col("w") / F.col("tw") * NEYMAN_BUDGET)
                     .alias("ideal"))
             .select("stratum", "n", "sigma", "ideal",
                     F.floor("ideal").cast("bigint").alias("base"),
                     (F.col("ideal") - F.floor("ideal")).alias("rem")))
    spent = based.agg(F.sum("base").alias("spent"))
    # the ranking window runs on the 5-row stratum relation — bounded
    # by the priority vocabulary, never by the data
    rn = F.row_number().over(
        Window.orderBy(F.col("rem").desc(), F.col("stratum").asc()))
    alloc = F.col("base") + F.when(
        F.col("rn") <= NEYMAN_BUDGET - F.col("spent"), 1).otherwise(0)
    return (based.withColumn("rn", rn)
            .crossJoin(F.broadcast(spent))
            .select("stratum",
                    F.col("n").cast("bigint").alias("n_rows"),
                    "sigma",
                    F.col("ideal").cast("decimal(18,6)").cast("double")
                    .alias("ideal"),
                    alloc.cast("bigint").alias("alloc"),
                    (alloc > F.col("n")).alias("exceeds_stratum")))
