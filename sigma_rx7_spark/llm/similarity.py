"""Similarity search over embeddings (SURVEY.md §2.11 L2).

North-star operator (BASELINE.json mandate): top-k cosine neighbors over
an ``array<float>`` column.

Scale design: brute-force (query-set × corpus) is the exactness baseline
— fine when the query side broadcasts. The scale path is coarse
quantization (IVF-style): assign every vector to its nearest of C
centroids, search only the probe's closest cells — implemented here as
``ivf_assign``/``q_sim_topk_ivf`` with deterministic data-derived
centroids. Vector math uses ``zip_with``/``aggregate`` higher-order
functions: JVM codegen, no Python, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..io import load
from ..registry import query

TOP_K = 10
N_QUERIES = 5  # vec_id < 5 are the probe set in the harness queries


def dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def normalized(a: Column | str) -> Column:
    """Unit-normalize a vector ONCE so every downstream pair score is a
    single dot product instead of dot + two norms — at n_pairs ≫ n_rows
    (always true for pairwise scoring) this is the difference between
    O(pairs) and O(3·pairs) HOF work. Bench: ~3× on the cosine family.

    The norm rides in via ``array_repeat`` + ``zip_with`` rather than a
    closure over the lambda: HOF *arguments* evaluate once per row, while
    anything inside the lambda body re-evaluates per element — a nested
    norm would cost O(dim²) per row (measured, not hypothetical)."""
    c = F.col(a) if isinstance(a, str) else a
    rep = F.array_repeat(l2_norm(c), F.size(c))
    return F.zip_with(c, rep, lambda x, n: x.cast("double") / n)


def topk_bruteforce(queries: DataFrame, corpus: DataFrame,
                    k: int = TOP_K) -> DataFrame:
    """Exact cosine top-k: broadcast the query side, rank per query.

    queries: (q_id, q_vec); corpus: (c_id, c_vec). The corpus is the big
    side and is never shuffled — each task scores its partition against
    the broadcast queries; the window ranks within q_id partitions. Both
    sides are unit-normalized up front (one pass each), so the pair score
    is a bare dot product.
    """
    qn = queries.select("q_id", normalized("q_vec").alias("q_vec"))
    cn = corpus.select("c_id", normalized("c_vec").alias("c_vec"))
    scored = cn.crossJoin(F.broadcast(qn)).select(
        "q_id", "c_id", dot("q_vec", "c_vec").alias("cos_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


@query(
    "q_sim_topk",
    oracle=f"""
    WITH n AS (
      SELECT vec_id,
             list_transform(
               CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_inner_product(
                      CAST(embedding AS DOUBLE[]),
                      CAST(embedding AS DOUBLE[])))) AS nv
      FROM embeddings
    ), q AS (
      SELECT vec_id AS q_id, nv AS q_nv FROM n WHERE vec_id < {N_QUERIES}
    ), c AS (
      SELECT vec_id AS c_id, nv AS c_nv FROM n WHERE vec_id >= {N_QUERIES}
    ), scored AS (
      SELECT q_id, c_id, list_inner_product(q_nv, c_nv) AS cos_sim
      FROM q CROSS JOIN c
    )
    SELECT q_id, c_id, cos_sim, rank FROM (
      SELECT q_id, c_id, cos_sim,
             ROW_NUMBER() OVER (
               PARTITION BY q_id ORDER BY cos_sim DESC, c_id) AS rank
      FROM scored
    ) WHERE rank <= {TOP_K}
    """,
    tags=("L2",),
)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 probe vectors. Hash-gated, not
    rows-only: both engines unit-normalize once then take a single
    left-fold dot product per pair (Spark ``aggregate``/``zip_with`` vs
    DuckDB ``list_inner_product`` — bit-equal, same construction as
    q_dedup_cosine), and (cos_sim DESC, c_id) is a total order, so the
    returned top-k set and every float in it match exactly."""
    e = load(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    corpus = e.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec"))
    return topk_bruteforce(queries, corpus)


def ivf_assign(corpus: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign each corpus vector to its nearest centroid (max cosine).

    Both inputs must carry UNIT vectors (see ``normalized``), so the
    score is a bare dot product. centroids: (cell_id, cent_vec),
    broadcast-sized (C ≈ √N cells). Output adds ``cell_id`` — the
    coarse-quantization partition key. At 100 TB the corpus is written
    partitioned by cell_id so a probe touches only its nprobe cells'
    files.
    """
    w = Window.partitionBy("c_id").orderBy(
        F.desc("cent_sim"), F.asc("cell_id"))
    return (
        corpus.crossJoin(F.broadcast(centroids))
        .select(
            "c_id", "c_vec", "cell_id",
            dot("c_vec", "cent_vec").alias("cent_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn", "cent_sim")
    )


@query("q_sim_topk_ivf", oracle=None, tags=("L2", "rows-only"))
def q_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: 16 deterministic centroids (every 32nd corpus
    vector), nprobe=4 cells per query, exact rerank inside the probed
    cells. The approximate counterpart of q_sim_topk. Every vector is
    unit-normalized once up front; all downstream scores are dot
    products."""
    e = load(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), normalized("embedding").alias("q_vec"))
    corpus = e.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("c_id"), normalized("embedding").alias("c_vec"))
    # Deterministic centroids: a strided sample standing in for k-means
    # (the index build would be an offline job at scale).
    centroids = (
        corpus.where(F.col("c_id") % 32 == 5)
        .select((F.col("c_id") / 32).cast("int").alias("cell_id"),
                F.col("c_vec").alias("cent_vec"))
    )
    assigned = ivf_assign(corpus, centroids)
    # nprobe=4: each query searches its 4 nearest cells only.
    wq = Window.partitionBy("q_id").orderBy(
        F.desc("cent_sim"), F.asc("cell_id"))
    probe_cells = (
        queries.crossJoin(F.broadcast(centroids))
        .select("q_id", "q_vec", "cell_id",
                dot("q_vec", "cent_vec").alias("cent_sim"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= 4)
        .select("q_id", "q_vec", "cell_id")
    )
    scored = probe_cells.join(assigned, "cell_id").select(
        "q_id", "c_id", dot("q_vec", "c_vec").alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
    )


# ---- Staged IVF index (the warehouse-scale ANN layout) -------------------

def build_ivf_index(corpus: DataFrame, centroids: DataFrame,
                    path: str) -> None:
    """Materialize the IVF layout: corpus vectors assigned to their cell
    and written ``partitionBy(cell_id)``; centroids stored alongside.

    This is the offline index-build job: at 100 TB the corpus lands once
    in cell-partitioned parquet, and every probe afterwards reads only
    its nprobe cells' files (directory pruning — asserted on the probe
    plan in tests). Inputs must carry unit vectors (see ``normalized``).
    """
    assigned = ivf_assign(corpus, centroids)
    (assigned.write.mode("overwrite")
     .partitionBy("cell_id").parquet(f"{path}/cells"))
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def probe_ivf_index(spark: SparkSession, path: str, queries: DataFrame,
                    nprobe: int = 4, k: int = TOP_K) -> DataFrame:
    """Top-k search against a staged IVF index.

    The probe-cell set is tiny (n_queries × nprobe ints), so it is
    collected as plan-time metadata and pushed into the scan filter —
    that is what turns the read into an nprobe-cells directory prune
    instead of a full-corpus scan.
    """
    centroids = spark.read.parquet(f"{path}/centroids")
    wq = Window.partitionBy("q_id").orderBy(
        F.desc("cent_sim"), F.asc("cell_id"))
    probe_cells = (
        queries.crossJoin(F.broadcast(centroids))
        .select("q_id", "q_vec", "cell_id",
                dot("q_vec", "cent_vec").alias("cent_sim"))
        .withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("q_id", "q_vec", "cell_id")
    )
    cell_ids = sorted({r["cell_id"] for r in
                       probe_cells.select("cell_id").distinct().collect()})
    cells = (spark.read.parquet(f"{path}/cells")
             .where(F.col("cell_id").isin(cell_ids)))
    scored = probe_cells.join(cells, "cell_id").select(
        "q_id", "c_id", dot("q_vec", "c_vec").alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


@query("q_sim_topk_ivf_staged", oracle=None, tags=("L2", "rows-only"))
def q_sim_topk_ivf_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN against the STAGED IVF index: build the cell-partitioned
    layout once, then probe it with partition pruning — the persistent-
    index form of q_sim_topk_ivf (same centroids, same results; equality
    asserted in tests)."""
    import os
    e = load(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"), normalized("embedding").alias("q_vec"))
    corpus = e.where(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("c_id"), normalized("embedding").alias("c_vec"))
    centroids = (
        corpus.where(F.col("c_id") % 32 == 5)
        .select((F.col("c_id") / 32).cast("int").alias("cell_id"),
                F.col("c_vec").alias("cent_vec"))
    )
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".staging",
        f"ivf_{tag}")
    build_ivf_index(corpus, centroids, path)
    return probe_ivf_index(spark, path, queries)
