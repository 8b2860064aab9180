"""Round-16 optimization properties.

The r16 rewrites must be BIT-EXACT re-expressions: the Arrow-vectorized
exact cosine scorer replaces the JVM ``aggregate`` fold, so its doubles
must equal the fold's doubles bit for bit (the query is hash-gated
against DuckDB). These tests pin that equality on the real fixture,
plus the numpy mirrors' arithmetic against the engine expressions.
"""

from __future__ import annotations

import math
import struct

import pytest

from sigma_rx7_spark import registry
from sigma_rx7_spark.io import load

ALL = registry.load_all()


def _bits(x: float) -> int:
    return struct.unpack("<q", struct.pack("<d", x))[0]


def test_arrow_cosine_bit_equals_jvm_fold(spark, sf_dir):
    # The mapInArrow scorer vs the r15 BroadcastNestedLoopJoin fold:
    # same pairs, and every cos_sim IDENTICAL AT THE BIT LEVEL (the
    # property the hash gate needs; == would also pass for -0.0/0.0
    # and fail for NaN, so compare raw bit patterns).
    from sigma_rx7_spark.llm.dedup import _allpairs_cosine_jvm

    e = load(spark, sf_dir, "embeddings")
    new = ALL["q_dedup_cosine"].fn(spark, sf_dir).collect()
    old = _allpairs_cosine_jvm(e).collect()
    new_m = {(r.a_vec_id, r.b_vec_id): r.cos_sim for r in new}
    old_m = {(r.a_vec_id, r.b_vec_id): r.cos_sim for r in old}
    assert set(new_m) == set(old_m)
    assert len(new) == len(new_m)  # no duplicate pairs
    for k, v in old_m.items():
        assert _bits(new_m[k]) == _bits(v), (k, new_m[k], v)


def test_np_unit_rows_matches_engine_normalized(spark, sf_dir):
    # The numpy normalization mirror vs the engine expression, element
    # by element at the bit level — including the 1e-300 zero floor.
    import numpy as np

    from pyspark.sql import functions as F

    from sigma_rx7_spark.llm.similarity import normalized, np_unit_rows

    e = load(spark, sf_dir, "embeddings").limit(200)
    rows = e.select("vec_id", normalized("embedding").alias("nv"),
                    "embedding").collect()
    V = np.asarray([list(r.embedding) for r in rows], dtype=np.float64)
    N = np_unit_rows(V)
    for i, r in enumerate(rows):
        for j, x in enumerate(r.nv):
            assert _bits(N[i, j]) == _bits(x), (r.vec_id, j)
    # zero vector: floor divisor keeps +0.0 components
    Z = np_unit_rows(np.zeros((1, 4)))
    assert Z.tolist() == [[0.0, 0.0, 0.0, 0.0]]


def test_np_pairwise_dots_is_sequential_fold():
    # The rank-1-update accumulation must equal a scalar left fold (the
    # definition the JVM aggregate implements), bit for bit, on values
    # where a reordered/pairwise sum WOULD differ.
    import numpy as np

    from sigma_rx7_spark.llm.similarity import np_pairwise_dots

    rng = [1e16, 1.0, -1e16, 3.0, 0.1, -7.25, 1e-9, 2.0]
    A = np.asarray([rng, rng[::-1]], dtype=np.float64)
    B = np.asarray([[0.3, -1.1, 0.3, 5.0, 1e10, 2.0, -0.5, 1.25],
                    [1.0] * 8], dtype=np.float64)
    got = np_pairwise_dots(A, B)
    for i in range(A.shape[0]):
        for j in range(B.shape[0]):
            acc = 0.0
            for d in range(A.shape[1]):
                acc = acc + A[i, d] * B[j, d]
            assert _bits(got[i, j]) == _bits(acc), (i, j)


def test_arrow_cov_bit_equals_explode_path(spark, sf_dir):
    # The fixed-point mapInArrow covariance accumulator vs the r15
    # double-explode plan: same (i, j) set, n_vecs equal, and every cov
    # double IDENTICAL AT THE BIT LEVEL (hash-gate property), plus the
    # result schemas (names, types, nullability) byte-equal.
    from sigma_rx7_spark.llm.clustering import _embed_cov_jvm

    e = load(spark, sf_dir, "embeddings")
    new_df = ALL["q_embed_cov"].fn(spark, sf_dir)
    old_df = _embed_cov_jvm(e)
    assert new_df.schema == old_df.schema
    new = {(r.i, r.j): (r.n_vecs, r.cov) for r in new_df.collect()}
    old = {(r.i, r.j): (r.n_vecs, r.cov) for r in old_df.collect()}
    assert set(new) == set(old) and len(new) > 0
    for k, (n_o, c_o) in old.items():
        n_n, c_n = new[k]
        assert n_n == n_o, k
        assert _bits(c_n) == _bits(c_o), (k, c_n, c_o)


def test_scale9_int64_matches_engine_decimal_cast(spark):
    # The vectorized double->DECIMAL(20,9) mirror vs Spark's cast, on
    # adversarial float32 values: exact decimal halves (dyadic m/1024,
    # where HALF_UP vs HALF_EVEN diverge), negatives, tiny magnitudes.
    import numpy as np

    from pyspark.sql import functions as F

    from sigma_rx7_spark.llm.clustering import _scale9_int64

    f32 = [3.0 / 1024, -3.0 / 1024, 5.0 / 1024, -1.5 / 1024, 0.1, -0.1,
           1.0, -1.0, 0.0, 1e-30, -1e-30, 15.9999, -15.9999, 2.5e-9,
           -2.5e-9, 7.5e-9]
    vals = [float(np.float32(x)) for x in f32]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    eng = [r.d for r in df.select(
        (F.col("x").cast("decimal(20,9)") * F.lit(10 ** 9))
        .cast("bigint").alias("d")).collect()]
    got = _scale9_int64(np.asarray(vals, dtype=np.float64)).tolist()
    assert got == eng, list(zip(vals, got, eng))


def test_bitset_cluster_pairs_equal_join_pairs(spark, sf_dir):
    # The mapInArrow bitset pair stage vs the r15 blocked self-join:
    # identical (src, dst) edge sets (integer-exact contract), and the
    # full clusters query row-identical to the join-built variant.
    from pyspark.sql import functions as F

    from sigma_rx7_spark.functions.text import tokens
    from sigma_rx7_spark.llm.dedup import (CLUSTER_JACCARD,
                                           _cluster_pair_batches)

    d = load(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", "lang", "source",
        F.array_distinct(tokens(F.col("text"))).alias("words"))
    new = set((r.src, r.dst) for r in words.repartition("lang", "source")
              .mapInArrow(_cluster_pair_batches, "src bigint, dst bigint")
              .collect())
    a = d.select(F.col("doc_id").alias("a_doc_id"), "lang", "source",
                 F.array_distinct(tokens(F.col("text"))).alias("a_words"))
    b = d.select(F.col("doc_id").alias("b_doc_id"),
                 F.col("lang").alias("b_lang"),
                 F.col("source").alias("b_source"),
                 F.array_distinct(tokens(F.col("text"))).alias("b_words"))
    n_common = F.size(F.array_intersect("a_words", "b_words"))
    union_sz = F.size("a_words") + F.size("b_words") - n_common
    jaccard = (F.when(union_sz == 0, F.lit(1.0))
               .otherwise(n_common.cast("double") / union_sz))
    old = set((r.src, r.dst) for r in a.join(
        b, (F.col("lang") == F.col("b_lang"))
        & (F.col("source") == F.col("b_source"))
        & (F.col("a_doc_id") < F.col("b_doc_id")))
        .where(jaccard >= CLUSTER_JACCARD)
        .select(F.col("a_doc_id").alias("src"),
                F.col("b_doc_id").alias("dst")).collect())
    assert new == old and len(new) > 0


def test_release_dedup_caches_is_scoped(spark, sf_dir):
    # ADVICE r15: dedup persists route through a tracked registry with
    # a scoped release — releasing must unpersist what the module
    # cached and must NOT touch unrelated persisted relations.
    from pyspark.sql import functions as F

    from sigma_rx7_spark.llm import dedup as D

    other = spark.range(10).select(F.col("id").alias("x")).persist()
    other.count()
    n_before = len(D._DEDUP_CACHES)
    ALL["q_dedup_near"].fn(spark, sf_dir).write.mode("overwrite") \
        .format("noop").save()
    assert len(D._DEDUP_CACHES) > n_before
    released = D.release_dedup_caches()
    assert released >= len(D._DEDUP_CACHES) or released > 0
    assert not D._DEDUP_CACHES
    assert other.storageLevel.useMemory  # unrelated cache untouched
    other.unpersist()
