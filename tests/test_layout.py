"""Z-order layout: the skipping claim measured on real parquet footers."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sigma_rx7_spark.io import load
from sigma_rx7_spark.sources.formats import _stage_dir
from sigma_rx7_spark.sources.layout import (
    N_ZFILES,
    morton_key,
    stage_zorder,
    zorder_skip_stats,
)


def test_morton_key_interleaves_bits(spark):
    # morton(a=0b11, b=0b10) = a bits at even positions, b at odd:
    # bit0=a0=1, bit1=b0=0, bit2=a1=1, bit3=b1=1 -> 0b1101 = 13
    df = spark.range(1).select(
        morton_key(F.lit(3), F.lit(2)).alias("z"),
        morton_key(F.lit(0xFFFF), F.lit(0)).alias("za"),
        morton_key(F.lit(0), F.lit(0xFFFF)).alias("zb"),
    )
    row = df.collect()[0]
    assert row.z == 13
    assert row.za == 0x55555555  # all even bit positions
    assert row.zb == 0xAAAAAAAA  # all odd bit positions


def test_zorder_prunes_both_dimensions(spark, sf_dir):
    zpath = stage_zorder(spark, sf_dir)

    # Counter-layout: the same data sorted on shipdate only.
    lpath = _stage_dir("linear_lineitem", sf_dir)
    if not os.path.exists(os.path.join(lpath, "_SUCCESS")):
        (load(spark, sf_dir, "lineitem")
         .select("l_partkey", "l_shipdate", "l_quantity",
                 "l_extendedprice", "l_returnflag")
         .repartitionByRange(N_ZFILES, "l_shipdate")
         .sortWithinPartitions("l_shipdate")
         .write.mode("overwrite").parquet(lpath))

    z_hit, z_total = zorder_skip_stats(zpath)
    l_hit, l_total = zorder_skip_stats(lpath)
    assert z_total == N_ZFILES and l_total == N_ZFILES

    # The probe is date-WIDE / partkey-NARROW: the linear layout can only
    # prune via dates (little), the z-order layout prunes via both.
    assert z_hit < l_hit, (z_hit, l_hit)
    assert z_hit <= z_total // 4, f"z-order pruned only {z_total-z_hit}"


def test_zorder_scan_pushes_both_predicates(spark, sf_dir):
    from sigma_rx7_spark.plans.inspect import formatted_plan
    from sigma_rx7_spark.registry import get
    p = formatted_plan(get("q_scan_zorder").fn(spark, sf_dir))
    assert "PushedFilters" in p
    assert "l_partkey" in p.split("PushedFilters")[1][:400]
    assert "l_shipdate" in p.split("PushedFilters")[1][:400]


def test_incremental_delta_prunes_like_base(spark, sf_dir):
    import os

    from sigma_rx7_spark.sources.layout import (
        N_DELTA_FILES,
        stage_zorder_incremental,
    )
    path = stage_zorder_incremental(spark, sf_dir)
    b_hit, b_total = zorder_skip_stats(os.path.join(path, "base"))
    d_hit, d_total = zorder_skip_stats(os.path.join(path, "delta"))
    assert b_total == N_ZFILES and d_total == N_DELTA_FILES
    # Both file sets sit on the same curve: the box prunes a majority
    # of files in each (the delta has coarser spans - fewer files over
    # the same key space - so its bound is proportionally looser).
    assert b_hit <= b_total // 4, (b_hit, b_total)
    assert d_hit <= d_total // 2, (d_hit, d_total)


def test_codec_choice_zstd_beats_snappy_and_roundtrips(spark, sf_dir):
    """Warehouse codec tuning, measured not asserted from folklore:
    the same clustered data written zstd vs snappy — zstd must be
    materially smaller (it is the capacity-tier default for cold data)
    and both must round-trip identical rows. At 100 TB the delta is
    directly storage cost; the trade is decode CPU, which is why the
    hot tier often stays snappy/lz4."""
    import os

    from pyspark.sql import functions as F

    from sigma_rx7_spark.io import load
    from sigma_rx7_spark.sources.formats import _stage_dir

    src = (load(spark, sf_dir, "lineitem")
           .select("l_orderkey", "l_partkey", "l_shipdate",
                   "l_extendedprice", "l_returnflag")
           .repartitionByRange(4, "l_orderkey")
           .sortWithinPartitions("l_orderkey"))
    sizes = {}
    for codec in ("snappy", "zstd"):
        path = _stage_dir(f"codec_{codec}", sf_dir)
        src.write.mode("overwrite") \
            .option("compression", codec).parquet(path)
        sizes[codec] = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path) if f.endswith(".parquet"))
    assert sizes["zstd"] < sizes["snappy"] * 0.9, sizes
    a = spark.read.parquet(_stage_dir("codec_snappy", sf_dir))
    b = spark.read.parquet(_stage_dir("codec_zstd", sf_dir))
    assert a.count() == b.count()
    assert a.exceptAll(b).limit(1).count() == 0


def test_index_planned_scan_opens_fewer_files(spark, sf_dir):
    import os

    from pyspark.sql import functions as F

    from sigma_rx7_spark.sources.layout import (
        _OK_HI,
        _OK_LO,
        stage_indexed_lineitem,
    )
    path = stage_indexed_lineitem(spark, sf_dir)
    idx = spark.read.parquet(os.path.join(path, "idx"))
    total = idx.count()
    chosen = idx.where((F.col("min_ok") <= _OK_HI)
                       & (F.col("max_ok") >= _OK_LO)).count()
    assert total == N_ZFILES
    # the band covers a contiguous clustered range: a small slice of
    # the file population
    assert chosen < total // 2, (chosen, total)
    assert chosen >= 1


def test_index_staging_memo_is_sf_keyed(spark, sf_dir):
    """Repeat staging for the SAME sf must be a no-op (idempotent memo
    + on-disk _SUCCESS), and a DIFFERENT sf must stage to its own path
    instead of overwriting — alternating scale factors in one process
    previously thrashed the single-slot memo."""
    import os

    from sigma_rx7_spark.sources.layout import stage_indexed_lineitem

    p1 = stage_indexed_lineitem(spark, sf_dir)
    marker = os.path.join(p1, "idx", "_SUCCESS")
    mtime = os.path.getmtime(marker)
    assert stage_indexed_lineitem(spark, sf_dir) == p1
    assert os.path.getmtime(marker) == mtime  # not re-written
    other = "/root/testdata/sf0.01"
    if os.path.isdir(other) and other != sf_dir:
        p2 = stage_indexed_lineitem(spark, other)
        assert p2 != p1
        # and returning to the first sf still does not re-stage
        assert stage_indexed_lineitem(spark, sf_dir) == p1
        assert os.path.getmtime(marker) == mtime


def test_staging_marker_discipline(tmp_path):
    """Round-6/7 contract: a completed staging (stamp + _SUCCESS) is
    detected and reused; a missing _SUCCESS, absent stamp, stamp from
    another layout, or an in-progress BUILDING sentinel all force a
    (re)build. No Spark needed — the guard is pure filesystem logic."""
    from sigma_rx7_spark.staging import (
        begin_staging,
        mark_staged,
        staging_ok,
    )

    p = str(tmp_path / "stage")
    import os

    os.makedirs(p)
    # empty dir: not complete
    assert not staging_ok(p, "1")
    # _SUCCESS without stamp: not complete (older code left it)
    open(os.path.join(p, "_SUCCESS"), "w").close()
    assert not staging_ok(p, "1")
    # stamp + _SUCCESS: complete for that stamp only
    mark_staged(p, "1")
    assert staging_ok(p, "1")
    assert not staging_ok(p, "2")          # version bump invalidates
    assert not staging_ok(p, "1:sf0.01")   # sf-qualified stamp differs
    # multi-subdir artifacts: every part needs its _SUCCESS
    os.makedirs(os.path.join(p, "cells"))
    os.makedirs(os.path.join(p, "centroids"))
    assert not staging_ok(p, "1", "cells", "centroids")
    open(os.path.join(p, "cells", "_SUCCESS"), "w").close()
    assert not staging_ok(p, "1", "cells", "centroids")
    open(os.path.join(p, "centroids", "_SUCCESS"), "w").close()
    assert staging_ok(p, "1", "cells", "centroids")
    # r6-advice mixed-version race: begin_staging's BUILDING sentinel
    # makes the mid-rebuild state incomplete to EVERY stamp — including
    # the one that was just valid — until mark_staged restores it.
    begin_staging(p)
    assert not staging_ok(p, "1", "cells", "centroids")
    assert not staging_ok(p, "BUILDING", "cells", "centroids")
    mark_staged(p, "2")
    assert staging_ok(p, "2", "cells", "centroids")
    # begin_staging also creates a missing parent dir
    q = str(tmp_path / "fresh")
    begin_staging(q)
    assert os.path.exists(os.path.join(q, "_layout_v.txt"))


def test_src_stamp_tracks_builder_source(tmp_path):
    """src_stamp derives the layout version from builder SOURCE: same
    builders → same stamp across calls/processes; different builder
    code or extra salt → different stamp (the automatic bump that
    replaced the hand-maintained integers, r6 advice)."""
    from sigma_rx7_spark.llm import similarity
    from sigma_rx7_spark.staging import src_stamp

    def builder_a():
        return 1

    def builder_b():
        return 2

    s1 = src_stamp(builder_a)
    assert s1 == src_stamp(builder_a)                  # deterministic
    assert s1 != src_stamp(builder_b)                  # code-sensitive
    assert s1 != src_stamp(builder_a, extra="dim=8")   # salt-sensitive
    assert s1 != src_stamp(builder_a, builder_b)       # set-sensitive
    assert len(s1) == 12 and s1 != "BUILDING"
    # modules hash too (the domain fixtures stamp hashes fixtures.py)
    assert src_stamp(similarity) == src_stamp(similarity)
    # and the production per-artifact stamps are distinct from each
    # other (split per artifact, not one shared constant); since r11
    # _cent_stamp also keys on the corpus fingerprint of its sf_dir
    cent = similarity._cent_stamp("/root/testdata/sf0.001")
    ivf = src_stamp(similarity.build_ivf_index, similarity.ivf_assign,
                    extra=cent)
    assert cent != ivf
    assert cent != similarity._cent_stamp("/root/testdata/sf0.01")
