#!/usr/bin/env python
"""One more measured decade for the heavy queries (r9 verdict item 5).

/root/testdata tops out at sf0.1, so this script synthesizes a local
~sf1-EQUIVALENT staging (10x rows) by re-keyed duplication of sf0.1 and
measures the heavy queries' 10x growth ratio between sf0.1 and the
synthetic decade — extending scripts/scaling_curves.py's g10 story one
rung for exactly the queries whose data terms dominate.

Synthesis rules (deterministic, no RNG):
- keys shift by copy * stride, so each copy is disjoint;
- `documents.text` gets a per-copy vowel rotation (translate), so
  copies are NOT near-duplicates of each other — without this, LSH
  dedup would see 10-way duplicate groups and its candidate volume
  would grow ~45x on 10x rows BY CONSTRUCTION, measuring the synthetic
  data's shape rather than the operator;
- `embeddings.embedding` components get a per-copy SIGN-FLIP pattern
  (cosine is scale-invariant, so a scalar nudge would make every copy
  an exact cosine-duplicate — measured g10 18.9 on the v1 staging);
  only copy-0 keeps vec_id < N_QUERIES, so the probe set stays fixed
  while the corpus grows 10x;
- `events.user_id` shifts per copy, so per-user session/attribution
  state stays bounded (more users, not deeper timelines) — the shape a
  real 10x user-growth decade has.

Run:  python scripts/scaling_decade.py [--reps 3] [--fail-over 14]
Prints one JSON report; nonzero exit if any g10 exceeds --fail-over.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sigma_rx7_spark import registry  # noqa: E402
from sigma_rx7_spark.session import get_spark  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SYNTH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".staging", "sf1_synth")
COPIES = 10
STRIDE = 10 ** 9

# The heavy six (r9 verdict item 5) + the PQ variant + the staged IVF
# serve path (the inline q_sim_topk_ivf re-assigns the FULL corpus per
# call by design — its decade cost is the N·sqrt(N) index-BUILD;
# q_sim_topk_ivf_staged is what a deployed probe pays).
NAMES = [
    "q_graph_pagerank", "q_dedup_cosine_lsh", "q_dedup_clusters_lsh",
    "q_sim_topk_ivf", "q_sim_topk_ivf_staged", "q_sim_topk_ivfpq",
    "q_text_bpe_merges", "q_stream_attribution",
    # r11: the reworked/new heavy operators over the synthesized tables
    # (lineitem/events/documents only — orders/customer aren't synthed)
    "q_agg_spearman", "q_agg_kendall_tau", "q_agg_trimmed_mean",
    "q_graph_clustering", "q_graph_link_prediction", "q_drift_cvm",
    # r12: the new data-heavy ops (r12 measured: LPA g10 1.01 flat,
    # range-bin 4.11, minhash-error 8.13 — candidate-volume-bound by
    # design)
    "q_graph_communities", "q_join_range_bin", "q_dedup_minhash_error",
    # r13: the TPC-H headline shapes over the v4 relational synth
    # (orders/customer 10x, catalog verbatim — Q5/Q9/Q18/Q21 exercise
    # the synthesized fact side; Q1 is the pure-scan anchor)
    "q_tpch_q01", "q_tpch_q05", "q_tpch_q09", "q_tpch_q18",
    "q_tpch_q21",
    # r14: the GD-eval representative after the greatest()-floor
    # rewrite of quality_features — 3 tokenizing passes (2 GD rounds +
    # scoring) over the synthesized 10x corpus, then the value-
    # cardinality-bounded PR sweep; growth should be ~linear in rows
    "q_ml_pr_curve",
    # r15: the per-ROW text-family representative after its own
    # greatest(ntok, 1) floor rewrite (VERDICT r14 items 2/7) — one
    # tokenizing scan, per-doc output; growth should be ~linear
    "q_text_langid",
]

VOWELS = "aeiou"
ROTS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio",
        "aeuio", "eiaou", "iueao", "oaiue", "ueoia"]


def _write_single_file(df, name: str) -> None:
    """Land the table as ONE parquet FILE named <name>.parquet (the
    testdata layout): the streaming file source narrows the shared dir
    with pathGlobFilter on the LEAF file name, so a directory-shaped
    table silently streams zero files (caught on the first decade run:
    q_stream_attribution "processed" the synth decade in 0.25 s)."""
    import glob
    import shutil

    tmp = os.path.join(SYNTH, f"_tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    dest = os.path.join(SYNTH, f"{name}.parquet")
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    shutil.move(part, dest)
    shutil.rmtree(tmp)


def synthesize(spark) -> None:
    # v2: single-file layout + sign-flip embedding decorrelation.
    done = os.path.join(SYNTH, "_SYNTH_DONE_v4")
    if os.path.exists(done):
        return
    os.makedirs(SYNTH, exist_ok=True)

    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    parts = []
    for i in range(COPIES):
        parts.append(li.select(
            (F.col("l_orderkey") + i * STRIDE).alias("l_orderkey"),
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    _write_single_file(out, "lineitem")

    d = spark.read.parquet(f"{SF01}/documents.parquet")
    parts = []
    for i in range(COPIES):
        parts.append(d.select(
            (F.col("doc_id") + i * STRIDE).alias("doc_id"),
            F.translate("text", VOWELS, ROTS[i]).alias("text"),
            "lang", "source", "n_chars"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    _write_single_file(out, "documents")

    e = spark.read.parquet(f"{SF01}/embeddings.parquet")
    dim = 64  # harness EMB_DIM
    parts = []
    for i in range(COPIES):
        # Copies must be DECORRELATED in direction, not just scaled:
        # cosine is scale-invariant, so the v1 per-copy scalar nudge
        # made every copy an exact cosine-duplicate and the LSH pair
        # volume grew ~45x on 10x rows BY CONSTRUCTION (measured g10
        # 18.9). v2's sign-flip-only pattern still collided for copies
        # with equal i%6 (exact duplicates again). v3: per-copy
        # component PERMUTATION (rotate by 7i) + sign-flip pattern —
        # intra-copy pairwise cosines are preserved exactly (the
        # workload stays realistic), cross-copy cosines collapse.
        if i == 0:
            vec = F.col("embedding")
        else:
            off = (i * 7) % dim
            bit = 1 << (i % 6)
            vec = F.expr(
                f"transform(sequence(0, {dim - 1}), j -> CAST("
                f"CASE WHEN (j & {bit}) != 0 THEN "
                f"-element_at(embedding, ((j + {off}) % {dim}) + 1) "
                f"ELSE element_at(embedding, ((j + {off}) % {dim}) + 1) "
                f"END AS FLOAT))")
        parts.append(e.select(
            (F.col("vec_id") + i * STRIDE).alias("vec_id"),
            vec.alias("embedding"),
            "label"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    _write_single_file(out, "embeddings")

    ev = spark.read.parquet(f"{SF01}/events.parquet")
    parts = []
    for i in range(COPIES):
        parts.append(ev.select(
            (F.col("event_id") + i * STRIDE).alias("event_id"),
            "ts",
            (F.col("user_id") + i * STRIDE).alias("user_id"),
            "event_type", "value", "props"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    _write_single_file(out, "events")

    # v4: the relational side of the decade. orders/customer grow with
    # the same key-shift discipline (lineitem's shifted l_orderkey must
    # resolve; o_custkey/c_custkey shift together so the customer base
    # grows 10x). part/supplier/nation/region copy verbatim — the
    # catalog-saturation shape every prior decade measurement
    # documented (more orders over the same catalog).
    o = spark.read.parquet(f"{SF01}/orders.parquet")
    parts = []
    for i in range(COPIES):
        parts.append(o.select(
            (F.col("o_orderkey") + i * STRIDE).alias("o_orderkey"),
            (F.col("o_custkey") + i * STRIDE).alias("o_custkey"),
            "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    _write_single_file(out, "orders")

    c = spark.read.parquet(f"{SF01}/customer.parquet")
    parts = []
    for i in range(COPIES):
        parts.append(c.select(
            (F.col("c_custkey") + i * STRIDE).alias("c_custkey"),
            "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    _write_single_file(out, "customer")

    for tbl in ("part", "supplier", "nation", "region"):
        _write_single_file(
            spark.read.parquet(f"{SF01}/{tbl}.parquet"), tbl)

    with open(done, "w") as fh:
        fh.write("ok\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fail-over", type=float, default=None)
    ap.add_argument("--names", default=None,
                    help="comma-separated subset of NAMES (default all)")
    args = ap.parse_args()
    names = args.names.split(",") if args.names else NAMES

    spark = get_spark(app_name="scaling-decade")
    t0 = time.perf_counter()
    synthesize(spark)
    synth_sec = round(time.perf_counter() - t0, 1)

    def run(name, sf_dir):
        best = None
        for _ in range(args.reps):
            t = time.perf_counter()
            registry.get(name).fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    report, flags = {}, []
    for name in names:
        run(name, SF01)           # warm caches/stagings at each scale
        t_base = run(name, SF01)
        run(name, SYNTH)
        t_decade = run(name, SYNTH)
        g10 = round(t_decade / max(t_base, 1e-9), 2)
        report[name] = {"t_sf0_1": t_base, "t_sf1_synth": t_decade,
                        "g10": g10}
        if args.fail_over is not None and g10 > args.fail_over:
            flags.append(name)

    print(json.dumps({"synth_build_sec": synth_sec, "copies": COPIES,
                      "queries": report, "flagged": flags}))
    return 1 if flags else 0


if __name__ == "__main__":
    sys.exit(main())
