#!/usr/bin/env python
"""Measured scaling curves: per-query runtime across sf0.001/0.01/0.1.

The repo's standing claim is that every production operator is built on
bucketed / blocked / broadcast plans whose cost grows near-linearly in
input size. At harness scales the fixed orchestration floor (~0.2 s)
hides data terms for small queries, but the data-heavy queries DO show
their growth between sf0.01 and sf0.1 (10× rows) — so the growth ratio

    g = (t_sf01 - floor) / max(t_sf001 - floor, eps)      # 100× rows
    g10 = (t_sf01 - floor) / max(t_sf0_01 - floor, eps)   # 10× rows

is a direct, measurable answer to "would this survive another 10×?".
A query whose warm min-of-3 grows ~≤10× on 10× data is at-worst-linear;
growth well above the data factor flags a superlinear term (pair
explosion, global sort, driver loop) that the plan tests missed.

The floor is estimated per-session as the min warm runtime of the
cheapest probe query at the smallest sf — it subtracts identically from
both sides, so the ratio is conservative (overestimates growth for
small absolute times; read ratios only for queries whose sf0.1 time is
well above the floor).

Run: python scripts/scaling_curves.py [--names q_a,q_b,...] [--reps 3]
Prints a JSON report; exits nonzero if any measured query's 10× growth
exceeds --fail-over (default: off).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sigma_rx7_spark import registry  # noqa: E402
from sigma_rx7_spark.session import get_spark  # noqa: E402

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]

# The bench queries with real data terms at sf0.1 (≥ ~0.5 s absolute,
# BENCH_DETAIL.json r7) — the ones whose growth is measurable above the
# orchestration floor. Floor-bound queries are excluded on purpose: at
# these scales their "growth" would measure scheduler noise.
DEFAULT_NAMES = [
    "q_dedup_cosine_lsh", "q_graph_pagerank", "q_sim_topk_ivf",
    "q_stream_attribution", "q_agg_pricing_summary",
    "q_dedup_clusters_lsh", "q_agg_corr", "q_sim_topk_ivfpq",
    "q_text_bpe_merges", "q_pipeline_near_dedup", "q_link_entities",
    "q_pipeline_fates", "q_agg_exact_quantiles", "q_agg_exact_median",
    "q_dedup_near", "q_quality_audit", "q_subquery_scalar",
    "q_window_rolling_dau", "q_text_heavyhitters", "q_sessionize_batch",
    # round-8 additions with real data terms at sf0.1
    "q_dedup_prefix", "q_agg_hbos", "q_sim_recall_rp", "q_embed_rp",
    # round-9 additions with real data terms at sf0.1
    "q_ab_sequential", "q_ab_delta", "q_agg_bloom",
    "q_drift_wasserstein", "q_text_gopher_rules", "q_sample_systematic",
    # round-10 additions with real data terms at sf0.1
    "q_sim_index_incremental", "q_graph_link_prediction",
    "q_agg_spearman", "q_survival_km", "q_ml_pr_curve",
    "q_agg_assoc_rules", "q_window_rfm",
    # round-11 additions with real data terms at sf0.1
    "q_agg_kendall_tau", "q_agg_trimmed_mean", "q_graph_clustering",
    "q_graph_assortativity", "q_drift_cvm", "q_ml_ks",
    "q_mv_join_maintenance", "q_join_bloom_filtered", "q_ts_acf",
]
FLOOR_PROBE = "q_agg_having"  # cheapest stable headline query


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default=None,
                    help="comma-separated query names (default: the "
                         "data-heavy headline set)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--fail-over", type=float, default=None,
                    help="exit 1 if any 10x growth ratio exceeds this")
    args = ap.parse_args()
    names = (args.names.split(",") if args.names else DEFAULT_NAMES)

    specs = registry.load_all()
    spark = get_spark(app_name="scaling-curves")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop").save()
        return time.perf_counter() - t0

    # Warm pass: trigger codegen + staged builds at every sf OUTSIDE
    # the timed reps (same discipline as bench.py).
    for sf in SF_DIRS:
        run(FLOOR_PROBE, sf)
        for n in names:
            run(n, sf)
        print(f"warm pass done: {sf}", file=sys.stderr, flush=True)

    floor = min(run(FLOOR_PROBE, SF_DIRS[0]) for _ in range(args.reps))

    report: dict[str, dict] = {}
    for n in names:
        times = {}
        for sf in SF_DIRS:
            key = os.path.basename(sf.rstrip("/"))
            times[key] = round(min(run(n, sf) for _ in range(args.reps)), 3)
        t001, t01, t1 = (times["sf0.001"], times["sf0.01"], times["sf0.1"])
        eps = 0.010
        g10 = (t1 - floor) / max(t01 - floor, eps)
        report[n] = {
            **times,
            "growth_10x": round(g10, 2),
            # flag only where the data term is real (well above floor)
            "data_term_sec": round(t1 - floor, 3),
            "superlinear_flag": bool(g10 > 10.0 and (t1 - floor) > 0.5),
        }
        print(f"{n}: {times} g10x={report[n]['growth_10x']}",
              file=sys.stderr, flush=True)

    out = {"floor_sec": round(floor, 3), "reps": args.reps,
           "queries": report}
    print(json.dumps(out, indent=2))
    spark.stop()

    if args.fail_over is not None:
        bad = [n for n, r in report.items()
               if r["superlinear_flag"] and r["growth_10x"] > args.fail_over]
        if bad:
            print(f"growth over {args.fail_over}x: {bad}", file=sys.stderr)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
