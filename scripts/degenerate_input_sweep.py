#!/usr/bin/env python
"""Degenerate-input robustness sweep: every registered query on
CONSTANT-VALUE tables (the empty sweep's sibling).

At 100 TB, zero-VARIANCE inputs are as routine as zero-row ones: a
stuck sensor emits one value all day, a repriced catalog goes uniform,
a promo forces every quantity to the cap. Statistics divide by
variance, tie corrections divide by (N³−N−ties), shares divide by
spans — and under ANSI mode (this engine's default) every such 0/0 is
a hard DIVIDE_BY_ZERO crash, not a quiet NaN. tests/test_degenerate_r11b.py
pins a handful of these shapes for the round-11 operators; this sweep
is the registry-wide version.

Three profiles, all schema-faithful copies of sf0.001:
- `tied`:  l_quantity = 7.0 everywhere, p_retailprice = 950.0, p_size = 5
- `stuck`: events.value = 42.0 everywhere (the stuck-sensor day),
           l_discount = 0.04 everywhere
- `nulls`: events.value and customer.c_acctbal all-NULL (the
           failed-extractor day — columns present, meaning gone)

Pass = the query executes end-to-end through the noop sink (any row
count; NULL statistics are the CONTRACT). Fail = any raised exception.

Run: python scripts/degenerate_input_sweep.py [--names a,b] [--profile tied|stuck|all]
Prints one JSON line per profile; exits nonzero if any query fails.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sigma_rx7_spark import io, registry  # noqa: E402
from sigma_rx7_spark.session import get_spark  # noqa: E402

SRC_SF = "/root/testdata/sf0.001"
BASE = "/tmp/sigma_degen_sweep"

PROFILES = {
    "tied": {
        "lineitem": {"l_quantity": 7.0, "l_extendedprice": 1000.0},
        "part": {"p_retailprice": 950.0, "p_size": 5},
        # r12: the orders table was uncovered — a constant o_totalprice
        # (zero variance in EVERY stratum) crashed the Neyman planner's
        # share division on first crafted probe; keep it in the sweep.
        "orders": {"o_totalprice": 1000.0},
    },
    "stuck": {
        "events": {"value": 42.0},
        "lineitem": {"l_discount": 0.04},
    },
    "nulls": {
        "events": {"value": None},
        "customer": {"c_acctbal": None},
    },
    # r13 (VERDICT r12 item 7): the text/embedding corpus was
    # unprofiled — the L3/L2 families have per-op guards (zero-vector
    # quantization, empty-text lang-ID) but no standing proof the WHOLE
    # registry survives a degenerate corpus: every document empty,
    # every embedding the zero vector (norm 0 ⇒ cosine 0/0), every
    # n_chars 0. Values given as ("expr", sql) evaluate per-row.
    "flat_corpus": {
        "documents": {"text": "", "n_chars": 0},
        "embeddings": {"embedding": ("expr",
                                     "array_repeat(CAST(0.0 AS FLOAT), 64)")},
    },
    # r14 (VERDICT r13 item 7): TOTAL KEY COLLAPSE — every event from
    # one user at one instant, every order from one customer on one
    # day. The windowed/sessionize/funnel/cohort/streak family had
    # never faced it: every window lands in one partition, every
    # lag/lead chain degenerates to same-timestamp ties, inter-arrival
    # gaps are all zero, retention collapses to a single cohort. The
    # constant ts is deliberately harsher than "same hour": it also
    # forces the total-order tiebreaks (event_id) to carry ALL ordering.
    "single_key": {
        "events": {"user_id": 7,
                   "ts": ("expr", "TIMESTAMP '1997-06-15 10:30:00'")},
        "orders": {"o_custkey": 1,
                   "o_orderdate": ("expr", "TIMESTAMP '1997-06-15'")},
    },
}


def build(spark, profile: str) -> str:
    dest = f"{BASE}_{profile}"
    shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)
    overrides = PROFILES[profile]
    for t in io.TABLES:
        df = io.load(spark, SRC_SF, t)
        for col, val in overrides.get(t, {}).items():
            typ = dict(df.dtypes)[col]
            if isinstance(val, tuple) and val[0] == "expr":
                df = df.withColumn(col, F.expr(val[1]).cast(typ))
            else:
                df = df.withColumn(col, F.lit(val).cast(typ))
        df.write.mode("overwrite").parquet(f"{dest}/{t}.parquet")
    return dest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default=None)
    ap.add_argument("--profile", default="all",
                    choices=["tied", "stuck", "nulls", "flat_corpus",
                             "single_key", "all"])
    args = ap.parse_args()
    spark = get_spark(app_name="sigma-degen-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.load_all()
    names = (args.names.split(",") if args.names else list(specs))
    profiles = list(PROFILES) if args.profile == "all" else [args.profile]
    worst = 0
    for profile in profiles:
        sf_dir = build(spark, profile)
        failures: dict[str, str] = {}
        npass = 0
        for name in names:
            try:
                specs[name].fn(spark, sf_dir) \
                    .write.mode("overwrite").format("noop").save()
                npass += 1
                print(f"ok   {name}")
            except Exception as exc:  # noqa: BLE001 - report, don't die
                msg = str(exc).split("\n", 1)[0][:300]
                failures[name] = msg
                print(f"FAIL {name}: {msg}")
        print(json.dumps({"profile": profile, "pass": npass,
                          "fail": len(failures), "failures": failures}))
        worst = max(worst, len(failures))
    return 1 if worst else 0


if __name__ == "__main__":
    sys.exit(main())
