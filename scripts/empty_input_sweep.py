#!/usr/bin/env python
"""Empty-input robustness sweep: every registered query on zero-row tables.

At 100 TB, zero-row inputs are not an edge case — a new tenant's first
day, a filtered-out partition, a source that produced nothing overnight.
An operator that CRASHES on an empty relation (driver-side division by
zero, unpacking a `.collect()` scalar that came back NULL, a k-means
loop over no points) takes the whole pipeline run down with it, whereas
an operator that returns an empty (or degenerate-but-typed) result
composes fine. This sweep is the measurable version of that claim: it
materializes a schema-correct, zero-row copy of every harness table and
runs EVERY registered query against it, forcing full execution through
the noop sink.

Pass = the query returns a DataFrame and executes end-to-end (any row
count, including zero). Fail = any raised exception; each failure is a
real robustness defect with a driver-side stack to read.

Notes on scope:
- Queries that read staged index artifacts build them from the empty
  corpus — itself part of the sweep (an index BUILD that dies on an
  empty corpus is the same defect).
- The domain (`q_domain_*`) queries read self-contained staged fixtures,
  not the sf tables; they run here too but exercise only their fixture
  path.
- Streaming queries run their file-source harness against the empty
  events table; watermark/state logic must tolerate zero batches.

Safe to run concurrently with other sessions since round 9: every
shared staging (IVF oracle centroids, PQ codes/assign, schema-merge
batches, backfill) is keyed by sf_dir in its PATH, so sweeping the
empty sf stages its own disjoint artifacts and never touches another
session's scale factor.

Run: python scripts/empty_input_sweep.py [--names a,b]
Prints one JSON line {"pass": N, "fail": M, "failures": {...}}; exits
nonzero if any query fails.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sigma_rx7_spark import io, registry  # noqa: E402
from sigma_rx7_spark.session import get_spark  # noqa: E402

# A stable path (not mkdtemp): staged artifacts under .staging are keyed
# by the sf_dir string, so reusing one path bounds the junk dirs the
# sweep leaves behind to a single set.
EMPTY_SF = "/tmp/sigma_empty_sf"
SRC_SF = "/root/testdata/sf0.001"


def build_empty_tables(spark) -> None:
    """Zero-row, schema-faithful copy of every harness table.

    `limit(0)` through the real loader keeps the logical schema (and the
    events.ts physical-type branch) identical to a populated read, so a
    query sees exactly the production schema with no rows.
    """
    shutil.rmtree(EMPTY_SF, ignore_errors=True)
    os.makedirs(EMPTY_SF, exist_ok=True)
    for t in io.TABLES:
        (io.load(spark, SRC_SF, t).limit(0)
         .write.mode("overwrite").parquet(f"{EMPTY_SF}/{t}.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default=None,
                    help="comma-separated subset (default: all registered)")
    args = ap.parse_args()

    spark = get_spark(app_name="empty-input-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    build_empty_tables(spark)

    specs = registry.load_all()
    names = args.names.split(",") if args.names else sorted(specs)
    passed, failures = [], {}
    for name in names:
        try:
            df = specs[name].fn(spark, EMPTY_SF)
            df.write.mode("overwrite").format("noop").save()
            passed.append(name)
        except Exception as exc:  # noqa: BLE001 — the sweep's entire point
            tb = traceback.format_exc(limit=25)
            failures[name] = {
                "error": f"{type(exc).__name__}: {str(exc).splitlines()[0][:200]}",
            }
            print(f"FAIL {name}\n{tb}", file=sys.stderr, flush=True)
        else:
            print(f"ok   {name}", file=sys.stderr, flush=True)

    print(json.dumps({"pass": len(passed), "fail": len(failures),
                      "failures": failures}))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
