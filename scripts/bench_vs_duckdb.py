#!/usr/bin/env python
"""Side-by-side throughput: this engine vs the reference's engine.

The reference delegates all query execution to embedded DuckDB (reference
README.md:7) and publishes no numbers, so the single-node comparison
point at a given scale factor is DuckDB itself running the exact oracle
SQL on the same parquet. This script times every oracle-gated headline
query both ways (steady-state best-of-2, full materialization on both
sides) and prints a JSON report.

Read the ratios with SCALE.md's analysis in hand: at harness scale
(≤11 MB per table) Spark's fixed per-query orchestration floor
(~0.2-0.5 s) dominates and DuckDB's data terms are milliseconds, so the
ratio measures overhead, not operator efficiency. The engine's target
regime is data that exceeds a single node — this report exists to keep
the fixed floor and the data-term growth visible and honest.

Run: python scripts/bench_vs_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402
from sigma_rx7_spark import registry  # noqa: E402
from sigma_rx7_spark.io import TABLES  # noqa: E402
from sigma_rx7_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    specs = registry.load_all()
    names = [n for n in HEADLINE if specs[n].oracle]

    spark = get_spark(app_name="bench-vs-duckdb")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    def t_spark(name: str) -> float:
        t0 = time.perf_counter()
        specs[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop").save()
        return time.perf_counter() - t0

    def t_duck(name: str) -> float:
        t0 = time.perf_counter()
        con.execute(specs[name].oracle_for(sf_dir)).fetchall()
        return time.perf_counter() - t0

    t_spark(names[0])  # JVM warmup
    report = {}
    for n in names:
        s = round(min(t_spark(n), t_spark(n)), 3)
        d = round(min(t_duck(n), t_duck(n)), 3)
        report[n] = {"spark_sec": s, "duckdb_sec": d,
                     "ratio": round(s / d, 2) if d > 0 else None}
    totals = {
        "spark_total_sec": round(sum(v["spark_sec"] for v in report.values()), 3),
        "duckdb_total_sec": round(sum(v["duckdb_sec"] for v in report.values()), 3),
        "sf_dir": sf_dir,
        "n_queries": len(report),
    }
    print(json.dumps({"totals": totals, "queries": report}, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
