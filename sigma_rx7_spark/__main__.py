"""CLI runner: the operational surface of the engine.

The reference ships a FastAPI+HTMX app whose "Run" button re-executes the
rules per request (reference README.md:11,69-71); the engine-side
equivalent of that surface is a command runner over the same registry the
driver harness uses:

    python -m sigma_rx7_spark list
    python -m sigma_rx7_spark run q_agg_pricing_summary --sf-dir ... -n 20
    python -m sigma_rx7_spark explain q_join_broadcast
    python -m sigma_rx7_spark oracle q_agg_pricing_summary
    python -m sigma_rx7_spark report q_agg_pricing_summary -o out.html

`report` is the S7 sink end-to-end (sources/report.py): the query's
result rendered as a self-contained static HTML page + sibling JSON
payload — the reference's "Run → rendered result" flow without the HTTP
shell.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sigma-rx7-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")
    for name, hlp in (("run", "execute a query and show rows"),
                      ("explain", "show the formatted physical plan"),
                      ("oracle", "print the DuckDB oracle SQL"),
                      ("report", "render the result as HTML+JSON (S7)")):
        sp = sub.add_parser(name, help=hlp)
        sp.add_argument("query")
        sp.add_argument("--sf-dir", default=os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
        if name == "run":
            sp.add_argument("-n", type=int, default=20,
                            help="rows to show (0 = count only)")
        if name == "report":
            sp.add_argument("-o", "--out", default="report.html",
                            help="output HTML path (sibling .json too)")
            sp.add_argument("--limit", type=int, default=None,
                            help="max rows in the report (in-plan bound)")
            sp.add_argument("--title", default=None)
    args = p.parse_args(argv)

    from . import registry

    specs = registry.load_all()
    if args.cmd == "list":
        width = max(len(n) for n in specs)
        for name in sorted(specs):
            s = specs[name]
            gate = "oracle" if s.oracle else "rows-only"
            print(f"{name:<{width}}  [{gate:9}] "
                  f"{s.doc.splitlines()[0] if s.doc else ''}")
        return 0

    if args.query not in specs:
        print(f"unknown query {args.query!r}; run `list`", file=sys.stderr)
        return 2
    spec = specs[args.query]

    if args.cmd == "oracle":
        if spec.oracle is None:
            print(f"{args.query} is rows-only (no oracle)", file=sys.stderr)
            return 1
        print(spec.oracle_for(args.sf_dir).strip())
        return 0

    from .session import get_spark

    spark = get_spark(app_name=f"sigma-rx7-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    df = spec.fn(spark, args.sf_dir)
    if args.cmd == "explain":
        from .plans.inspect import formatted_plan

        print(formatted_plan(df))
    elif args.cmd == "report":
        from .sources.report import DEFAULT_LIMIT, write_report

        payload = write_report(
            df, args.out, title=args.title or args.query,
            limit=args.limit or DEFAULT_LIMIT)
        print(f"{args.out}: {payload['row_count']} row(s)"
              f"{' (truncated)' if payload['truncated'] else ''}")
    else:
        if args.n:
            df.show(args.n, truncate=False)
        print(f"rows: {df.count()}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
