#!/usr/bin/env python
"""Regenerate the operator catalog section of README.md from the registry.

Run after adding/changing queries:  python scripts/gen_catalog.py
The catalog lives between the BEGIN/END markers; everything else in the
README is hand-written.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sigma_rx7_spark import registry  # noqa: E402

BEGIN = "<!-- BEGIN OPERATOR CATALOG (generated) -->"
END = "<!-- END OPERATOR CATALOG (generated) -->"

FAMILY_ORDER = [
    ("Scans / sources / sinks", ("q_scan", "q_filter", "q_derived",
                                 "q_source", "q_sink")),
    ("Joins", ("q_join",)),
    ("Subqueries", ("q_subquery",)),
    ("Aggregation", ("q_agg",)),
    ("Windows / top-k", ("q_window", "q_sort")),
    ("Time-series / incremental", ("q_resample", "q_fill", "q_sessionize",
                                   "q_merge")),
    ("Set operations", ("q_set",)),
    ("Scalar functions", ("q_string", "q_date", "q_math", "q_conditional",
                          "q_json", "q_array", "q_nested")),
    ("Streaming", ("q_stream",)),
    ("UDF / UDAF (Arrow slow path)", ("q_udf", "q_udaf")),
    ("LLM pipeline: dedup", ("q_dedup",)),
    ("LLM pipeline: similarity", ("q_sim",)),
    ("LLM pipeline: text / sampling / multimodal",
     ("q_text", "q_split", "q_sample", "q_multimodal")),
    ("LLM pipeline: composite", ("q_pipeline",)),
    ("Reference-domain composites", ("q_domain",)),
    ("Other", ()),  # fallback — renders anything no prefix claims
]


def family(name: str) -> str:
    for fam, prefixes in FAMILY_ORDER:
        if any(name.startswith(p) for p in prefixes):
            return fam
    return "Other"


def first_sentence(doc: str) -> str:
    text = " ".join(doc.split())
    m = re.match(r"(.+?\.)(\s|$)", text)
    return (m.group(1) if m else text)[:160]


def main() -> None:
    specs = registry.load_all()
    fams: dict[str, list] = {}
    for name in sorted(specs):
        fams.setdefault(family(name), []).append(specs[name])

    n_oracle = sum(1 for s in specs.values() if s.oracle)
    lines = [BEGIN, "",
             f"**{len(specs)} registered queries** — {n_oracle} hash-gated "
             "against the DuckDB oracle (row count + schema + order-"
             "insensitive value hash, zero float tolerance), "
             f"{len(specs) - n_oracle} rows-only (approximate, "
             "hash-randomized, or JSON-formatted outputs). "
             "Regenerate with `python scripts/gen_catalog.py`.", ""]
    for fam, _ in FAMILY_ORDER:
        if fam not in fams:
            continue
        lines += [f"### {fam}", "", "| query | gate | what it computes |",
                  "|---|---|---|"]
        for s in fams[fam]:
            gate = "oracle" if s.oracle else "rows-only"
            lines.append(f"| `{s.name}` | {gate} | {first_sentence(s.doc)} |")
        lines.append("")
    lines.append(END)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "README.md")
    with open(path) as f:
        readme = f.read()
    block = "\n".join(lines)
    if BEGIN in readme:
        readme = re.sub(
            re.escape(BEGIN) + r".*?" + re.escape(END),
            block, readme, flags=re.S)
    else:
        readme = readme.rstrip() + "\n\n## Operator catalog\n\n" + block + "\n"
    with open(path, "w") as f:
        f.write(readme)
    print(f"wrote catalog: {len(specs)} queries, {n_oracle} oracle-gated")


if __name__ == "__main__":
    main()
