"""Result marshalling for the API/UI sink (SURVEY.md §2.1 S7).

The reference serves query results through an HTTP app that marshals
result rows into JSON payloads and HTML fragments (reference
README.md:11, 18-21, 69-71 — `app/main.py`, `app/ui/`). The HTTP serving
itself stays out of scope (SURVEY §2.1: thin presentation shell), but the
marshalling step IS engine-visible — it decides how many rows leave the
cluster, how values serialize, and whether untrusted text can smuggle
markup into a rendered page. This module implements exactly that step:

- ``to_json_payload``  — DataFrame → the dict an API handler would
  serialize: column names/types, row dicts, and an honest ``truncated``
  flag.
- ``to_html_fragment`` — the same rows as an escaped ``<table>``
  fragment, the unit an HTMX-style UI swaps into a page.
- ``write_report``     — a self-contained static HTML document (inline
  CSS, zero external assets) plus a sibling ``.json`` payload, written
  atomically (tmp + ``os.replace``) so a half-written report is never
  served.

Scale posture: a presentation sink is a **driver-side endpoint by
definition** — its correct 100 TB behavior is to refuse to be a data
path. ``limit`` is mandatory and enforced INSIDE the plan
(``df.limit(limit + 1)``, the +1 row only detects truncation), so at most
``limit + 1`` rows ever leave the executors regardless of input size, and
Catalyst pushes the limit below projections where legal (CollectLimit).
Full-result export belongs to the distributed sinks: S8 parquet
(sources/formats.py:129) and S6 JSON-lines (functions/json_ops.py:113).
Marshalling runs through ``DataFrame.toJSON`` — JVM-side Jackson
serialization of exactly the limited rows — not per-row Python conversion
of Row objects.
"""

from __future__ import annotations

import html as _html
import json
import os

from pyspark.sql import DataFrame

# A UI page shows a page of rows, not a relation. Callers can raise the
# cap explicitly, but there is no "no limit" mode — an unbounded collect
# in a serving path is the classic driver-OOM incident at scale.
DEFAULT_LIMIT = 1000


def to_json_payload(df: DataFrame, limit: int = DEFAULT_LIMIT) -> dict:
    """Marshal a result DataFrame into an API-shaped JSON payload.

    Returns ``{"columns": [...], "types": [...], "rows": [row-dict, ...],
    "row_count": n, "truncated": bool}``. ``truncated`` is exact: the
    plan fetches ``limit + 1`` rows and the payload keeps ``limit``, so
    the flag never requires a count() over the full input. Values arrive
    through ``toJSON`` (JVM Jackson): dates/timestamps as ISO strings,
    decimals as numbers, NULL columns omitted per JSON-lines convention —
    re-inserted here as explicit ``None`` so every row dict has every
    column (an API consumer should not key-probe).
    """
    if limit <= 0:
        raise ValueError(f"limit must be positive, got {limit}")
    cols = df.columns
    raw = df.limit(limit + 1).toJSON().collect()
    truncated = len(raw) > limit
    rows = [json.loads(s) for s in raw[:limit]]
    for r in rows:
        for c in cols:
            r.setdefault(c, None)
    return {
        "columns": cols,
        "types": [f.dataType.simpleString() for f in df.schema.fields],
        "rows": rows,
        "row_count": len(rows),
        "truncated": truncated,
    }


def _cell(value) -> str:
    """One escaped <td>. Untrusted text (documents.body, user agents)
    must never reach a page unescaped — escape() covers <>&\"' so a value
    like '<script>' renders as text, not markup."""
    if value is None:
        return '<td class="null">∅</td>'
    return f"<td>{_html.escape(str(value), quote=True)}</td>"


def _fragment(payload: dict) -> str:
    """Escaped <table> fragment from an already-marshalled payload —
    shared by to_html_fragment and write_report so a report costs one
    collect, not two."""
    head = "".join(
        f"<th>{_html.escape(c)}</th>" for c in payload["columns"])
    body = "".join(
        "<tr>" + "".join(_cell(r[c]) for c in payload["columns"]) + "</tr>"
        for r in payload["rows"])
    foot = ""
    if payload["truncated"]:
        foot = (f'<tfoot><tr><td colspan="{len(payload["columns"])}">'
                f"showing first {payload['row_count']} rows (truncated)"
                "</td></tr></tfoot>")
    return (f'<table class="result">'
            f"<thead><tr>{head}</tr></thead>"
            f"<tbody>{body}</tbody>{foot}</table>")


def to_html_fragment(df: DataFrame, limit: int = DEFAULT_LIMIT) -> str:
    """Render a result as an escaped ``<table>`` fragment — the unit a
    fragment-swapping UI (reference README.md:20, 70) inserts into a
    page. All cell text is HTML-escaped; truncation is surfaced as a
    ``<tfoot>`` notice so the UI cannot silently present a cut result as
    complete."""
    return _fragment(to_json_payload(df, limit=limit))


_PAGE_CSS = (
    "body{font-family:system-ui,sans-serif;margin:2rem;color:#1a1a2e}"
    "table.result{border-collapse:collapse;font-size:.875rem}"
    "table.result th,table.result td{border:1px solid #d0d0e0;"
    "padding:.3rem .6rem;text-align:left}"
    "table.result th{background:#f0f0f8}"
    "table.result td.null{color:#a0a0b0;font-style:italic}"
    "table.result tfoot td{color:#707088;font-style:italic}"
)


def write_report(df: DataFrame, path: str, title: str = "Query result",
                 limit: int = DEFAULT_LIMIT) -> dict:
    """Write a self-contained static report: ``path`` (HTML document,
    inline CSS, no external assets) and the sibling ``<path stem>.json``
    (the API payload for programmatic consumers). Both writes are atomic
    — content lands in a tmp file and ``os.replace`` publishes it — so a
    reader polling the path never sees a partial document (same
    never-serve-incomplete rule as the parquet staging markers,
    staging.py). Returns the payload."""
    payload = to_json_payload(df, limit=limit)
    doc = (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{_html.escape(title)}</title>"
        f"<style>{_PAGE_CSS}</style></head><body>"
        f"<h1>{_html.escape(title)}</h1>"
        f"<p>{payload['row_count']} row(s)"
        f"{' — truncated' if payload['truncated'] else ''}</p>"
        f"{_fragment(payload)}</body></html>"
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    for target, text in ((path, doc),
                         (os.path.splitext(path)[0] + ".json",
                          json.dumps(payload, ensure_ascii=False))):
        tmp = target + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(text)
        os.replace(tmp, target)
    return payload
