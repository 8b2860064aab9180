"""S7 result-sink marshalling (sigma_rx7_spark/sources/report.py).

The reference's app layer marshals result rows to JSON/HTML per request
(reference README.md:11, 18-21, 69-71); these tests pin the engine-visible
contract of that step: bounded collection with an exact truncation flag,
full-column row dicts, HTML escaping of untrusted text, and atomic
self-contained file output.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from sigma_rx7_spark.sources.report import (
    DEFAULT_LIMIT, to_html_fragment, to_json_payload, write_report)


@pytest.fixture(scope="module")
def result_df(spark, sf_dir):
    # A realistic "query result": small aggregate over a harness table,
    # with a NULL-bearing column and a decimal measure.
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    return (orders.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders"),
                 F.sum("o_totalprice").alias("sum_price"),
                 F.when(F.count("*") > 1_000_000, F.lit("hot"))
                  .otherwise(F.lit(None)).alias("tag"))
            .orderBy("o_orderpriority"))


def test_payload_shape_and_null_reinsertion(result_df):
    payload = to_json_payload(result_df, limit=10)
    assert payload["columns"] == [
        "o_orderpriority", "n_orders", "sum_price", "tag"]
    assert payload["row_count"] == len(payload["rows"]) <= 10
    assert payload["truncated"] is False  # 5 priorities at any sf
    # toJSON omits NULL keys; the payload must re-insert them so every
    # row dict carries every column.
    for r in payload["rows"]:
        assert set(r) == set(payload["columns"])
        assert r["tag"] is None
    # types come from the schema, not guessed from values
    assert payload["types"][1] == "bigint"


def test_payload_matches_collect(result_df):
    payload = to_json_payload(result_df, limit=10)
    rows = result_df.collect()
    assert [r["o_orderpriority"] for r in payload["rows"]] == \
        [r.o_orderpriority for r in rows]
    assert [r["n_orders"] for r in payload["rows"]] == \
        [r.n_orders for r in rows]


def test_truncation_is_exact_and_bounded(spark):
    df = spark.range(1000).withColumnRenamed("id", "v")
    payload = to_json_payload(df, limit=7)
    assert payload["truncated"] is True
    assert payload["row_count"] == 7
    full = to_json_payload(df.limit(5), limit=5)
    assert full["truncated"] is False and full["row_count"] == 5


def test_limit_must_be_positive(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        to_json_payload(df, limit=0)


def test_html_escapes_untrusted_text(spark):
    df = spark.createDataFrame(
        [('<script>alert("x")</script>', None)],
        schema="body string, note string")
    frag = to_html_fragment(df, limit=5)
    assert "<script>" not in frag
    assert "&lt;script&gt;" in frag
    assert '<td class="null">' in frag  # NULL renders as a typed cell
    assert frag.startswith('<table class="result">')


def test_html_truncation_notice(spark):
    df = spark.range(100).withColumnRenamed("id", "v")
    frag = to_html_fragment(df, limit=3)
    assert "<tfoot>" in frag and "truncated" in frag
    frag_full = to_html_fragment(df.limit(2), limit=5)
    assert "<tfoot>" not in frag_full


def test_write_report_atomic_pair(result_df, tmp_path):
    path = str(tmp_path / "report.html")
    payload = write_report(result_df, path, title="Priorities & <totals>")
    html_text = open(path, encoding="utf-8").read()
    # self-contained: no external asset references
    assert "http" not in html_text and "src=" not in html_text
    assert "Priorities &amp; &lt;totals&gt;" in html_text
    # sibling JSON is the exact payload
    sidecar = json.loads(open(str(tmp_path / "report.json"),
                              encoding="utf-8").read())
    assert sidecar == json.loads(json.dumps(payload))
    # no tmp debris left behind
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]


def test_limit_is_in_plan_not_post_collect(spark, sf_dir):
    # The bound must be INSIDE the plan (CollectLimit), so at most
    # limit+1 rows leave the executors — not a python slice of a full
    # collect. Pin the plan shape the docstring claims.
    df = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    plan = df.limit(11)._jdf.queryExecution().executedPlan().toString()
    assert "CollectLimit" in plan


def test_default_limit_guard():
    # the serving path must always be bounded — a "no limit" mode is the
    # driver-OOM incident at scale, so the default must be a real cap
    assert 0 < DEFAULT_LIMIT <= 100_000
