"""Local mirror of the driver's correctness gate (SURVEY.md §5.1).

For every registered query with an oracle: run the Spark DataFrame and the
DuckDB oracle SQL on the same parquet inputs and require IDENTICAL results
— same row count, same column-name set, same multiset of values, with NO
float tolerance (the compat.py conventions must make values bit-equal).
Rows-only queries are executed and smoke-checked.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import pytest

from sigma_rx7_spark import registry
from sigma_rx7_spark.io import TABLES

ALL = registry.load_all()
ORACLE_QUERIES = sorted(n for n, s in ALL.items() if s.oracle)
ROWS_ONLY = sorted(n for n, s in ALL.items() if not s.oracle)

# Queries where an empty result at tiny sf0.001 is legitimate.
MAY_BE_EMPTY = {"q_join_anti", "q_dedup_near", "q_agg_having"}


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(name, spark, sf_dir):
    spec = ALL[name]
    sdf = spec.fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(spec.oracle)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={s_cols} duck={d_cols}")
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")

    sc, sr = _canon(s_cols, s_rows)
    dc, dr = _canon(d_cols, d_rows)
    mismatches = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(sr)} rows differ; "
        f"first: spark={mismatches[0][0]!r} duck={mismatches[0][1]!r} "
        f"(cols={sc})")
    if name not in MAY_BE_EMPTY:
        assert len(s_rows) > 0, f"{name}: unexpectedly empty result"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, sf_dir):
    spec = ALL[name]
    sdf = spec.fn(spark, sf_dir)
    rows = sdf.collect()
    assert isinstance(rows, list)
    if name not in MAY_BE_EMPTY:
        assert len(rows) > 0, f"{name}: unexpectedly empty result"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert len(df.collect()) > 0


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
