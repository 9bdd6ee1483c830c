"""Rehearsal of the driver's correctness gate: run every queries() entry
and its oracle_sql() DuckDB equivalent on the same parquet tables, compare
row count, column-name set, and (order-insensitively) values.

Floats are compared with tolerance 1e-9 here — the driver's value-hash is
exact, which is why the queries round every float output to 6dp and route
double sums through integer cents (see __spark_entry__ docstring)."""

import math

import duckdb
import pytest

import __spark_entry__ as E

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, int):
        return v
    return str(v)


def _sorted_rows(cols_in_order, rows):
    """Rows as tuples ordered by sorted column name (driver semantics)."""
    idx = [cols_in_order.index(c) for c in sorted(cols_in_order)]
    return sorted(
        (tuple(_norm(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t))


ORACLE_KEYS = sorted(E.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    qfn = E.queries()[name]
    sdf = qfn(spark, sf_dir)
    scols = sdf.columns
    srows = sdf.collect()

    res = ddb.execute(E.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"

    sn = _sorted_rows(scols, [list(r) for r in srows])
    dn = _sorted_rows(dcols, [list(r) for r in drows])
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_every_oracle_key_has_query():
    qs, os_ = set(E.queries()), set(E.oracle_sql())
    assert os_ <= qs, os_ - qs


def test_rows_only_queries_run(spark, sf_dir):
    qs = E.queries()
    for name in set(qs) - set(E.oracle_sql()):
        df = qs[name](spark, sf_dir)
        assert df.count() >= 0, name
        assert len(df.schema.fields) > 0, name


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert "tokens" in df.columns and "rms_mean" in df.columns
