"""Local mirror of the driver's correctness gate: every queries() entry
with an oracle_sql() twin must match DuckDB on the same parquet tables —
row count, column names/types, and order-insensitive values."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _rows_to_set(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


QUERY_NAMES = sorted(entrymod.oracle_sql().keys())


@pytest.fixture(scope="module")
def duck():
    con = _duck()
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_parity(spark, duck, name):
    qfn = entrymod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    res = duck.execute(entrymod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: columns {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: rows {len(srows)} vs {len(drows)}"
    a = _rows_to_set(scols, [[r[c] for c in scols] for r in srows])
    b = _rows_to_set(dcols, drows)
    mism = [(x, y) for x, y in zip(a, b) if x != y][:3]
    assert a == b, f"{name}: value mismatch, first diffs {mism}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert df.columns == ["conv_id", "turn_idx", "turn_seq", "main_text", "spans"]
    assert len(rows) > 0


def test_rows_only_queries(spark):
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    for name in sorted(set(qs) - set(osql)):
        assert qs[name](spark, SF_DIR).count() > 0, name
