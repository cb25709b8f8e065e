"""Mimic the driver's correctness gate: every __spark_entry__ query vs its
DuckDB oracle at sf0.01 — row count, column names, and order-insensitive
value equality."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = f"{SF_DIR}/{t}.parquet"
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        rel = con.sql(sql)
        return rel.fetchall(), rel.columns
    finally:
        con.close()


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def _query_names():
    import __spark_entry__ as entrymod

    return sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, name):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    sdf = fn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    drows, dcols = _duck(sql)
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    assert len(srows) == len(drows), f"{name}: {len(srows)} vs {len(drows)}"
    got = _normalize([[r[c] for c in scols] for r in srows], scols)
    exp = _normalize(drows, dcols)
    mismatches = [
        (g, e)
        for g, e in zip(got, exp)
        if not _rows_close(g, e)
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def _rows_close(g, e):
    if len(g) != len(e):
        return False
    for a, b in zip(g, e):
        if isinstance(a, float) and isinstance(b, float):
            if not math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-6):
                return False
        elif a != b:
            return False
    return True
