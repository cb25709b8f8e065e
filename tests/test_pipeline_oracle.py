"""Oracle parity for the training-data pipeline operators: every entry in
PIPELINE_QUERIES must match its DuckDB oracle row-for-row at sf0.001 —
the same comparison the driver's correctness gate runs at sf0.01.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from search_engine_spark.api_pipeline import PIPELINE_ORACLES, PIPELINE_QUERIES

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9) + 0.0  # -0.0 -> 0.0
    return v


def _rows(seq):
    return sorted(tuple(_norm(v) for v in row) for row in seq)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in ["documents", "embeddings", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(PIPELINE_ORACLES))
def test_pipeline_query_matches_oracle(spark, ddb, name):
    sdf = PIPELINE_QUERIES[name](spark, SF_DIR)
    srows = _rows(map(tuple, sdf.collect()))
    drows = _rows(ddb.sql(PIPELINE_ORACLES[name]).fetchall())
    assert len(srows) > 0, f"{name}: empty result (vacuous gate)"
    assert [c.lower() for c in sdf.columns] == [
        c.lower() for c in ddb.sql(PIPELINE_ORACLES[name]).columns
    ], f"{name}: column names differ"
    assert srows == drows, (
        f"{name}: {len(srows)} spark rows vs {len(drows)} oracle rows; "
        f"first diff: "
        f"{next((a, b) for a, b in zip(srows, drows) if a != b) if len(srows) == len(drows) else 'row-count mismatch'}"
    )
