"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``search_engine_spark``; this module is a thin
registry view over ``search_engine_spark.api``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from search_engine_spark import api  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: BM25 top-10 for the reference query set over the
    sf0.001 documents corpus."""
    return api.q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(api.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(api.ORACLES)
