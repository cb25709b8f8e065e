"""Tokenizer goldens — doc/query asymmetry per FIXTURES.md §3.2.

Doc side mirrors reference src/lib.rs:70-74 (whitespace split, punctuation
kept); query side mirrors src/lib.rs:151-157 (\\w+ matches).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.tokenize import (
    doc_tokens_col,
    doc_tokens_py,
    doc_tokens_udf,
    query_tokens_col,
    query_tokens_py,
    query_tokens_udf,
)

DOC_CASES = [
    ("Chips, and sauce.", ["chips,", "and", "sauce."]),
    ("It's not easy to let go.", ["it's", "not", "easy", "to", "let", "go."]),
    ("a\tb\nc   d", ["a", "b", "c", "d"]),
    ("", []),
    ("   ", []),
    ("Mixed CASE Tokens", ["mixed", "case", "tokens"]),
    ("digits 123 under_score", ["digits", "123", "under_score"]),
    ('quoted "words" halt."', ["quoted", '"words"', 'halt."']),
]

QUERY_CASES = [
    ("Chips, and sauce.", ["chips", "and", "sauce"]),
    ("It's not easy to let go.", ["it", "s", "not", "easy", "to", "let", "go"]),
    ("Does size matter?.", ["does", "size", "matter"]),
    ("", []),
    ("...!!!", []),
    ("under_score stays 123", ["under_score", "stays", "123"]),
    ("repeat repeat repeat", ["repeat", "repeat", "repeat"]),
]

UNICODE_DOC_CASES = [
    # U+00A0 nbsp and U+3000 ideographic space are Unicode whitespace:
    # Rust split_whitespace and Python str.split() both split on them.
    ("a b　c", ["a", "b", "c"]),
    ("CAFÉ Straße", ["café", "straße"]),
]


@pytest.mark.parametrize("text,expected", DOC_CASES)
def test_doc_tokens_py(text, expected):
    assert doc_tokens_py(text) == expected


@pytest.mark.parametrize("text,expected", QUERY_CASES)
def test_query_tokens_py(text, expected):
    assert query_tokens_py(text) == expected


@pytest.mark.parametrize("text,expected", UNICODE_DOC_CASES)
def test_doc_tokens_unicode(text, expected):
    assert doc_tokens_py(text) == expected


def test_none_inputs():
    assert doc_tokens_py(None) == []
    assert query_tokens_py(None) == []


def test_spark_columns_match_python_on_ascii(spark):
    rows = [(t,) for t, _ in DOC_CASES + QUERY_CASES]
    df = spark.createDataFrame(rows, ["s"])
    got = df.select(
        "s",
        doc_tokens_col("s").alias("d_col"),
        doc_tokens_udf(F.col("s")).alias("d_udf"),
        query_tokens_col("s").alias("q_col"),
        query_tokens_udf(F.col("s")).alias("q_udf"),
    ).collect()
    for r in got:
        assert r.d_col == doc_tokens_py(r.s), r.s
        assert r.d_udf == doc_tokens_py(r.s), r.s
        assert r.q_col == query_tokens_py(r.s), r.s
        assert r.q_udf == query_tokens_py(r.s), r.s


def test_udf_matches_python_on_unicode(spark):
    rows = [(t,) for t, _ in UNICODE_DOC_CASES]
    df = spark.createDataFrame(rows, ["s"])
    got = df.select("s", doc_tokens_udf(F.col("s")).alias("d")).collect()
    for r in got:
        assert r.d == doc_tokens_py(r.s)
