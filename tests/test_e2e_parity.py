"""End-to-end parity: Spark engine vs pure-Python reference model over the
100-document reference corpus and its 10 queries (SURVEY.md §5.2.3-4).

Also asserts the reference's own accuracy proxy: P@10 by the
query{n}document{d}.txt naming convention (src/bin/test.rs:122-137).
"""

from __future__ import annotations

import math

import pytest

from search_engine_spark import corpus
from search_engine_spark.index.build import (
    build_postings,
    doc_lengths,
    term_stats,
)
from search_engine_spark.query.scoring import bm25_topk, tfsum_topk

from .reference_model import bm25_search, build_model_index, tfsum_search

pytestmark = pytest.mark.skipif(
    not corpus.reference_available(), reason="reference corpus not present"
)


@pytest.fixture(scope="module")
def ref_docs():
    rows = corpus.reference_pages_rows()
    return {url: text for url, _, _, text, _ in rows}


@pytest.fixture(scope="module")
def model(ref_docs):
    return build_model_index(ref_docs)


@pytest.fixture(scope="module")
def spark_results(spark):
    pages = corpus.reference_pages(spark)
    queries = corpus.reference_queries_df(spark)
    postings = build_postings(pages).cache()
    dl = doc_lengths(pages).cache()
    n = dl.count()
    avgdl = dl.agg({"dl": "avg"}).collect()[0][0]
    ts = term_stats(postings, n)
    tf_rows = tfsum_topk(queries, postings).collect()
    bm_rows = bm25_topk(queries, postings, dl, ts, avgdl).collect()
    return {"tfsum": tf_rows, "bm25": bm_rows, "n": n, "avgdl": avgdl}


def _by_query(rows):
    out = {}
    for r in rows:
        out.setdefault(r.query_id, []).append(r)
    for v in out.values():
        v.sort(key=lambda r: r.rank)
    return out


def test_tfsum_matches_model(spark_results, model):
    postings, _ = model
    got = _by_query(spark_results["tfsum"])
    for n, q in enumerate(corpus.REFERENCE_QUERIES, start=1):
        expected = tfsum_search(postings, q, k=10)
        qid = f"q{n:02d}-r01"
        got_pairs = [(r.url, r.score) for r in got.get(qid, [])]
        assert got_pairs == expected, f"query {n}: {q!r}"


def test_bm25_matches_model(spark_results, model):
    postings, dl = model
    got = _by_query(spark_results["bm25"])
    for n, q in enumerate(corpus.REFERENCE_QUERIES, start=1):
        expected = bm25_search(postings, dl, q, k=10)
        qid = f"q{n:02d}-r01"
        got_pairs = [(r.url, r.score) for r in got.get(qid, [])]
        assert [u for u, _ in got_pairs] == [u for u, _ in expected], (
            f"query {n} ranking: {q!r}"
        )
        for (gu, gs), (eu, es) in zip(got_pairs, expected):
            assert math.isclose(gs, es, rel_tol=1e-9), (n, gu, gs, es)


def test_reference_accuracy_proxy(spark_results):
    """P@10 by filename prefix, the reference's own metric. The corpus is
    built so documents query{n}document*.txt are relevant to query n."""
    got = _by_query(spark_results["tfsum"])
    accs = []
    for n in range(1, 11):
        qid = f"q{n:02d}-r01"
        hits = sum(
            1
            for r in got.get(qid, [])
            if r.url.startswith(f"https://example.org/query{n}document")
        )
        accs.append(hits / 10)
    # The reference engine itself does not hit 100% on every query; require
    # a sane aggregate rather than a flaky exact bar.
    assert sum(accs) / len(accs) >= 0.5, accs


def test_bm25_accuracy_not_worse_than_tfsum(spark_results):
    def acc(rows):
        got = _by_query(rows)
        total = 0
        for n in range(1, 11):
            qid = f"q{n:02d}-r01"
            total += sum(
                1
                for r in got.get(qid, [])
                if r.url.startswith(f"https://example.org/query{n}document")
            )
        return total / 100
    assert acc(spark_results["bm25"]) >= acc(spark_results["tfsum"]) - 0.05
