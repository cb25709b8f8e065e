"""Salted two-phase term merge (SURVEY.md §5.2.7): salted == unsalted,
and both decode to the uncompressed postings relation with dense global
doc ids."""

from __future__ import annotations

import pytest

from search_engine_spark import corpus
from search_engine_spark.index.build import build_postings
from search_engine_spark.index.codec import decode_postings
from search_engine_spark.index.term_merge import build_term_index, global_doc_ids

pytestmark = pytest.mark.skipif(
    not corpus.reference_available(), reason="reference corpus not present"
)


@pytest.fixture(scope="module")
def pages(spark):
    # Reference corpus + Zipfian filler so head terms exercise salting.
    ref = corpus.reference_pages(spark)
    filler = corpus.synth_pages(spark, 300, seed=42, partitions=8)
    df = ref.unionByName(filler).cache()
    df.count()
    return df


def _index_content(df):
    return sorted(
        (r.term, r.df, bytes(r.postings), bytes(r.blockmeta))
        for r in df.collect()
    )


def test_salted_equals_unsalted(spark, pages):
    salted = _index_content(build_term_index(spark, pages, n_salts=8))
    unsalted = _index_content(build_term_index(spark, pages, n_salts=1))
    assert salted == unsalted


def test_merged_decodes_to_relation(spark, pages):
    ids = {r.url: r.doc_id for r in global_doc_ids(spark, pages).collect()}
    # global ids are dense 0..N-1
    assert sorted(ids.values()) == list(range(len(ids)))
    rel = {}
    for r in build_postings(pages).collect():
        rel.setdefault(r.term, {})[ids[r.url]] = r.tf
    merged = build_term_index(spark, pages, n_salts=4).collect()
    assert {r.term for r in merged} == set(rel)
    for r in merged:
        got_ids, got_tfs = decode_postings(bytes(r.postings), bytes(r.blockmeta))
        assert dict(zip(got_ids.tolist(), got_tfs.tolist())) == rel[r.term], r.term
        assert got_ids.tolist() == sorted(got_ids.tolist())
