"""Faceted / metadata-filtered search units: planted facet counts,
filter pushdown to the scan, and filtered-vs-unfiltered consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.query.facets import facet_counts, filtered_tfsum_topk


def _docs(spark):
    rows = [
        (1, "spark shuffles data", "en", "web"),
        (2, "spark caches data", "en", "news"),
        (3, "der spark funke", "de", "web"),
        (4, "nothing relevant here", "en", "web"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def _queries(spark):
    return spark.createDataFrame(
        [("q1", "spark"), ("q2", "data"), ("q3", "zzz")],
        ["query_id", "query_string"],
    )


def test_facet_counts_planted(spark):
    got = {
        (r.query_id, r.facet, r.value): r.n_docs
        for r in facet_counts(_docs(spark), _queries(spark)).collect()
    }
    # q1 "spark" matches docs 1, 2, 3
    assert got[("q1", "lang", "en")] == 2
    assert got[("q1", "lang", "de")] == 1
    assert got[("q1", "source", "web")] == 2
    assert got[("q1", "source", "news")] == 1
    # q2 "data" matches docs 1, 2
    assert got[("q2", "lang", "en")] == 2
    assert ("q2", "lang", "de") not in got
    # q3 matches nothing -> absent entirely
    assert not any(k[0] == "q3" for k in got)


def test_filtered_topk_pushdown_and_semantics(spark, tmp_path):
    """The lang predicate reaches the parquet scan (PushedFilters), and
    the ranking equals the unfiltered scorer restricted to that lang."""
    path = str(tmp_path / "docs.parquet")
    _docs(spark).write.parquet(path)
    docs = spark.read.parquet(path)
    out = filtered_tfsum_topk(docs, _queries(spark), lang="en")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan.split("PushedFilters", 1)[1][:200], plan
    got = {(r.query_id, r.doc_id): (r.rank, r.score) for r in out.collect()}
    # doc 3 is German: excluded even though it contains "spark"
    assert ("q1", "3") not in got
    assert got[("q1", "1")] == (1, 1) and got[("q1", "2")] == (2, 1)
    assert got[("q2", "1")] == (1, 1) and got[("q2", "2")] == (2, 1)
