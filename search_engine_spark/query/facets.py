"""Faceted / metadata-filtered search over the documents corpus.

The reference's data model is text-only (pages carry no metadata,
``/root/reference/src/lib.rs:341-343``); a fulltext tier over a real
corpus always pairs ranked retrieval with (a) facet counts — "how do my
matches distribute over language / source?" — and (b) metadata-filtered
ranking — "top-k, English only". Both are re-expressed here over the
engine's own matching semantics (doc-side whitespace tokenizer,
query-side ``\\w+`` — the reference's asymmetric contract).

Plan shapes (and the 100 TB argument):

- ``facet_counts``: query terms broadcast into the postings join
  (BroadcastHashJoin, corpus side streams), matched (query, doc) pairs
  dedup with map-side partial aggregation, the facet explosion is a
  2-row ``stack`` per match, and the final count groups on a
  low-cardinality (query, facet, value) key — partial-aggregated to
  almost nothing before the only small shuffle.
- ``filtered_tfsum_topk``: the metadata predicate is applied to the
  *source relation before tokenization*, so Catalyst pushes it into the
  parquet scan (PushedFilters, plan-asserted in tests) — at 100 TB with
  a lang-partitioned layout this is partition pruning, i.e. the scan
  reads only the filtered language's bytes, not the corpus. Everything
  downstream (postings build, broadcast query join, top-k window) then
  runs on the reduced corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.build import build_postings
from .scoring import query_terms, tfsum_topk

FILTER_LANG = "en"  # the gate's frozen metadata predicate


def facet_counts(docs: DataFrame, queries: DataFrame) -> DataFrame:
    """(query_id, facet, value, n_docs) — for each query, the count of
    matching documents (>= 1 query term present under the engine's
    tokenizer contract) per language and per source facet."""
    corpus = docs.select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )
    postings = build_postings(corpus)
    qt = query_terms(queries).select("query_id", "term")
    matched = (
        F.broadcast(qt)
        .join(postings, "term")
        .select("query_id", "url")
        .distinct()
    )
    meta = docs.select(
        F.col("doc_id").cast("string").alias("url"), "lang", "source"
    )
    return (
        matched.join(meta, "url")
        .select(
            "query_id",
            F.expr(
                "stack(2, 'lang', lang, 'source', source) AS (facet, value)"
            ),
        )
        .groupBy("query_id", "facet", "value")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )


def filtered_tfsum_topk(
    docs: DataFrame, queries: DataFrame, lang: str = FILTER_LANG, k: int = 10
) -> DataFrame:
    """(query_id, rank, doc_id, score) — tf-sum top-k restricted to
    documents whose ``lang`` equals the predicate; the filter sits on
    the source relation so it reaches the parquet scan."""
    corpus = docs.filter(F.col("lang") == lang).select(
        F.col("doc_id").cast("string").alias("url"), "text"
    )
    postings = build_postings(corpus)
    out = tfsum_topk(queries, postings, k=k)
    return out.select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        F.col("url").alias("doc_id"),
        F.col("score").cast("long").alias("score"),
    )


def sql_facet_counts(query_values: str) -> str:
    """DuckDB mirror of :func:`facet_counts` (same tokenizer contract)."""
    return rf"""
WITH toks AS (
    SELECT doc_id::VARCHAR AS doc_id,
           unnest(regexp_extract_all(lower(text), '[^\s]+')) AS term
    FROM documents
),
postings AS (
    SELECT term, doc_id FROM toks GROUP BY term, doc_id
),
q(query_id, query_string) AS (VALUES
    {query_values}
),
qterms AS (
    SELECT DISTINCT query_id,
           unnest(regexp_extract_all(lower(query_string), '\w+')) AS term
    FROM q
),
matched AS (
    SELECT DISTINCT query_id, doc_id
    FROM qterms JOIN postings USING (term)
),
fac AS (
    SELECT m.query_id, 'lang' AS facet, d.lang AS value
    FROM matched m JOIN documents d ON d.doc_id::VARCHAR = m.doc_id
    UNION ALL
    SELECT m.query_id, 'source' AS facet, d.source AS value
    FROM matched m JOIN documents d ON d.doc_id::VARCHAR = m.doc_id
)
SELECT query_id, facet, value, count(*)::BIGINT AS n_docs
FROM fac GROUP BY 1, 2, 3
"""


def sql_filtered_tfsum_topk(
    query_values: str, lang: str = FILTER_LANG, k: int = 10
) -> str:
    """DuckDB mirror of :func:`filtered_tfsum_topk`."""
    return rf"""
WITH toks AS (
    SELECT doc_id::VARCHAR AS doc_id,
           unnest(regexp_extract_all(lower(text), '[^\s]+')) AS term
    FROM documents WHERE lang = '{lang}'
),
postings AS (
    SELECT term, doc_id, count(*)::BIGINT AS tf
    FROM toks GROUP BY term, doc_id
),
q(query_id, query_string) AS (VALUES
    {query_values}
),
qtok AS (
    SELECT query_id,
           unnest(regexp_extract_all(lower(query_string), '\w+')) AS term
    FROM q
),
qterms AS (
    SELECT query_id, term, count(*)::BIGINT AS qtf
    FROM qtok GROUP BY query_id, term
),
scored AS (
    SELECT query_id, doc_id, sum(qtf * tf)::BIGINT AS score
    FROM qterms JOIN postings USING (term)
    GROUP BY query_id, doc_id
),
ranked AS (
    SELECT query_id,
           row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id ASC
           )::INTEGER AS rank,
           doc_id, score
    FROM scored
)
SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= {k}
"""
