"""Batch query scoring: tf-sum parity scorer and brute-force BM25 oracle.

Parity scorer (reference ``SearchLibrary::search``, ``src/lib.rs:374-411``):
``score(q, d) = sum over query-token occurrences of tf(token, d)`` — an
integer. Query tokens carry multiplicity (``src/lib.rs:379`` iterates the
token Vec), so a query term appearing twice doubles its contribution; we
aggregate query tokens to (term, qtf) and multiply.

BM25 oracle (SURVEY.md §7.3, the north-star scorer):
``score(q, d) = sum_t qtf(t) * idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
with k1=1.2, b=0.75, idf = ln(1 + (N-df+0.5)/(df+0.5)).

Ranking: score DESC, then url ASC — the deterministic tie-break the
reference lacks (its HashMap iteration order made ties nondeterministic,
``src/lib.rs:400-404``; SURVEY.md §1.4.6).

Plan shape (and why it scales):
- query tokenization + explode happens on a tiny DataFrame (10s-1000s of
  rows) → Spark auto-broadcasts it into the join with postings, so the
  big side never shuffles for the join (BroadcastHashJoin, postings
  streamed).
- the (query_id, url) score aggregation shuffles only rows that matched a
  query term — for k-term queries that's k posting lists, not the corpus.
- top-k per query via window row_number over the aggregated scores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.tokenize import query_tokens_col
from ..index.build import BM25_B, BM25_K1

TOP_K = 10  # reference's effective k (src/lib.rs:238, src/bin/test.rs:128)


def query_terms(queries: DataFrame) -> DataFrame:
    """(query_id, term, qtf) — query tokens with multiplicity collapsed
    into a count (equivalent to reference's per-occurrence iteration)."""
    return (
        queries.select(
            "query_id", F.explode(query_tokens_col("query_string")).alias("term")
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("qtf"))
    )


def _ranked(scored: DataFrame, k: int, score_col: str) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc(score_col), F.asc("url")
    )
    df = scored.withColumn("rank", F.row_number().over(w))
    return df.filter(F.col("rank") <= k).select(
        "query_id", "rank", "url", score_col
    )


def tfsum_topk(
    queries: DataFrame, postings: DataFrame, k: int = TOP_K
) -> DataFrame:
    """Parity scorer: (query_id, rank, url, score:int) — integer tf-sum.

    Matches reference ranking up to its nondeterministic tie order; ties
    here break url ASC.
    """
    qt = query_terms(queries)
    scored = (
        F.broadcast(qt)
        .join(postings, "term")
        .groupBy("query_id", "url")
        .agg(F.sum(F.col("qtf") * F.col("tf")).cast("long").alias("score"))
    )
    return _ranked(scored, k, "score")


def bm25_topk(
    queries: DataFrame,
    postings: DataFrame,
    doc_lengths: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    k: int = TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 oracle: (query_id, rank, url, score:double), brute force.

    This is the reference implementation the block-max WAND fast path must
    be rank-identical to (north_rule). Join order: tiny query-term set is
    broadcast against postings; term_stats rows for matched terms ride
    along; doc_lengths joins on url after the match-filter so only matched
    docs pay the join.
    """
    qt = query_terms(queries)
    # Restrict term_stats to query terms first (broadcast qt into the
    # term_stats scan), then broadcast the tiny (query_id, term, qtf, idf)
    # result into the postings scan — the corpus-sized side never shuffles
    # for either join. The dl join is the only big-big join; at index time
    # segments store dl inline (segments.py) so the WAND path avoids it.
    qt_idf = F.broadcast(qt).join(term_stats.select("term", "idf"), "term")
    matched = (
        F.broadcast(qt_idf)
        .join(postings, "term")
        .join(doc_lengths, "url")
    )
    contrib = matched.withColumn(
        "contrib",
        F.col("qtf")
        * F.col("idf")
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / float(avgdl))),
    )
    # Rank on the 6dp-rounded score: floating-point reassociation across
    # different plans (oracle vs WAND) must not flip near-tie ranks; below
    # 1e-6 the deterministic url ASC tie-break decides.
    scored = contrib.groupBy("query_id", "url").agg(
        F.round(F.sum("contrib"), 6).alias("score")
    )
    return _ranked(scored, k, "score")


def boolean_and_topk(
    queries: DataFrame,
    postings: DataFrame,
    doc_lengths: DataFrame,
    term_stats: DataFrame,
    avgdl: float,
    k: int = TOP_K,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Conjunctive (boolean AND) BM25 top-k: only documents containing
    EVERY query term are candidates; survivors rank by BM25.

    The reference is disjunctive-only (its HashMap scorer unions posting
    lists, ``src/lib.rs:374-411``); conjunctive mode is the other half
    of a fulltext engine's boolean surface. Semantics when a query term
    does not exist in the corpus: no document can satisfy the AND, so
    the query returns zero rows (the inner join to term_stats drops the
    term from scoring but ``n_terms`` still counts it, so no doc ever
    reaches the required match count).

    Plan: identical join shape to ``bm25_topk`` (tiny query set
    broadcast into postings — corpus side never shuffles for the join);
    the conjunction is one extra ``count(*)`` in the same (query_id,
    url) aggregate, filtered against a broadcast per-query term count.
    At scale this is strictly cheaper than the disjunctive scorer: the
    post-agg filter drops partial matches before the top-k window.
    """
    qt = query_terms(queries)  # distinct (query_id, term) + qtf
    n_terms = qt.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms")
    )
    qt_idf = F.broadcast(qt).join(term_stats.select("term", "idf"), "term")
    matched = (
        F.broadcast(qt_idf)
        .join(postings, "term")
        .join(doc_lengths, "url")
    )
    contrib = matched.withColumn(
        "contrib",
        F.col("qtf")
        * F.col("idf")
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / float(avgdl))),
    )
    # One row per (query_id, url, term) by construction (qt and postings
    # are both term-distinct), so count(*) IS the matched-term count.
    scored = contrib.groupBy("query_id", "url").agg(
        F.round(F.sum("contrib"), 6).alias("score"),
        F.count(F.lit(1)).cast("long").alias("n_matched"),
    )
    conj = (
        scored.join(F.broadcast(n_terms), "query_id")
        .filter(F.col("n_matched") == F.col("n_terms"))
        .select("query_id", "url", "score")
    )
    return _ranked(conj, k, "score")
