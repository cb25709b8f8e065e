"""Top-k BM25 serving over compressed segments: block-max MaxScore.

The fast path mandated by the north_rule ("block-max WAND over the
compressed postings"). The variant implemented is a vectorized
**block-max MaxScore** (term-at-a-time with an exactness proof), which
fits Arrow/numpy execution far better than doc-at-a-time pivoting while
skipping the same work — whole blocks of non-essential terms are never
decoded:

1. Terms sorted by global upper bound ``ub_t = qtf * idf * max_norm_t``
   (descending), where ``max_norm_t`` is derived at query time from the
   avgdl-independent per-block ``(max_tf, min_dl)`` bound pairs in the
   segment metadata (codec.py). Decode + accumulate exact scores into a
   dense per-bucket accumulator (``acc[doc_idx] += qtf * idf * norm``),
   term by term.
2. After each term, let θ = k-th largest accumulated score and
   ``rem`` = sum of the undecoded terms' ubs. Once θ >= rem, every doc
   not yet touched is provably out of the top-k (its max possible score
   < θ) — switch to the pruned phase.
3. Pruned phase: candidates = docs with ``acc + rem >= θ``. For each
   remaining term, only blocks that contain a candidate (located via the
   blockmeta ``last_docid`` fences with searchsorted — no decode) are
   decoded; their contributions are added. Docs outside the candidate
   set may receive partial scores, but by the dominance argument their
   true score < θ <= final k-th score, so restricting the final top-k to
   candidates is exact.
4. Final ranking key is (round(score, 6) DESC, url ASC) — identical to
   the brute-force oracle, making rank-identity well-defined under
   floating-point reassociation (SURVEY.md §7.4 determinism).

Scatter-gather shape (reference mode 4, ``src/processor.rs:146-369``,
re-expressed): queries broadcast to every doc-bucket partition; each
partition computes a local exact top-k (the reference's shard partials);
a final window aggregation merges per-bucket partials into the global
top-k (the reference's ``aggregate_result`` merge, ``src/lib.rs:190-226``,
which Catalyst plans as partial/final automatically).

Data access: ONE partition-pruned scan of the unified index table feeds
the per-bucket kernel — term rows filtered to the query vocabulary by an
int64 ``term_hash`` predicate (parquet-stats friendly), doc rows
(doc_idx, dl) riding the same scan. Everything flows through Spark's
data source (locality, pushdown); there is no executor-side filesystem
side-channel. The per-query-batch cost of shipping each bucket's dl
array is amortized over the whole query batch — batch serving scores
thousands of queries against one shipment. Inside the kernel, postings
are matched by the full term STRING (carried in the segment rows), so a
60-bit hash collision between a query term and another term in the
bucket cannot mis-score; the hash is only a pushdown filter.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.tokenize import query_tokens_py
from .scoring import TOP_K
from ..index.codec import BlockMeta, bm25_norm, decode_blocks, decode_postings
from ..index.segments import load_stats, read_docmeta, read_index


def maxscore_topk(
    term_entries: list[dict],
    dls: np.ndarray,
    avgdl: float,
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> list[tuple[int, float]]:
    """Exact top-k for one query over one bucket.

    term_entries: [{postings, blockmeta, idf, qtf}] for each query term
    present in the bucket. dls: dense doc_idx -> dl array for the bucket.
    Returns [(doc_idx, score)] ranked by (round(score,6) DESC, doc_idx ASC).
    """
    n_docs = len(dls)
    if not term_entries or n_docs == 0:
        return []

    entries = []
    for e in term_entries:
        meta = BlockMeta(e["blockmeta"])
        weight = e["qtf"] * e["idf"]
        ub = weight * float(meta.max_norms(avgdl, k1=k1, b=b).max())
        entries.append((ub, weight, meta, e["postings"]))
    entries.sort(key=lambda x: -x[0])
    ubs = np.array([e[0] for e in entries])

    acc = np.zeros(n_docs, dtype=np.float64)
    theta = -np.inf
    switch_at = len(entries)
    for i, (ub, weight, meta, postings) in enumerate(entries):
        rem = float(ubs[i:].sum())
        if theta >= rem:
            switch_at = i
            break
        ids, tfs = decode_postings(postings, meta)
        norms = bm25_norm(tfs, dls[ids], avgdl, k1=k1, b=b)
        acc[ids] += weight * norms
        kth = n_docs - k
        if kth >= 0 and np.count_nonzero(acc) >= k:
            theta = float(np.partition(acc, kth)[kth])

    if switch_at < len(entries):
        rem = float(ubs[switch_at:].sum())
        candidates = np.flatnonzero(acc + rem >= theta)
        for ub, weight, meta, postings in entries[switch_at:]:
            if len(candidates) == 0:
                break
            blocks = np.unique(
                np.searchsorted(meta.last_docids, candidates)
            )
            blocks = blocks[blocks < meta.n_blocks]
            if len(blocks) == 0:
                continue
            ids, tfs = decode_blocks(postings, meta, blocks)
            norms = bm25_norm(tfs, dls[ids], avgdl, k1=k1, b=b)
            acc[ids] += weight * norms
        pool = candidates
    else:
        pool = np.flatnonzero(acc)

    if len(pool) == 0:
        return []
    scores = np.round(acc[pool], 6)
    order = np.lexsort((pool, -scores))
    top = order[:k]
    return [(int(pool[i]), float(scores[i])) for i in top]


CANDIDATE_SCHEMA = StructType(
    [
        StructField("query_id", StringType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("doc_idx", LongType(), False),
        StructField("score", DoubleType(), False),
    ]
)


def wand_topk(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = TOP_K,
) -> DataFrame:
    """(query_id, rank, url, score) — block-max MaxScore over segments.

    Plan: one unified index scan (term rows pruned to the query
    vocabulary via an int64 predicate pushed to parquet; doc rows ride
    along) -> applyInPandas per bucket (local top-k) -> broadcast-join
    candidates to docmeta for url resolution -> window for the global
    top-k merge.
    """
    stats = load_stats(index_dir)
    avgdl, k1, b = stats["avgdl"], stats["k1"], stats["b"]

    qrows = queries.select("query_id", "query_string").collect()
    query_terms: dict[str, dict[str, int]] = {}
    for r in qrows:
        toks = query_tokens_py(r.query_string)
        qt: dict[str, int] = {}
        for t in toks:
            qt[t] = qt.get(t, 0) + 1
        query_terms[r.query_id] = qt
    all_terms = sorted({t for qt in query_terms.values() for t in qt})
    if not all_terms:
        return _empty_result(spark)

    ts = (
        spark.read.parquet(f"{index_dir}/termstats")
        .filter(F.col("term").isin(all_terms))
        .collect()
    )
    idf = {r.term: r.idf for r in ts}
    # Segments are keyed by the term's 60-bit md5-derived hash; termstats
    # carries the (term, term_hash) mapping for exactly the query
    # vocabulary, so the scan prunes on an int64 predicate (parquet stats
    # friendly). The hash is ONLY a filter — the kernel matches postings
    # by the full term string, so collisions cannot mis-score.
    term_hash = {r.term: r.term_hash for r in ts}
    bc = spark.sparkContext.broadcast(
        {"query_terms": query_terms, "idf": idf,
         "avgdl": avgdl, "k1": k1, "b": b, "k": k}
    )

    scan = (
        read_index(spark, index_dir)
        .filter(
            (F.col("kind") == 0)
            | (
                (F.col("kind") == 1)
                & F.col("term_hash").isin(list(term_hash.values()))
            )
        )
        .select("bucket", "kind", "doc_idx", "dl", "term", "postings", "blockmeta")
    )

    def run_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        cfg = bc.value
        bucket = int(pdf["bucket"].iloc[0])
        kinds = pdf["kind"].to_numpy()
        docs = pdf[kinds == 0]
        terms_pdf = pdf[kinds == 1]
        n_docs = len(docs)
        if n_docs == 0 or len(terms_pdf) == 0:
            return pd.DataFrame(
                columns=["query_id", "bucket", "doc_idx", "score"]
            ).astype({"bucket": "int32", "doc_idx": "int64", "score": "float64"})
        dls = np.zeros(n_docs, dtype=np.int64)
        dls[docs["doc_idx"].to_numpy(dtype=np.int64)] = docs["dl"].to_numpy(
            dtype=np.int64
        )
        by_term = {
            t: (p, m)
            for t, p, m in zip(
                terms_pdf["term"], terms_pdf["postings"], terms_pdf["blockmeta"]
            )
        }
        rows = []
        for qid, qt in cfg["query_terms"].items():
            entries = [
                {
                    "postings": by_term[t][0],
                    "blockmeta": by_term[t][1],
                    "idf": cfg["idf"][t],
                    "qtf": n,
                }
                for t, n in qt.items()
                if t in by_term and t in cfg["idf"]
            ]
            for doc_idx, score in maxscore_topk(
                entries, dls, cfg["avgdl"], cfg["k"], cfg["k1"], cfg["b"]
            ):
                rows.append((qid, bucket, doc_idx, score))
        return pd.DataFrame(
            rows, columns=["query_id", "bucket", "doc_idx", "score"]
        )

    candidates = scan.groupBy("bucket").applyInPandas(
        run_bucket, schema=CANDIDATE_SCHEMA
    )

    docmeta = read_docmeta(spark, index_dir).select("bucket", "doc_idx", "url")
    resolved = F.broadcast(candidates).join(docmeta, ["bucket", "doc_idx"])

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("url"))
    return (
        resolved.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "url", "score")
    )


def _empty_result(spark: SparkSession) -> DataFrame:
    schema = StructType(
        [
            StructField("query_id", StringType(), False),
            StructField("rank", IntegerType(), False),
            StructField("url", StringType(), False),
            StructField("score", DoubleType(), False),
        ]
    )
    return spark.createDataFrame([], schema)
