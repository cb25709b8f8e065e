"""Compressed index segments: build, checkpoint/resume, lineage, metrics.

Layout (parquet-backed; an Iceberg table would use the same schema with a
``bucket(n, url)`` partition transform — the sandbox has no Iceberg
runtime jars, so this is the documented fallback per SURVEY.md §7.4):

    <out_dir>/
      stats.json                 corpus stats: N, avgdl, n_buckets, k1, b
      docmeta/bucket=K/*.parquet (doc_idx, url, dl) per doc bucket
      segments/bucket=K/*.parquet(term, df, postings, blockmeta, encode_secs)
      termstats/*.parquet        (term, df, cf, idf) global
      lineage.parquet            one row per committed bucket per run
      metrics.parquet            per-bucket throughput/size rows

Partitioning choice: **documents** are hash-partitioned into buckets and
each bucket holds a full mini-index over its docs (local dense doc_idx).
Query serving scatters every query to all buckets and gathers per-bucket
top-k (reference mode 4 scatter-gather, ``src/processor.rs:146-369``, but
doc-sharded instead of term-sharded — doc sharding keeps per-partition
top-k semantics exact and is how web-scale engines shard). Skew: bucket
sizes are uniform by url-hash regardless of term distribution, so head
terms never concentrate a shuffle partition; the term-partitioned variant
with explicit head-term salting lives in ``term_merge.py``.

Scoring metadata is idf-free (per-block ``max_norm``); global idf comes
from ``termstats`` at query time, so the build needs no term-global join.

Checkpoint/resume (north_rule): each bucket is an idempotent unit. A
bucket is *committed* iff a lineage row exists for it; on resume,
uncommitted bucket directories (partial writes from a crash) are deleted
and only missing buckets are rebuilt — the per-bucket output is a pure
function of the input corpus, so a resumed build is identical to an
uninterrupted one (tested in tests/test_segments.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.tokenize import doc_tokens_col, doc_tokens_udf
from .build import BM25_B, BM25_K1
from .codec import bm25_norm, encode_postings_batch

SEGMENT_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("term_hash", LongType(), False),
        StructField("df", LongType(), False),
        StructField("postings", BinaryType(), False),
        StructField("blockmeta", BinaryType(), False),
        StructField("encode_secs", DoubleType(), True),
    ]
)

LINEAGE_SCHEMA = StructType(
    [
        StructField("run_id", StringType(), False),
        StructField("bucket", IntegerType(), False),
        StructField("status", StringType(), False),
        StructField("segment_path", StringType(), False),
        StructField("input_docs", LongType(), False),
        StructField("committed_at", DoubleType(), False),
    ]
)


def _bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")


_PHASE_LOG = os.environ.get("SEGMENTS_PHASE_LOG", "") == "1"


class _phase:
    """Optional phase timer (SEGMENTS_PHASE_LOG=1) for build diagnostics."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.monotonic()
        return self

    def __exit__(self, *exc):
        if _PHASE_LOG:
            print(
                f"[segments] {self.name}: {time.monotonic() - self.t0:.2f}s",
                file=sys.stderr,
                flush=True,
            )


def build_segments(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    run_id: str = "run-0",
    k1: float = BM25_K1,
    b: float = BM25_B,
    exact_unicode: bool = False,
    fail_after_buckets: int | None = None,
) -> dict:
    """Build (or resume) the compressed segment index for ``pages``.

    ``fail_after_buckets`` injects a crash after committing that many
    buckets — used by the resume test only.

    Returns a summary dict (buckets built, docs, elapsed).
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    t0 = time.monotonic()

    committed = _committed_buckets(spark, out)
    _clean_uncommitted(out, committed)

    tok = doc_tokens_udf(F.col("text")) if exact_unicode else doc_tokens_col("text")
    toks = pages.select("url", tok.alias("tokens")).withColumn(
        "bucket", _bucket_col(n_buckets)
    )

    # Pass 1 — docmeta for every missing bucket (even past a fail-injection
    # point, so corpus stats below are always computed over the FULL
    # corpus and resumed runs encode with identical avgdl/norms).
    missing = sorted(set(range(n_buckets)) - committed)
    if missing:
        with _phase("docmeta"):
            _write_docmeta(spark, toks, out, missing)
    # Lexicon (term string <-> xxhash64 key): segments carry only the
    # int64 hash in their hot path; the full-corpus lexicon is tiny
    # (map-side distinct collapses occurrences to the vocabulary before
    # the shuffle) and rebuilt idempotently whenever buckets change.
    if missing or not (out / "lexicon").exists():
        with _phase("lexicon"):
            _write_lexicon(spark, toks, out)

    # Corpus stats from docmeta — no extra tokenize pass over the corpus.
    stats_path = out / "stats.json"
    docmeta_all = spark.read.parquet(str(out / "docmeta"))
    with _phase("stats"):
        agg = docmeta_all.agg(
            F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
        ).collect()[0]
    n_docs, avgdl = int(agg["n"]), float(agg["avgdl"] or 0.0)
    stats = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "n_buckets": n_buckets,
        "k1": k1,
        "b": b,
    }
    stats_path.write_text(json.dumps(stats))

    todo = missing
    if fail_after_buckets is not None:
        todo = todo[:fail_after_buckets]
    if todo:
        with _phase("build_buckets"):
            _build_buckets(spark, toks, out, todo, n_buckets, avgdl, k1, b, run_id)

    # Global term stats (df summed across buckets) — rebuilt when complete.
    if len(_committed_buckets(spark, out)) == n_buckets:
        with _phase("termstats"):
            _write_termstats(spark, out, n_docs)

    elapsed = time.monotonic() - t0
    return {
        "built_buckets": len(todo),
        "n_docs": n_docs,
        "avgdl": avgdl,
        "elapsed_secs": elapsed,
        "docs_per_sec": (n_docs / elapsed) if elapsed > 0 else None,
    }


def _committed_buckets(spark: SparkSession, out: Path) -> set[int]:
    lineage = out / "lineage.parquet"
    if not lineage.exists():
        return set()
    rows = spark.read.parquet(str(lineage)).select("bucket").distinct().collect()
    return {r.bucket for r in rows}


def _clean_uncommitted(out: Path, committed: set[int]) -> None:
    for sub in ("segments", "docmeta"):
        base = out / sub
        if not base.exists():
            continue
        for d in base.glob("bucket=*"):
            try:
                b = int(d.name.split("=", 1)[1])
            except ValueError:
                continue
            if b not in committed:
                shutil.rmtree(d)


def _write_docmeta(spark, toks, out: Path, missing: list[int]) -> None:
    """Dense per-bucket doc_idx, deterministic (url-sorted within bucket)."""
    from pyspark.sql import Window

    dl_df = toks.filter(F.col("bucket").isin(list(missing))).select(
        "bucket", "url", F.size("tokens").cast("long").alias("dl")
    )
    w = Window.partitionBy("bucket").orderBy("url")
    docmeta = dl_df.withColumn(
        "doc_idx", (F.row_number().over(w) - 1).cast("long")
    ).select("bucket", "doc_idx", "url", "dl")
    docmeta.write.partitionBy("bucket").mode("append").parquet(
        str(out / "docmeta")
    )


def _build_buckets(
    spark, toks, out: Path, todo, n_buckets, avgdl, k1, b, run_id
) -> None:
    todo_set = set(todo)
    toks_f = toks.filter(F.col("bucket").isin(list(todo_set)))
    docmeta_r = spark.read.parquet(str(out / "docmeta")).filter(
        F.col("bucket").isin(list(todo_set))
    )

    # Single-shuffle plan for the corpus-sized data: join doc_idx at the
    # DOCUMENT level (one row per doc — a small join, never a
    # postings-sized sort-merge), explode to occurrences keyed by the
    # term's xxhash64 (fixed-width int64 — no strings in the big shuffle
    # or the Arrow hop; strings live in the tiny lexicon table), and move
    # them ONCE (repartition by bucket) into a cogrouped Arrow kernel
    # that does tf-counting + sort + batch-encode vectorized. tf
    # aggregation in the kernel instead of a groupBy avoids a second
    # corpus-sized shuffle+sort: Zipf-tail (doc, term) pairs are mostly
    # unique, so a pre-aggregation shuffle would carry ~the same rows.
    occurrences = (
        toks_f.join(docmeta_r.select("bucket", "url", "doc_idx"), ["bucket", "url"])
        .select("bucket", "doc_idx", F.explode("tokens").alias("term"))
        .select("bucket", "doc_idx", F.xxhash64("term").alias("th"))
        .repartition(len(todo_set), "bucket")
    )

    def encode_bucket(occ: pd.DataFrame, meta: pd.DataFrame) -> pd.DataFrame:
        t_start = time.monotonic()
        if occ.empty:
            return pd.DataFrame(
                {c: pd.Series(dtype=t)
                 for c, t in zip(
                     ["bucket", "term_hash", "df", "postings", "blockmeta", "encode_secs"],
                     ["int64", "int64", "int64", "object", "object", "float64"],
                 )}
            )
        bucket = int(occ["bucket"].iloc[0])
        th = occ["th"].to_numpy(dtype=np.int64)
        doc_idx = occ["doc_idx"].to_numpy(dtype=np.int64)
        order = np.lexsort((doc_idx, th))
        th_s = th[order]
        docs_s = doc_idx[order]
        # tf run-length over sorted (term, doc): one posting per run.
        new_run = np.concatenate(
            ([True], (th_s[1:] != th_s[:-1]) | (docs_s[1:] != docs_s[:-1]))
        )
        run_starts = np.flatnonzero(new_run)
        run_ends = np.concatenate((run_starts[1:], [len(th_s)]))
        p_th = th_s[run_starts]
        p_docs = docs_s[run_starts]
        p_tfs = (run_ends - run_starts).astype(np.int64)
        # dl lookup via the cogrouped docmeta (doc_idx is dense 0..n-1).
        dl_lookup = np.zeros(int(meta["doc_idx"].max()) + 1, dtype=np.int64)
        dl_lookup[meta["doc_idx"].to_numpy(dtype=np.int64)] = meta[
            "dl"
        ].to_numpy(dtype=np.int64)
        norms = bm25_norm(p_tfs, dl_lookup[p_docs], avgdl=avgdl, k1=k1, b=b)
        # Term-group bounds over the posting runs (hashes are sorted).
        t_change = np.flatnonzero(
            np.concatenate(([True], p_th[1:] != p_th[:-1]))
        )
        bounds = np.concatenate((t_change, [len(p_th)]))
        starts, ends = bounds[:-1], bounds[1:]
        encoded = encode_postings_batch(p_docs, p_tfs, norms, starts, ends)
        secs = time.monotonic() - t_start
        res = pd.DataFrame(
            {
                "bucket": np.full(len(starts), bucket, dtype=np.int64),
                "term_hash": p_th[starts],
                "df": (ends - starts).astype(np.int64),
                "postings": [e.postings for e in encoded],
                "blockmeta": [e.blockmeta for e in encoded],
                "encode_secs": np.full(len(starts), np.nan),
            }
        )
        if len(res):
            res.loc[res.index[0], "encode_secs"] = secs
        return res

    # Cogroup occurrences with docmeta per bucket. The explicit
    # repartition above is exempt from AQE partition coalescing (which
    # would otherwise fold Python-heavy buckets into too few tasks — this
    # stage's cost is per-posting Python/numpy work, not shuffle bytes).
    # Fresh read for the cogroup side: occurrences already embeds
    # docmeta_r in its lineage, and Spark flags the doc_idx self-join as
    # ambiguous if the same Dataset object appears on both sides.
    docmeta_cg = spark.read.parquet(str(out / "docmeta")).filter(
        F.col("bucket").isin(list(todo_set))
    )
    segments = (
        occurrences.groupBy("bucket")
        .cogroup(docmeta_cg.select("bucket", "doc_idx", "dl").groupBy("bucket"))
        .applyInPandas(encode_bucket, schema=SEGMENT_SCHEMA)
    )
    with _phase("encode+write"):
        segments.write.partitionBy("bucket").mode("append").parquet(
            str(out / "segments")
        )

    # Commit: lineage rows mark buckets durable; metrics ride along.
    seg_read = spark.read.parquet(str(out / "segments")).filter(
        F.col("bucket").isin(list(todo_set))
    )
    docs_per_bucket = {
        r.bucket: r.cnt
        for r in docmeta_r.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    now = time.time()
    lineage_rows = [
        (run_id, int(bkt), "committed", f"{out}/segments/bucket={bkt}",
         int(docs_per_bucket.get(bkt, 0)), now)
        for bkt in sorted(todo_set)
    ]
    spark.createDataFrame(lineage_rows, LINEAGE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(out / "lineage.parquet"))

    metrics = (
        seg_read.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("df").alias("n_postings"),
            (F.sum(F.length("postings")) + F.sum(F.length("blockmeta"))).alias(
                "segment_bytes"
            ),
            F.max("encode_secs").alias("encode_secs"),
        )
        .withColumn("run_id", F.lit(run_id))
    )
    docs_df = spark.createDataFrame(
        [(int(k), int(v)) for k, v in docs_per_bucket.items()], ["bucket", "input_docs"]
    )
    (
        metrics.join(docs_df, "bucket")
        .withColumn(
            "docs_per_sec", F.col("input_docs") / F.col("encode_secs")
        )
        .withColumn(
            "postings_per_sec", F.col("n_postings") / F.col("encode_secs")
        )
        .select(
            "run_id", "bucket", "input_docs", "n_terms", "n_postings",
            "segment_bytes", "encode_secs", "docs_per_sec", "postings_per_sec",
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(str(out / "metrics.parquet"))
    )


def _write_lexicon(spark: SparkSession, toks, out: Path) -> None:
    lex = (
        toks.select(F.explode(F.array_distinct("tokens")).alias("term"))
        .distinct()
        .select("term", F.xxhash64("term").alias("term_hash"))
        # Deterministic single sorted file: the resume test asserts
        # byte-identical indexes, and the table is vocabulary-sized.
        .repartition(1)
        .sortWithinPartitions("term")
    )
    lex.write.mode("overwrite").parquet(str(out / "lexicon"))


def _write_termstats(spark: SparkSession, out: Path, n_docs: int) -> None:
    seg = spark.read.parquet(str(out / "segments"))
    lex = spark.read.parquet(str(out / "lexicon"))
    ts = (
        seg.groupBy("term_hash")
        .agg(F.sum("df").cast("long").alias("df"))
        .join(lex, "term_hash")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .select("term", "term_hash", "df", "idf")
    )
    ts.write.mode("overwrite").parquet(str(out / "termstats"))


def load_stats(out_dir: str) -> dict:
    return json.loads((Path(out_dir) / "stats.json").read_text())


def read_segments(
    spark: SparkSession, out_dir: str, with_terms: bool = False
) -> DataFrame:
    seg = spark.read.parquet(f"{out_dir}/segments")
    if with_terms:
        seg = seg.join(
            F.broadcast(read_lexicon(spark, out_dir)), "term_hash"
        )
    return seg


def read_lexicon(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/lexicon")


def read_docmeta(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/docmeta")


def read_termstats(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/termstats")


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/lineage.parquet")


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/metrics.parquet")
