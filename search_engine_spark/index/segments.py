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
import shutil
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
from .codec import bm25_norm, encode_postings

SEGMENT_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("term", StringType(), False),
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

    # Corpus stats are global and cheap; recompute idempotently each run.
    stats_path = out / "stats.json"
    dl_df = toks.select(
        "bucket", "url", F.size("tokens").cast("long").alias("dl")
    )
    agg = dl_df.agg(
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

    todo = sorted(set(range(n_buckets)) - committed)
    if fail_after_buckets is not None:
        todo = todo[:fail_after_buckets]
    if todo:
        _build_buckets(spark, toks, dl_df, out, todo, n_buckets, avgdl, k1, b, run_id, n_docs)

    # Global term stats (df summed across buckets) — rebuilt when complete.
    if len(_committed_buckets(spark, out)) == n_buckets:
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


def _build_buckets(
    spark, toks, dl_df, out: Path, todo, n_buckets, avgdl, k1, b, run_id, n_docs
) -> None:
    from pyspark.sql import Window

    todo_set = set(todo)
    toks_f = toks.filter(F.col("bucket").isin(list(todo_set)))

    # Dense per-bucket doc_idx, deterministic (url-sorted within bucket).
    w = Window.partitionBy("bucket").orderBy("url")
    docmeta = (
        dl_df.filter(F.col("bucket").isin(list(todo_set)))
        .withColumn("doc_idx", (F.row_number().over(w) - 1).cast("long"))
        .select("bucket", "doc_idx", "url", "dl")
    )
    docmeta.write.partitionBy("bucket").mode("append").parquet(
        str(out / "docmeta")
    )
    docmeta_r = spark.read.parquet(str(out / "docmeta")).filter(
        F.col("bucket").isin(list(todo_set))
    )

    postings = (
        toks_f.select("bucket", "url", F.explode("tokens").alias("term"))
        .groupBy("bucket", "url", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        .join(docmeta_r.select("bucket", "url", "doc_idx", "dl"), ["bucket", "url"])
        .select("bucket", "term", "doc_idx", "tf", "dl")
    )

    def encode_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        t_start = time.monotonic()
        pdf = pdf.sort_values(["term", "doc_idx"], kind="mergesort")
        terms = pdf["term"].to_numpy()
        doc_idx = pdf["doc_idx"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        norms = bm25_norm(tfs, dls, avgdl=avgdl, k1=k1, b=b)
        # Segment boundaries per term (vectorized group detection).
        change = np.flatnonzero(
            np.concatenate(([True], terms[1:] != terms[:-1]))
        )
        bounds = np.concatenate((change, [len(terms)]))
        bucket = int(pdf["bucket"].iloc[0])
        out_rows = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            enc = encode_postings(doc_idx[s:e], tfs[s:e], norms[s:e])
            out_rows.append(
                (bucket, terms[s], int(e - s), enc.postings, enc.blockmeta, None)
            )
        secs = time.monotonic() - t_start
        res = pd.DataFrame(
            out_rows,
            columns=["bucket", "term", "df", "postings", "blockmeta", "encode_secs"],
        )
        if len(res):
            res.loc[res.index[0], "encode_secs"] = secs
        return res

    segments = postings.groupBy("bucket").applyInPandas(
        encode_bucket, schema=SEGMENT_SCHEMA
    )
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


def _write_termstats(spark: SparkSession, out: Path, n_docs: int) -> None:
    seg = spark.read.parquet(str(out / "segments"))
    ts = (
        seg.groupBy("term")
        .agg(F.sum("df").cast("long").alias("df"))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
    )
    ts.write.mode("overwrite").parquet(str(out / "termstats"))


def load_stats(out_dir: str) -> dict:
    return json.loads((Path(out_dir) / "stats.json").read_text())


def read_segments(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/segments")


def read_docmeta(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/docmeta")


def read_termstats(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/termstats")


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/lineage.parquet")


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/metrics.parquet")
