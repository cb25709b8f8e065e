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

from .build import BM25_B, BM25_K1
from .codec import bm25_norm, encode_postings_batch

SEGMENT_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("term_hash", LongType(), False),
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

    # Bucket layout — two modes:
    #   n_buckets > 0: url-hash bucketing (repartition + url sort) —
    #     deterministic under ANY input layout; used by tests/small runs.
    #   n_buckets = 0: map-side — each INPUT PARTITION is a bucket and
    #     the corpus-sized data NEVER shuffles (this is how doc-sharded
    #     web indexes actually build: every shard indexes its own docs
    #     locally; only vocabulary-sized aggregates cross the wire).
    part = pages.select("url", "text")
    if n_buckets and n_buckets > 0:
        part = part.repartition(n_buckets, "url").sortWithinPartitions("url")
    else:
        n_buckets = part.rdd.getNumPartitions()

    committed = _committed_buckets(spark, out)
    _clean_uncommitted(out, committed)

    # Pass 1 — docmeta for every missing bucket (even past a fail-injection
    # point, so corpus stats below are always computed over the FULL
    # corpus and resumed runs encode with identical avgdl/norms).
    # bucket = partition id; doc_idx = partition-local row position —
    # both deterministic for a fixed input layout, and identical to the
    # positions the Arrow encode kernel sees in pass 2 (same tokenizer
    # kernel, same row order).
    missing = sorted(set(range(n_buckets)) - committed)
    if missing:
        with _phase("docmeta"):
            _write_docmeta(part, out, missing)

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
            _build_buckets(spark, part, out, todo, avgdl, k1, b, run_id)

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


_MID_MASK = (1 << 33) - 1


def _arrow_tokens(text_array):
    """Arrow-side reference tokenizer: lower + Unicode-whitespace split.

    Returns (flat tokens Array, doc_of int64, dl int64 per doc) with
    empty edge tokens dropped (utf8_split_whitespace keeps them; the
    reference's split_whitespace does not).
    """
    import pyarrow.compute as pc

    toks = pc.utf8_split_whitespace(pc.utf8_lower(text_array))
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = toks.values
    raw_counts = np.diff(offsets)
    doc_of = np.repeat(np.arange(len(raw_counts), dtype=np.int64), raw_counts)
    nonempty = pc.greater(pc.utf8_length(flat), 0)
    if not pc.all(nonempty).as_py():
        flat = flat.filter(nonempty)
        doc_of = doc_of[nonempty.to_numpy(zero_copy_only=False)]
    dl = np.bincount(doc_of, minlength=len(raw_counts)).astype(np.int64)
    return flat, doc_of, dl


def _write_docmeta(part, out: Path, missing: list[int]) -> None:
    """Dense per-bucket doc_idx from partition-local row positions.

    mapInArrow kernel (no JVM regex: Java regexp_extract_all materializes
    a corpus-sized array of token strings on the JVM heap, and that
    allocation storm is what broke core-scaling); bucket = the partition
    id, doc_idx = the running row offset — exactly the positions the
    pass-2 encode kernel assigns by row order.
    """
    import pyarrow as pa

    schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("doc_idx", pa.int64()),
            ("url", pa.string()),
            ("dl", pa.int64()),
        ]
    )

    def dl_kernel(batches):
        from pyspark import TaskContext

        bucket = TaskContext.get().partitionId()
        pos = 0
        for rb in batches:
            url = rb.column(0)
            _, _, dl = _arrow_tokens(rb.column(1))
            n = len(url)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.full(n, bucket, dtype=np.int32)),
                    pa.array(np.arange(pos, pos + n, dtype=np.int64)),
                    url,
                    pa.array(dl),
                ],
                schema=schema,
            )
            pos += n

    docmeta = (
        part.filter(F.spark_partition_id().isin(list(missing)))
        .select("url", "text")
        .mapInArrow(
            dl_kernel,
            schema="bucket int, doc_idx long, url string, dl long",
        )
    )
    docmeta.write.partitionBy("bucket").mode("append").parquet(
        str(out / "docmeta")
    )


def _build_buckets(
    spark, part, out: Path, todo, avgdl, k1, b, run_id
) -> None:
    """Pass 2 — ZERO-SHUFFLE map-side indexing.

    Each partition (= bucket) of ``part`` flows through one mapInArrow
    kernel that does the whole per-bucket index build in Arrow/numpy:
    tokenize (pyarrow C++ utf8_lower + utf8_split_whitespace — string
    data never becomes Python objects), dictionary-encode terms,
    sort+run-length into (term, doc, tf) postings, BM25 norms from
    locally-computed doc lengths, and the batched varint/block-max
    encode. The corpus never crosses an exchange; the only shuffled
    relations in the whole build are vocabulary-sized (lexicon,
    termstats). This mirrors how doc-sharded web indexes scale: posting
    construction is embarrassingly parallel per shard.
    """
    import pyarrow as pa

    todo_set = set(todo)
    part_f = part.filter(F.spark_partition_id().isin(list(todo_set)))

    arrow_schema = pa.schema(
        [
            ("bucket", pa.int32()),
            ("term_hash", pa.int64()),
            ("term", pa.string()),
            ("df", pa.int64()),
            ("postings", pa.binary()),
            ("blockmeta", pa.binary()),
            ("encode_secs", pa.float64()),
        ]
    )

    def encode_partition(batches):
        import hashlib

        import pyarrow.compute as pc
        from pyspark import TaskContext

        t_start = time.monotonic()
        chunks = [rb.column(0) for rb in batches]
        if not chunks:
            return
        bucket = TaskContext.get().partitionId()
        text = pa.chunked_array(chunks).combine_chunks()
        flat, doc_of, dl = _arrow_tokens(text)
        if len(flat) == 0:
            return
        de = pc.dictionary_encode(flat)
        codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # One int64 sort key: (term code << 33) | doc position.
        key = (codes << 33) | doc_of
        key.sort()
        codes_s = key >> 33
        docs_s = key & _MID_MASK
        new_run = np.concatenate(([True], key[1:] != key[:-1]))
        run_starts = np.flatnonzero(new_run)
        run_ends = np.concatenate((run_starts[1:], [len(key)]))
        p_codes = codes_s[run_starts]
        p_docs = docs_s[run_starts]
        p_tfs = (run_ends - run_starts).astype(np.int64)
        norms = bm25_norm(p_tfs, dl[p_docs], avgdl=avgdl, k1=k1, b=b)
        t_change = np.flatnonzero(
            np.concatenate(([True], p_codes[1:] != p_codes[:-1]))
        )
        bounds = np.concatenate((t_change, [len(p_codes)]))
        starts, ends = bounds[:-1], bounds[1:]
        encoded = encode_postings_batch(p_docs, p_tfs, norms, starts, ends)
        # Term strings via Arrow take (no Python string materialization);
        # hash60 per DISTINCT term only (vocabulary-sized) — identical to
        # int(md5[:15], 16) everywhere else in the engine.
        seg_terms = de.dictionary.take(
            pa.array(p_codes[starts], type=pa.int32())
        )
        hashes = np.array(
            [
                int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                for t in seg_terms.to_pylist()
            ],
            dtype=np.int64,
        )
        secs = np.full(len(starts), np.nan)
        if len(secs):
            secs[0] = time.monotonic() - t_start
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.full(len(starts), bucket, dtype=np.int32)),
                pa.array(hashes),
                seg_terms,
                pa.array((ends - starts).astype(np.int64)),
                pa.array([e.postings for e in encoded], type=pa.binary()),
                pa.array([e.blockmeta for e in encoded], type=pa.binary()),
                pa.array(secs, from_pandas=True),  # NaN -> null
            ],
            schema=arrow_schema,
        )

    segments = part_f.select("text").mapInArrow(
        encode_partition, schema=SEGMENT_SCHEMA
    )
    with _phase("encode+write"):
        segments.write.partitionBy("bucket").mode("append").parquet(
            str(out / "segments")
        )

    # Commit: lineage rows mark buckets durable; metrics ride along.
    seg_read = spark.read.parquet(str(out / "segments")).filter(
        F.col("bucket").isin(list(todo_set))
    )
    docmeta_r = spark.read.parquet(str(out / "docmeta")).filter(
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
    # Vocabulary-sized aggregation over the compact segment parquet —
    # the ONLY shuffle in the whole build (term strings ride in the
    # dictionary-encoded segment column, so no corpus pass, no join).
    seg = spark.read.parquet(str(out / "segments"))
    ts = (
        seg.groupBy("term", "term_hash")
        .agg(F.sum("df").cast("long").alias("df"))
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
    spark: SparkSession, out_dir: str, with_terms: bool = True
) -> DataFrame:
    # term strings live in the segments themselves (parquet dictionary
    # encoding makes the column vocabulary-sized on disk); with_terms is
    # kept for API compatibility and simply no-ops.
    return spark.read.parquet(f"{out_dir}/segments")


def read_lexicon(spark: SparkSession, out_dir: str) -> DataFrame:
    """(term, term_hash) vocabulary — derived from segments."""
    return (
        spark.read.parquet(f"{out_dir}/segments")
        .select("term", "term_hash")
        .distinct()
    )


def read_docmeta(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/docmeta")


def read_termstats(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/termstats")


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/lineage.parquet")


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/metrics.parquet")
