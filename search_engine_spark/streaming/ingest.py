"""Structured Streaming ingestion: continuous page arrival -> segment
index generations.

The reference rebuilds its whole in-memory index at startup and never
updates it (SURVEY.md §2.7 — no persistence, no incremental build). At
web scale the pages table grows continuously, so the rebuild offers an
incremental path: a stream of pages is indexed per micro-batch into a
*generation* subdirectory (``gen=<batch_id>``), each generation being a
complete, committed mini-index built by the same batch builder
(``segments.build_segments`` — lineage, metrics, resumability and all).

Serving unions generations: every generation is doc-disjoint by
construction (a page arrives in exactly one micro-batch), so per-bucket
top-k within each generation + the global top-k merge stays exact —
the same scatter-gather argument as multi-bucket serving. Generation
compaction (merging many small generations into one) is the same
``build_segments`` run over the union of their docmeta/url sets.

``foreachBatch`` is the right tool (vs a custom sink): the index build
is a multi-job batch dataflow (docmeta, lexicon, encode, commit), and
foreachBatch gives exactly-once per-batch semantics via the streaming
checkpoint + the builder's idempotent lineage commits.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from ..index.segments import build_segments


def index_stream(
    pages_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    n_buckets_per_gen: int = 16,
    trigger: dict | None = None,
):
    """Start the streaming index build; returns the StreamingQuery.

    ``pages_stream`` must be a streaming DataFrame with at least
    (url, text) columns (the canonical pages shape works as-is).
    """

    def _index_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        gen_dir = str(Path(out_dir) / f"gen={batch_id}")
        build_segments(
            batch_df.sparkSession,
            batch_df,
            gen_dir,
            n_buckets=n_buckets_per_gen,
            run_id=f"stream-batch-{batch_id}",
        )

    writer = (
        pages_stream.writeStream.foreachBatch(_index_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def list_generations(out_dir: str) -> list[str]:
    """Complete (stats.json present) generation directories, sorted."""
    base = Path(out_dir)
    if not base.exists():
        return []
    gens = []
    for d in sorted(base.glob("gen=*"), key=lambda p: int(p.name.split("=")[1])):
        if (d / "stats.json").exists():
            gens.append(str(d))
    return gens


def generation_stats(out_dir: str) -> dict:
    """Aggregate corpus stats over all generations (N, avgdl weighted)."""
    total_docs, dl_sum = 0, 0.0
    for g in list_generations(out_dir):
        s = json.loads((Path(g) / "stats.json").read_text())
        total_docs += s["n_docs"]
        dl_sum += s["avgdl"] * s["n_docs"]
    return {
        "n_docs": total_docs,
        "avgdl": (dl_sum / total_docs) if total_docs else 0.0,
        "n_generations": len(list_generations(out_dir)),
    }


def query_generations(
    spark: SparkSession,
    out_dir: str,
    queries: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Exact top-k over the union of generations.

    Per-generation local top-k is exact for that generation's docs;
    generations are doc-disjoint, so the global top-k is the k best of
    the per-generation candidates — one final window merge, identical in
    shape to the multi-bucket merge inside ``wand_topk``.

    Scoring caveat (documented): BM25 idf/avgdl are per-generation
    (each generation's termstats covers its own docs). A compaction run
    restores globally-consistent stats; the streaming path trades exact
    global idf for incremental availability, like segment-local stats in
    Lucene-style engines before merge.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..query.wand import wand_topk

    gens = list_generations(out_dir)
    if not gens:
        raise ValueError(f"no complete generations under {out_dir}")
    parts = [wand_topk(spark, g, queries, k=k) for g in gens]
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("url"))
    return (
        unioned.withColumn("grank", F.row_number().over(w))
        .filter(F.col("grank") <= k)
        .select("query_id", F.col("grank").cast("int").alias("rank"), "url", "score")
    )
