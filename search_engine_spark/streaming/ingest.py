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
compaction (:func:`compact_generations`) merges many small generations
into one WITHOUT re-reading any text: segments decode back to the
(url, term, tf, dl) relation and re-encode with union-global stats.

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
    """Complete generation directories, sorted by batch id.

    Completeness marker: ``stats.json``, which ``build_segments`` writes
    LAST — strictly after every bucket's lineage commit and the
    termstats write — so a generation listed here is never a partial
    index from a crashed micro-batch (the batch retry resumes and only
    then writes stats.json).
    """
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


def compact_generations(
    spark: SparkSession,
    out_dir: str,
    n_buckets: int = 16,
) -> str | None:
    """Merge all complete generations into ONE, restoring globally
    consistent BM25 stats (N, avgdl, idf over the union) — the remedy
    the per-generation-stats caveat in :func:`query_generations`
    documents.

    No text pass: each generation's segments are decoded back to the
    ``(url, term, tf, dl)`` relation (``read_postings_relation``) and
    re-encoded by ``build_segments_from_postings`` — compaction moves
    compressed-postings-sized data, exactly like a Lucene segment merge.
    The compacted index is built into a temp dir first, then swapped in
    under the highest existing batch id (streaming batch ids only grow,
    so the next micro-batch cannot collide). The swap (delete old gens,
    rename tmp) is not atomic across directories; a production deploy
    would gate readers on a manifest — documented trade-off.

    Returns the compacted generation directory (or the single existing
    one if there is nothing to merge).
    """
    import shutil

    from ..index.segments import (
        build_segments_from_postings,
        read_postings_relation,
    )

    gens = list_generations(out_dir)
    if not gens:
        return None
    if len(gens) == 1:
        return gens[0]
    union = read_postings_relation(spark, gens[0])
    for g in gens[1:]:
        union = union.unionByName(read_postings_relation(spark, g))
    max_id = max(int(Path(g).name.split("=")[1]) for g in gens)
    tmp = Path(out_dir) / ".compact-tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    build_segments_from_postings(
        spark, union, str(tmp), n_buckets=n_buckets,
        run_id=f"compact-{max_id}",
    )
    for g in gens:
        shutil.rmtree(g)
    dest = Path(out_dir) / f"gen={max_id}"
    tmp.rename(dest)
    return str(dest)


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
