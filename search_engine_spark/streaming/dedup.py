"""Streaming exact deduplication — the Structured Streaming shape of
``pipeline.dedup.exact_dups``.

A crawl ingest stream re-fetches the same page endlessly (mirrors,
trackers-stripped reposts, captures of unchanged urls); the batch gate
answers "which docs are duplicates" after the fact, this module keeps
duplicates OUT of the downstream pipeline as they arrive:

- :func:`dedup_stream` — ``dropDuplicates`` on the content hash:
  exact first-seen-wins dedup across the whole stream. State is one
  entry per distinct content hash, forever — the exact-global
  contract fundamentally requires it (a doc arriving years later can
  still be a dup). Use when the key universe fits state (or the state
  store is RocksDB-backed and sized for it).
- :func:`dedup_stream_within_watermark` —
  ``dropDuplicatesWithinWatermark``: the bounded-state production
  variant. Duplicates are only suppressed while their first sighting
  is within the watermark horizon; state older than the horizon is
  evicted, so state size is O(distinct keys per horizon), independent
  of stream length. This is the crawl contract in practice: re-fetches
  cluster in time, and anything beyond the horizon is the batch
  compaction's job (the same split as the reference's in-memory index
  vs its persisted segments — build fast online, reconcile offline).

Content identity matches the batch gate exactly: md5 over
whitespace-normalized lowercase text (``pipeline.dedup.content_hash_col``
— the literal same expression object, not a copy), so a
batch re-run over the survivor stream finds zero duplicates — the
equivalence contract tested in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..pipeline.dedup import content_hash_col


def _with_content_hash(docs: DataFrame) -> DataFrame:
    # the SAME expression as batch exact_dups — single definition, so
    # the batch/stream equivalence contract can't silently drift
    return docs.withColumn("content_hash", content_hash_col())


def dedup_stream(docs_stream: DataFrame) -> DataFrame:
    """First-seen-wins exact dedup over the whole stream.

    Emits each distinct content exactly once (the first arrival);
    later duplicates are suppressed by the dropDuplicates state store.
    Over an in-doc_id-order replay this equals the batch gate's
    survivor set (canonical = min doc_id = first seen).
    """
    return _with_content_hash(docs_stream).dropDuplicates(["content_hash"])


def dedup_stream_within_watermark(
    docs_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Bounded-state dedup: suppress re-arrivals within ``watermark``
    of the first sighting's event time; evict older state.

    Requires an event-time column ``ts`` on the stream. The watermark
    bounds BOTH late data and state: a duplicate landing beyond the
    horizon is re-emitted (and left for offline compaction), which is
    the explicit trade a 100 TB/day ingest makes to keep the state
    store horizon-sized.

    Eviction timing note (observable in the test): the watermark a
    micro-batch's data advances only takes effect in the NEXT batch,
    and end-of-batch eviction runs after that batch's dedup checks —
    so expired state disappears one batch after the watermark passes
    it, never mid-batch.
    """
    docs_stream = docs_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        _with_content_hash(docs_stream)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
