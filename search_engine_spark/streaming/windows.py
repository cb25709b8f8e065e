"""Watermarked event-time windowed aggregation — the Structured
Streaming shape of ``api_pipeline.q_event_window_counts``.

The batch gate groups by ``F.window("ts", "1 hour")``; this module runs
the SAME aggregate over a stream with a watermark, which buys the two
things batch can't express:

- **finalization**: in append output mode a window row is emitted
  exactly once, when the watermark passes its end — downstream sinks
  (parquet, Kafka, an Iceberg table) get immutable rows, no upserts.
- **late-data policy**: events older than ``watermark`` behind the
  max observed event time are DROPPED from their (already finalized)
  window instead of reopening state — the watermark bounds state size.

Scale notes (100 TB/day ingest): state is one row per (window,
event_type) per state-store partition, keyed by the same groupBy hash
partitioning as the batch gate's single Exchange — partial aggregation
happens map-side per micro-batch, so state-store traffic is the
aggregate deltas, not the events. Watermark eviction keeps the store to
O(windows-in-flight x event_types), independent of stream length.

Equivalence contract (tests/test_streaming.py): over a finite in-order
replay, the appended rows equal the batch gate minus windows the final
watermark never passed; a planted too-late event is excluded from its
window while the batch recompute (which has no lateness notion) counts
it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW = "1 hour"


def windowed_event_counts_stream(
    events_stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """(window_start, event_type, n_events, sum_value) — append-mode
    tumbling-window counts with late data dropped past ``watermark``.

    Column contract matches the batch gate (q_event_window_counts)
    minus max_k (kept identical where the semantics overlap so the
    batch/stream equivalence test can diff rows directly).
    """
    # Watermarks require TIMESTAMP event time; parquet event logs often
    # carry TIMESTAMP_NTZ — cast through the session timezone (UTC in
    # every deploy of this engine), same convention as the batch gate.
    events_stream = events_stream.withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", WINDOW), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value") + F.lit(1e-9), 6).alias("sum_value"),
        )
        .select(
            F.col("window").getField("start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
