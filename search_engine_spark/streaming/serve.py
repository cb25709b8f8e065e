"""Structured Streaming query serving: the reference's submit/poll
servers re-expressed.

Reference shape (SURVEY.md §2 S2-S5): queries arrive continuously on a
TCP socket, are pushed through an MPMC channel to processor threads, and
results land in a poll-until-present mailbox keyed by query_id.

Streaming re-expression: a streaming DataFrame of
(query_id, query_string) rows — any source: file drop-dir, Kafka, rate —
is scored per micro-batch against the segment index with the same
block-max MaxScore path as batch serving, and appended to a parquet
results mailbox. "Polling" is a read of the mailbox filtered by
query_id; a result is present once its micro-batch commits (the
reference's poll loop maps to re-reading the mailbox table).

The reference's partial-result visibility mid-merge
(``src/processor.rs:219``) is deliberately NOT reproduced: a micro-batch
commits atomically, so pollers only ever see complete results
(documented divergence, SURVEY.md §2 Q7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def serve_stream(
    queries_stream: DataFrame,
    index_dir: str,
    mailbox_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    trigger: dict | None = None,
):
    """Score a stream of queries against the index; append results to a
    parquet mailbox. Returns the StreamingQuery."""

    from ..query.wand import wand_topk

    def _serve_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        result = wand_topk(spark, index_dir, batch_df, k=k)
        result.write.mode("append").parquet(mailbox_dir)

    writer = (
        queries_stream.writeStream.foreachBatch(_serve_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def poll_result(spark: SparkSession, mailbox_dir: str, query_id: str) -> DataFrame:
    """The poll endpoint: ranked rows for one query_id (empty DataFrame
    until the query's micro-batch has committed — the reference's
    "No result yet, check again..." state)."""
    from pyspark.sql import functions as F

    try:
        mailbox = spark.read.parquet(mailbox_dir)
    except Exception:
        return spark.createDataFrame(
            [], "query_id string, rank int, url string, score double"
        )
    return mailbox.filter(F.col("query_id") == query_id).orderBy("rank")
