"""Incremental index ingestion via Structured Streaming.

The reference is batch-only; at web scale a crawl arrives continuously, so
this module wires the posting-list builder into a ``foreachBatch`` sink:
each micro-batch of new pages is tokenized and appended as **partial
posting lists** (stage-1 shape, ``postings.PARTIAL_SCHEMA``) plus
per-partition stats rows. Periodic (or final) compaction replays the
stage-2 merge over all accumulated partials to produce the servable
block-max index — the same merge code path as the batch build, so streamed
and batch-built indexes are identical for identical input.

Why partials as the streaming unit: appends are blind (no read-modify-write
of existing posting lists, so no stateful store is needed), idempotent per
micro-batch id (checkpointed by Structured Streaming), and compaction cost
is amortized exactly like an LSM merge.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkforward.postings import (
    PostingIndex,
    STATS_TERM,
    _build_partials,
    merge_partials,
)


def stream_ingest(
    pages: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_once: bool = True,
    checkpoint_dir: str | None = None,
):
    """Attach the partial-postings sink to a streaming DataFrame.

    Returns the StreamingQuery. Each micro-batch appends stage-1 partials to
    ``<path>/partials`` (parquet, append-only); Structured Streaming's own
    checkpoint (``<path>/_stream_checkpoint``) makes re-delivery idempotent.
    """
    partial_dir = os.path.join(path, "partials")
    ckpt = checkpoint_dir or os.path.join(path, "_stream_checkpoint")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        partials = _build_partials(batch_df, id_col, text_col)
        # Structured Streaming's foreachBatch contract is at-least-once: a
        # crashed-and-replayed micro-batch re-delivers the same batch_id.
        # Writing each batch as its OWN partition with dynamic partition
        # overwrite makes the replay idempotent — the retry replaces its own
        # partition instead of appending a second copy that would
        # double-count tf/df/N/avgdl after compaction (tested).
        (
            partials.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(partial_dir)
        )

    writer = (
        pages.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """(window_start, event_type, n_events, sum_value, sum_k) — tumbling-
    window analytics over an event stream or batch table.

    One definition serves both execution modes: on a streaming DataFrame a
    watermark bounds state for late data (windows older than ``watermark``
    behind the max event time are finalized and dropped from state); on a
    batch DataFrame the same plan is a plain window aggregation, which is
    what the DuckDB oracle checks (time_bucket parity). ``sum_k`` pulls a
    typed field out of the semi-structured JSON ``props`` column JVM-side.
    """
    # parquet timestamps arrive as TIMESTAMP_NTZ; watermarks require the
    # instant type — the session timezone is pinned to UTC (session.py) so
    # the cast is a no-op re-interpretation, identical in both modes
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "sum_k",
        )
    )


def compact_streamed_index(
    spark: SparkSession, path: str, **build_kwargs
) -> PostingIndex:
    """Stage-2 merge over all streamed partials -> servable index.

    Feeds the accumulated partials through the batch builder's own
    ``merge_partials`` (same salting, block metadata, manifests) into
    ``<path>/index``.
    """
    partials = spark.read.parquet(os.path.join(path, "partials")).drop("batch_id")

    # Reconstitute global stats from the streamed stats rows
    g = (
        partials.filter(F.col("term") == STATS_TERM)
        .agg(
            F.sum("n").cast("double").alias("n_docs"),
            (F.sum("sum_dl").cast("double") / F.sum("n")).alias("avgdl"),
        )
        .collect()[0]
    )
    core = partials.filter(F.col("term") != STATS_TERM)
    return merge_partials(
        spark, core, os.path.join(path, "index"),
        n_docs=float(g["n_docs"]), avgdl=float(g["avgdl"]), **build_kwargs,
    )
