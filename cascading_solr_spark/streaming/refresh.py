"""Structured Streaming extensions.

The reference is strictly batch (flush/commit/optimize lifecycle,
core/SolrWriter.java:101-128) — SURVEY.md §2.3 marks streaming absent.  These
are the forward-looking extensions a Spark-native engine gets nearly for
free:

* incremental_index_refresh — foreachBatch appending posting DELTAS for new
  documents into the same postings layout (shard dirs).  Queries see new docs
  after each micro-batch; global stats (N, avgdl, df) are refreshed from the
  docs table per batch.  Exactly-once per micro-batch comes from
  checkpointing + idempotent parquet task commits.
* windowed_event_counts — watermarked tumbling-window aggregation over an
  event stream (the standard streaming-analytics shape, included for
  operator-surface completeness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cascading_solr_spark.spec import IndexSpec


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (works on both a
    streaming and a batch DataFrame — batch ignores the watermark)."""
    # parquet event times may load as TIMESTAMP_NTZ; watermarks require
    # TIMESTAMP (session tz is pinned UTC, so the cast is value-preserving)
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window(ts_col, window), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def incremental_index_refresh(
    stream: DataFrame,
    spec: IndexSpec,
    index_dir: str,
    checkpoint_dir: str,
) -> StreamingQuery:
    """Append posting deltas for newly arriving documents into ONE coherent
    index (indexing/append.py): per-batch doc_ids are assigned above the
    current max, posting rows append into the live shard dirs, and global
    stats (N, avgdl, dict df) refresh atomically — queries see the new docs
    after each micro-batch with EXACT BM25 scores (identical to a
    from-scratch build of the union corpus; asserted in
    tests/test_streaming.py).  The first batch bootstraps the index via
    build_index.  Lucene-analogy: each micro-batch is a new segment;
    ``compact_index`` plays the optimize() role (core/SolrWriter.java:112).

    Replay semantics: foreachBatch is AT-LEAST-ONCE — a crash after the
    append but before the checkpoint commit replays the epoch.  Each epoch
    id is therefore recorded in meta.applied_batches when its append fully
    commits, and a replayed epoch whose id is already recorded is skipped
    (idempotent).  A crash MIDWAY through an append can still leave partial
    batch rows that the replay would duplicate; that window is documented in
    indexing/append.py (recover by rebuild or generation restore) rather
    than papered over.
    """
    import os

    from cascading_solr_spark.indexing.append import append_documents
    from cascading_solr_spark.indexing.build import build_index

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        if os.path.exists(os.path.join(index_dir, "meta.json")):
            append_documents(
                spark, index_dir, batch_df, batch_id=f"epoch-{epoch_id}"
            )
        else:
            build_index(spark, batch_df, spec, index_dir)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
