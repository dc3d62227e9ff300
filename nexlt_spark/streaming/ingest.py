"""Structured Streaming ingest — the reference's incremental batch loop,
engine-native.

The reference has no streaming engine; its incremental semantics are a
cron window (athena2nexlt.sh:44: index yesterday..today) plus an mtime
watermark over a file drop (parseJSON.pl:412-416, tr2solr.sh
touch/rename), committing every N docs (AthenaExportMt.java:363-384).
The Spark-native form of exactly that contract:

    readStream(file source over the transcripts drop directory)
      -> foreachBatch(ingest_batch)            # index.incremental
      -> Trigger.AvailableNow                  # drain backlog, stop

- the file-source checkpoint replaces the mtime watermark file (exactly
  the `lastUpdateFile` role, but transactional);
- each micro-batch becomes one incremental index batch: new docIDs past
  all prior batches, tombstones for re-added doc_keys (upsert SO5),
  atomic manifest commit — so a crash between micro-batches resumes
  without double-indexing (the micro-batch is retried; ingest_batch
  appends a NEW batch only when the manifest rename committed);
- `Trigger.AvailableNow` = the daily-cron catch-up run; a processing-
  time trigger turns the same code into a continuous indexer.

Late/duplicate data: last-write-wins per (conv_id, turn_idx) WITHIN a
micro-batch via latest_by_key; ACROSS batches via tombstoning — i.e.
the same upsert lattice as Solr's uniqueKey re-add, ordered by arrival.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from nexlt_spark.index.incremental import ingest_batch
from nexlt_spark.synth import TRANSCRIPT_SCHEMA


def start_transcript_stream(
    spark: SparkSession,
    drop_dir: str,
    index_path: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
    on_batch: Optional[Callable] = None,
):
    """Start the streaming indexer over a parquet drop directory.

    Returns the StreamingQuery; caller awaits termination. Each
    micro-batch commits one incremental index batch under
    ``index_path`` (see index.incremental for layout and query-time
    liveDocs masking).
    """
    reader = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.load(drop_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        res = ingest_batch(batch_df, index_path, build_id=f"stream-{batch_id}")
        if on_batch is not None:
            on_batch(batch_id, res)

    writer = stream.writeStream.foreachBatch(handle).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_ingest_available_now(
    spark: SparkSession,
    drop_dir: str,
    index_path: str,
    checkpoint_dir: str,
    timeout_sec: int = 600,
) -> None:
    """Drain every unprocessed file in ``drop_dir`` into the incremental
    index, then stop — the cron-job form. Idempotent across calls: the
    stream checkpoint remembers which files were already indexed."""
    q = start_transcript_stream(
        spark, drop_dir, index_path, checkpoint_dir, available_now=True
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
