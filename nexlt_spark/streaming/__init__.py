from nexlt_spark.streaming.ingest import (  # noqa: F401
    start_transcript_stream,
    stream_ingest_available_now,
)
