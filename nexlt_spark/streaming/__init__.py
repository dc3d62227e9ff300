from nexlt_spark.streaming.ingest import (  # noqa: F401
    start_transcript_stream,
    stream_ingest_available_now,
)
from nexlt_spark.streaming.sessions import (  # noqa: F401
    closed_sessions_batch,
    sessionize_turns,
)
