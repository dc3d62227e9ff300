"""Stateful conversation sessionization — `applyInPandasWithState`.

The custom stateful operator the brief's streaming surface calls for,
over the shape this engine indexes: multi-turn transcripts arrive as a
stream of turns, a conversation's turns may be split across many
micro-batches, and downstream consumers (the incremental indexer, a
training-data exporter) want each conversation exactly once, AFTER it
has gone idle — not per-turn partials. That close-on-gap semantic is
not expressible as a windowed aggregation (a conversation is keyed by
conv_id, not by a time window; its duration is unbounded), so it is the
textbook case for per-key user state + event-time timers.

Reference analog: the reference batches whole conversations because its
cron exports run daily (athena2nexlt.sh:44 — yesterday's window is
"closed" by fiat); this operator closes conversations by observed
inactivity instead, which is the streaming-correct form of the same
contract.

Scale shape: state is keyed by conv_id, so it shards across executors
with the groupBy exchange; per-key state is O(1) (six counters — turn
texts are aggregated into the state, never buffered), and closed keys
are removed, so state size tracks LIVE conversations only, not corpus
size. Late turns are bounded by the caller's watermark delay: a turn
later than the watermark may arrive after its conversation closed and
would (correctly, loudly) open a fresh single-key session — the same
late-data contract as every watermarked Spark aggregation.
"""

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("n_user_turns", T.LongType(), False),
        T.StructField("total_chars", T.LongType(), False),
        T.StructField("started_at", T.TimestampType(), False),
        T.StructField("last_at", T.TimestampType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("n_user_turns", T.LongType(), False),
        T.StructField("total_chars", T.LongType(), False),
        T.StructField("started_ms", T.LongType(), False),
        T.StructField("last_ms", T.LongType(), False),
    ]
)


def _ms(ts, tz: str) -> int:
    """Epoch-ms of a tz-naive pandas timestamp that Arrow rendered in the
    SESSION timezone — it must be localized there before conversion, or
    every timer is offset by the zone offset (hours-early timeouts throw
    'timestamp cannot be earlier than the current watermark'; hours-late
    ones silently delay closes)."""
    return int(pd.Timestamp(ts).tz_localize(tz).value // 1_000_000)


def _from_ms(ms: int, tz: str) -> pd.Timestamp:
    """Inverse of _ms: a naive timestamp rendered in the session
    timezone, which is how Spark reinterprets returned naive values."""
    return pd.Timestamp(ms, unit="ms", tz="UTC").tz_convert(tz).tz_localize(None)


def sessionize_turns(
    turns: DataFrame,
    gap_seconds: int = 1800,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming turns -> one row per CLOSED conversation.

    A conversation closes when the event-time watermark passes its last
    turn's timestamp + ``gap_seconds`` (an event-time timer per key —
    no row ever needs to arrive for the close to fire: Spark runs
    no-data micro-batches to flush timed-out state). Emits
    ``SESSION_SCHEMA``; open conversations emit nothing.

    Works only on a streaming DataFrame (``applyInPandasWithState`` is
    streaming-only); the batch oracle is a plain groupBy — equivalence
    is asserted in tests/test_sessionize.py.
    """
    # captured driver-side and closed over: workers see tz-naive pandas
    # timestamps rendered in THIS zone (see _ms/_from_ms)
    session_tz = turns.sparkSession.conf.get("spark.sql.session.timeZone")

    def close_or_update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, nu, ch, fm, lm = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [n],
                    "n_user_turns": [nu],
                    "total_chars": [ch],
                    "started_at": [_from_ms(fm, session_tz)],
                    "last_at": [_from_ms(lm, session_tz)],
                }
            )
            return
        n = nu = ch = 0
        fm, lm = None, None
        if state.exists:
            n, nu, ch, fm, lm = state.get
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            nu += int((pdf["role"] == "user").sum())
            ch += int(pdf["text"].fillna("").str.len().sum())
            batch_first = _ms(pdf["ts"].min(), session_tz)
            batch_last = _ms(pdf["ts"].max(), session_tz)
            fm = batch_first if fm is None else min(fm, batch_first)
            lm = batch_last if lm is None else max(lm, batch_last)
        state.update((n, nu, ch, fm, lm))
        # the close timer: event-time, so it needs no further input for
        # this key — the watermark advancing (even via no-data batches)
        # fires it. setTimeoutTimestamp takes epoch-ms. Clamp to strictly
        # above the current watermark: applyInPandasWithState does NOT
        # drop late rows, so a straggler key whose lm + gap already fell
        # behind the watermark would otherwise throw ("timeout cannot be
        # earlier than watermark") and kill the query permanently — the
        # clamped session instead closes on the next watermark advance.
        timeout_ms = lm + gap_seconds * 1000
        wm_ms = state.getCurrentWatermarkMs()
        if wm_ms > 0 and timeout_ms <= wm_ms:
            timeout_ms = wm_ms + 1
        state.setTimeoutTimestamp(timeout_ms)
        # no output on the update path (yielding an empty frame would
        # also work, but trips pandas' empty-concat dtype deprecation)

    return (
        turns.withWatermark("ts", watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            close_or_update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def closed_sessions_batch(turns: DataFrame, as_of, gap_seconds: int = 1800) -> DataFrame:
    """The batch oracle: conversations whose last turn is more than
    ``gap_seconds`` before ``as_of`` (a timestamp standing in for the
    watermark), aggregated exactly as the streaming operator aggregates
    them. STRICT inequality, matching the streaming side: an event-time
    timer fires only when the watermark strictly exceeds the timeout
    timestamp, so a conversation whose last turn is exactly
    ``gap_seconds`` old is still OPEN in both forms."""
    from pyspark.sql import functions as F

    return (
        turns.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum((F.col("role") == "user").cast("long")).alias("n_user_turns"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("total_chars"),
            F.min("ts").alias("started_at"),
            F.max("ts").alias("last_at"),
        )
        .where(F.col("last_at") + F.expr(f"INTERVAL {int(gap_seconds)} SECONDS") < F.lit(as_of))
    )
