"""Stateful streaming sessionization (applyInPandasWithState): close-on-
gap semantics, cross-micro-batch state accumulation, and equivalence
with the batch groupBy oracle.
"""

import os
from datetime import datetime, timedelta

import pytest

from nexlt_spark.streaming.sessions import (
    SESSION_SCHEMA,
    closed_sessions_batch,
    sessionize_turns,
)
from nexlt_spark.synth import TRANSCRIPT_SCHEMA

T0 = datetime(2024, 1, 1, 10, 0, 0)
GAP = 1800


@pytest.fixture()
def dirs(tmp_path):
    return {
        "drop": str(tmp_path / "drop"),
        "ckpt": str(tmp_path / "ckpt"),
        "out": str(tmp_path / "out"),
    }


def _mk(spark, rows):
    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def _drop(df, drop_dir):
    df.coalesce(1).write.mode("append").parquet(drop_dir)


def _drain(spark, dirs, gap_seconds=GAP):
    reader = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(dirs["drop"])
    )
    q = (
        sessionize_turns(reader, gap_seconds=gap_seconds)
        .writeStream.format("parquet")
        .option("path", dirs["out"])
        .option("checkpointLocation", dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    if q.isActive:  # pragma: no cover
        q.stop()


def _sessions(spark, dirs):
    if not os.path.exists(dirs["out"]):
        return {}
    df = spark.read.schema(SESSION_SCHEMA).parquet(dirs["out"])
    return {r["conv_id"]: r for r in df.collect()}


def test_closes_on_gap_keeps_open_conversations(spark, dirs):
    _drop(
        _mk(
            spark,
            [
                ("A", 0, "user", "hello world", None, T0),
                ("A", 1, "assistant", "hi", None, T0 + timedelta(seconds=30)),
            ],
        ),
        dirs["drop"],
    )
    _drain(spark, dirs)
    assert _sessions(spark, dirs) == {}  # nothing past A's gap yet

    # a later turn advances the watermark past A's close timer; B stays open
    _drop(
        _mk(spark, [("B", 0, "user", "late conv", None, T0 + timedelta(hours=3))]),
        dirs["drop"],
    )
    _drain(spark, dirs)
    got = _sessions(spark, dirs)
    assert set(got) == {"A"}
    a = got["A"]
    assert a["n_turns"] == 2
    assert a["n_user_turns"] == 1
    assert a["total_chars"] == len("hello world") + len("hi")
    assert a["started_at"] == T0
    assert a["last_at"] == T0 + timedelta(seconds=30)


def test_non_utc_session_timezone(spark, dirs):
    # the timers must be correct when Arrow renders the session-local
    # naive timestamps in a non-UTC zone (regression: _ms used to
    # reinterpret them as UTC, offsetting every timeout by the zone
    # offset — west-of-UTC zones threw 'timestamp cannot be earlier
    # than the current watermark')
    old = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        _drop(
            _mk(
                spark,
                [
                    ("A", 0, "user", "hello", None, T0),
                    ("A", 1, "assistant", "hi", None, T0 + timedelta(seconds=30)),
                ],
            ),
            dirs["drop"],
        )
        _drop(
            _mk(spark, [("B", 0, "user", "late", None, T0 + timedelta(hours=3))]),
            dirs["drop"],
        )
        _drain(spark, dirs)
        got = _sessions(spark, dirs)
        assert set(got) == {"A"}
        assert got["A"]["started_at"] == T0
        assert got["A"]["last_at"] == T0 + timedelta(seconds=30)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_state_accumulates_across_micro_batches(spark, dirs):
    # conv C's turns arrive in two separate files (= two micro-batches,
    # maxFilesPerTrigger=1); the close must see the union
    _drop(_mk(spark, [("C", 0, "user", "part one", None, T0)]), dirs["drop"])
    _drop(
        _mk(
            spark,
            [
                ("C", 1, "tool", None, "bash", T0 + timedelta(seconds=60)),
                ("C", 2, "assistant", "done", None, T0 + timedelta(seconds=90)),
            ],
        ),
        dirs["drop"],
    )
    _drop(
        _mk(spark, [("Z", 0, "user", "sentinel", None, T0 + timedelta(hours=2))]),
        dirs["drop"],
    )
    _drain(spark, dirs)
    got = _sessions(spark, dirs)
    assert set(got) == {"C"}
    c = got["C"]
    assert c["n_turns"] == 3
    assert c["n_user_turns"] == 1
    assert c["total_chars"] == len("part one") + 0 + len("done")  # null text = 0
    assert c["started_at"] == T0
    assert c["last_at"] == T0 + timedelta(seconds=90)


def test_matches_batch_oracle(spark, dirs):
    # 12 convs with staggered activity; sentinel fixes the watermark.
    # Convs whose last turn is > GAP before the sentinel close; the rest
    # (and the sentinel itself) stay open. 60 s margins keep every conv
    # clear of the close boundary.
    sentinel_ts = T0 + timedelta(hours=6)
    rows = []
    for i in range(12):
        conv = f"c{i:02d}"
        start = T0 + timedelta(minutes=7 * i)
        n_turns = 2 + (i % 3)
        for t in range(n_turns):
            ts = start + timedelta(seconds=45 * t)
            if i >= 9:  # last three convs: recent activity, must stay open
                ts = sentinel_ts - timedelta(seconds=GAP - 60 - 45 * t)
            rows.append(
                (conv, t, "user" if t % 2 == 0 else "assistant", f"text {i} {t}", None, ts)
            )
    files = [rows[:10], rows[10:20], rows[20:]]
    for chunk in files:
        _drop(_mk(spark, chunk), dirs["drop"])
    _drop(_mk(spark, [("zz", 0, "user", "sentinel", None, sentinel_ts)]), dirs["drop"])
    _drain(spark, dirs)
    got = _sessions(spark, dirs)

    turns = _mk(spark, rows)
    want = {
        r["conv_id"]: r
        for r in closed_sessions_batch(turns, sentinel_ts, GAP).collect()
    }
    assert set(got) == set(want)
    assert set(got) == {f"c{i:02d}" for i in range(9)}
    for conv, w in want.items():
        g = got[conv]
        for f in ("n_turns", "n_user_turns", "total_chars", "started_at", "last_at"):
            assert g[f] == w[f], (conv, f)


def test_late_straggler_update_does_not_kill_query(spark, dirs):
    """A late row for a live key whose last_ts + gap already fell behind
    the watermark must not kill the query: applyInPandasWithState does
    not drop late input, so the update path would compute a timeout in
    the past ('timeout cannot be earlier than watermark' — fatal).
    The clamp closes the session on the next watermark advance instead.

    Batch 1 seeds A@T0 and B@T0+3h together, so the watermark jumps to
    T0+3h while A's timer is T0+gap. Batch 2 delivers a straggler A turn
    at T0+60s — its natural timeout (T0+60s+gap) is behind the watermark.
    Batch 3's C@T0+6h advances the watermark past the clamped timer, and
    the no-data flush closes A with BOTH turns."""
    _drop(
        _mk(
            spark,
            [
                ("A", 0, "user", "hello", None, T0),
                ("B", 0, "user", "watermark mover", None, T0 + timedelta(hours=3)),
            ],
        ),
        dirs["drop"],
    )
    _drop(
        _mk(spark, [("A", 1, "assistant", "late reply", None, T0 + timedelta(seconds=60))]),
        dirs["drop"],
    )
    _drop(
        _mk(spark, [("C", 0, "user", "advance again", None, T0 + timedelta(hours=6))]),
        dirs["drop"],
    )
    _drain(spark, dirs)
    got = _sessions(spark, dirs)
    assert set(got) == {"A", "B"}
    a = got["A"]
    assert a["n_turns"] == 2  # the straggler was folded in, not dropped
    assert a["last_at"] == T0 + timedelta(seconds=60)
    assert a["started_at"] == T0


def test_random_activity_matches_batch_oracle(spark, tmp_path):
    """Property fuzz: random conversation activity patterns, random
    micro-batch chunking (ts-ordered, so the watermark advances
    monotonically), and random SAME-CHUNK re-deliveries must aggregate
    exactly like the batch oracle fed the identical delivered multiset —
    the operator's contract is per-delivery counting, with idempotence
    handled upstream by the index's LWW ingest (ST5)."""
    import random

    rng = random.Random(20260820)
    for trial in range(2):
        d = {
            "drop": str(tmp_path / f"drop{trial}"),
            "ckpt": str(tmp_path / f"ckpt{trial}"),
            "out": str(tmp_path / f"out{trial}"),
        }
        sentinel_ts = T0 + timedelta(hours=8)
        rows = []
        n_convs = rng.randrange(8, 14)
        for i in range(n_convs):
            conv = f"f{trial}c{i:02d}"
            if rng.random() < 0.25:  # stays open: recent activity
                start = sentinel_ts - timedelta(seconds=GAP - 300)
            else:  # closes: ends well before sentinel - GAP
                start = T0 + timedelta(minutes=rng.randrange(0, 240))
            for t in range(rng.randrange(1, 5)):
                ts = start + timedelta(seconds=rng.randrange(30, 90) * t)
                rows.append(
                    (conv, t, rng.choice(["user", "assistant"]),
                     f"t{trial} {i} {t} " + "x" * rng.randrange(0, 40), None, ts)
                )
        rows.sort(key=lambda r: r[5])
        # random consecutive chunks + same-chunk duplicate injections
        chunks, i = [], 0
        while i < len(rows):
            j = min(len(rows), i + rng.randrange(3, 10))
            chunk = list(rows[i:j])
            if rng.random() < 0.5:
                chunk.append(rng.choice(chunk))  # re-delivery in-batch
            chunks.append(chunk)
            i = j
        delivered = [r for c in chunks for r in c]
        for chunk in chunks:
            _drop(_mk(spark, chunk), d["drop"])
        _drop(_mk(spark, [("zz", 0, "user", "sentinel", None, sentinel_ts)]), d["drop"])
        _drain(spark, d)
        got = _sessions(spark, d)

        want = {
            r["conv_id"]: r
            for r in closed_sessions_batch(
                _mk(spark, delivered), sentinel_ts, GAP
            ).collect()
        }
        assert set(got) == set(want), trial
        for conv, w in want.items():
            g = got[conv]
            for f in ("n_turns", "n_user_turns", "total_chars", "started_at", "last_at"):
                assert g[f] == w[f], (trial, conv, f)
