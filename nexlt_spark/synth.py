"""Deterministic synthetic transcripts (the BASELINE.json input_hint shape).

Schema: (conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp).

Two generators, both fully deterministic and batch-/partition-independent
(every value is a pure function of the conversation number or of the
source row), so builds are reproducible across parallelism levels and
resumes — required by the resumability + stable-docID invariants
(SURVEY.md §7.4):

- :func:`synth_transcripts` — pure synthetic Zipf text (hot head terms to
  exercise skew salting; empty texts; unicode rows; >5000-char rows to
  exercise the reference's length cap, parseJSON.pl:313).
- :func:`transcripts_from_documents` — derives transcripts from the
  driver's read-only documents.parquet by splitting each document's text
  into turns; used to tie DuckDB-oracle data to the transcripts shape.

All generation is numpy-vectorized inside mapInPandas (no per-row Python
at the Spark row level; the per-conversation loop is bounded by turns per
conversation and runs on numpy arrays).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["bash", "search", "editor", "browser", None]

# Seeded vocabulary: a Zipf head of common "agent transcript" words plus a
# generated tail. Hot head terms (the/run/file/...) exercise posting skew.
_HEAD = (
    "the a to of and in run file test error code line data user tool call "
    "result value table query spark index search term score merge batch "
    "output input read write fast slow join sort key row scan filter"
).split()


def _vocab(size: int = 2000) -> np.ndarray:
    tail = [f"w{i:04d}" for i in range(size - len(_HEAD))]
    return np.array(_HEAD + tail)


def _zipf_cdf(n: int, s: float = 1.07) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1), s)
    return np.cumsum(w) / np.sum(w)


def _hash64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — deterministic uniform uint64 per input."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> np.uint64(31))


def _uniform(x: np.ndarray) -> np.ndarray:
    return (_hash64(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


_BASE_TS = np.datetime64("2026-01-01T00:00:00")


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    seed: int = 42,
    vocab_size: int = 2000,
    max_turn_tokens: int = 120,
) -> DataFrame:
    vocab = _vocab(vocab_size)
    cdf = _zipf_cdf(len(vocab))

    def gen(batches):
        for pdf in batches:
            # int64 wraparound IS the hash mixing here (deterministic on
            # every platform numpy supports) — errstate only silences the
            # overflow warning; it does not change a single generated
            # value. Entered per batch, around the computation and NOT
            # around the yield, so the suppression never stays active
            # while the generator is suspended (Arrow serialization
            # between batches runs with normal numpy error state).
            with np.errstate(over="ignore"):
                batch = _gen_batch(pdf)
            yield batch

    def _gen_batch(pdf):
            out = []
            for conv in pdf["id"].to_numpy():
                c = np.int64(conv) * np.int64(1_000_003) + np.int64(seed)
                n_turns = 3 + int(_hash64(np.array([c]))[0] % 14)
                idx = np.arange(n_turns, dtype=np.int64)
                rowkeys = c * np.int64(131) + idx
                # token count per turn: 0 (rare, empty) .. max_turn_tokens
                u_len = _uniform(rowkeys * np.int64(7) + np.int64(1))
                n_tok = np.maximum(1, (u_len * max_turn_tokens).astype(np.int64))
                n_tok[_uniform(rowkeys + np.int64(99)) < 0.02] = 0  # empty rows
                texts = []
                for i in range(n_turns):
                    k = int(n_tok[i])
                    if k == 0:
                        texts.append("")
                        continue
                    tok_keys = rowkeys[i] * np.int64(1_000_003) + np.arange(k, dtype=np.int64)
                    picks = np.searchsorted(cdf, _uniform(tok_keys))
                    words = vocab[picks]
                    txt = " ".join(words.tolist())
                    # sprinkle unicode + mixed case deterministically
                    h = int(_hash64(np.array([rowkeys[i]]))[0])
                    if h % 17 == 0:
                        txt = "Café Über " + txt
                    if h % 23 == 0:
                        txt = txt.upper()
                    if h % 401 == 0:
                        txt = txt + " x" * 3000  # >5000 chars (length-cap case)
                    texts.append(txt)
                roles = np.array(ROLES)[(idx % 4).astype(np.int64)]
                tools = [
                    TOOLS[int(t % 5)] for t in _hash64(rowkeys + np.int64(5)) % np.uint64(5)
                ]
                # wrap the per-conversation day offset so ts stays inside
                # pandas' ns-timestamp range at any corpus size
                ts = _BASE_TS + ((np.int64(conv) % 600) * 86_400 + idx * 37).astype(
                    "timedelta64[s]"
                )
                out.append(
                    pd.DataFrame(
                        {
                            "conv_id": f"conv-{int(conv):08d}",
                            "turn_idx": idx.astype(np.int32),
                            "role": roles,
                            "text": texts,
                            "tool": pd.array(tools, dtype=object),
                            "ts": ts,
                        }
                    )
                )
            return pd.concat(out) if out else pd.DataFrame(
                {f.name: pd.Series(dtype=object) for f in TRANSCRIPT_SCHEMA}
            )

    n_part = max(2, min(n_convs // 8, 64))
    return (
        spark.range(0, n_convs, numPartitions=n_part)
        .mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
    )


def transcripts_from_documents(
    spark: SparkSession, sf_dir: str, turn_tokens: int = 32
) -> DataFrame:
    """Split each documents.parquet row into a conversation of turns.

    Deterministic: turn j of doc d = tokens [j*turn_tokens, (j+1)*turn_tokens)
    of the whitespace-split text. conv_id = 'doc-<doc_id>'.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = F.split(F.col("text"), " ")
    n_turns = F.greatest(
        F.lit(1), F.ceil(F.size(words) / F.lit(turn_tokens)).cast("int")
    )
    df = docs.select(
        F.concat(F.lit("doc-"), F.col("doc_id")).alias("conv_id"),
        F.col("doc_id"),
        words.alias("words"),
        F.posexplode(F.sequence(F.lit(0), n_turns - 1)).alias("turn_idx", "_t"),
    )
    turn_text = F.concat_ws(
        " ", F.slice(F.col("words"), F.col("turn_idx") * turn_tokens + 1, turn_tokens)
    )
    return df.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.when(F.col("turn_idx") % 2 == 0, "user").otherwise("assistant").alias("role"),
        turn_text.alias("text"),
        F.when(F.col("turn_idx") % 5 == 0, "search").alias("tool"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(secs=F.col("doc_id") * 3600 + F.col("turn_idx") * 60)
        ).alias("ts"),
    )
