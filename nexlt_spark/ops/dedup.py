"""Deduplication operators for large-scale training-data pipelines.

The reference dedups by uniqueKey upsert (schema.xml:1030-1033 — last
write wins). A 100 TB corpus pipeline needs content dedup too:

- exact: hash-groupBy on normalized text (one shuffle, map-side combine);
- fingerprint: hash of a token prefix (cheap near-dup blocking key);
- MinHash + LSH banding (minhash.py) for true near-dup at scale.

All pure Column ops — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicate_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (text_hash, dup_count, min_doc_id).

    Keyed by md5 so the shuffle key is 32 bytes, not the document —
    at 100 TB the groupBy never moves full texts.
    """
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min("doc_id").alias("keep_doc_id"))
        .where(F.col("dup_count") > 1)
    )


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the lowest doc_id per identical text (deterministic winner)."""
    w_min = (
        docs.select(F.md5(F.col(text_col)).alias("h"), F.col("doc_id"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return docs.join(w_min.select("doc_id"), "doc_id", "left_semi")


def prefix_fingerprint(docs: DataFrame, text_col: str = "text", n_tokens: int = 8):
    """Blocking fingerprint: md5 of the first n whitespace tokens.

    SQL-parity form (DuckDB): md5(array_to_string(toks[:n], ' ')).
    """
    toks = F.split(F.col(text_col), " ")
    return docs.withColumn(
        "fingerprint", F.md5(F.concat_ws(" ", F.slice(toks, 1, n_tokens)))
    )


def fingerprint_duplicate_groups(docs: DataFrame, text_col: str = "text", n_tokens: int = 8) -> DataFrame:
    fp = prefix_fingerprint(docs, text_col, n_tokens)
    return (
        fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min("doc_id").alias("keep_doc_id"))
        .where(F.col("dup_count") > 1)
    )
