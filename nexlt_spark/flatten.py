"""Transcripts → documents: flattening under stable turn ordering.

Reference semantics being re-expressed (see SURVEY.md §1.4, §2.2):

- one document per conversation turn (NeXLT: one Solr doc per segment,
  AthenaExportMt.java:454 / parseJSON.pl:330);
- ``doc_key = conv_id || ':' || turn_idx`` — the uniqueKey analog of the
  reference's ``id`` field (schema.xml:916,1033), upsert key;
- ``text_lc = lower(text)`` — the ``srclc`` sort/exact-match projection
  (schema.xml:926, AthenaExportMt.java:564);
- ``text`` is kept **byte-equal** to the source row (the north_star
  per-turn text equality invariant); the reference's ingest scrubs
  (newline scrub AthenaExportMt.java:456-458, whitespace collapse
  parseJSON.pl:307-320) are exposed as :func:`scrub_text` and applied
  *before* flattening when desired;
- dense monotone int ``doc_id`` assigned under stable (conv_id, turn_idx)
  global order — the docID that postings delta-encode against.

Stable docIDs at scale (SURVEY.md §7.4): a global window row_number would
funnel everything through one task. Instead:

1. ``repartitionByRange(P, conv_id, turn_idx)`` + ``sortWithinPartitions``
   — each partition holds a contiguous, sorted key range;
2. count rows per range-partition (P tiny rows to the driver);
3. ``doc_id = cumulative_offset[pid] + local_rank`` computed **JVM-side**:
   ``monotonically_increasing_id()`` is ``pid<<33 + row-index-in-iteration-
   order``, and iteration order of the sorted (and cached) partition IS the
   in-partition rank — so the id is a pure Column expression (offset map
   literal + bitmask), zero Python crossings. The previous ``mapInPandas``
   implementation round-tripped every text byte through Arrow just to add
   an integer — measurably the scarcest resource on a shared box (BENCH.md
   §5) and a wasted serialization pass on any cluster.

Because (conv_id, turn_idx) is a unique key, the resulting doc_id equals
the global rank of the key and is **invariant to where the sampled range
boundaries fall** — stable across runs, resumes, and parallelism levels.
The ranged DataFrame is persisted between the two passes so the sampled
boundaries are computed once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ORDER_COLS = ("conv_id", "turn_idx")

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("doc_key", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("text_lc", T.StringType(), True),
    ]
)


def scrub_text(col):
    """Newline scrub + horizontal/vertical whitespace collapse + trim.

    AthenaExportMt.java:456-458 (\\n\\r → space) and parseJSON.pl:316
    (collapse [\\h\\v]+ → single space).
    """
    return F.trim(F.regexp_replace(col, r"\s+", " "))


def assign_stable_ids(
    df: DataFrame, order_cols=ORDER_COLS, num_partitions: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add a dense 0-based long ``id_col`` equal to the global rank of
    ``order_cols`` (a unique key). Distributed; no global single-task sort.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    ranged = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {r["_pid"]: r["cnt"] for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # monotonically_increasing_id packs the in-partition index into the low
    # 33 bits; the offset arithmetic assumes no partition exceeds that
    if counts and max(counts.values()) >= (1 << 33):
        raise ValueError(
            "assign_stable_ids: a range partition holds >= 2^33 rows; "
            "raise num_partitions"
        )
    if not offsets:  # empty input: keep the map expression well-typed
        offsets = {0: 0}

    # literal pid → cumulative-offset map (P entries, P = shuffle partitions:
    # a constant-folded expression, not a join); local rank = the low 33 bits
    # of monotonically_increasing_id, valid because this projection runs in
    # the same stage as (and therefore iterates in the order of) the cached
    # sorted partition
    omap = F.create_map(
        *[F.lit(v) for pid in offsets for v in (pid, offsets[pid])]
    )
    out = (
        ranged.withColumn(
            id_col,
            (
                omap[F.col("_pid")]
                + F.monotonically_increasing_id().bitwiseAND(F.lit((1 << 33) - 1))
            ).cast(T.LongType()),
        )
        .drop("_pid")
    )
    return out


def flatten_transcripts(transcripts: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """transcripts (input_hint shape) → documents table (FIXTURES.md §2)."""
    with_ids = assign_stable_ids(transcripts, ORDER_COLS, num_partitions)
    return with_ids.select(
        F.col("doc_id"),
        F.concat_ws(":", F.col("conv_id"), F.col("turn_idx")).alias("doc_key"),
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role",
        "tool",
        "ts",
        F.col("text"),
        F.lower(F.col("text")).alias("text_lc"),
    )
