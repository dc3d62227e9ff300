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

1. **Driver-chosen range boundaries** — a seeded, bounded sample of the
   order key (≤ ~10^5 tuples to the driver regardless of corpus size)
   yields ``num_partitions - 1`` quantile boundaries, fixed as literals;
2. ``_bucket`` = count of boundaries ≤ key (a single ``F.aggregate``
   fold over the literal boundary array — struct comparison gives the
   lexicographic order, no codegen blowup at high partition counts);
3. per-bucket counts (map-side-combined aggregate over the pruned
   order columns — the shuffle moves ``num_partitions`` rows, NOT the
   corpus) → cumulative offsets on the driver;
4. ``doc_id = offset[_bucket] + row_number() OVER (PARTITION BY _bucket
   ORDER BY key) - 1`` — ONE corpus-wide exchange (the window's hash
   partitioning), a per-bucket in-partition sort, zero Python crossings.

Because boundaries are driver-side literals, every job that evaluates
``_bucket`` sees the SAME partitioning by construction — nothing needs
to be cached to keep two passes consistent. (The previous implementation
relied on ``repartitionByRange``, whose per-execution sampling forces the
ranged corpus to be **persisted** between the count pass and the id
pass; that full-corpus cache competed with the builder's own caches for
executor storage — measured as 2-3x bimodal flatten times under
multi-executor memory pressure — and is simply impossible at 10^12
turns.) And because (conv_id, turn_idx) is a unique key, the resulting
doc_id equals the global rank of the key — invariant to where the
boundaries fall, to parallelism, and to re-execution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


SAMPLE_TARGET = 131_072  # boundary-sample size collected to the driver
SAMPLE_SEED = 42


def _bucket_col(df: DataFrame, order_cols, boundaries) -> Column:
    """Count of boundary tuples ≤ the row's key — the row's range-bucket
    index, as ONE ``F.aggregate`` fold over a literal boundary array
    (struct comparison = lexicographic key order). O(B) literals and O(B)
    per-row work in a single expression node, so a 10^4-partition build
    does not explode whole-stage codegen the way a 10^4-branch CASE
    chain would. Boundary fields are cast to each column's own type —
    struct comparison requires exact field-type agreement."""
    dtypes = [df.schema[c].dataType for c in order_cols]
    key = F.struct(*[F.col(c) for c in order_cols])
    lits = [
        F.struct(
            *[F.lit(v).cast(t).alias(c) for c, t, v in zip(order_cols, dtypes, b)]
        )
        for b in boundaries
    ]
    if len(lits) <= 256:
        # direct predicate sum: every comparison stays inside whole-stage
        # codegen (an F.aggregate HOF evaluates its lambda INTERPRETED per
        # element — measured ~60 s slower over a 4.5M-row double pass)
        out = F.lit(0)
        for b in lits:
            out = out + (key >= b).cast("int")
        return out
    return F.aggregate(
        F.array(*lits),
        F.lit(0),
        lambda acc, b: acc + F.when(key >= b, 1).otherwise(0),
    )


def assign_stable_ids(
    df: DataFrame, order_cols=ORDER_COLS, num_partitions: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add a dense 0-based long ``id_col`` equal to the global rank of
    ``order_cols`` (a unique key). Distributed; no global single-task
    sort, no corpus-scale cache (module docstring) — the corpus crosses
    exactly one exchange.

    Input contract: ``order_cols`` must be NON-NULL (checked — a null
    key has no defined rank and would poison both the driver-side
    boundary sort and the bucket fold) and ``df`` must be
    **deterministic across re-executions**: the boundary-sample job, the
    per-bucket count job, and the final id job each scan the source
    independently, so a non-deterministic upstream (unseeded ``sample``,
    ``limit`` over an unordered shuffle, a changing external table) can
    silently yield colliding or non-dense ids. Materialize such inputs
    first (write to parquet / ``localCheckpoint``).
    """
    spark = df.sparkSession
    if num_partitions is None:
        # 2x the shuffle width: buckets hash into the window's exchange,
        # so extra granularity smooths the balls-into-bins task skew a
        # bucket-count == partition-count mapping would have
        num_partitions = 2 * int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )

    keyed = df.select(*order_cols)  # pruned scans for sample + counts
    # one job yields the total AND per-column non-null counts: a null
    # order key would make the driver-side boundary sort raise (None vs
    # str) when sampled, or silently produce a null bucket when not
    counts_row = keyed.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.count(F.col(c)).alias(f"_nn_{i}") for i, c in enumerate(order_cols)],
    ).head()
    n = counts_row["_n"]
    for i, c in enumerate(order_cols):
        if counts_row[f"_nn_{i}"] != n:
            raise ValueError(
                f"assign_stable_ids: order column {c!r} contains "
                f"{n - counts_row[f'_nn_{i}']} null(s); the order key "
                "must be non-null (it is the unique-key contract)"
            )
    boundaries: list = []
    if n > 0 and num_partitions > 1:
        frac = min(1.0, SAMPLE_TARGET / n)
        sampled = sorted(
            tuple(r) for r in keyed.sample(False, frac, SAMPLE_SEED).collect()
        )
        if sampled:
            # num_partitions-1 quantile keys, deduped (duplicates merge
            # buckets — fewer, larger ranges, never wrong ids)
            raw = [
                sampled[(i * len(sampled)) // num_partitions]
                for i in range(1, num_partitions)
            ]
            boundaries = sorted(set(raw))

    bucket = _bucket_col(df, order_cols, boundaries) if boundaries else F.lit(0)
    counts = {
        r["_b"]: r["cnt"]
        for r in keyed.withColumn("_b", bucket)
        .groupBy("_b")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    offsets, acc = {}, 0
    for b in range(len(boundaries) + 1):
        offsets[b] = acc
        acc += counts.get(b, 0)
    # row_number() is IntegerType — a bucket must stay under 2^31 rows
    if counts and max(counts.values()) >= (1 << 31):
        raise ValueError(
            "assign_stable_ids: a range bucket holds >= 2^31 rows; "
            "raise num_partitions"
        )

    from pyspark.sql.window import Window

    omap = F.create_map(*[F.lit(v) for b in offsets for v in (b, offsets[b])])
    rank = F.row_number().over(
        Window.partitionBy("_b").orderBy(*[F.col(c) for c in order_cols])
    )
    return (
        df.withColumn("_b", bucket)
        .withColumn(id_col, (omap[F.col("_b")] + rank - F.lit(1)).cast(T.LongType()))
        .drop("_b")
    )


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
