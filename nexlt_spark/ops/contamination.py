"""Benchmark contamination detection — test-set n-gram overlap.

The training-data op the dedup family doesn't cover: before training on
a web-scale corpus you must find documents that CONTAIN evaluation data
(GSM8K answers pasted into a blog post, MMLU questions in a forum dump),
which is an asymmetric containment problem, not near-duplication — a
10-page document holding one verbatim benchmark question has Jaccard
similarity ~0 to it and sails through every near-dup filter. The
standard remedy (e.g. the GPT-3 and Llama training reports) is n-gram
overlap: flag a (document, benchmark item) pair when they share at least
``min_hits`` distinct token n-grams, with n high enough (8-13) that
natural re-use is improbable.

Spark shape, sized for 10^12 turns vs a ~10^4-item benchmark:

1. both sides: tokens → n-gram shingles (`shingles_col`, the same JVM
   transform the MinHash family uses) → explode distinct → 8-byte
   ``xxhash64`` shingle keys (the string never crosses the exchange);
2. the benchmark side is a few-MB key set BY DEFINITION (benchmarks are
   small) — the join is a **broadcast** hash join against the corpus
   shingle stream, so the corpus is never shuffled on shingle;
3. the only aggregation is ``groupBy(doc_id, bench_id)`` over JOIN
   SURVIVORS — rows exist only for actual overlaps, so the shuffle is
   bounded by real contamination, not corpus size.

A 64-bit hash collision can produce a spurious single hit
(P ≈ 8·10⁻²⁰ per shingle pair); callers wanting certainty at
``min_hits=1`` re-verify flagged pairs textually — flagged volume is
tiny by construction.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexlt_spark.ops.minhash import shingles_col


def _shingle_hashes(
    df: DataFrame, out_id: str, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    """(out_id, n_shingles, shingle_hash) — distinct per doc, whole-stage
    codegen. Same [a-z0-9]+ tokenization as ops.textstats.tokens_col,
    applied to the caller's text column.

    ``n_shingles`` (the doc's distinct-shingle count) is computed
    ROW-LOCALLY — size of the distinct array before the explode — and
    carried on every shingle row. The alternative, a separate
    groupBy(id).count() over the exploded stream plus a join back, would
    re-shuffle the entire corpus once per call just to recover a number
    each row already knows; at 10^12 turns that aggregation IS the job.
    """
    # tokenize behind a projection boundary: the shingle transform's
    # lambda re-evaluates whatever expression `toks` is per GRAM (no CSE
    # across HOF lambda scopes), so the regex must be a materialized
    # column, not an inline expression — measured ~8x at sf0.1
    toked = df.select(
        F.col(id_col).alias(out_id),
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z0-9]+"), 0).alias("_t"),
    )
    return (
        toked.select(
            out_id,
            F.array_distinct(shingles_col(F.col("_t"), shingle_n)).alias("_sh"),
        )
        .where(F.size("_sh") > 0)
        .select(out_id, F.size("_sh").alias("n_shingles"), F.explode("_sh").alias("_s"))
        .select(out_id, "n_shingles", F.xxhash64("_s").alias("shingle_hash"))
    )


# auto mode force-broadcasts the benchmark side only when it holds at
# most this many ITEMS — real eval suites are 10^3-10^5 rows; anything
# larger is not "a benchmark" and gets the shuffled hash join instead
BROADCAST_MAX_BENCH_ITEMS = 200_000


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    shingle_n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast: bool | None = None,
) -> DataFrame:
    """Flag (corpus doc, benchmark item) pairs sharing ≥ ``min_hits``
    distinct token ``shingle_n``-grams.

    Returns (doc_id, bench_id, n_hits, doc_shingles, overlap_frac) where
    ``overlap_frac = n_hits / bench_shingles`` — the CONTAINMENT of the
    benchmark item in the document (1.0 = every n-gram of the item
    appears), which is the decontamination-relevant direction; Jaccard
    would divide by the big document and vanish.

    ``broadcast``: True forces the broadcast hash join (caller vouches
    the benchmark side fits executor memory), False forces the shuffled
    join on the 8-byte shingle key, and None (default) **size-gates**: a
    bounded ``limit(cap+1).count()`` probe of the benchmark row count
    (stops scanning at the cap — never a full pass over a large input)
    picks broadcast iff ≤ ``BROADCAST_MAX_BENCH_ITEMS`` items. The gate
    exists because the API accepts ANY DataFrame as "benchmark": an
    unconditional ``F.broadcast`` (the r3 behavior) would OOM every
    executor if a caller passed a corpus-sized frame, while the shuffled
    fallback degrades gracefully — the corpus shuffles 8-byte hashes,
    never text.
    """
    c = _shingle_hashes(corpus, "doc_id", id_col, text_col, shingle_n)
    b = _shingle_hashes(benchmark, "bench_id", bench_id_col, bench_text_col, shingle_n)
    if broadcast is None:
        probe = benchmark.select(bench_id_col).limit(BROADCAST_MAX_BENCH_ITEMS + 1)
        broadcast = probe.count() <= BROADCAST_MAX_BENCH_ITEMS
    b = b.withColumnRenamed("n_shingles", "bench_shingles")
    # per-side sizes ride on the shingle rows (see _shingle_hashes), so
    # the ONLY corpus-scale shuffle in the whole plan is the groupBy over
    # join survivors — bounded by actual contamination, never corpus size
    # (broadcast route; the shuffled route adds one 8-byte-key exchange)
    return (
        c.join(F.broadcast(b) if broadcast else b, "shingle_hash")
        .groupBy("doc_id", "bench_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.first("n_shingles").alias("doc_shingles"),
            F.first("bench_shingles").alias("_bs"),
        )
        .where(F.col("n_hits") >= min_hits)
        .select(
            "doc_id",
            "bench_id",
            "n_hits",
            "doc_shingles",
            (F.col("n_hits") / F.col("_bs")).alias("overlap_frac"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    shingle_n: int = 8,
    min_hits: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    broadcast: bool | None = None,
) -> DataFrame:
    """The corpus minus every document ``ngram_contamination`` flags —
    one left_anti join on doc_id (broadcast while the flagged set is
    small, which it is unless the corpus really does contain the
    benchmark wholesale)."""
    flagged = ngram_contamination(
        corpus, benchmark, shingle_n, min_hits,
        id_col, text_col, bench_id_col, bench_text_col, broadcast,
    ).select(F.col("doc_id").alias(id_col)).distinct()
    return corpus.join(flagged, id_col, "left_anti")
