"""Block-Max WAND top-k over the blocked postings index (SURVEY.md M4).

The reference's Lucene core collects top-k with a priority queue over
doc-at-a-time scorers; modern Lucene prunes with Block-Max WAND using
per-block max-score skip data (the `solrconfig.xml:151` codecFactory's
postings format carries the skip lists). Our blocked table already
stores the per-block metadata (`max_tfnorm`, `first_doc_id`,
`last_doc_id`, codec in nexlt_spark.index.codec) — this module is the
distributed BM-WAND that uses it.

Distributed formulation (no doc-at-a-time cursor; set algebra instead):

1. **θ probe** — decode only the globally highest-upper-bound blocks
   (`ub = idf_t · max_tfnorm`, `orderBy(ub desc).limit(16·|T|)` =
   TakeOrderedAndProject over block *metadata*, never postings), fold
   partial scores. Partial sums of non-negative contributions are lower
   bounds of exact scores, so θ = k-th best partial is a valid pruning
   threshold.
2. **Block pruning with a MaxScore essential split** — terms whose
   ascending-gm prefix sum stays below θ are non-essential (a doc made
   only of them cannot reach θ; Turtle & Flood 1995); keep block b of
   an ESSENTIAL term t iff `ub_b + Σ_{t'≠t} gm_{t'} ≥ θ` (gm = per-term
   global max ub). Any doc with exact score ≥ θ contains ≥1 essential
   term and appears in ≥1 kept block: for its argmax essential term t*,
   that block's ub dominates c_{t*} and the other terms' gm dominate
   the rest.
3. **Candidates** — docs of kept blocks (∩ fq doc_filter). Collected to
   the driver iff ≤ candidate_cap (the Lucene collector analog —
   driver-side orchestration of a bounded set); else exact fallback.
4. **Exact rescore** — decode only blocks whose docID range intersects
   the candidate *slices* (doc_id >> slice_shift; numpy searchsorted
   inside mapInPandas — blocks that skip all candidate ranges are never
   decoded), keep candidate rows, and fold with the SAME
   `fold_scores` as the exact path ⇒ rank identity by construction.

AND mode drives candidates from the rarest term (classic
conjunction-by-smallest-list; `CGI/corpus.cgi:338` AND semantics): its
postings are decoded in full, other terms only where slices intersect;
arity is enforced on the full rescored rows, so θ-probing (whose OR
partials would over-estimate the k-th AND score) is not needed.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexlt_spark.index.blocks import DECODED_SCHEMA, BlockedIndex
from nexlt_spark.index.codec import decode_block_rows
from nexlt_spark.query.exact import EMPTY_SCORED_SCHEMA, fold_scores, idf_map_col
from nexlt_spark.scoring import idf

DEFAULT_CANDIDATE_CAP = 500_000
DEFAULT_SLICE_SHIFT = 12  # candidate-range granularity: 4096 docIDs
PROBE_BLOCKS_PER_TERM = 16


def _adaptive_slice_shift(n_docs: int, n_candidates: int) -> int:
    """Candidate-slice granularity sized to the candidate density.

    The skip-list jump drops a block iff its [first,last] docID range
    intersects no candidate slice; with the fixed 4096-doc slice a few
    thousand candidates over a 10^7+-doc corpus mark ~every slice and
    nothing skips. Target slices covering ~1/20 of the docID space
    (width ≈ n_docs / (20·n_cand)), clamped to [64, 4096]: correctness
    never depends on the width (decoded rows are still masked to exact
    candidate membership), only decode volume does.
    """
    if n_candidates <= 0:
        return DEFAULT_SLICE_SHIFT
    width = max(1, n_docs // (20 * n_candidates))
    return max(6, min(DEFAULT_SLICE_SHIFT, width.bit_length() - 1))


def _decode_filtered(
    blocks: DataFrame,
    keep_doc_ids=None,
    slice_shift: int = DEFAULT_SLICE_SHIFT,
) -> DataFrame:
    """Decode block rows → (term, doc_id, tf, dl); optionally restricted.

    keep_doc_ids: a Spark Broadcast of a sorted int64 array (broadcast
    ONCE per query, not serialized into every task closure). Blocks whose
    [first,last] docID range intersects no candidate slice are SKIPPED
    (never decoded) — this is the skip-list jump, vectorized over the
    Arrow batch; decoded rows are then masked to exact candidate
    membership (np.isin on a sorted array).
    """
    sel = blocks.select("term", "n", "first_doc_id", "last_doc_id", "doc_ids", "tfs", "dls")

    def dec(batches):
        if keep_doc_ids is not None:
            keep = keep_doc_ids.value
            slices = np.unique(keep >> np.int64(slice_shift))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if keep_doc_ids is not None:
                # skip-list jump: drop blocks whose docID range intersects
                # no candidate slice BEFORE any decode happens
                lo = pdf["first_doc_id"].to_numpy(np.int64) >> np.int64(slice_shift)
                hi = pdf["last_doc_id"].to_numpy(np.int64) >> np.int64(slice_shift)
                hits = np.searchsorted(slices, hi, "right") > np.searchsorted(slices, lo, "left")
                pdf = pdf[hits]
                if len(pdf) == 0:
                    continue
            block_of, ids, tfs, dls = decode_block_rows(
                [bytes(x) for x in pdf["doc_ids"]],
                [bytes(x) for x in pdf["tfs"]],
                [bytes(x) for x in pdf["dls"]],
                pdf["n"].to_numpy(),
            )
            ids = ids.astype(np.int64)
            terms = pdf["term"].to_numpy()[block_of]
            if keep_doc_ids is not None:
                m = np.isin(ids, keep, assume_unique=False)
                if not m.any():
                    continue
                ids, tfs, dls, terms = ids[m], tfs[m], dls[m], terms[m]
            yield pd.DataFrame(
                {
                    "term": terms,
                    "doc_id": ids,
                    "tf": tfs.astype(np.int32),
                    "dl": dls.astype(np.int32),
                }
            )

    return sel.mapInPandas(dec, schema=DECODED_SCHEMA)


def _query_blocks(bidx: BlockedIndex, present: List[str], idfs: Optional[dict] = None) -> DataFrame:
    """Block rows for the query terms, bucket-pruned, with ub column."""
    b = bidx.blocks
    if bidx.n_buckets and "term_bucket" in b.columns:
        buckets = sorted({_bucket(t, bidx.n_buckets) for t in present})
        b = b.where(F.col("term_bucket").isin(buckets))
    b = b.where(F.col("term").isin(present))
    if idfs is not None:
        b = b.withColumn("ub", idf_map_col(idfs) * F.col("max_tfnorm"))
    return b


# per-term block-ub quantile grid kept in the metadata cache — the
# planner's histogram of how block upper bounds distribute within a term
META_QUANTS = (0.0, 0.1, 0.25, 0.5, 0.75, 0.9)


def _term_meta(bidx: BlockedIndex, qterms: List[str]) -> dict:
    """(df, max_tfnorm, n_blocks, tfnorm_quantiles) per present query
    term — ONE metadata-only job for cache misses, memoized on the index
    object.

    Replaces two separate driver jobs (term_stats collect + per-term
    groupBy(max(ub)) collect): df (Σ block n), the per-term global max
    tfnorm, the block count, and the block-max-tfnorm quantile sketch all
    come from the same block-metadata aggregate, and repeated queries
    against the same index skip the job entirely (the Lucene
    TermStates/collection-statistics cache analog). The quantile sketch
    feeds the driver-side WAND-vs-exact planner (query.planner) with an
    estimate of how many blocks a θ cut would keep — no postings touched.
    """
    cache = getattr(bidx, "_term_meta_cache", None)
    if cache is None:
        cache = {}
        bidx._term_meta_cache = cache
    missing = [t for t in qterms if t not in cache]
    if missing:
        rows = (
            _query_blocks(bidx, missing)
            .groupBy("term")
            .agg(
                F.sum("n").cast("long").alias("df"),
                F.max("max_tfnorm").alias("mtf"),
                F.count(F.lit(1)).alias("nb"),
                F.percentile_approx(
                    "max_tfnorm", F.array(*[F.lit(q) for q in META_QUANTS]), 1000
                ).alias("qs"),
            )
            .collect()
        )
        found = {
            r["term"]: (int(r["df"]), float(r["mtf"]), int(r["nb"]), tuple(r["qs"]))
            for r in rows
        }
        for t in missing:
            cache[t] = found.get(t)  # None = absent from the index
    return {t: cache[t] for t in qterms if cache.get(t) is not None}


def _bucket(term: str, n_buckets: int) -> int:
    """pmod(xxhash64(term), n_buckets) computed driver-side.

    Matches Spark's xxhash64 (XXH64 over utf8 bytes, seed=42) used by
    save_blocked_index, so term→bucket partition pruning needs no Spark
    job (parity asserted in tests/test_wand.py)."""
    return _xxh64(term.encode("utf-8"), 42) % n_buckets


_PRIME64_1 = 0x9E3779B185EBCA87
_PRIME64_2 = 0xC2B2AE3D27D4EB4F
_PRIME64_3 = 0x165667B19E3779F9
_PRIME64_4 = 0x85EBCA77C2B2AE63
_PRIME64_5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _PRIME64_2) & _M
    return (_rotl(acc, 31) * _PRIME64_1) & _M


def _xxh64(data: bytes, seed: int) -> int:
    """Pure-Python XXH64 (public algorithm, Yann Collet's spec)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _PRIME64_1 + _PRIME64_2) & _M
        v2 = (seed + _PRIME64_2) & _M
        v3 = seed & _M
        v4 = (seed - _PRIME64_1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _PRIME64_1 + _PRIME64_4) & _M
    else:
        h = (seed + _PRIME64_5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h = ((_rotl(h ^ _round(0, int.from_bytes(data[i : i + 8], "little")), 27) * _PRIME64_1) + _PRIME64_4) & _M
        i += 8
    if i <= n - 4:
        h = ((_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _PRIME64_1) & _M), 23) * _PRIME64_2) + _PRIME64_3) & _M
        i += 4
    while i < n:
        h = ((_rotl(h ^ ((data[i] * _PRIME64_5) & _M), 11) * _PRIME64_1)) & _M
        i += 1
    h ^= h >> 33
    h = (h * _PRIME64_2) & _M
    h ^= h >> 29
    h = (h * _PRIME64_3) & _M
    h ^= h >> 32
    # Spark's xxhash64 yields a signed long; pmod makes it non-negative.
    signed = h - (1 << 64) if h >= (1 << 63) else h
    return signed


MAX_JVM_SLICE_FILTER = 4096


def _slice_prefilter(blocks: DataFrame, cand_ids: np.ndarray, slice_shift: int) -> DataFrame:
    """JVM-side skip-list jump: drop block rows whose [first,last] docID
    range intersects no candidate slice BEFORE the payload bytes cross
    the Arrow hop (the in-kernel searchsorted skip only avoids decode,
    not transfer). An F.exists over the slice-id array literal — O(rows ×
    n_slices) JVM lambda evals, so gated to ≤ MAX_JVM_SLICE_FILTER slices;
    above that the kernel-side skip alone is the right plan anyway
    (dense candidates ⇒ nothing to skip)."""
    slices = np.unique(cand_ids >> np.int64(slice_shift))
    if slices.size == 0 or slices.size > MAX_JVM_SLICE_FILTER:
        return blocks
    arr = F.array(*[F.lit(int(s)) for s in slices.tolist()])
    lo = F.shiftright(F.col("first_doc_id"), slice_shift)
    hi = F.shiftright(F.col("last_doc_id"), slice_shift)
    return blocks.where(F.exists(arr, lambda s: (s >= lo) & (s <= hi)))


def _est_covered_fraction(n_docs: int, n_cand: int, slice_shift: int) -> float:
    """Upper-bound estimate of the docID-space fraction candidate slices
    cover — the driver-side signal for how much the rescore's skip-list
    jump will actually skip."""
    if n_docs <= 0:
        return 1.0
    return min(1.0, (n_cand << slice_shift) / float(n_docs))


# when candidate slices cover less than this fraction of the docID space,
# the rescore takes the shuffle-free rows path (decode+mask in place via
# mapInPandas; only masked posting rows — ≤ |candidates|·|terms| — reach
# the fold's exchange). Above it, most blocks decode anyway and the
# per-range kernel (one payload exchange, fold fused) is the better plan.
ROWS_RESCORE_COVERAGE = 0.3


def _rescore(
    bidx, blocks_q, present, idfs, avgdl, n_required, bc, slice_shift,
    covered: float = 1.0, rescore: str = "auto",
):
    """Candidate-restricted exact rescore — two plans, chosen by the
    estimated slice coverage:

    - **rows** (sparse candidates, the WAND design case at scale): decode
      + slice-skip + mask happen inside mapInPandas on the scan — NO
      shuffle of block payloads; the fold's groupBy exchanges only the
      masked posting rows. Cost scales with candidate volume, not corpus
      size (the §6 crossover's requirement).
    - **ranged kernel** (dense candidates on a ranged store): one
      groupBy(rsalt) exchange of block payloads, decode+mask+fold fused
      per range (query.ranged.score_ranged_masked) — cheaper than
      shuffling ~every decoded posting row when the mask keeps most.
    """
    use_ranged = (
        getattr(bidx, "ranged", False)
        and rescore != "rows"
        and (rescore == "ranged" or covered >= ROWS_RESCORE_COVERAGE)
    )
    if use_ranged:
        from nexlt_spark.query.ranged import score_ranged_masked

        return score_ranged_masked(
            blocks_q, present, idfs, avgdl, n_required, bc, slice_shift
        )
    pruned = _slice_prefilter(blocks_q, bc.value, slice_shift)
    rows = _decode_filtered(pruned, bc, slice_shift)
    return fold_scores(rows, idfs, avgdl, n_required)


def wand_topk(
    bidx: BlockedIndex,
    terms: List[str],
    k: int = 10,
    mode: str = "or",
    doc_filter: Optional[DataFrame] = None,
    candidate_cap: int = DEFAULT_CANDIDATE_CAP,
    slice_shift: Optional[int] = None,
    stats_out: Optional[dict] = None,
    rescore: str = "auto",
) -> DataFrame:
    """(doc_id, score) top-k via Block-Max WAND; ≡ exact path ranks+scores.

    slice_shift=None (default) sizes the rescore's skip-list granularity
    to the collected candidate count (_adaptive_slice_shift); pass an int
    to pin it. stats_out, when given, is filled with pruning telemetry
    (theta, blocks_total, blocks_kept, n_candidates, slice_shift,
    fallback).
    """
    spark = bidx.doc_stats.sparkSession
    qterms = sorted(set(terms))
    meta = _term_meta(bidx, qterms)  # one cached metadata job: df + gm
    present = [t for t in qterms if t in meta]
    if not present or (mode == "and" and len(present) < len(qterms)):
        return spark.createDataFrame([], EMPTY_SCORED_SCHEMA)

    n, avgdl = bidx.stats.n_docs, bidx.stats.avgdl
    dfs = {t: meta[t][0] for t in present}
    idfs = {t: idf(n, dfs[t]) for t in present}
    blocks_q = _query_blocks(bidx, present, idfs)
    n_required = len(present) if mode == "and" else None

    def _exact_fallback() -> DataFrame:
        # delegate to the exact path (which itself picks the per-range
        # fused plan on ranged stores — per_range_limit=k is safe, WAND
        # has no post-hoc row removal beyond doc_filter, handled inside)
        from nexlt_spark.query.exact import score_postings

        scored = score_postings(bidx, present, mode, doc_filter, per_range_limit=k)
        return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)

    if mode == "and":
        # rarest-term-driven conjunction: candidates = smallest list.
        rare = min(present, key=lambda t: dfs[t])
        cand_rows = _decode_filtered(blocks_q.where(F.col("term") == rare))
        cand_df = cand_rows.select("doc_id")
        if doc_filter is not None:
            cand_df = cand_df.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
        cand = cand_df.limit(candidate_cap + 1).collect()
        if len(cand) > candidate_cap:
            if stats_out is not None:
                stats_out["fallback"] = True
            return _exact_fallback()
        cand_ids = np.sort(np.array([r["doc_id"] for r in cand], dtype=np.int64))
        if cand_ids.size == 0:
            return spark.createDataFrame([], EMPTY_SCORED_SCHEMA)
        shift = (
            _adaptive_slice_shift(n, cand_ids.size) if slice_shift is None else slice_shift
        )
        covered = _est_covered_fraction(n, cand_ids.size, shift)
        bc = spark.sparkContext.broadcast(cand_ids)
        scored = _rescore(
            bidx, blocks_q, present, idfs, avgdl, n_required, bc, shift, covered,
            rescore,
        )
        if stats_out is not None:
            stats_out.update(
                fallback=False, n_candidates=int(cand_ids.size), theta=None,
                slice_shift=shift, covered=round(covered, 4),
            )
        return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)

    # ---- OR mode: θ probe → block pruning → candidates → rescore ----
    # gm comes free from the cached term metadata (no extra Spark job)
    gm = {t: idfs[t] * meta[t][1] for t in present}
    sum_gm = sum(gm.values())

    # θ-probe block selection runs on SKINNY metadata (term, first_doc_id,
    # ub) — a direct orderBy(ub).limit(n) would drag every block's payload
    # byte columns through the sort exchange (measured: 13 s on a 120k-block
    # head list vs ~0.3 s skinny). The collected keys then filter blocks_q
    # per term; a key collision across salted blocks only decodes a few
    # extra blocks, which can only RAISE θ (partials stay lower bounds).
    n_probe = PROBE_BLOCKS_PER_TERM * len(present)
    probe_keys = (
        blocks_q.select("term", "first_doc_id", "ub")
        .orderBy(F.col("ub").desc())
        .limit(n_probe)
        .collect()
    )
    by_term: dict = {}
    for r in probe_keys:
        by_term.setdefault(r["term"], []).append(r["first_doc_id"])
    probe_cond = None
    for t, firsts in by_term.items():
        c = (F.col("term") == t) & F.col("first_doc_id").isin(firsts)
        probe_cond = c if probe_cond is None else (probe_cond | c)
    probe_blocks = blocks_q.where(probe_cond) if probe_cond is not None else blocks_q.limit(0)
    probe_rows = _decode_filtered(probe_blocks)
    if doc_filter is not None:
        probe_rows = probe_rows.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
    partial = fold_scores(probe_rows, idfs, avgdl, None)
    topk_partial = partial.orderBy(F.col("score").desc()).limit(k).collect()
    theta = topk_partial[-1]["score"] if len(topk_partial) >= k else 0.0

    # MaxScore essential-list split (Turtle & Flood 1995; Lucene's
    # MaxScoreBulkScorer does the same partition): order terms by
    # ascending gm and mark the maximal prefix whose gm prefix-sum stays
    # BELOW θ as non-essential — a doc containing only non-essential
    # terms scores < θ and cannot enter the top-k, so candidate
    # discovery needs only the essential terms' kept blocks. The
    # non-essential lists still contribute exactly: the rescore decodes
    # them wherever a candidate slice intersects. Without this split, a
    # rare high-idf term ORed with a hot term keeps EVERY hot block
    # (θ ≤ gm_rare makes the per-block cut vacuous for the hot term) and
    # the candidate collect blows the cap — the BENCH.md §6 round-2
    # fallback rows.
    by_gm = sorted(present, key=lambda t: gm[t])
    non_essential: set = set()
    prefix = 0.0
    for t in by_gm[:-1]:  # the largest-gm term is always essential
        if prefix + gm[t] < theta:
            prefix += gm[t]
            non_essential.add(t)
        else:
            break
    essential = [t for t in present if t not in non_essential]

    # keep b(t) iff ub_b + Σ_{t'≠t} gm_{t'} ≥ θ  ⇔  ub_b ≥ θ - (sum_gm - gm_t)
    # (valid for candidate discovery restricted to essential terms: a doc
    # scoring ≥ θ has its argmax-essential-term block kept — its other
    # terms' contributions are dominated by their gms, essential or not)
    gm_col = F.create_map(*[x for t in present for x in (F.lit(t), F.lit(gm[t]))])[
        F.col("term")
    ]
    kept = blocks_q.where(
        F.col("term").isin(essential)
        & (F.col("ub") >= F.lit(theta) - (F.lit(sum_gm) - gm_col))
    )

    cand_df = _decode_filtered(kept).select("doc_id").distinct()
    if doc_filter is not None:
        cand_df = cand_df.join(doc_filter.select("doc_id"), "doc_id", "left_semi")
    cand = cand_df.limit(candidate_cap + 1).collect()
    if len(cand) > candidate_cap:
        if stats_out is not None:
            stats_out["fallback"] = True
        return _exact_fallback()
    cand_ids = np.sort(np.array([r["doc_id"] for r in cand], dtype=np.int64))
    if cand_ids.size == 0:
        return spark.createDataFrame([], EMPTY_SCORED_SCHEMA)
    shift = _adaptive_slice_shift(n, cand_ids.size) if slice_shift is None else slice_shift
    covered = _est_covered_fraction(n, cand_ids.size, shift)

    if stats_out is not None:
        stats_out.update(
            fallback=False,
            theta=float(theta),
            n_candidates=int(cand_ids.size),
            blocks_total=blocks_q.count(),
            blocks_kept=kept.count(),
            slice_shift=shift,
            n_essential=len(essential),
            covered=round(covered, 4),
        )

    bc = spark.sparkContext.broadcast(cand_ids)
    scored = _rescore(
        bidx, blocks_q, present, idfs, avgdl, None, bc, shift, covered, rescore
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
