"""Driver-side top-k path planner: Block-Max WAND vs the exact fused plan.

The reference's Lucene picks between exhaustive scoring and BMW pruning
per query (IndexSearcher's TopScoreDocCollector enables WAND exactly
when ranks alone are needed); which one is faster depends on whether the
decode work pruning saves exceeds pruning's own overhead. On this engine
the trade is measurable and stark (tools/bench_wand_crossover.py, 2.25M
docs, narrow + Zipf vocabularies, every shape × both paths):

- the exact per-range plan is ONE fused Spark job: ~0.35 s floor plus
  ~50 ns per decoded posting (≈20M postings/s through the kernel) —
  4M postings of two Zipf-head terms score in 0.56 s;
- WAND pays a fixed multi-job orchestration floor — θ-probe job +
  candidate collect + masked rescore ≈ 1.2-1.5 s regardless of how well
  it prunes (and ~3.5-4 s when the candidate cap forces fallback).

So at 10^6-doc scale exact wins EVERY measured shape, and the planner's
job is mostly to say "exact". WAND earns its floor only when the skipped
decode volume is tens of millions of postings — index scales where a
term's list alone is 10^8-10^10 postings (the 100 TB serving case, or
equivalently when per-executor decode throughput is divided by a much
larger corpus). The decision is therefore a two-constant cost model,
not a heuristic: route to WAND iff

    est_postings_saved / DECODE_RATE > WAND_OVERHEAD_SEC

with both constants calibrated by the crossover bench (BENCH.md §6) and
scale-free inputs (posting counts) from CACHED collection statistics
only — the (df, max_tfnorm, n_blocks, block-ub quantile sketch) per
term that query.wand._term_meta memoizes on the index (one metadata-only
Spark job per new term, the Lucene TermStates analog). No postings are
read and no extra job runs to plan.

Saved-volume estimate:
- OR: θ̂ = THETA_FRACTION · Σ_t gm_t (the co-occurrence bound); a block
  of term t survives iff ub ≥ θ̂ − Σ_{t'≠t} gm_{t'}; stepping that cut
  through the cached block-ub quantile sketch yields a kept-block
  fraction, hence kept ≈ frac · df_t postings per term.
- AND: the rarest list drives; candidate-masked rescore decodes at most
  one block per (candidate, term), so kept ≤ rare_df · n_terms ·
  BLOCK_SIZE postings (a deliberate overcount — candidates clustering
  into shared blocks only reduces it).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexlt_spark.index.blocks import BLOCK_SIZE, BlockedIndex
from nexlt_spark.query.wand import (
    DEFAULT_CANDIDATE_CAP,
    META_QUANTS,
    _term_meta,
    wand_topk,
)
from nexlt_spark.scoring import idf

THETA_FRACTION = 0.8
# calibrated on tools/bench_wand_crossover.py (BENCH.md §6): the fused
# kernel decodes+folds ~20M postings/s end-to-end through one Spark job,
# and WAND's extra driver round-trips cost ~1 s over the exact plan's
# single job. Both are engine/cluster constants, not data constants —
# override per deployment if the crossover bench says otherwise there.
DECODE_RATE_POSTINGS_PER_SEC = 20_000_000
WAND_OVERHEAD_SEC = 1.0
# the volume WAND must skip to pay for its orchestration
BREAK_EVEN_POSTINGS = int(DECODE_RATE_POSTINGS_PER_SEC * WAND_OVERHEAD_SEC)


def estimate_kept_fraction(bidx: BlockedIndex, terms: List[str]) -> Optional[float]:
    """Estimated fraction of the query terms' blocks that survive a
    θ̂ = THETA_FRACTION·Σgm Block-Max cut. None when no term is present
    in the index."""
    qterms = sorted(set(terms))
    meta = _term_meta(bidx, qterms)
    if not meta:
        return None
    n = bidx.stats.n_docs
    gm = {t: idf(n, m[0]) * m[1] for t, m in meta.items()}
    sum_gm = sum(gm.values())
    theta = THETA_FRACTION * sum_gm
    kept = total = 0
    for t, (df_t, mtf, nb, qs) in meta.items():
        total += nb
        cut = theta - (sum_gm - gm[t])
        if cut <= 0.0:
            kept += nb  # every block of t survives
            continue
        idf_t = idf(n, df_t)
        if idf_t <= 0.0:
            continue
        cut_tfnorm = cut / idf_t
        # fraction of blocks with max_tfnorm >= cut_tfnorm, stepped on
        # the cached quantile sketch (conservative: assumes the whole
        # quantile bucket above the crossing survives)
        frac = 0.0
        for q, v in zip(META_QUANTS, qs):
            if v >= cut_tfnorm:
                frac = 1.0 - q
                break
        if mtf >= cut_tfnorm and frac == 0.0:
            frac = 1.0 - META_QUANTS[-1]
        kept += nb * frac
    return kept / total if total else None


def estimate_postings_saved(
    bidx: BlockedIndex, terms: List[str], mode: str = "or"
) -> Optional[int]:
    """Postings the WAND path would skip decoding vs the exact fused
    plan, from cached metadata only. None when no term is present."""
    qterms = sorted(set(terms))
    meta = _term_meta(bidx, qterms)
    if not meta:
        return None
    total = sum(m[0] for m in meta.values())
    if mode == "and":
        rare_df = min(m[0] for m in meta.values())
        kept = min(total, rare_df * len(meta) * BLOCK_SIZE)
        return max(0, total - kept)
    kf = estimate_kept_fraction(bidx, terms)
    if kf is None:
        return None
    return int(total * (1.0 - kf))


def choose_topk_path(
    bidx: BlockedIndex, terms: List[str], k: int = 10, mode: str = "or"
) -> str:
    """'wand' or 'exact' from cached stats only (no Spark job beyond the
    memoized term-metadata fill)."""
    qterms = sorted(set(terms))
    meta = _term_meta(bidx, qterms)
    if not meta or len(meta) == 1:
        # single-list queries: nothing to prune, exact reads one list
        return "exact"
    if mode == "and":
        if len(meta) < len(qterms):
            return "exact"  # empty result; exact short-circuits driver-side
        rare_df = min(m[0] for m in meta.values())
        if rare_df > DEFAULT_CANDIDATE_CAP:
            return "exact"  # candidate collect would overflow → fallback anyway
    saved = estimate_postings_saved(bidx, terms, mode)
    return "wand" if saved is not None and saved > BREAK_EVEN_POSTINGS else "exact"


def topk(
    bidx: BlockedIndex,
    terms: List[str],
    k: int = 10,
    mode: str = "or",
    doc_filter: Optional[DataFrame] = None,
    stats_out: Optional[dict] = None,
) -> DataFrame:
    """Planned top-k: route to WAND or the exact fused plan. Both paths
    are rank-identical (asserted in tests/test_wand.py), so the planner
    only ever changes latency, never results."""
    path = choose_topk_path(bidx, terms, k, mode)
    if stats_out is not None:
        stats_out["path"] = path
    if path == "wand":
        return wand_topk(bidx, terms, k=k, mode=mode, doc_filter=doc_filter,
                         stats_out=stats_out)
    from nexlt_spark.query.exact import score_postings

    scored = score_postings(
        bidx, sorted(set(terms)), mode, doc_filter,
        per_range_limit=k if doc_filter is None else None,
    )
    return scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
