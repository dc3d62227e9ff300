"""Driver-side top-k path planner: Block-Max WAND vs the exact fused plan.

The reference's Lucene picks between exhaustive scoring and BMW pruning
per query (IndexSearcher's TopScoreDocCollector enables WAND exactly
when ranks alone are needed); which one is faster depends on how much a
θ threshold actually prunes. On this engine the trade is starker
because WAND pays fixed driver orchestration (a θ-probe job plus a
candidate collect) that the exact per-range plan (query.ranged) never
pays — measured in tools/bench_wand_crossover.py, exact wins whenever
θ keeps most blocks alive, WAND wins when the kept-block fraction is
small (rare high-idf terms mixed with common ones).

This module decides from CACHED collection statistics only — the
(df, max_tfnorm, n_blocks, block-ub quantile sketch) per term that
query.wand._term_meta memoizes on the index (one metadata-only Spark
job per new term, the Lucene TermStates analog). No postings are read
and no extra job runs to plan.

Estimate: take θ̂ = THETA_FRACTION · Σ_t gm_t — the co-occurrence
bound: the probe's threshold approaches the sum of per-term maxima
exactly when top documents contain most query terms at strong tf, which
is also when BMW pruning actually bites (comparable idfs, plausible
co-occurrence). A block b of term t survives pruning iff
ub_b ≥ θ̂ − Σ_{t'≠t} gm_{t'}; per term that cut maps onto the cached
quantile sketch of block ubs, giving an estimated kept-block fraction
without touching the store. For extreme idf spreads (one rare term
dominating), every other term's cut goes negative → kept ≈ 1 → exact:
correct on this engine, where the exact fused plan reads the rare list
plus the hot list in one job while WAND pays probe+collect round-trips
first (tools/bench_wand_crossover.py is the empirical table behind the
constants).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexlt_spark.index.blocks import BlockedIndex
from nexlt_spark.query.wand import (
    DEFAULT_CANDIDATE_CAP,
    META_QUANTS,
    _term_meta,
    wand_topk,
)
from nexlt_spark.scoring import idf

THETA_FRACTION = 0.8
# choose WAND only when pruning is estimated to drop >half the blocks;
# below that, the exact per-range plan's single fused job wins (it has
# no probe/collect round-trips to amortize)
KEPT_FRACTION_CUTOFF = 0.5
# AND conjunctions: drive from the rarest list iff it fits the candidate
# collect comfortably (same cap wand_topk enforces at run time)
AND_RARE_DF_CUTOFF = DEFAULT_CANDIDATE_CAP // 2


def estimate_kept_fraction(bidx: BlockedIndex, terms: List[str]) -> Optional[float]:
    """Estimated fraction of the query terms' blocks that survive a
    θ̂ = THETA_FRACTION·max(gm) Block-Max cut. None when no term is
    present in the index."""
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
        return "wand" if rare_df <= AND_RARE_DF_CUTOFF else "exact"
    kf = estimate_kept_fraction(bidx, terms)
    return "wand" if kf is not None and kf < KEPT_FRACTION_CUTOFF else "exact"


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
