"""Inverted-index build: documents → postings / doc_stats / term_stats.

Re-expresses what Lucene does inside the reference's Solr core
(schema.xml analyzer chains → term dictionary + postings + norms;
solrconfig.xml:151 codecFactory) as Spark DataFrame aggregations
(SURVEY.md §2.4 A2-A5):

- tf   = explode(tokens) → groupBy(term, doc_id).count()   [A2]
- df   = groupBy(term).count() over distinct (term, doc)   [A3]
- dl   = size(tokens) per doc; avgdl global                [A4]
- postings: docID-sorted per term, **dl denormalized into the posting
  row** so query-time scoring is pure column algebra with no big-big
  doc_stats join (the Lucene-norms analog, schema.xml:899-903).

All hot-path text work is one Arrow pandas_udf (the tokenizer); the aggs
are Catalyst hash aggregates with map-side partial combine — no custom
shuffle logic needed here. Block compression + salting live in
nexlt_spark.index.blocks (SURVEY.md M3).

BM25 idf is NOT materialized here: ln() differs in last-ulp across
runtimes, and rank-identity vs the pure-Python oracle requires computing
idf from (N, df) with the same libm at query time (SURVEY.md §7.4
"rank-identity under floats"). term_stats stores exact integers only.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nexlt_spark.analysis import tokenize_udf_col


@dataclass
class IndexStats:
    n_docs: int
    total_tokens: int

    @property
    def avgdl(self) -> float:
        # Single well-defined float op: exact int sum / exact int count.
        return self.total_tokens / self.n_docs if self.n_docs else 0.0


@dataclass
class InvertedIndex:
    """Flat (uncompressed) index — the exact-path source of truth.

    postings:   (term, doc_id, tf, dl)       — one row per posting
    doc_stats:  (doc_id, dl)                 — includes dl=0 docs
    term_stats: (term, df)                   — exact integers only
    """

    postings: DataFrame
    doc_stats: DataFrame
    term_stats: DataFrame
    stats: IndexStats
    analyzer: str = "standard"

    def persist(self) -> "InvertedIndex":
        self.postings.persist()
        self.doc_stats.persist()
        self.term_stats.persist()
        return self

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        """df for a small set of query terms (tiny collect)."""
        rows = self.term_stats.where(F.col("term").isin(list(terms))).collect()
        return {r["term"]: r["df"] for r in rows}

    @property
    def has_positions(self) -> bool:
        return "positions" in self.postings.columns

    def lookup(self, terms: list[str], positions: bool = False) -> DataFrame:
        """Flat posting rows for the given terms (the exact query path's
        postings provider; BlockedIndex implements the same protocol).
        The flat rows already carry the positions column when built with
        positions=True, so the flag only validates availability."""
        if positions and not self.has_positions:
            raise ValueError("index was built without positions")
        return self.postings.where(F.col("term").isin(list(terms)))


def tokenized(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """documents + tokens/dl columns (one Arrow batch pass)."""
    return documents.withColumn("tokens", tokenize_udf_col(F.col(text_col))).withColumn(
        "dl", F.size("tokens")
    )


RAW_SCHEMA = "term string, doc_id long, tf int, dl int"
RAW_POS_SCHEMA = RAW_SCHEMA + ", positions array<int>"
_SENTINEL = ""  # the tokenizer regex never yields an empty string


def _emit_postings(
    doc_id_col: str, text_col: str, analyzer: str = "standard", positions: bool = False
):
    """mapInPandas kernel: documents batch → pre-aggregated posting rows.

    One vectorized pass per Arrow batch: tokenize (pandas .str chain, same
    ops as nexlt_spark.analysis.tokenize), flatten via itertools.chain
    (C-speed), tf via pandas groupby(doc, term).size() — i.e. the map-side
    combine happens HERE, in numpy/pandas, so the explode shuffle of one
    row per token never exists. Each doc additionally emits one sentinel
    row (term='', tf=0, dl) carrying its length — doc_stats for free,
    including dl=0 docs.

    positions=True additionally emits the ascending in-doc token offsets
    per (doc, term) as an array<int> column — the Lucene positions-file
    analog (the reference's phrase queries read Lucene positions;
    schema.xml text fields index positions by default). With a stemming
    analyzer the positions are those of the RAW tokens whose stem equals
    the term, still ascending.
    """
    import numpy as np
    import pandas as pd

    from nexlt_spark.analysis import ANALYZERS, batch_token_codes

    spec = ANALYZERS[analyzer]

    def emit(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            doc_ids = pdf[doc_id_col].to_numpy()
            # chain-order-faithful shared tokenizer (tokenize() semantics:
            # token_map, then stream_map/drop, then dl/positions) — the
            # fused-key tf below counts per distinct FINAL term
            doc_idx, codes, uniques, lens = batch_token_codes(pdf[text_col], spec)
            sent = pd.DataFrame(
                {
                    "term": _SENTINEL,
                    "doc_id": doc_ids,
                    "tf": np.zeros(len(doc_ids), dtype=np.int32),
                    "dl": lens.astype(np.int32),
                }
            )
            if positions:
                sent["positions"] = None
            if len(codes) == 0:
                yield sent
                continue
            # tf via ONE sort/unique over a fused (doc, term-code) int64 key —
            # the string hashing happens once in factorize; no object-dtype
            # groupby (measured materially faster + fewer allocations)
            v = len(uniques)
            key = doc_idx * v + codes
            if not positions:
                uk, counts = np.unique(key, return_counts=True)
                ud = uk // v
                tf = pd.DataFrame(
                    {
                        "term": uniques[(uk % v).astype(np.int64)],
                        "doc_id": doc_ids[ud],
                        "tf": counts.astype(np.int32),
                        "dl": lens[ud].astype(np.int32),
                    }
                )
                yield pd.concat([sent, tf], ignore_index=True)
                continue
            # positions variant: stable sort by the fused key preserves
            # in-doc token order inside each (doc, term) group, so the
            # sliced position runs are already ascending.
            total = len(key)
            doc_starts = np.zeros(len(doc_ids), dtype=np.int64)
            np.cumsum(lens[:-1], out=doc_starts[1:])
            tok_pos = (np.arange(total, dtype=np.int64) - doc_starts[doc_idx]).astype(np.int32)
            order = np.argsort(key, kind="stable")
            ks = key[order]
            ps = tok_pos[order]
            cut = np.flatnonzero(np.diff(ks)) + 1
            starts = np.concatenate(([0], cut))
            uk = ks[starts]
            counts = np.diff(np.concatenate((starts, [total])))
            ud = uk // v
            tf = pd.DataFrame(
                {
                    "term": uniques[(uk % v).astype(np.int64)],
                    "doc_id": doc_ids[ud],
                    "tf": counts.astype(np.int32),
                    "dl": lens[ud].astype(np.int32),
                    "positions": np.split(ps, cut),
                }
            )
            yield pd.concat([sent, tf], ignore_index=True)

    return emit


# Java-regex equivalent of analysis.TOKEN_RE ([^\W_]+ under re.UNICODE):
# maximal runs of Unicode letters/digits, underscore excluded. \p{N}
# covers Nd/Nl/No exactly as Python's str.isalnum does.
_JVM_TOKEN_RE = r"[\p{L}\p{N}]+"


def _emit_postings_jvm(
    documents: DataFrame, doc_id_col: str, text_col: str, positions: bool
) -> DataFrame:
    """The 'standard'-chain emit expressed entirely in Catalyst — zero
    Python anywhere in the plan (no Arrow hop, no python workers).

    Per-doc tf is computed INSIDE the row with higher-order functions
    (array_distinct × filter — the map-side combine the Arrow kernel
    does in pandas), so like the Arrow path this emits pre-aggregated
    posting rows with NO shuffle: explode fans out one row per (doc,
    term), never one per token occurrence. O(distinct·dl) comparisons
    per doc — for conversation turns (dl ≈ 10-100) this stays cheap and
    fully inside WholeStageCodegen.

    Semantics match the 'standard' chain exactly for NFKC-normalized
    text (JVM `lower` ≡ Python `str.lower` on such input; the regexes
    are equivalent by construction — asserted against the pandas emit
    in tests/test_jvm_tokenize.py, including positions, on 87M postings).
    Spark has no NFKC builtin, so texts containing compatibility forms
    (full-width CJK digits, ligatures) need the Arrow path.

    MEASURED (tools/bench_emit_paths.py, BENCH.md §5): the Arrow kernel
    is ~6× FASTER than this path on the bench box (91.5k vs 15.8k
    turns/s at 8 cores, 2.25M turns) — the per-pair string comparisons
    of the HOF tf computation plus JVM regex cost far more than the
    Arrow hop they avoid. The Arrow emit stays the default and the
    scale recommendation; this path is the option for clusters where
    Python workers are unavailable or prohibited.
    """
    toks = F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(_JVM_TOKEN_RE), 0
    )
    base = documents.select(
        F.col(doc_id_col).alias("doc_id"), toks.alias("toks")
    ).select("doc_id", "toks", F.size("toks").cast("int").alias("dl"))

    entry_cols = [
        F.col("t").alias("term"),
        F.size(F.filter("toks", lambda x: x == F.col("t"))).cast("int").alias("tf"),
    ]
    if positions:
        entry_cols.append(
            F.filter(
                F.transform("toks", lambda x, i: F.when(x == F.col("t"), i.cast("int"))),
                lambda v: v.isNotNull(),
            ).alias("positions")
        )
    entries = base.select(
        "doc_id", "dl", F.explode(F.array_distinct("toks")).alias("t"), "toks"
    ).select("doc_id", "dl", *entry_cols)

    sent_cols = [
        F.lit(_SENTINEL).alias("term"),
        F.col("doc_id"),
        F.lit(0).cast("int").alias("tf"),
        F.col("dl"),
    ]
    if positions:
        sent_cols.append(F.lit(None).cast("array<int>").alias("positions"))
    sentinels = base.select(*sent_cols)
    cols = ["term", "doc_id", "tf", "dl"] + (["positions"] if positions else [])
    return entries.select(*cols).unionByName(sentinels.select(*cols))


def build_index(
    documents: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    persist_raw: bool = True,
    analyzer: str = "standard",
    positions: bool = False,
    tokenizer: str = "arrow",
) -> InvertedIndex:
    """Build the flat inverted index from a documents DataFrame.

    Single tokenizer pass (mapInPandas, Arrow-batched, vectorized pandas —
    no per-row Python at the Spark level), already aggregated per
    (doc, term): the only shuffle in the whole build is the small
    groupBy(term) for df. At production scale, ``persist_raw`` becomes a
    write of the raw posting rows to the staging table instead of a
    cache (see index.checkpoint for the resumable form).

    positions=True carries per-posting token offsets (array<int>) so
    phrase queries run entirely off postings (query.exact.phrase_match_docs)
    with no documents-table access.

    tokenizer='jvm' (standard chain only) swaps the Arrow kernel for the
    pure-Catalyst emit (_emit_postings_jvm): identical output, zero
    Python in the plan — the build becomes 100% JVM codegen end-to-end.
    """
    if tokenizer == "jvm":
        if analyzer != "standard":
            raise ValueError(
                "tokenizer='jvm' implements the 'standard' chain only; "
                f"analyzer={analyzer!r} needs the arrow path"
            )
        raw = _emit_postings_jvm(documents, doc_id_col, text_col, positions)
    else:
        raw = documents.select(doc_id_col, text_col).mapInPandas(
            _emit_postings(doc_id_col, text_col, analyzer, positions),
            schema=RAW_POS_SCHEMA if positions else RAW_SCHEMA,
        )
    if persist_raw:
        raw = raw.persist()

    postings = raw.where(F.col("term") != _SENTINEL)
    doc_stats = raw.where(F.col("term") == _SENTINEL).select("doc_id", "dl")
    term_stats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    agg = doc_stats.agg(
        F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("tot")
    ).collect()[0]
    stats = IndexStats(n_docs=int(agg["n"]), total_tokens=int(agg["tot"]))

    return InvertedIndex(
        postings=postings,
        doc_stats=doc_stats,
        term_stats=term_stats,
        stats=stats,
        analyzer=analyzer,
    )
