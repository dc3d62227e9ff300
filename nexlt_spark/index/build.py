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

    def persist(self) -> "InvertedIndex":
        self.postings.persist()
        self.doc_stats.persist()
        self.term_stats.persist()
        return self

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        """df for a small set of query terms (tiny collect)."""
        rows = self.term_stats.where(F.col("term").isin(list(terms))).collect()
        return {r["term"]: r["df"] for r in rows}


def tokenized(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """documents + tokens/dl columns (one Arrow batch pass)."""
    return documents.withColumn("tokens", tokenize_udf_col(F.col(text_col))).withColumn(
        "dl", F.size("tokens")
    )


def build_index(documents: DataFrame, doc_id_col: str = "doc_id") -> InvertedIndex:
    """Build the flat inverted index from a documents DataFrame.

    ``documents`` needs (doc_id, text). The heavy lifting is two shuffles:
    one hash-agg by (term, doc_id) for tf (with map-side combine), one by
    term for df. dl rides along in the tf group key (functionally
    dependent on doc_id) so no postings⋈doc_stats join is ever needed.
    """
    toks = tokenized(documents).select(
        F.col(doc_id_col).alias("doc_id"), "tokens", "dl"
    )

    doc_stats = toks.select("doc_id", "dl")

    postings = (
        toks.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select("term", "doc_id", F.col("tf").cast("int").alias("tf"), "dl")
    )

    term_stats = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    agg = doc_stats.agg(
        F.count(F.lit(1)).alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("tot")
    ).collect()[0]
    stats = IndexStats(n_docs=int(agg["n"]), total_tokens=int(agg["tot"]))

    return InvertedIndex(postings=postings, doc_stats=doc_stats, term_stats=term_stats, stats=stats)
