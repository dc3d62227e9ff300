"""Text analysis ops for training-data pipelines: token counts, quality
scores, language-ID heuristic, rolling-hash fingerprints.

All pure Column algebra where possible; the documents-table analogs of
the reference's ingest-side projections (F10 length cap, F15 lowercase,
SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ASCII-regexp token expression — identical to the engine tokenizer
# (nexlt_spark.analysis) on ASCII corpora and to the DuckDB oracle form
# regexp_extract_all(lower(text), '[a-z0-9]+'). Pure JVM regexp, no UDF.
def tokens_col():
    return F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), 0)


def token_count_col():
    return F.size(tokens_col())


def token_stats_by(docs: DataFrame, group_col: str) -> DataFrame:
    """(group, n_docs, total_tokens, avg_tokens) — corpus shape profile."""
    t = docs.withColumn("n_tokens", token_count_col())
    return (
        t.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .orderBy(group_col)
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality features per doc: token count, mean token length,
    unique-token ratio — the standard cheap pre-filters before expensive
    model-based scoring."""
    toks = tokens_col()
    n = token_count_col()
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(
            F.when(n == 0, F.lit(0.0)).otherwise(F.length(F.trim(F.col("text"))).cast("double") / n),
            4,
        ).alias("avg_token_len"),
        F.round(
            F.when(n == 0, F.lit(0.0)).otherwise(F.size(F.array_distinct(toks)).cast("double") / n),
            4,
        ).alias("unique_ratio"),
    )


def char_ngram_fingerprint(docs: DataFrame, n: int = 16) -> DataFrame:
    """Rolling fingerprint: md5 of the first/last n chars + length —
    order-free near-identity probe used for fast candidate blocking."""
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(
                "|", F.substring(t, 1, n), F.substring(t, -n, n), F.length(t).cast("string")
            )
        ).alias("fingerprint"),
    )


# --------------------------------------------------------------------------
# Language identification (stopword-overlap heuristic)
# --------------------------------------------------------------------------

# Minimal public stopword cores (top function words per language). A
# production pipeline swaps in bigger lists or a model; the operator's
# dataflow (array_intersect scoring, argmax with deterministic tiebreak)
# is what matters at 100 TB — one JVM-side pass, no UDF, no shuffle.
STOPWORDS = {
    "en": "the of and to in a is that it for on with as are this be at or".split(),
    "fr": "le la les de des du et en un une est que pour dans sur au avec ne pas".split(),
    "de": "der die das und in den von zu mit ist des im für auf nicht ein eine als".split(),
    "es": "el la los las de y en un una es que por para con del se no al como".split(),
}


def language_scores(docs: DataFrame, languages=None) -> DataFrame:
    """Per-doc stopword-hit counts per language: (doc_id, score_<lang>…)."""
    langs = languages or sorted(STOPWORDS)
    toks = F.array_distinct(tokens_col())
    cols = [
        F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
        ).alias(f"score_{lang}")
        for lang in langs
    ]
    return docs.select("doc_id", *cols)


def language_id(docs: DataFrame, languages=None, min_hits: int = 1) -> DataFrame:
    """(doc_id, lang_pred, hits): argmax language by stopword overlap,
    ties broken by language-code order, 'und' (undetermined) below
    min_hits — the greatest(..)/CASE form keeps it one codegen stage."""
    langs = languages or sorted(STOPWORDS)
    scored = language_scores(docs, langs)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties (reversed fold)
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best >= min_hits, pred).otherwise(F.lit("und"))
    return scored.select("doc_id", pred.alias("lang_pred"), best.alias("hits"))
