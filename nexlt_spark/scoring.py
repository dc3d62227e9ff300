"""Okapi BM25 scalar math — the ONE definition shared by engine and oracle.

BASELINE.json pins BM25 k1=1.2, b=0.75 (replacing the reference's Solr-4
DefaultSimilarity TF-IDF, schema.xml:1088). Rank-identity under floats
(SURVEY.md §7.4) demands that the Spark column expression and the
pure-Python oracle perform the *same IEEE-754 operations in the same
order*; both are generated from the constants and operation order fixed
here. idf is always computed driver-side with Python's math.log (never
JVM Math.log / SQL ln) so the engine and oracle share one libm.

score(doc, Q) = Σ_{t ∈ Q, sorted by term} idf(t) * tf_norm(tf, dl)
idf(t)        = ln(1 + (N - df + 0.5) / (df + 0.5))      # Lucene BM25 idf
tf_norm       = (tf * (k1+1)) / (tf + k1 * ((1-b) + b*dl/avgdl))
"""

from __future__ import annotations

import math

from nexlt_spark import B, K1

K1_PLUS_1 = K1 + 1.0
ONE_MINUS_B = 1.0 - B


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(tf: float, dl: float, avgdl: float) -> float:
    return (tf * K1_PLUS_1) / (tf + K1 * (ONE_MINUS_B + B * dl / avgdl))


def contribution(idf_t: float, tf: float, dl: float, avgdl: float) -> float:
    return idf_t * tf_norm(tf, dl, avgdl)


def score_sorted(contribs_by_term: list[tuple[str, float]]) -> float:
    """Sum contributions in term-sorted order (deterministic float fold)."""
    acc = 0.0
    for _, c in sorted(contribs_by_term, key=lambda x: x[0]):
        acc += c
    return acc


def contribution_col(idf_col, tf_col, dl_col, avgdl: float):
    """The same arithmetic as :func:`contribution`, as a Spark Column.

    Operation order mirrors the Python expression exactly:
    idf * ((tf * K1_PLUS_1) / (tf + K1 * (ONE_MINUS_B + (B * dl) / avgdl)))
    (note Python's left-to-right ``B * dl / avgdl`` == ``(B*dl)/avgdl``).
    """
    from pyspark.sql import functions as F

    tf_d = tf_col.cast("double")
    dl_d = dl_col.cast("double")
    return idf_col * (
        (tf_d * F.lit(K1_PLUS_1))
        / (tf_d + F.lit(K1) * (F.lit(ONE_MINUS_B) + (F.lit(B) * dl_d) / F.lit(avgdl)))
    )


def sql_contribution(idf_expr: str, tf_expr: str, dl_expr: str, avgdl_expr: str) -> str:
    """The same arithmetic as ANSI SQL text (DuckDB oracle parity)."""
    return (
        f"({idf_expr}) * ((({tf_expr}) * {K1_PLUS_1!r}) / "
        f"(({tf_expr}) + {K1!r} * ({ONE_MINUS_B!r} + ({B!r} * ({dl_expr})) / ({avgdl_expr}))))"
    )


def sql_idf(n_expr: str, df_expr: str) -> str:
    return f"ln(1.0 + (({n_expr}) - ({df_expr}) + 0.5) / (({df_expr}) + 0.5))"
