"""Ingest-side operators: the reference indexers' dataflow, Spark-first.

Each maps to a SURVEY.md §2.2/2.3/2.6 row (file:line cited per function).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_by_key(df: DataFrame, key_cols: Sequence[str], order_col: str, tiebreak_col: str) -> DataFrame:
    """Last-write-wins upsert semantics (SO5; schema.xml:1030-1033
    uniqueKey re-add replaces doc): keep the newest row per key.

    row_number over (key) ordered by (order desc, tiebreak desc) — one
    shuffle by key; at scale this is the standard MERGE INTO reduction.
    """
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc(), F.col(tiebreak_col).desc())
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def date_window_filter(
    df: DataFrame, ts_col: str, start: str, end: str, alt_ts_col: Optional[str] = None
) -> DataFrame:
    """Date-range predicate with optional OR-alternate-date column
    (AthenaExportMt.java:314-328: creation OR edit date in window)."""
    t = (F.col(ts_col) >= F.to_timestamp(F.lit(start))) & (F.col(ts_col) < F.to_timestamp(F.lit(end)))
    if alt_ts_col:
        a = (F.col(alt_ts_col) >= F.to_timestamp(F.lit(start))) & (
            F.col(alt_ts_col) < F.to_timestamp(F.lit(end))
        )
        t = t | a
    return df.where(t)


def dim_lookup_with_fallback(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    value_col: str,
    default: str,
) -> DataFrame:
    """Broadcast lookup join with default fallback (J1: productsMap memo
    cache + 'MARKETING' default, AthenaExportMt.java:408-451)."""
    joined = facts.join(F.broadcast(dim), key, "left")
    return joined.withColumn(value_col, F.coalesce(F.col(value_col), F.lit(default)))


def code_normalize(col, mapping: Dict[str, str], strip_prefix: Optional[str] = None):
    """Product-code normalization (F6: strip RENT_ prefix, PlDS→PLDS map,
    AthenaExportMt.java:400-406) as a single CASE expression."""
    c = col
    if strip_prefix:
        c = F.regexp_replace(c, f"^{strip_prefix}", "")
    expr = None
    for k, v in mapping.items():
        cond = c == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return expr.otherwise(c) if expr is not None else c


def scrub_and_project(docs: DataFrame) -> DataFrame:
    """The reference's per-row ingest transform bundle over documents:
    newline scrub (F7), lowercase projection (F15, srclc), id synthesis
    (F16), length cap (F10, parseJSON.pl:313: drop >5000 chars)."""
    return (
        docs.where(F.col("text").isNotNull() & (F.length("text") <= 5000))
        .select(
            "doc_id",
            F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("doc_key"),
            F.regexp_replace(F.col("text"), r"[\n\r]", " ").alias("text"),
            F.lower(F.col("text")).alias("text_lc"),
        )
    )


def positional_to_records(
    df: DataFrame, values_col: str, field_names: Sequence[str], keep: Optional[Sequence[str]] = None
) -> DataFrame:
    """S5: positional-array rows → named columns.

    The reference's Passolo JSON stores a header array of field names and
    per-record positional value arrays (jString.pm:49-79,
    jStringList.pm:27-63: ``string_prop_names`` defines the order, each
    string is an array read by index). Spark-first that is a pure
    projection — ``try_element_at(values, i)`` per field, no UDF; missing
    trailing fields become NULL (out-of-range → NULL under ANSI mode),
    the Perl reader's undef.
    """
    base = [F.col(c) for c in (keep if keep is not None else [c for c in df.columns if c != values_col])]
    cols = [F.try_element_at(F.col(values_col), F.lit(i + 1)).alias(n) for i, n in enumerate(field_names)]
    return df.select(*base, *cols)


def collect_multivalued(df: DataFrame, key: str, value: str, out_col: str) -> DataFrame:
    """A1: accumulate multi-valued field per key (productname JSON array,
    AthenaExportMt.java:429-440) — deterministic sorted-distinct form."""
    return df.groupBy(key).agg(
        F.concat_ws(",", F.sort_array(F.collect_set(F.col(value)))).alias(out_col)
    )


# --------------------------------------------------------------------------
# PII redaction (training-data scrub)
# --------------------------------------------------------------------------

# Conservative, documented patterns — high precision over recall (the
# standard trade for corpus scrubbing: a missed rare formatting beats
# mangling code/numeric data with aggressive phone/ID regexes). All are
# Java regex (JVM-side regexp_replace/regexp_extract_all, no UDF).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    # dotted quad with 1-3 digit octets; \b guards keep version strings
    # like 1.2.3.4000 from matching
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    # international-format numbers only (+ then 7-14 more digits, up to
    # two separator chars between digits, e.g. ") 1") — bare local
    # formats collide with ordinary numerics far too often to scrub
    # blindly
    "phone": r"\+\d(?:[\s().\-]{0,2}\d){6,13}\b",
}


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    kinds: Sequence[str] = ("email", "ipv4", "phone"),
) -> DataFrame:
    """Replace each PII match with ``<KIND>`` and count what was hit:
    the input columns pass through with ``text_col`` rewritten, plus one
    ``n_<kind>`` count column per requested kind.

    One row-local projection — counts via ``regexp_extract_all`` sizes,
    rewrite via chained ``regexp_replace`` — all JVM regex inside a
    single codegen stage: no UDF, no shuffle, scales as a map-only pass.

    Each kind's count is taken on the text AFTER the earlier kinds'
    rewrites (the same sequential pass the rewrite chain applies), so
    ``n_<kind>`` always equals the number of ``<KIND>`` placeholders
    emitted — a match swallowed by an earlier kind (a ``+…`` phone
    inside an email local part) is counted once, as that earlier kind.
    """
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown}; have {sorted(PII_PATTERNS)}")
    scrubbed = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for k in kinds:
        counts.append(
            F.size(F.regexp_extract_all(scrubbed, F.lit(PII_PATTERNS[k]), 0)).alias(f"n_{k}")
        )
        scrubbed = F.regexp_replace(scrubbed, PII_PATTERNS[k], f"<{k.upper()}>")
    passthrough = [c for c in docs.columns if c != text_col]
    # counts run on the coalesced text (NULL counts as 0 hits), but the
    # rewritten column keeps NULL as NULL — turning NULL into '' would
    # change what downstream isNotNull() filters and user pipelines see
    out_text = F.when(F.col(text_col).isNull(), F.lit(None).cast("string")).otherwise(
        scrubbed
    )
    return docs.select(*passthrough, out_text.alias(text_col), *counts)
