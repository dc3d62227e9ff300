"""Faceting — field, query, and range facets (A7).

The reference's ajax-solr widget surface drives all three Solr facet
modes (web/nexlt/ajax-solr/widgets/AbstractFacetWidget.js:43-91:
facet.field / facet.query / facet.range). Spark-first transposition:

- facet.field  = groupBy(field).count()                 (facet_field_counts)
- facet.query  = ONE aggregate pass computing every predicate's
  conditional count simultaneously, then an unpivot of the single result
  row — no per-facet scan, no shuffle beyond the map-side-combined agg
  (facet_query_counts)
- facet.range  = bucket = floor((v-start)/gap) groupBy, left-joined onto
  the generated bucket spine so empty buckets report 0 (Solr's default
  mincount=0), the spine being a tiny broadcast side
  (facet_range_counts)

All pure Column algebra. At 100 TB each facet call is one scan with a
partial-aggregate combine; facet.query over k predicates stays ONE scan
regardless of k.
"""

from __future__ import annotations

import math
from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def facet_field_counts(
    df: DataFrame,
    fld: str,
    prefix: str = None,
    mincount: int = 0,
    limit: int = -1,
    offset: int = 0,
    sort: str = None,
    missing: bool = False,
) -> DataFrame:
    """facet.field: (value, n) counts per distinct field value, with the
    SimpleFacetParameters refinements the reference's widgets emit
    (AbstractFacetWidget.js:43-54): ``facet.prefix`` (filter BEFORE the
    aggregate — it reaches the scan as a StartsWith pushdown),
    ``facet.mincount``, ``facet.limit``/``facet.offset`` paging,
    ``facet.sort`` ('count' = n desc — Solr's default when a limit is in
    effect — or 'index' = value asc), and ``facet.missing`` (append the
    null-value count row). Solr's null handling is preserved: null field
    values are excluded from the value counts and reported only via
    facet.missing.

    The refinements change only a post-aggregate top-N — the heavy part
    stays one map-side-combined groupBy per call at any scale; limit+
    offset bound what reaches the driver.
    """
    vals = df.where(F.col(fld).isNotNull())
    if prefix is not None:
        vals = vals.where(F.col(fld).startswith(prefix))
    counts = vals.groupBy(F.col(fld)).agg(F.count(F.lit(1)).alias("n"))
    if mincount > 0:
        counts = counts.where(F.col("n") >= mincount)
    if sort is None:
        sort = "count" if limit >= 0 else "index"
    if sort == "count":
        counts = counts.orderBy(F.col("n").desc(), F.col(fld).asc())
    elif sort == "index":
        counts = counts.orderBy(F.col(fld).asc())
    else:
        raise ValueError(f"facet.sort must be 'count' or 'index', got {sort!r}")
    if offset > 0:
        counts = counts.offset(offset)
    if limit >= 0:
        counts = counts.limit(limit)
    if missing:
        n_null = df.where(F.col(fld).isNull()).agg(
            F.count(F.lit(1)).alias("n")
        ).select(F.lit(None).cast(df.schema[fld].dataType).alias(fld), "n")
        counts = counts.unionByName(n_null)
    return counts


def facet_query_counts(df: DataFrame, predicates: Dict[str, Column]) -> DataFrame:
    """facet.query: (facet, n) — one row per named arbitrary predicate.

    All predicates are evaluated in a single aggregate over one scan
    (sum(when(p,1))) and the one-row result is unpivoted via an
    explode(map) — names travel as literal Columns, never interpolated
    into SQL text, so quotes/backticks in facet names are inert data
    (ADVICE r2: the previous stack() string was injectable).
    """
    names = sorted(predicates)
    aggs = [
        F.coalesce(
            F.sum(F.when(predicates[name], F.lit(1)).otherwise(F.lit(0))), F.lit(0)
        ).alias(f"_f{i}")
        for i, name in enumerate(names)
    ]
    row = df.agg(*aggs)
    pairs = F.map_from_arrays(
        F.array(*[F.lit(name) for name in names]),
        F.array(*[F.col(f"_f{i}") for i in range(len(names))]),
    )
    return row.select(F.explode(pairs).alias("facet", "n"))


def facet_range_counts(
    df: DataFrame, col: str, start: float, end: float, gap: float
) -> DataFrame:
    """facet.range: (bucket_start, n) over [start, end) in steps of gap.

    Matches Solr semantics: values outside [start, end) are excluded;
    every bucket in the range is reported, empty ones with n=0.
    """
    if gap <= 0 or end <= start:
        raise ValueError("facet.range needs gap > 0 and end > start")
    n_buckets = int(math.ceil((end - start) / gap))
    spark = df.sparkSession
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    v = F.col(col)
    counts = (
        df.where((v >= F.lit(start)) & (v < F.lit(end)))
        .groupBy(F.floor((v - F.lit(start)) / F.lit(gap)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        spine.join(counts, "bucket", "left")
        .select(
            (F.lit(start) + F.col("bucket") * F.lit(gap)).alias("bucket_start"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )


def facet_response(
    df: DataFrame,
    fields=(),
    predicates: Dict[str, Column] | None = None,
    ranges=(),
) -> DataFrame:
    """All facet modes of ONE request as a single long-form frame —
    (kind, facet, n) — the shape of a Solr /select response carrying
    facet.field + facet.query + facet.range together
    (AbstractFacetWidget.js:43-91 drives all three from one request).

    kind = 'field:<fld>' | 'query' | 'range:<col>'; facet is the field
    value / predicate name / bucket start, stringified so the modes
    union. Each mode stays its own one-scan map-side-combined aggregate
    (module docstring) — the union adds no shuffle.

    ``ranges``: iterable of (col, start, end, gap) tuples. Range bucket
    starts are emitted as integer strings (buckets are driver-computed
    literals), keeping the string form engine-independent.
    """
    parts = []
    for fld in fields:
        c = facet_field_counts(df, fld)
        parts.append(
            c.select(
                F.lit(f"field:{fld}").alias("kind"),
                F.col(fld).cast("string").alias("facet"),
                F.col("n").cast("long").alias("n"),
            )
        )
    if predicates:
        parts.append(
            facet_query_counts(df, predicates).select(
                F.lit("query").alias("kind"),
                F.col("facet"),
                F.col("n").cast("long").alias("n"),
            )
        )
    for col, start, end, gap in ranges:
        r = facet_range_counts(df, col, start, end, gap)
        # integral start/gap → integer-string buckets (the Solr response
        # shape); fractional buckets keep their full value — the old
        # unconditional cast('long') truncated float starts, colliding
        # distinct buckets like 0.5 and 0.9 into '0' (ADVICE r4)
        if float(start).is_integer() and float(gap).is_integer():
            bucket_str = F.col("bucket_start").cast("long").cast("string")
        else:
            bucket_str = F.col("bucket_start").cast("double").cast("string")
        parts.append(
            r.select(
                F.lit(f"range:{col}").alias("kind"),
                bucket_str.alias("facet"),
                F.col("n").cast("long").alias("n"),
            )
        )
    if not parts:
        raise ValueError("facet_response needs at least one facet mode")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# Solr date-math gap units (facet.date.gap "+1DAY"), in seconds. MONTH/
# YEAR are calendar-variable in Solr; the fixed-width subset covers the
# histogram use the reference UI puts date facets to.
_DATE_GAP_SECONDS = {
    "SECOND": 1,
    "MINUTE": 60,
    "HOUR": 3600,
    "DAY": 86400,
    "WEEK": 7 * 86400,
}


def parse_date_gap(gap: str) -> int:
    """'+1DAY' / '+6HOURS' → seconds. Raises on calendar-variable units
    (MONTH/YEAR) rather than approximating them."""
    import re as _re

    m = _re.match(r"^\+(\d+)([A-Z]+?)S?$", gap.strip().upper())
    if not m or m.group(2) not in _DATE_GAP_SECONDS:
        raise ValueError(
            f"unsupported facet.date.gap {gap!r} (use +N"
            f"{'/'.join(_DATE_GAP_SECONDS)}; MONTH/YEAR are calendar-"
            "variable and not supported)"
        )
    return int(m.group(1)) * _DATE_GAP_SECONDS[m.group(2)]


def facet_date_counts(
    df: DataFrame, col: str, start: str, end: str, gap: str
) -> DataFrame:
    """facet.date (AbstractFacetWidget.js:63-72): (bucket_start, n) time
    histogram over [start, end) in Solr date-math gaps ('+1DAY').

    Same shape as facet_range_counts — one groupBy over epoch-bucketed
    timestamps left-joined onto the generated bucket spine so empty
    buckets report 0 — with bucket_start returned as a timestamp. The
    spine is driver-sized (buckets, not rows); the scan aggregates
    map-side at any corpus size.
    """
    gap_s = parse_date_gap(gap)
    spark = df.sparkSession
    # bounds parse driver-side (normalize_ts: canonical UTC, raising
    # QueryParseError — the facade's 400 — on garbage) instead of
    # scheduling a Spark job to evaluate to_timestamp on two literals;
    # epoch-second literals also make the plan independent of
    # spark.sql.session.timeZone (the engine pins UTC, session.py)
    import datetime as _dt

    from nexlt_spark.query.parser import normalize_ts

    def _epoch(vstr: str) -> int:
        d = _dt.datetime.fromisoformat(normalize_ts(vstr))
        return int(d.replace(tzinfo=_dt.timezone.utc).timestamp())

    s_epoch, e_epoch = _epoch(start), _epoch(end)
    if e_epoch <= s_epoch:
        raise ValueError(f"facet.date needs start < end, got {start!r}..{end!r}")
    n_buckets = int(math.ceil((e_epoch - s_epoch) / gap_s))
    spine = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    v = F.unix_timestamp(F.col(col))
    ts_s = F.timestamp_seconds(F.lit(s_epoch))
    ts_e = F.timestamp_seconds(F.lit(e_epoch))
    counts = (
        df.where((F.col(col) >= ts_s) & (F.col(col) < ts_e))
        .groupBy(F.floor((v - F.lit(s_epoch)) / F.lit(gap_s)).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spine.join(counts, "bucket", "left").select(
        F.timestamp_seconds(F.lit(s_epoch) + F.col("bucket") * F.lit(gap_s)).alias(
            "bucket_start"
        ),
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )
