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


def facet_field_counts(df: DataFrame, fld: str) -> DataFrame:
    """facet.field: (value, n) counts per distinct field value."""
    return df.groupBy(F.col(fld)).agg(F.count(F.lit(1)).alias("n"))


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
