"""Faceting (A7): facet.field / facet.query / facet.range semantics."""

from pyspark.sql import functions as F

from nexlt_spark.query.facets import (
    facet_field_counts,
    facet_query_counts,
    facet_range_counts,
)


def test_facet_field_counts(documents):
    got = {r["role"]: r["n"] for r in facet_field_counts(documents, "role").collect()}
    want = {
        r["role"]: r["cnt"]
        for r in documents.groupBy("role").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want and sum(got.values()) == documents.count()


def test_facet_query_counts_one_scan(documents):
    preds = {
        "users": F.col("role") == "user",
        "long": F.length("text") > 200,
        "none": F.col("role") == "no-such-role",
    }
    got = {r["facet"]: r["n"] for r in facet_query_counts(documents, preds).collect()}
    assert got["users"] == documents.where(F.col("role") == "user").count()
    assert got["long"] == documents.where(F.length("text") > 200).count()
    assert got["none"] == 0
    # one scan for all predicates: a single aggregate, no join/union
    plan = facet_query_counts(documents, preds)._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan and "Join" not in plan


def test_facet_range_counts_with_empty_buckets(spark):
    rows = [(i, float(v)) for i, v in enumerate([1, 5, 5, 27, 95, 95, 95, 150])]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r["bucket_start"]: r["n"] for r in facet_range_counts(df, "v", 0, 100, 10).collect()}
    # 10 buckets, all reported; out-of-range value 150 excluded
    assert len(got) == 10
    assert got[0.0] == 3 and got[20.0] == 1 and got[90.0] == 3
    assert got[10.0] == 0 and got[50.0] == 0
    assert sum(got.values()) == 7


def test_facet_range_boundary_semantics(spark):
    # start inclusive, end exclusive, bucket edges belong to the right bucket
    df = spark.createDataFrame([(0, 0.0), (1, 10.0), (2, 99.999), (3, 100.0)], "id long, v double")
    got = {r["bucket_start"]: r["n"] for r in facet_range_counts(df, "v", 0, 100, 10).collect()}
    assert got[0.0] == 1 and got[10.0] == 1 and got[90.0] == 1
    assert sum(got.values()) == 3  # v=100.0 excluded
