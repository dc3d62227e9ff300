"""Iceberg catalog binding (index/iceberg.py): the DDL/DML generators are
pure and fully testable without the runtime jar; the writer facades must
refuse loudly (not corrupt anything) on a session without Iceberg."""

import pytest

from nexlt_spark.index.iceberg import (
    append_documents_iceberg,
    create_documents_sql,
    create_postings_blocks_sql,
    expire_snapshots_sql,
    iceberg_available,
    merge_upsert_documents_sql,
    rollback_sql,
    time_travel_sql,
    write_blocks_iceberg,
)
from nexlt_spark.query.parser import QueryParseError


def test_postings_ddl_shape():
    sql = create_postings_blocks_sql("lake.search.postings", n_buckets=64)
    assert "CREATE TABLE IF NOT EXISTS lake.search.postings" in sql
    assert "USING iceberg" in sql
    assert "PARTITIONED BY (bucket(64, term))" in sql
    # every stand-in store column survives into the catalog DDL
    for col in ("term string", "rsalt long", "doc_ids binary", "max_tfnorm double"):
        assert col in sql
    assert "pos binary" not in sql
    assert "pos binary" in create_postings_blocks_sql("t", positions=True)
    assert "zstd" in sql


def test_documents_ddl_daily_partitioning():
    sql = create_documents_sql("lake.search.documents")
    assert "PARTITIONED BY (days(ts))" in sql
    for col in ("doc_id bigint", "doc_key string", "turn_idx int", "ts timestamp"):
        assert col in sql


def test_merge_upsert_is_doc_key_lww():
    sql = merge_upsert_documents_sql("lake.docs", "batch_view")
    assert sql.splitlines() == [
        "MERGE INTO lake.docs t",
        "USING batch_view s",
        "ON t.doc_key = s.doc_key",
        "WHEN MATCHED THEN UPDATE SET *",
        "WHEN NOT MATCHED THEN INSERT *",
    ]


def test_snapshot_procedures():
    assert (
        time_travel_sql("lake.docs", 42) == "SELECT * FROM lake.docs VERSION AS OF 42"
    )
    assert rollback_sql("lake", "search.docs", 7) == (
        "CALL lake.system.rollback_to_snapshot('search.docs', 7)"
    )
    bare = expire_snapshots_sql("lake", "search.docs")
    assert bare == "CALL lake.system.expire_snapshots(table => 'search.docs')"
    aged = expire_snapshots_sql("lake", "search.docs", older_than="2026-1-2")
    # bounds canonicalize through normalize_ts, never raw interpolation
    assert "TIMESTAMP '2026-01-02T00:00:00.000000'" in aged
    with pytest.raises(QueryParseError):
        expire_snapshots_sql("lake", "search.docs", older_than="yesterday-ish")


def test_ddl_columns_split_top_level_only():
    # parameterized types must survive the column split intact
    from nexlt_spark.index.iceberg import _ddl_columns

    body = _ddl_columns(
        "a decimal(10,2), b map<string,int>, c array<struct<x:int,y:string>>, d string"
    )
    cols = [c.strip() for c in body.split(",\n  ")]
    assert cols == [
        "a decimal(10,2)",
        "b map<string,int>",
        "c array<struct<x:int,y:string>>",
        "d string",
    ]


@pytest.mark.parametrize(
    "bad",
    ["docs; DROP TABLE x", "a-b.c", "", "lake..docs", "d'ocs", "1docs"],
)
def test_identifiers_validated_not_interpolated(bad):
    with pytest.raises(ValueError):
        create_documents_sql(bad)
    with pytest.raises(ValueError):
        merge_upsert_documents_sql("ok", bad)


def test_runtime_facades_gated_in_sandbox(spark, documents):
    # this container ships no Iceberg jar: detection must say so without
    # running a job, and the writers must raise the configuration error
    # instead of attempting a write
    assert iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        write_blocks_iceberg(documents.limit(1), "lake.postings")
    with pytest.raises(RuntimeError, match="spark.sql.extensions"):
        append_documents_iceberg(documents.limit(1), "lake.docs")
