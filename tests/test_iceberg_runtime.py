"""REAL-Iceberg runtime smoke test (VERDICT r3 next-round #8).

Skipped — not silently absent — in environments without an
``iceberg-spark-runtime`` jar (this sandbox ships none; the SQL-level
contract stays covered by tests/test_iceberg_sql.py). Where the jar
exists, the test creates a local hadoop-catalog warehouse in a
subprocess session (extensions must be set at session creation, so the
shared test session can't be reused), then exercises the full binding:
documents DDL → append → MERGE upsert (LWW) → snapshot log → time
travel → rollback, plus the postings-blocks bucket-partitioned write.
"""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_iceberg_jar():
    jar = os.environ.get("NEXLT_ICEBERG_JAR")
    if jar and os.path.exists(jar):
        return jar
    roots = []
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        roots.append(os.path.join(spark_home, "jars"))
    try:
        import pyspark

        roots.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:
        pass
    for r in roots:
        hits = glob.glob(os.path.join(r, "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    return None


ICEBERG_JAR = _find_iceberg_jar()

pytestmark = pytest.mark.skipif(
    ICEBERG_JAR is None,
    reason="no iceberg-spark-runtime jar on this environment (sandbox: "
    "SQL binding covered by test_iceberg_sql.py; run where the jar exists)",
)

_SMOKE = r"""
import sys, json
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F
from nexlt_spark.index.iceberg import (
    append_documents_iceberg, create_documents_sql, iceberg_available,
    merge_upsert_documents_sql, rollback_sql, time_travel_sql,
    upsert_documents_iceberg, write_blocks_iceberg,
)

spark = (
    SparkSession.builder.master("local[2]")
    .appName("nexlt-iceberg-smoke")
    .config("spark.jars", {jar!r})
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.lakehouse",
            "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.lakehouse.type", "hadoop")
    .config("spark.sql.catalog.lakehouse.warehouse", {warehouse!r})
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
assert iceberg_available(spark), "detection must see the configured catalog"
spark.sql("CREATE NAMESPACE IF NOT EXISTS lakehouse.lake")
T = "lakehouse.lake.documents"

rows1 = [(0, "c1:0", "c1", 0, "user", "hello world", None, "2024-01-01 10:00:00"),
         (1, "c1:1", "c1", 1, "assistant", "hi", None, "2024-01-01 10:00:05")]
schema = ("doc_id long, doc_key string, conv_id string, turn_idx int, "
          "role string, text string, tool string, ts string")
b1 = spark.createDataFrame(rows1, schema).withColumn("ts", F.to_timestamp("ts"))
append_documents_iceberg(b1, "lake.documents")
snap1 = spark.sql(f"SELECT snapshot_id FROM {T}.snapshots ORDER BY committed_at").collect()[-1][0]

# LWW upsert: doc 1 re-delivered with new text, doc 2 new
rows2 = [(1, "c1:1", "c1", 1, "assistant", "hi there", None, "2024-01-01 10:00:06"),
         (2, "c1:2", "c1", 2, "user", "bye", None, "2024-01-01 10:01:00")]
b2 = spark.createDataFrame(rows2, schema).withColumn("ts", F.to_timestamp("ts"))
upsert_documents_iceberg(b2, "lake.documents")
cur = {r["doc_key"]: r["text"] for r in spark.table(T).collect()}
assert cur == {"c1:0": "hello world", "c1:1": "hi there", "c1:2": "bye"}, cur

# time travel reads the pre-merge snapshot
old = {r["doc_key"]: r["text"]
       for r in spark.sql(time_travel_sql("lake.documents", snap1)).collect()}
assert old == {"c1:0": "hello world", "c1:1": "hi"}, old

# rollback restores it for current readers
spark.sql(rollback_sql("lakehouse", "lake.documents", snap1))
back = {r["doc_key"]: r["text"] for r in spark.table(T).collect()}
assert back == old, back

# blocked postings store with the native bucket(term) transform
blocks = spark.createDataFrame(
    [("spark", 0, 0, 2, 0, 5, bytearray(b"x"), bytearray(b"y"), bytearray(b"z"), 1.5)],
    "term string, rsalt long, block_id int, n int, first_doc_id long, "
    "last_doc_id long, doc_ids binary, tfs binary, dls binary, max_tfnorm double",
)
write_blocks_iceberg(blocks, "lake.postings", n_buckets=8)
assert spark.table("lakehouse.lake.postings").count() == 1
print("ICEBERG_SMOKE_OK")
"""


def test_real_iceberg_end_to_end(tmp_path):
    script = _SMOKE.format(
        repo=REPO, jar=ICEBERG_JAR, warehouse=str(tmp_path / "warehouse")
    )
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=600
    )
    assert "ICEBERG_SMOKE_OK" in out.stdout, (out.stdout[-2000:], out.stderr[-2000:])
