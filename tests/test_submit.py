"""LITERAL spark-submit --py-files run (north_rule wording: "runs via
spark-submit --py-files at N and 4N executors").

Builds the dist zip, then launches tools/submit_job.py through the real
spark-submit binary against a MULTI-EXECUTOR local-cluster master, with
the package resolvable only from --py-files (cwd pointed elsewhere).
Asserts the job's store round-trips and serves the same BM25 ranks as a
driver-local build of the same input.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles_builds_serving_store(spark, transcripts, tmp_path):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(shutil.which("pyspark") or ""), "spark-submit"
    )
    assert spark_submit and os.path.exists(spark_submit), "spark-submit not found"

    from nexlt_spark.deploy import build_pyfiles_zip

    input_dir = str(tmp_path / "input")
    transcripts.write.mode("overwrite").parquet(input_dir)
    zip_path = build_pyfiles_zip(str(tmp_path / "nexlt_spark.zip"))
    store = str(tmp_path / "store")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local-cluster[2,2,2048]",  # 2 executor JVMs x 2 cores
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", f"spark.pyspark.python={sys.executable}",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            "--input", input_dir,
            "--store", store,
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    metrics = json.loads(
        [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert metrics["n_turns"] > 0 and metrics["turns_per_sec"] > 0

    # the submitted job's store serves rank-identically to a local build
    from pyspark.sql import functions as F

    from nexlt_spark.flatten import flatten_transcripts
    from nexlt_spark.index.blocks import load_blocked_index
    from nexlt_spark.index.packed import build_blocked_direct
    from nexlt_spark.query.exact import paginate, score_postings

    bidx = load_blocked_index(spark, store)
    documents = flatten_transcripts(transcripts)
    local = build_blocked_direct(documents)

    def topk(ix):
        return [
            (r["doc_id"], round(r["score"], 9))
            for r in paginate(
                score_postings(ix, ["error", "data"], "or"),
                [F.col("score").desc(), F.col("doc_id").asc()], 0, 10,
            ).collect()
        ]

    assert topk(bidx) == topk(local)
