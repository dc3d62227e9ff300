import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nexlt_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="nexlt-tests",
        master=os.environ.get("NEXLT_TEST_MASTER", "local[4]"),
        shuffle_partitions=8,
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def transcripts(spark):
    from nexlt_spark.synth import synth_transcripts

    return synth_transcripts(spark, n_convs=120, seed=42).persist()


@pytest.fixture(scope="session")
def documents(transcripts):
    from nexlt_spark.flatten import flatten_transcripts

    return flatten_transcripts(transcripts, num_partitions=8).persist()


@pytest.fixture(scope="session")
def index(documents):
    from nexlt_spark.index.build import build_index

    return build_index(documents).persist()


@pytest.fixture(scope="session")
def pos_index(documents):
    from nexlt_spark.index.build import build_index

    return build_index(documents, positions=True).persist()


@pytest.fixture(scope="session")
def oracle(documents):
    from nexlt_spark.oracle import OracleIndex

    rows = [r.asDict() for r in documents.collect()]
    return OracleIndex(rows)
