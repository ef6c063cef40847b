import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from driftmind_spark.session import get_spark

    spark = get_spark(master="local[4]", app_name="driftmind-tests",
                      shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def pages_dir(tmp_path_factory):
    """Small deterministic pages corpus shared by Spark pipeline tests."""
    from driftmind_spark.synth import write_corpus

    out = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(out, n=400, seed=42)
    return out
