import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pravega_spark.session import get_spark

    spark = get_spark("tests")
    yield spark


@pytest.fixture()
def store(spark, tmp_path):
    from pravega_spark.store import StreamStore

    root = str(tmp_path / "store")
    st = StreamStore(spark, root)
    yield st
    shutil.rmtree(root, ignore_errors=True)


@pytest.fixture(scope="session")
def events(spark):
    from pravega_spark.sources import load_table

    return load_table(spark, SF_DIR, "events").cache()
