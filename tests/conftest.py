import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ankiocr_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("spark-warehouse"))
    s = get_spark(
        app_name="ankiocr_spark_tests",
        master="local[4]",
        shuffle_partitions=8,
        extra={
            "spark.driver.memory": "4g",
            # bucketed-table tests saveAsTable; keep the warehouse out of
            # the repo working tree
            "spark.sql.warehouse.dir": warehouse,
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
