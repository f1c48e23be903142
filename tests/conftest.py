import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dlt_iceberg_spark.session import configure_session  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "integration: needs live external services (REST catalog, object "
        "store) — auto-skipped when unreachable, mirroring the reference's "
        "docker-based integration suite",
    )


@pytest.fixture(scope="session")
def spark():
    s = (
        configure_session(
            SparkSession.builder.appName("tests").master("local[4]"),
            shuffle_partitions=4,
        )
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "warehouse")
