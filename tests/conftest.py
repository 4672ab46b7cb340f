import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from geofileops_spark.session import get_spark

    s = get_spark(
        app_name="gfo-spark-tests",
        master=f"local[{os.environ.get('SPARK_TEST_CPUS', '4')}]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.execution.arrow.maxRecordsPerBatch": "2048"},
    )
    yield s
