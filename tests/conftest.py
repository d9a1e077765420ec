import pytest

from g4s_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("g4s_spark_tests", shuffle_partitions=8)
    yield s
