import pytest

from xidel_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small local session: crawl tests run many tiny iterative jobs, so keep
    # shuffle partitions low; production sizing is submit-time config.
    s = get_spark("xidel_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
