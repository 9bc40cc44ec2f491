import pytest


@pytest.fixture(scope="session")
def spark():
    from ionex_spark.session import get_spark

    s = get_spark("pytest", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
