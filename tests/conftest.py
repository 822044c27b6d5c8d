import pytest

from rdf2smw_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="rdf2smw_spark-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
