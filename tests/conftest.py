import pytest

from no_fasel_scrapers_spark.session import get_spark
from no_fasel_scrapers_spark.sources.fixture import Fixture


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture():
    return Fixture()
