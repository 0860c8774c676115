import pytest

from xarray_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("xarray_spark_tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
