import pytest

from jsonschema_rs_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="jrs-tests", cores=8, shuffle_partitions=8)
    yield s
