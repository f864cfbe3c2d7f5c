from __future__ import annotations

import pytest

from datalakes_and_data_integration_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=4, shuffle_partitions=4)
    yield s
