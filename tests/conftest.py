from __future__ import annotations

import pytest

from megalista_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="megalista_spark_tests", shuffle_partitions=8)
    yield s
    # keep the session alive across the whole pytest run; stop at the end
    s.stop()


@pytest.fixture()
def sf_dir():
    return "/root/testdata/sf0.001"
