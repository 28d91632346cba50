from __future__ import annotations

import os

import pytest

from megalista_spark.session import get_spark

# Executor Python workers inherit the JVM's environment, not pytest's
# runtime sys.path — make test modules importable when closures defined in
# them (mock transports) are unpickled on workers.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ["PYTHONPATH"] = (
    f"{_REPO}:{_REPO}/tests:" + os.environ.get("PYTHONPATH", "")
)


def pytest_collection_modifyitems(config, items):
    # "fast" marks the curated <5-min subset (tests/fast_suite.py) so a
    # time-budgeted gate can run `-m fast` and still touch every operator
    # family; base name match so parametrized variants ride along.
    from fast_suite import FAST_TESTS

    for item in items:
        base = item.name.split("[", 1)[0]
        if base in FAST_TESTS:
            item.add_marker(pytest.mark.fast)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="megalista_spark_tests", shuffle_partitions=8)
    yield s
    # keep the session alive across the whole pytest run; stop at the end
    s.stop()


@pytest.fixture()
def sf_dir():
    return "/root/testdata/sf0.001"
