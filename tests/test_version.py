"""__version__ single source of truth (round-12 task 4: it was a
five-releases-stale hardcoded '0.1.0' while pyproject said 0.11.0)."""

import os
import re
import tomllib

import megalista_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject_version() -> str:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as fh:
        return tomllib.load(fh)["project"]["version"]


def test_dunder_version_matches_pyproject():
    assert megalista_spark.__version__ == _pyproject_version()


def test_no_stale_wheels_on_disk():
    # dist/ may hold only wheels of the CURRENT version — a stale wheel
    # is exactly the artifact an offline user would pip-install by glob
    dist = os.path.join(REPO, "dist")
    if not os.path.isdir(dist):
        return
    cur = _pyproject_version()
    for name in os.listdir(dist):
        m = re.match(r"megalista_spark-([0-9][^-]*)-", name)
        if m:
            assert m.group(1) == cur, f"stale artifact in dist/: {name}"
