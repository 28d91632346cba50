"""__version__ single source of truth (round-12 task 4: it was a
five-releases-stale hardcoded '0.1.0' while pyproject said 0.11.0)."""

import os
import re

import megalista_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject_version() -> str:
    # regex, not tomllib: the package supports Python 3.10, where
    # tomllib doesn't exist — the test must collect there too
    with open(os.path.join(REPO, "pyproject.toml")) as fh:
        return re.search(r'^version\s*=\s*["\']([^"\']+)["\']', fh.read(), re.M).group(1)


def test_dunder_version_matches_pyproject():
    assert megalista_spark.__version__ == _pyproject_version()


def test_pyproject_parser_rejects_foreign_projects():
    # a vendored copy inside another repo must NOT report the host
    # project's version
    host = 'name = "someone-elses-app"\nversion = "9.9.9"\n'
    assert megalista_spark._pyproject_version(host) is None
    ours = 'name = "megalista-spark"\nversion = "1.2.3"\n'
    assert megalista_spark._pyproject_version(ours) == "1.2.3"


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
