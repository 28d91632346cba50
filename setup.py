"""Legacy setuptools shim.

All metadata lives in pyproject.toml; this file exists so dev installs
work on offline hosts whose setuptools predates the vendored wheel
backend (< 70.1) and that lack the ``wheel`` package — there the PEP
517/660 paths (``pip install`` / ``pip install -e``) die in
``dist_info`` with ``invalid command 'bdist_wheel'``, while the legacy
``python setup.py develop`` path needs no wheel at all. See README
"Installation" for the offline-host matrix (the stdlib-only
``scripts/build_wheel.py`` covers non-editable installs).
"""

from setuptools import setup

setup()
