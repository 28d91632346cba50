"""Stdlib-only wheel builder for offline hosts.

setuptools < 70.1 cannot build (or editable-install) a PEP 517 project
without the third-party ``wheel`` package — ``dist_info`` dies with
``invalid command 'bdist_wheel'`` — and an air-gapped host cannot fetch
it. A wheel, however, is just a zip with a ``.dist-info`` directory
(PEP 427), and *installing* one needs nothing but pip itself. This
script builds ``dist/megalista_spark-<version>-py3-none-any.whl`` from
pyproject.toml + the package tree using only the standard library:

    python scripts/build_wheel.py
    pip install --no-deps dist/megalista_spark-*.whl

Deterministic: fixed zip timestamps, sorted member order — rebuilding
from the same tree yields a byte-identical wheel.
"""

from __future__ import annotations

import base64
import hashlib
import os
import sys
import tomllib
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "megalista_spark"
ZIP_DATE = (1980, 1, 1, 0, 0, 0)  # fixed → reproducible archive


def _record_hash(data: bytes) -> str:
    digest = hashlib.sha256(data).digest()
    return "sha256=" + base64.urlsafe_b64encode(digest).rstrip(b"=").decode()


def _metadata(proj: dict) -> str:
    lines = [
        "Metadata-Version: 2.1",
        f"Name: {proj['name']}",
        f"Version: {proj['version']}",
    ]
    if proj.get("description"):
        lines.append(f"Summary: {proj['description']}")
    if proj.get("requires-python"):
        lines.append(f"Requires-Python: {proj['requires-python']}")
    if isinstance(proj.get("license"), dict) and proj["license"].get("text"):
        lines.append(f"License: {proj['license']['text']}")
    for dep in proj.get("dependencies", []):
        lines.append(f"Requires-Dist: {dep}")
    for extra, deps in proj.get("optional-dependencies", {}).items():
        lines.append(f"Provides-Extra: {extra}")
        for dep in deps:
            lines.append(f'Requires-Dist: {dep} ; extra == "{extra}"')
    return "\n".join(lines) + "\n"


def _package_files() -> list[str]:
    out = []
    for root, dirs, files in os.walk(os.path.join(REPO, PKG)):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith((".pyc", ".pyo")):
                continue
            out.append(os.path.relpath(os.path.join(root, f), REPO))
    return out


def main() -> str:
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as fh:
        proj = tomllib.load(fh)["project"]
    version = proj["version"]
    dist = proj["name"].replace("-", "_")
    dist_info = f"{dist}-{version}.dist-info"
    wheel_meta = (
        "Wheel-Version: 1.0\n"
        "Generator: scripts/build_wheel.py (stdlib)\n"
        "Root-Is-Purelib: true\n"
        "Tag: py3-none-any\n"
    )
    os.makedirs(os.path.join(REPO, "dist"), exist_ok=True)
    whl_path = os.path.join(REPO, "dist", f"{dist}-{version}-py3-none-any.whl")

    record_rows: list[str] = []

    def add(zf: zipfile.ZipFile, arcname: str, data: bytes) -> None:
        info = zipfile.ZipInfo(arcname, date_time=ZIP_DATE)
        info.external_attr = 0o644 << 16
        zf.writestr(info, data, compress_type=zipfile.ZIP_DEFLATED)
        record_rows.append(f"{arcname},{_record_hash(data)},{len(data)}")

    with zipfile.ZipFile(whl_path, "w") as zf:
        for rel in _package_files():
            with open(os.path.join(REPO, rel), "rb") as fh:
                add(zf, rel.replace(os.sep, "/"), fh.read())
        add(zf, f"{dist_info}/METADATA", _metadata(proj).encode())
        add(zf, f"{dist_info}/WHEEL", wheel_meta.encode())
        add(zf, f"{dist_info}/top_level.txt", f"{PKG}\n".encode())
        record_rows.append(f"{dist_info}/RECORD,,")
        info = zipfile.ZipInfo(f"{dist_info}/RECORD", date_time=ZIP_DATE)
        info.external_attr = 0o644 << 16
        zf.writestr(
            info,
            ("\n".join(record_rows) + "\n").encode(),
            compress_type=zipfile.ZIP_DEFLATED,
        )
    print(whl_path)
    return whl_path


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
