#!/usr/bin/env python
"""Dependency-free wheel builder for flint-spark.

This environment (and any minimal container) ships setuptools without
the ``wheel`` backend, so ``setup.py bdist_wheel`` cannot run — but the
package is pure Python and a wheel is just a PEP-427 zip with a
dist-info: payload files + METADATA + WHEEL + RECORD (sha256 digests).
This script builds exactly that artifact from pyproject.toml, with no
build backend at all::

    python tools/build_wheel.py [dist_dir]      # default: dist/

Where a full toolchain exists, ``pip wheel .`` / ``setup.py
bdist_wheel`` produce an equivalent artifact from the same metadata;
``tests/test_extensions.py`` builds through THIS script when the
backend is absent and through the real backend when present, and
imports the package from the wheel alone (zipimport) either way.
"""

from __future__ import annotations

import base64
import hashlib
import pathlib
import sys
import zipfile

REPO = pathlib.Path(__file__).resolve().parents[1]
PACKAGES = ("flint_spark", "ts")


def _project_meta() -> dict:
    import tomllib

    return tomllib.loads((REPO / "pyproject.toml").read_text())["project"]


def build_wheel(dist_dir: pathlib.Path) -> pathlib.Path:
    proj = _project_meta()
    version = proj["version"]
    name = f"flint_spark-{version}"
    dist_dir.mkdir(parents=True, exist_ok=True)
    whl = dist_dir / f"{name}-py3-none-any.whl"

    payload = sorted(
        p for pkg in PACKAGES for p in (REPO / pkg).rglob("*.py")
        if "__pycache__" not in p.parts)
    if len(payload) < 30:
        raise RuntimeError(f"suspiciously small payload ({len(payload)} "
                           f"files) — run from the repo root checkout")

    def digest(data: bytes) -> str:
        return base64.urlsafe_b64encode(
            hashlib.sha256(data).digest()).rstrip(b"=").decode()

    record_rows = []
    with zipfile.ZipFile(whl, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in payload:
            arc = p.relative_to(REPO).as_posix()
            data = p.read_bytes()
            zf.writestr(arc, data)
            record_rows.append(f"{arc},sha256={digest(data)},{len(data)}")
        di = f"{name}.dist-info"
        deps = "".join(f"Requires-Dist: {d}\n"
                       for d in proj.get("dependencies", []))
        meta = (f"Metadata-Version: 2.1\nName: flint-spark\n"
                f"Version: {version}\n"
                f"Summary: {proj.get('description', '')}\n"
                f"Requires-Python: {proj.get('requires-python', '')}\n"
                f"{deps}")
        wheel_meta = ("Wheel-Version: 1.0\nGenerator: flint-spark "
                      "tools/build_wheel.py\nRoot-Is-Purelib: true\n"
                      "Tag: py3-none-any\n")
        for fn, body in ((f"{di}/METADATA", meta),
                         (f"{di}/WHEEL", wheel_meta)):
            data = body.encode()
            zf.writestr(fn, data)
            record_rows.append(f"{fn},sha256={digest(data)},{len(data)}")
        record_rows.append(f"{di}/RECORD,,")
        zf.writestr(f"{di}/RECORD", "\n".join(record_rows) + "\n")
    return whl


if __name__ == "__main__":
    out_dir = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 \
        else REPO / "dist"
    print(build_wheel(out_dir))
