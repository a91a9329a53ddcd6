"""Compatibility shim: all metadata lives in pyproject.toml.

Exists so environments without PEP-517 frontends (or without the
`wheel` package, whose bdist_wheel setuptools<70 needs) can still
build artifacts: `python setup.py sdist`. tests/test_extensions.py
builds the sdist and imports `flint_spark` + `ts.flint` from the
extracted artifact."""
from setuptools import setup

setup()
