"""setuptools shim — metadata lives in pyproject.toml.

Kept for two reasons: parity with the reference's packaging surface
(/root/reference/setup.py installs the `crawler` package the same way)
and legacy-editable installs in environments without the `wheel` module
(`pip install -e . --no-use-pep517 --no-build-isolation`).
"""

from setuptools import setup

setup()
