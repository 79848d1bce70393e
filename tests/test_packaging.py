"""Packaging parity with the reference (/root/reference/setup.py installs
the `crawler` package; this repo installs `crawler_spark` + the `jobs`
console scripts — VERDICT_r03 item 6).

These tests exercise the declared packaging surface without network or a
fresh pip run: every [project.scripts] target must import and be callable,
and the declared package list must match the packages on disk.
"""

import importlib
import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent

try:  # py311+: stdlib toml parser
    import tomllib
except ImportError:  # pragma: no cover
    tomllib = None


@pytest.fixture(scope="module")
def pyproject():
    if tomllib is None:
        pytest.skip("tomllib unavailable")
    return tomllib.loads((REPO / "pyproject.toml").read_text())


def test_console_script_targets_resolve(pyproject):
    scripts = pyproject["project"]["scripts"]
    assert len(scripts) >= 10
    sys.path.insert(0, str(REPO))
    try:
        for name, target in scripts.items():
            mod_name, func_name = target.split(":")
            mod = importlib.import_module(mod_name)
            fn = getattr(mod, func_name)
            assert callable(fn), f"{name} -> {target} is not callable"
    finally:
        sys.path.remove(str(REPO))


def test_declared_packages_exist_on_disk(pyproject):
    for pkg in pyproject["tool"]["setuptools"]["packages"]:
        d = REPO / pkg.replace(".", "/")
        assert (d / "__init__.py").is_file(), f"missing package dir {pkg}"


def test_disk_packages_all_declared(pyproject):
    declared = set(pyproject["tool"]["setuptools"]["packages"])
    on_disk = {
        f"crawler_spark.{p.parent.name}"
        for p in (REPO / "crawler_spark").glob("*/__init__.py")
    } | {"crawler_spark", "jobs"}
    assert on_disk <= declared, f"undeclared packages: {on_disk - declared}"


def test_jobs_keep_spark_submit_shape():
    """pip packaging must not break the documented spark-submit path:
    every job module still guards its entry point with __main__."""
    for f in (REPO / "jobs").glob("*.py"):
        if f.name == "__init__.py":
            continue
        text = f.read_text()
        assert 'if __name__ == "__main__":' in text, f.name
        assert "def main(" in text, f.name
