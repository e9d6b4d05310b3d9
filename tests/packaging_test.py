"""Packaging sanity: the project must ship the way the reference does
(reference setup.py — pip package `deepctr`). Validates pyproject.toml via
the real setuptools build backend (no pip/network): metadata parses, every
subpackage is discovered, and the native C++ source ships as package data.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import os, sys, tempfile, glob
os.chdir(sys.argv[1])
from setuptools.build_meta import _BuildMetaBackend
be = _BuildMetaBackend()
with tempfile.TemporaryDirectory() as td:
    name = be.prepare_metadata_for_build_wheel(td)
    src = open(os.path.join(td, "deepctr_tpu.egg-info", "SOURCES.txt")).read()
print("METADATA_OK", name)
print(src)
"""


@pytest.fixture(scope="module")
def sources():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT, REPO],
        capture_output=True, text=True, timeout=180)
    assert "METADATA_OK" in out.stdout, out.stdout + out.stderr
    return out.stdout


def test_metadata_builds(sources):
    assert "deepctr_tpu-0.1.0" in sources


def test_all_subpackages_discovered(sources):
    for sub in ["deepctr_tpu/models/sequence/__init__.py",
                "deepctr_tpu/models/multitask/__init__.py",
                "deepctr_tpu/estimator/__init__.py",
                "deepctr_tpu/layers/__init__.py",
                "deepctr_tpu/ops/__init__.py",
                "deepctr_tpu/parallel/__init__.py",
                "deepctr_tpu/training/__init__.py",
                "deepctr_tpu/native/__init__.py"]:
        assert sub in sources, sub


def test_native_source_ships(sources):
    assert "deepctr_tpu/native/src/hostops.cc" in sources


def test_version_matches_package():
    import deepctr_tpu

    try:
        import tomllib
    except ImportError:
        pytest.skip("tomllib unavailable")
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["version"] == deepctr_tpu.__version__
