"""Packaging surface (pyproject.toml) stays consistent with the tree.

The reference ships only a requirements.txt (/root/reference/
requirements.txt:1-23); this framework is pip-installable (wheel verified
manually: `pip wheel . --no-build-isolation --no-deps` then console-script
smoke). These tests gate the cheap invariants so packaging can't silently
rot: the console entry point must resolve, the native C++ source must live
*inside* the package (wheels carry package data only), and the declared
dependency floors must be importable in the dev environment.
"""

import os
import tomllib

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_entry_point_resolves(pyproject):
    target = pyproject["project"]["scripts"]["pldepth-tpu"]
    mod_name, attr = target.split(":")
    import importlib

    import click

    obj = getattr(importlib.import_module(mod_name), attr)
    assert isinstance(obj, click.Group)
    # the documented command surface is present
    for cmd in ("train", "eval", "zeroshot", "active", "predict", "serve",
                "export", "sweep", "chi2", "convert", "warmup"):
        assert cmd in obj.commands, cmd


def test_native_source_ships_as_package_data(pyproject):
    pkg_data = pyproject["tool"]["setuptools"]["package-data"]["pldepth_tpu"]
    assert "native/packio.cpp" in pkg_data
    assert "native/Makefile" in pkg_data
    import pldepth_tpu

    pkg_dir = os.path.dirname(pldepth_tpu.__file__)
    assert os.path.exists(os.path.join(pkg_dir, "native", "packio.cpp"))
    assert os.path.exists(os.path.join(pkg_dir, "native", "Makefile"))
    # and packed.py looks for it there (not at a repo-root path a wheel lacks)
    from pldepth_tpu.data import packed

    assert os.path.normpath(packed._NATIVE_DIR) == os.path.normpath(
        os.path.join(pkg_dir, "native")
    )


def test_runtime_dependencies_importable(pyproject):
    import importlib

    mod_of = {"orbax-checkpoint": "orbax.checkpoint", "pillow": "PIL"}
    for dep in pyproject["project"]["dependencies"]:
        name = dep.split(">=")[0].split("==")[0].strip()
        importlib.import_module(mod_of.get(name, name))


def test_no_stray_requirements_file():
    # one source of dependency truth: pyproject, not a drifting requirements.txt
    assert not os.path.exists(os.path.join(REPO, "requirements.txt"))
