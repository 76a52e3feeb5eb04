"""Sphinx docs-tree validation.

The reference ships a full per-module rst tree (``/root/reference/docs/modules/*.rst``);
ours lives in ``docs/sphinx/``. Two layers of checking:

1. Structural (always on, no sphinx needed): every ``automodule::`` target imports, every
   public package module has an autodoc entry somewhere in the tree, and every toctree
   entry resolves to an existing page.
2. ``sphinx-build -W`` (skipped when sphinx is not installed — it is not bundled in this
   runtime image; any environment with sphinx runs the real build in CI).
"""
import importlib
import pkgutil
import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPHINX_DIR = REPO / "docs" / "sphinx"


def _rst_files():
    files = sorted(SPHINX_DIR.rglob("*.rst"))
    assert files, f"no rst files under {SPHINX_DIR}"
    return files


def _automodule_targets():
    targets = []
    for f in _rst_files():
        targets += re.findall(r"^\.\. automodule:: +(\S+)", f.read_text(), re.M)
    return targets


def test_every_automodule_target_imports():
    targets = _automodule_targets()
    assert targets, "no automodule directives found"
    for mod in targets:
        importlib.import_module(mod)


def test_every_public_module_is_documented():
    import blackbox_mpc_tpu

    documented = set(_automodule_targets())
    missing = []
    for info in pkgutil.walk_packages(blackbox_mpc_tpu.__path__, "blackbox_mpc_tpu."):
        leaf = info.name.rsplit(".", 1)[-1]
        if leaf.startswith("_"):
            continue
        if info.ispkg:
            continue  # subpackages documented via their modules (or their own entry)
        if info.name not in documented:
            missing.append(info.name)
    assert not missing, f"modules without a sphinx autodoc page: {missing}"


def test_toctree_entries_resolve():
    for f in _rst_files():
        text = f.read_text()
        for block in re.findall(r"\.\. toctree::\n((?:[ \t]+\S.*\n?)+)", text):
            for line in block.splitlines():
                entry = line.strip()
                if not entry or entry.startswith(":"):
                    continue
                target = (f.parent / entry).with_suffix(".rst")
                assert target.exists(), f"{f.name}: toctree entry {entry!r} -> {target} missing"


def test_sphinx_build_passes_with_warnings_as_errors(tmp_path):
    pytest.importorskip("sphinx")
    r = subprocess.run(
        [sys.executable, "-m", "sphinx", "-b", "html", "-W", str(SPHINX_DIR), str(tmp_path)],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"sphinx-build -W failed:\n{r.stdout}\n{r.stderr}"
