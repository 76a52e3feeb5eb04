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


def test_docs_build_renders_html(tmp_path):
    """The docs BUILD is executed, not just lint-checked (r5; was an importorskip that
    never ran anywhere — sphinx is not installable in this zero-egress image). Real
    sphinx runs when available; otherwise the in-repo static generator
    (``docs/gen_sphinx_html.py``) renders the identical rst tree — every page produced,
    every automodule target introspected into the output."""
    try:
        import sphinx  # noqa: F401

        r = subprocess.run(
            [sys.executable, "-m", "sphinx", "-b", "html", "-W",
             str(SPHINX_DIR), str(tmp_path)],
            capture_output=True, text=True, timeout=600,
        )
        assert r.returncode == 0, f"sphinx-build -W failed:\n{r.stdout}\n{r.stderr}"
    except ImportError:
        sys.path.insert(0, str(REPO / "docs"))
        try:
            import gen_sphinx_html
        finally:
            sys.path.pop(0)
        pages = gen_sphinx_html.build(tmp_path)
        assert pages, "static docs build produced no pages"
    # Either builder: one HTML page per rst page, and spot-check that autodoc content
    # actually rendered (symbol names + docstring text, not empty shells).
    for rst in _rst_files():
        out = tmp_path / rst.relative_to(SPHINX_DIR).with_suffix(".html")
        assert out.exists(), f"no HTML rendered for {rst.name}"
    solvers_html = (tmp_path / "modules" / "solvers.html").read_text()
    for needle in ("make_solver", "blackbox_mpc_tpu.solvers.cem", "CEMConfig"):
        assert needle in solvers_html, f"autodoc content missing: {needle}"
    assert (tmp_path / "index.html").exists()


def test_committed_html_artifact_is_current():
    """docs/html (the committed build artifact) contains a page for every rst source —
    regenerate with ``python docs/gen_sphinx_html.py`` after editing docs/sphinx."""
    html_dir = REPO / "docs" / "html"
    assert html_dir.is_dir(), "committed docs build missing: run docs/gen_sphinx_html.py"
    for rst in _rst_files():
        out = html_dir / rst.relative_to(SPHINX_DIR).with_suffix(".html")
        assert out.exists(), f"stale docs/html: no page for {rst.name}"
