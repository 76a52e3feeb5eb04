"""Minimal static HTML renderer for the sphinx autodoc tree (``docs/sphinx/``).

The reference ships a ReadTheDocs-buildable sphinx tree (``/root/reference/docs/conf.py``,
``.readthedocs.yml``); ours (``docs/sphinx/``) is sphinx-compatible, but sphinx itself is
not installable in this zero-egress runtime image. This generator is the honest fallback:
it executes the SAME contract a sphinx HTML build would — walk ``index.rst``'s toctree,
import every ``automodule::`` target, introspect its public surface (docstrings +
signatures), and render one HTML page per rst page — so the docs build is *exercised
end-to-end*, not merely lint-checked. Any environment with real sphinx can still run
``sphinx-build -W docs/sphinx out/`` against the identical sources (tests/test_docs.py).

Usage::

    python docs/gen_sphinx_html.py [output_dir]    # default: docs/html
"""
from __future__ import annotations

import html
import importlib
import inspect
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SPHINX_DIR = REPO / "docs" / "sphinx"

_CSS = """
body { font-family: system-ui, sans-serif; max-width: 60rem; margin: 2rem auto;
       padding: 0 1rem; line-height: 1.5; color: #1a1a1a; }
h1 { border-bottom: 2px solid #ddd; padding-bottom: .3rem; }
h2 { margin-top: 2rem; color: #234; }
code, pre { background: #f6f8fa; border-radius: 4px; }
pre { padding: .8rem; overflow-x: auto; white-space: pre-wrap; }
.sig { background: #eef3f8; padding: .4rem .6rem; border-left: 3px solid #4a7ab5;
       font-family: monospace; margin-top: 1.2rem; }
nav a { margin-right: 1rem; }
.member { margin-left: 1rem; }
"""


def _page_shell(title: str, body: str, root_rel: str = "") -> str:
    return (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)}</title><style>{_CSS}</style></head><body>"
        f"<nav><a href='{root_rel}index.html'>blackbox_mpc_tpu docs</a></nav>"
        f"{body}</body></html>"
    )


def _doc_block(obj) -> str:
    doc = inspect.getdoc(obj)
    return f"<pre>{html.escape(doc)}</pre>" if doc else ""


def _signature(name: str, obj) -> str:
    try:
        return f"{name}{inspect.signature(obj)}"
    except (ValueError, TypeError):
        return name


def _public_members(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None:
            continue
        # autodoc convention: only members defined (or re-exported) by this module
        mod_of = getattr(obj, "__module__", mod.__name__)
        if not (mod_of or "").startswith("blackbox_mpc_tpu") and names is not getattr(
            mod, "__all__", None
        ):
            continue
        yield n, obj


def _render_module(target: str) -> str:
    mod = importlib.import_module(target)
    parts = [f"<h2 id='{html.escape(target)}'><code>{html.escape(target)}</code></h2>"]
    parts.append(_doc_block(mod))
    for name, obj in _public_members(mod):
        if inspect.isclass(obj):
            parts.append(
                f"<div class='sig'>class {html.escape(_signature(name, obj))}</div>"
            )
            parts.append(f"<div class='member'>{_doc_block(obj)}</div>")
            for mname, meth in inspect.getmembers(obj):
                if mname.startswith("_") or not callable(meth):
                    continue
                if inspect.getdoc(meth) and mname in vars(obj):
                    parts.append(
                        "<div class='member'><div class='sig'>"
                        f"{html.escape(_signature(f'{name}.{mname}', meth))}</div>"
                        f"{_doc_block(meth)}</div>"
                    )
        elif callable(obj):
            parts.append(f"<div class='sig'>{html.escape(_signature(name, obj))}</div>")
            parts.append(f"<div class='member'>{_doc_block(obj)}</div>")
        else:  # module-level data (registries, constants)
            parts.append(
                f"<div class='sig'>{html.escape(name)}: "
                f"{html.escape(type(obj).__name__)}</div>"
            )
    return "\n".join(p for p in parts if p)


def _title_of(text: str, fallback: str) -> str:
    m = re.match(r"(?m)^(\S.*)\n[=~^\-`]+\s*$", text)
    return m.group(1).strip() if m else fallback


def _toctree_entries(text: str):
    for block in re.findall(r"\.\. toctree::\n((?:[ \t]+\S.*\n?)+)", text):
        for line in block.splitlines():
            entry = line.strip()
            if entry and not entry.startswith(":"):
                yield entry


def build(out_dir: Path) -> list[Path]:
    """Renders every rst page under docs/sphinx to ``out_dir``; returns written paths."""
    sys.path.insert(0, str(REPO))
    written = []
    for rst in sorted(SPHINX_DIR.rglob("*.rst")):
        rel = rst.relative_to(SPHINX_DIR).with_suffix(".html")
        text = rst.read_text()
        title = _title_of(text, rst.stem)
        root_rel = "../" * (len(rel.parts) - 1)
        body = [f"<h1>{html.escape(title)}</h1>"]
        # prose: everything that is not a directive block gets a light-touch rendering
        prose = re.sub(r"(?m)^\.\. (toctree|automodule)::.*\n((?:[ \t]+.*\n?)*)", "", text)
        prose = re.sub(r"(?m)^(\S.*)\n[=~^\-`]+\s*$", "", prose)  # headings handled above
        prose = re.sub(r"``([^`]+)``", r"<code>\1</code>", html.escape(prose.strip()))
        if prose:
            body.append(f"<p>{prose}</p>")
        entries = list(_toctree_entries(text))
        if entries:
            body.append("<ul>")
            for e in entries:
                body.append(f"<li><a href='{html.escape(e)}.html'>{html.escape(e)}</a></li>")
            body.append("</ul>")
        for target in re.findall(r"^\.\. automodule:: +(\S+)", text, re.M):
            body.append(_render_module(target))
        out = out_dir / rel
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(_page_shell(title, "\n".join(body), root_rel))
        written.append(out)
    return written


if __name__ == "__main__":
    dest = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "docs" / "html"
    pages = build(dest)
    total = sum(p.stat().st_size for p in pages)
    print(f"rendered {len(pages)} pages ({total / 1024:.0f} KiB) -> {dest}")
