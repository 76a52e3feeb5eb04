# Sphinx configuration (counterpart of /root/reference/docs/conf.py).
# Build: sphinx-build -b html docs/sphinx docs/_build
# (sphinx is not bundled in the framework's runtime environment; the dependency-free
# generated reference lives at docs/api_reference.md — see docs/gen_api_reference.py.)
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

project = "blackbox_mpc_tpu"
author = "blackbox_mpc_tpu authors"
release = "0.2"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]
autosummary_generate = True
autodoc_member_order = "bysource"
autodoc_mock_imports = ["jax", "jaxlib", "flax", "optax", "orbax", "tensorboardX"]
html_theme = "alabaster"
exclude_patterns = ["_build"]
