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
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
]
autodoc_member_order = "bysource"
# Hard deps (jax, optax, orbax, numpy) must be importable for a real autodoc build —
# mocking jax breaks dataclass field defaults (jnp.float32) and pytree registration at
# import time. Only soft/optional deps are mocked.
autodoc_mock_imports = ["tensorboardX", "imageio", "gymnasium", "mujoco"]
html_theme = "alabaster"
exclude_patterns = ["_build"]
