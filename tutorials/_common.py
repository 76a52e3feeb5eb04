"""Shared tutorial plumbing: platform selection and argument defaults.

All tutorials run on CPU by default (fast anywhere, supports the virtual multi-device mesh);
pass ``--tpu`` to run on the attached TPU instead.
"""
import argparse
import logging
import os


def setup(description: str, **extra_args) -> argparse.Namespace:
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s: %(message)s")
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--tpu", action="store_true", help="run on TPU (default: CPU)")
    parser.add_argument("--seed", type=int, default=0)
    for name, default in extra_args.items():
        parser.add_argument(f"--{name.replace('_', '-')}", type=type(default), default=default)
    args, _unknown = parser.parse_known_args()
    if not args.tpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    return args
