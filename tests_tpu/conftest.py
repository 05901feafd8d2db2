"""On-device (TPU) test suite — run explicitly with:

    python -m pytest tests_tpu/ -q

Unlike tests/ (which forces the 8-virtual-device CPU backend), these run
on whatever accelerator JAX selects and are skipped wholesale off-TPU.
Expect slow first-compile times through the tunnel (up to minutes).
"""
import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="requires a TPU backend")
        for item in items:
            item.add_marker(skip)
