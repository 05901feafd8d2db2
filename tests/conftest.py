"""Test harness config.

Forces the CPU backend with 8 virtual devices BEFORE jax initializes, per
SURVEY.md §4(d): sharding/pmap/GSPMD tests run on a virtual 8-device CPU
mesh (the standard way to test multi-chip code without a pod).  Parity
tests vs torch also run on CPU so FFT numerics differences reflect our
math, not cross-backend float drift.  TPU execution is covered by
bench.py / __graft_entry__.py, which the driver runs on the real chip.
"""
import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel
# (axon), which is slow to compile and can't host-transfer complex arrays —
# parity tests must run on the CPU backend regardless.  NOTE: `import
# pytest` already imports jax (via an installed plugin), so env vars are
# too late here; the backend, however, is not yet initialized, so
# jax.config.update still takes effect.
os.environ["JAX_PLATFORMS"] = "cpu"  # for any late-spawned subprocess

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# SURVEY §5 sanitizer analog: TAC_DEBUG_NANS=1 makes every test fail on
# the first NaN/Inf produced inside jit (jax re-runs un-jitted to locate it)
if os.environ.get("TAC_DEBUG_NANS") == "1":
    jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.device_count() == 8 and jax.devices()[0].platform == "cpu", (
    "tests require the 8-virtual-device CPU backend; got "
    f"{jax.devices()}")


# ---- fast/slow lanes ---------------------------------------------
# The full suite is ~60 min on this 1-core host; `pytest -m "not slow"`
# is the fast lane (target <= 15 min) that every change should run.
# The slow lane (importer torch replicas, examples, dataset trees,
# multihost, the heaviest shard_map/model suites) runs nightly /
# per-round: `pytest -m slow`.  Modules are marked here centrally so
# the split is one list, not 80 decorators.
_SLOW_MODULES = {
    "test_import_torch.py", "test_import_torch_extra.py",
    "test_import_hdemucs.py", "test_import_squim.py",
    "test_import_emformer_rnnt.py",
    "test_examples.py", "test_datasets.py", "test_multihost_2proc.py",
    "test_spattn.py", "test_pipelines.py", "test_bench_smoke.py",
    "test_tacotron2.py", "test_wavernn.py", "test_emformer_rnnt.py",
    "test_fsdp.py", "test_pp.py", "test_stream_io.py",
    "test_squim.py", "test_prototype_ssl.py", "test_vggish.py",
    "test_hdemucs.py", "test_conformer_w2v2.py",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
        if mod in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture()
def rng(request):
    # per-test deterministic stream (stable across runs and machines): a
    # session-scoped generator made test data depend on execution order
    # (adding a test file changed the inputs of every later test)
    import zlib

    seed = zlib.crc32(request.node.nodeid.encode())
    return np.random.default_rng(seed)
