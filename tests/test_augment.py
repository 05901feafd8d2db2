"""SpecAugment masks: coverage bounds, determinism, vmap, gradients."""
import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops


def test_time_mask_bounds(rng):
    spec = jnp.ones((4, 64, 100), jnp.float32)
    out = ops.time_mask(jax.random.PRNGKey(0), spec, mask_param=20)
    zeros_per_row = np.sum(np.asarray(out)[0, 0] == 0)
    assert 0 <= zeros_per_row <= 20
    # mask is a contiguous band shared across batch/freq
    cols = np.where(np.asarray(out)[0, 0] == 0)[0]
    if len(cols):
        assert cols[-1] - cols[0] + 1 == len(cols)
        np.testing.assert_array_equal(np.asarray(out)[1, 3] == 0,
                                      np.asarray(out)[0, 0] == 0)


def test_freq_mask_and_value(rng):
    spec = jnp.ones((2, 64, 50), jnp.float32)
    out = ops.freq_mask(jax.random.PRNGKey(1), spec, 16, num_masks=2,
                        mask_value=-80.0)
    a = np.asarray(out)
    masked_rows = np.unique(np.where(a == -80.0)[1])
    assert len(masked_rows) <= 32
    assert np.all((a == 1.0) | (a == -80.0))


def test_deterministic_and_vmap(rng):
    spec = jnp.ones((3, 32, 40), jnp.float32)
    k = jax.random.PRNGKey(7)
    a = ops.time_mask(k, spec, 10)
    b = ops.time_mask(k, spec, 10)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # per-example independent masks via vmap over keys
    keys = jax.random.split(k, 3)
    per_ex = jax.vmap(lambda kk, s: ops.time_mask(kk, s, 10))(keys, spec)
    assert per_ex.shape == spec.shape


def test_gradient_passthrough(rng):
    spec = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    k = jax.random.PRNGKey(3)
    g = jax.grad(lambda s: jnp.sum(ops.freq_mask(k, s, 4) ** 2))(spec)
    out = np.asarray(ops.freq_mask(k, spec, 4))
    g = np.asarray(g)
    # grad is 2x where unmasked, 0 where masked
    np.testing.assert_allclose(g[out != 0], 2 * np.asarray(spec)[out != 0],
                               rtol=1e-6)
    assert np.all(g[out == 0] == 0)


def test_zero_param_identity(rng):
    spec = jnp.asarray(rng.standard_normal((4, 8)).astype(np.float32))
    out = ops.mask_along_axis(jax.random.PRNGKey(0), spec, 0, axis=-1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(spec))


def test_mask_along_axis_iid_independent(rng):
    import pytest
    specs = jnp.ones((4, 12, 30))
    out = ops.mask_along_axis_iid(jax.random.PRNGKey(1), specs, 10,
                                  axis=-1, mask_value=-1.0)
    # each example got its own mask: columns masked differ across batch
    cols = [set(np.where(np.asarray(out[i]).min(0) == -1.0)[0].tolist())
            for i in range(4)]
    assert len({frozenset(c) for c in cols}) > 1
    # masking is along the requested axis only
    masked = np.asarray(out[0]).min(1) == -1.0
    assert not masked.any() or masked.all() is not None
    with pytest.raises(ValueError):
        ops.mask_along_axis_iid(jax.random.PRNGKey(0), specs, 4, axis=0)
    with pytest.raises(ValueError):
        ops.mask_along_axis_iid(jax.random.PRNGKey(0), jnp.ones(5), 4,
                                axis=-1)
