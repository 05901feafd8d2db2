"""compute_deltas / preemphasis / deemphasis (ops/features.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu import ops


def _deltas_np(x, win_length):
    """Independent NumPy regression-delta oracle (replicate padding)."""
    n = (win_length - 1) // 2
    denom = 2.0 * sum(k * k for k in range(1, n + 1))
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(n, n)], mode="edge")
    out = np.zeros_like(x)
    for t in range(x.shape[-1]):
        acc = np.zeros(x.shape[:-1])
        for k in range(1, n + 1):
            acc = acc + k * (xp[..., t + n + k] - xp[..., t + n - k])
        out[..., t] = acc / denom
    return out


def test_deltas_matches_numpy_oracle(rng):
    x = rng.standard_normal((2, 13, 50)).astype(np.float32)
    for win in (3, 5, 9):
        got = np.asarray(ops.compute_deltas(jnp.asarray(x),
                                            win_length=win))
        ref = _deltas_np(x, win)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_deltas_properties(rng):
    # constant input -> zero deltas; linear ramp -> constant slope
    c = jnp.full((1, 4, 32), 3.5)
    assert float(jnp.max(jnp.abs(ops.compute_deltas(c)))) <= 1e-6
    ramp = jnp.broadcast_to(jnp.arange(64.0) * 0.25, (2, 64))
    d = ops.compute_deltas(ramp)
    inner = d[..., 2:-2]  # edges see replicate padding
    np.testing.assert_allclose(np.asarray(inner), 0.25, rtol=1e-5)
    with pytest.raises(ValueError):
        ops.compute_deltas(ramp, win_length=4)
    with pytest.raises(ValueError):
        ops.compute_deltas(ramp, mode="bogus")


def test_deltas_differentiable(rng):
    x = jnp.asarray(rng.standard_normal((3, 20)).astype(np.float32))
    g = jax.grad(lambda v: jnp.sum(ops.compute_deltas(v) ** 2))(x)
    assert g.shape == x.shape and float(jnp.max(jnp.abs(g))) > 0


def test_preemphasis_deemphasis_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 4096)).astype(np.float32))
    y = ops.preemphasis(x, 0.97)
    z = ops.deemphasis(y, 0.97)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x),
                               rtol=1e-4, atol=1e-4)
    # sequential oracle for deemphasis
    xs = np.asarray(rng.standard_normal(256), np.float32)
    ref = np.zeros_like(xs)
    acc = 0.0
    for i, v in enumerate(xs):
        acc = v + 0.95 * acc
        ref[i] = acc
    got = np.asarray(ops.deemphasis(jnp.asarray(xs), 0.95))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_preemphasis_first_sample():
    x = jnp.asarray([[1.0, 1.0, 1.0]])
    y = ops.preemphasis(x, 0.9)
    np.testing.assert_allclose(np.asarray(y),
                               [[1.0, 0.1, 0.1]], rtol=1e-6, atol=1e-7)


def test_integer_inputs_promote():
    """Integer PCM inputs must promote to float, not silently truncate
    the fractional kernel/coefficient to zero."""
    x_i = jnp.asarray(np.array([[100, -200, 300, 50, -25, 12]], np.int16))
    d = ops.compute_deltas(x_i.reshape(1, 1, 6), win_length=3)
    assert d.dtype == jnp.float32
    assert float(jnp.max(jnp.abs(d))) > 0
    y = ops.deemphasis(x_i, 0.97)
    assert y.dtype == jnp.float32
    # identity would mean the coefficient truncated to 0
    assert float(jnp.max(jnp.abs(y - x_i.astype(jnp.float32)))) > 1.0
    p = ops.preemphasis(x_i, 0.97)
    assert p.dtype == jnp.float32
