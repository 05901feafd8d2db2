"""Polyphase resampler: scipy parity, tone preservation, shapes, grads."""
import math

import numpy as np
import pytest
import scipy.signal as ss
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops

BETA = 14.769656459379492


@pytest.mark.parametrize("sr1,sr2", [
    (16000, 22050), (22050, 16000), (48000, 16000), (8000, 44100),
])
def test_scipy_parity_exact(rng, sr1, sr2):
    """Against scipy's upfirdn with OUR filter taps the outputs must be
    bit-near identical over the full range (polyphase machinery parity);
    filter *design* quality is pinned separately by the tone test."""
    from torchaudio_contrib_tpu.ops.resample import _design_kernel

    x = rng.standard_normal(sr1).astype(np.float32)
    y = np.asarray(ops.resample(jnp.asarray(x), sr1, sr2))
    g = math.gcd(sr1, sr2)
    p, q = sr2 // g, sr1 // g
    taps = _design_kernel(p, q, 24, BETA)
    ref = ss.resample_poly(x.astype(np.float64), p, q, window=taps / p)
    assert y.shape == ref.shape
    assert np.max(np.abs(y - ref)) <= 1e-4


def test_tone_preservation(rng):
    sr1, sr2 = 16000, 22050
    t = np.arange(sr1) / sr1
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    y = np.asarray(ops.resample(jnp.asarray(x), sr1, sr2))
    t2 = np.arange(len(y)) / sr2
    amp = 2 * abs(np.mean(y * np.exp(-2j * np.pi * 440 * t2)))
    assert abs(amp - 0.5) < 5e-3


def test_identity_and_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 3, 1600)).astype(np.float32))
    assert ops.resample(x, 16000, 16000) is x
    y = ops.resample(x, 16000, 8000)
    assert y.shape == (2, 3, 800)
    y2 = ops.resample(x, 8000, 16000)
    assert y2.shape == (2, 3, 3200)


def test_differentiable(rng):
    x = jnp.asarray(rng.standard_normal(800).astype(np.float32))
    g = jax.grad(lambda v: jnp.sum(ops.resample(v, 8000, 16000) ** 2))(x)
    assert g.shape == x.shape and np.all(np.isfinite(np.asarray(g)))


def test_bad_rates():
    with pytest.raises(ValueError):
        ops.resample(jnp.zeros(100), 0, 16000)
