"""Pitch detection + level/shape utilities (`ops/pitchdetect.py`,
`ops/effects.py`)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu.ops import pitchdetect as P
from torchaudio_contrib_tpu.ops import effects as E

SR = 22050


def _tone(freq, seconds=1.0, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


# ---------------------------------------------------------------- pitch

@pytest.mark.parametrize("f0", [110.0, 220.0, 440.0])
def test_pitch_pure_tone(f0):
    est = np.asarray(P.detect_pitch_frequency(
        jnp.asarray(_tone(f0))[None], SR))
    # one lag quantum of tolerance: sr/round(sr/f0) vs f0
    assert abs(np.median(est) - f0) < f0 * 0.02


def test_pitch_harmonic_stack_finds_fundamental():
    t = np.arange(SR) / SR
    x = sum(np.sin(2 * np.pi * 150 * k * t) / k
            for k in range(1, 6)).astype(np.float32)
    est = np.asarray(P.detect_pitch_frequency(jnp.asarray(x)[None], SR))
    assert abs(np.median(est) - 150.0) < 3.0


def test_pitch_batched_shapes_and_jit():
    x = jnp.asarray(np.stack([_tone(110.0), _tone(330.0)]))
    f = jax.jit(lambda w: P.detect_pitch_frequency(w, SR))
    est = np.asarray(f(x))
    assert est.shape[0] == 2
    assert abs(np.median(est[0]) - 110.0) < 3.0
    assert abs(np.median(est[1]) - 330.0) < 7.0


def test_pitch_too_short_raises():
    with pytest.raises(ValueError, match="too short"):
        P.detect_pitch_frequency(jnp.zeros((1, 100)), SR)


# --------------------------------------------------------------- effects

def test_fade_envelope():
    w = jnp.ones((2, 1000))
    y = np.asarray(E.fade(w, 100, 200, "linear"))
    assert y[0, 0] == 0.0 and y[0, -1] == 0.0
    assert y[0, 500] == 1.0
    assert np.all(np.diff(y[0, :100]) >= 0)
    assert np.all(np.diff(y[0, -200:]) <= 0)


@pytest.mark.parametrize("shape", ["linear", "exponential", "logarithmic",
                                   "quarter_sine", "half_sine"])
def test_fade_shapes_monotone(shape):
    y = np.asarray(E.fade(jnp.ones(400), 400, 0, shape))
    assert y[0] <= 1e-6 and abs(y[-1] - 1.0) < 1e-6
    assert np.all(np.diff(y) >= -1e-6)


def test_fade_validation():
    with pytest.raises(ValueError):
        E.fade(jnp.ones(10), 11, 0)
    with pytest.raises(ValueError):
        E.fade(jnp.ones(10), 0, 2, "bogus")


def test_gain_db():
    y = np.asarray(E.gain(jnp.ones(4), 20.0))
    np.testing.assert_allclose(y, 10.0, rtol=1e-6)


def test_dither_magnitude_and_determinism():
    w = jnp.zeros(10000)
    d1 = np.asarray(E.dither(jax.random.PRNGKey(0), w))
    d2 = np.asarray(E.dither(jax.random.PRNGKey(0), w))
    np.testing.assert_array_equal(d1, d2)
    lsb = 2.0 ** (1 - 16)
    assert np.abs(d1).max() <= lsb          # TPDF spans ±1 LSB
    assert np.abs(d1).max() > 0
    g = np.asarray(E.dither(jax.random.PRNGKey(1), w,
                            density_function="GPDF"))
    assert g.std() > 0
    with pytest.raises(ValueError):
        E.dither(jax.random.PRNGKey(0), w, density_function="XPDF")


def test_dcshift():
    w = jnp.asarray(np.linspace(-1, 1, 100, dtype=np.float32))
    y = np.asarray(E.dcshift(w, 0.5))
    assert y.max() <= 1.0 and abs(y.min() - (-0.5)) < 1e-6
    y2 = np.asarray(E.dcshift(w, 0.3, limiter_gain=0.05))
    assert y2.max() <= 1.0
    y3 = np.asarray(E.dcshift(w, -0.3, limiter_gain=0.05))
    assert y3.min() >= -1.0


def test_cmn_constant_input_zeroes():
    out = np.asarray(E.sliding_window_cmn(
        jnp.full((1, 4, 50), 7.0), 10, 5, center=True))
    assert np.abs(out).max() < 1e-6


def test_cmn_whitens():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.standard_normal((2, 13, 300)).astype(np.float32)
                    * 3.0 + 5.0)
    out = np.asarray(E.sliding_window_cmn(s, 100, 50, center=True,
                                          norm_vars=True))
    assert abs(out.mean()) < 0.1
    assert abs(out.var() - 1.0) < 0.1


def test_cmn_trailing_window_oracle():
    """Trailing-window mean vs a direct per-frame loop (float64)."""
    rng = np.random.default_rng(1)
    s = rng.standard_normal((3, 40)).astype(np.float32)
    out = np.asarray(E.sliding_window_cmn(jnp.asarray(s), cmn_window=8,
                                          min_cmn_window=4))
    ref = np.empty_like(s)
    t = s.shape[-1]
    for i in range(t):
        start = max(i - 8 + 1, 0)
        end = max(i + 1, min(4, t))
        ref[:, i] = s[:, i] - s[:, start:end].mean(axis=-1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_cmn_grad():
    s = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((1, 4, 60)).astype(np.float32))
    g = jax.grad(lambda x: E.sliding_window_cmn(
        x, 20, 10, norm_vars=True).sum())(s)
    assert np.isfinite(np.asarray(g)).all()
