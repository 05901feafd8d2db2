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


def test_apply_codec_wav_family():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import pytest
    from torchaudio_contrib_tpu import ops

    rng = np.random.default_rng(0)
    x = jnp.asarray(np.clip(rng.standard_normal(4000) * 0.3, -1, 1),
                    jnp.float32)

    def snr_db(y):
        n = np.asarray(y) - np.asarray(x)
        return 10 * np.log10(float(jnp.sum(x ** 2))
                             / max(float(np.sum(n ** 2)), 1e-12))

    # PCM: more bits, less noise; 16-bit is near-transparent
    assert snr_db(ops.apply_codec(x, 16000)) > 80
    assert snr_db(ops.apply_codec(x, 16000, encoding="PCM_S",
                                  bits_per_sample=8)) < 60
    s8 = snr_db(ops.apply_codec(x, 16000, encoding="PCM_U"))
    assert 30 < s8 < 60
    # law codecs: ~35-40 dB at 8 bits, better than linear 8-bit for
    # small signals
    su = snr_db(ops.apply_codec(x, 16000, encoding="ULAW"))
    sa = snr_db(ops.apply_codec(x, 16000, encoding="ALAW"))
    assert 25 < su < 55 and 25 < sa < 55
    # jit-able
    j = jax.jit(lambda w: ops.apply_codec(w, 16000,
                                          encoding="ALAW"))(x)
    np.testing.assert_allclose(
        np.asarray(j),
        np.asarray(ops.apply_codec(x, 16000, encoding="ALAW")),
        atol=1e-6)
    with pytest.raises(ValueError, match="wav"):
        ops.apply_codec(x, 16000, format="mp3")
    with pytest.raises(ValueError, match="unknown encoding"):
        ops.apply_codec(x, 16000, encoding="GSM")
    with pytest.raises(ValueError, match="bits_per_sample"):
        ops.apply_codec(x, 16000, encoding="PCM_S", bits_per_sample=12)


def test_apply_codec_zero_levels():
    """Silence must round-trip to exact zero for every encoding
    (real WAV decoders have a zero code)."""
    import jax.numpy as jnp
    import numpy as np
    from torchaudio_contrib_tpu import ops
    z = jnp.zeros(32, jnp.float32)
    for enc in ("PCM_S", "PCM_U", "ALAW"):
        out = ops.apply_codec(z, 16000, encoding=enc)
        assert float(jnp.max(jnp.abs(out))) == 0.0, enc
    # ULAW rides the reference mu-law grid, whose zero code decodes
    # to ~8.6e-5 (torch semantics) — bounded, not exactly zero
    out = ops.apply_codec(z, 16000, encoding="ULAW")
    assert float(jnp.max(jnp.abs(out))) < 1e-4
    # PCM_U decode grid matches (code-128)/128
    x = jnp.asarray([-1.0, -0.5, 0.25, 0.9921875], jnp.float32)
    got = np.asarray(ops.apply_codec(x, 16000, encoding="PCM_U"))
    code = np.clip(np.round(np.asarray(x) * 128) + 128, 0, 255)
    np.testing.assert_allclose(got, (code - 128) / 128, atol=0)
