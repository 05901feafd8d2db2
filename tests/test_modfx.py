"""Modulation/nonlinear effects vs float64 NumPy loop oracles.

torchaudio is not installed here, so each effect is pinned against an
independent sample-by-sample ring-buffer reimplementation of the SoX
algorithm (float64), exactly the way the reference effects are defined.
The oracles deliberately use literal buffer-position arithmetic — they
share NO code with the gather/scan formulations under test except the
wave-table builder (whose range/period properties get their own test).
"""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu.ops.modfx import _wave_table


def _sig(shape, seed=0, scale=0.5):
    rng = np.random.default_rng(seed)
    return (scale * rng.standard_normal(shape)).astype(np.float32)


# ---------------------------------------------------------------- oracles

def _overdrive_oracle(x, gain, colour):
    x = np.asarray(x, np.float64)
    g = 10.0 ** (gain / 20.0)
    temp = x * g + colour / 200.0
    shaped = np.where(temp < -1, -2 / 3,
                      np.where(temp > 1, 2 / 3, temp - temp ** 3 / 3))
    out = np.empty_like(x)
    last_in = np.zeros(x.shape[:-1])
    last_out = np.zeros(x.shape[:-1])
    for i in range(x.shape[-1]):
        last_out = shaped[..., i] - last_in + 0.995 * last_out
        last_in = shaped[..., i]
        out[..., i] = x[..., i] * 0.5 + last_out * 0.75
    return np.clip(out, -1, 1)


def _phaser_oracle(x, sr, gain_in, gain_out, delay_ms, decay,
                   mod_speed, sinusoidal):
    x = np.asarray(x, np.float64)
    t = x.shape[-1]
    d = int(delay_ms * 0.001 * sr + 0.5)
    m = int(sr / mod_speed + 0.5)
    mod = _wave_table("sine" if sinusoidal else "triangle", m,
                      1.0, float(d), math.pi / 2.0, as_int=True)
    buf = np.zeros(x.shape[:-1] + (d,))
    out = np.empty_like(x)
    delay_pos, mod_pos = 0, 0
    for i in range(t):
        idx = int((delay_pos + mod[mod_pos]) % d)
        mod_pos = (mod_pos + 1) % m
        delay_pos = (delay_pos + 1) % d
        temp = x[..., i] * gain_in + buf[..., idx] * decay
        buf[..., delay_pos] = temp
        out[..., i] = temp * gain_out
    return out


def _flanger_oracle(x, sr, delay, depth, regen, width, speed_hz,
                    modulation, interpolation, phase=25.0):
    """Float64 ring-buffer loop with SoX's gain balance: raw
    regen/100 feeds back; the wet mix carries the (1-|fb|) balance;
    channel c of C gets an LFO offset of phase/100·lfo_len·c/C."""
    x = np.asarray(x, np.float64)
    t = x.shape[-1]
    n_ch = x.shape[-2] if x.ndim >= 2 else 1
    delay_gain = width / 100.0
    in_gain = 1.0 / (1.0 + delay_gain)
    delay_gain = delay_gain / (1.0 + delay_gain)
    fb = regen / 100.0
    delay_gain *= 1.0 - abs(fb)
    L = int((delay + depth) * 0.001 * sr + 0.5) + 2
    lfo_len = max(int(sr / speed_hz + 0.5), 1)
    lo = math.floor(delay * 0.001 * sr + 0.5)
    lfo = _wave_table(
        "sine" if modulation == "sinusoidal" else "triangle",
        lfo_len, lo, L - 2.0, 3.0 * math.pi / 2.0, as_int=False)
    offs = np.round(phase / 100.0 * lfo_len
                    * np.arange(n_ch) / n_ch).astype(np.int64)
    squeeze = x.ndim == 1
    x2 = x.reshape(n_ch, t) if squeeze else x    # (..., C, t)
    buf = np.zeros(x2.shape[:-1] + (L,))
    out = np.empty_like(x2)
    pos = 0
    for i in range(t):
        pos = (pos + L - 1) % L
        delayed = np.empty(x2.shape[:-1])
        for c in range(n_ch):
            dly = lfo[(i + offs[c]) % lfo_len]
            int_d = int(math.floor(dly))
            frac = dly - int_d
            a = buf[..., c, (pos + int_d) % L]
            b = buf[..., c, (pos + int_d + 1) % L]
            if interpolation == "linear":
                delayed[..., c] = a + (b - a) * frac
            else:
                cc = buf[..., c, (pos + int_d + 2) % L]
                delayed[..., c] = (a * (frac - 1) * (frac - 2) / 2
                                   - b * frac * (frac - 2)
                                   + cc * frac * (frac - 1) / 2)
        buf[..., pos] = x2[..., i] + delayed * fb
        out[..., i] = x2[..., i] * in_gain + delayed * delay_gain
    return out.reshape(x.shape)


# ----------------------------------------------------------------- tests

def test_wave_table_properties():
    for kind in ("sine", "triangle"):
        tbl = _wave_table(kind, 100, 1.0, 64.0, math.pi / 2, as_int=True)
        assert tbl.min() >= 1.0 and tbl.max() <= 64.0
        assert tbl.shape == (100,)
    # phase offset of a full period is a no-op
    a = _wave_table("sine", 64, 0.0, 1.0, 0.0, as_int=False)
    b = _wave_table("sine", 64, 0.0, 1.0, 2 * math.pi, as_int=False)
    np.testing.assert_allclose(a, b)
    with pytest.raises(ValueError):
        _wave_table("square", 10, 0, 1, 0.0, as_int=False)


def test_overdrive_matches_loop_oracle():
    x = _sig((2, 3000), seed=1)
    got = np.asarray(tac.overdrive(jnp.asarray(x), 25.0, 30.0))
    ref = _overdrive_oracle(x, 25.0, 30.0)
    assert np.max(np.abs(got - ref)) <= 2e-4


def test_contrast_formula_and_range():
    x = _sig((2, 2048), seed=2)
    got = np.asarray(tac.contrast(jnp.asarray(x), 75.0))
    t1 = x.astype(np.float64) * math.pi / 2
    ref = np.sin(t1 + 0.1 * np.sin(t1 * 4))
    assert np.max(np.abs(got - ref)) <= 1e-5
    assert np.max(np.abs(got)) <= 1.0 + 1e-6
    with pytest.raises(ValueError):
        tac.contrast(jnp.asarray(x), 150.0)


@pytest.mark.parametrize("sinusoidal", [True, False])
def test_phaser_matches_loop_oracle(sinusoidal):
    sr = 8000
    x = _sig((2, 6000), seed=3)
    got = np.asarray(tac.phaser(jnp.asarray(x), sr,
                                sinusoidal=sinusoidal))
    ref = _phaser_oracle(x, sr, 0.4, 0.74, 3.0, 0.4, 0.5, sinusoidal)
    assert np.max(np.abs(got - ref)) <= 1e-5


def test_phaser_strong_decay_truncation_is_below_noise():
    sr = 8000
    x = _sig((1, 4000), seed=4)
    got = np.asarray(tac.phaser(jnp.asarray(x), sr, decay=0.8))
    ref = _phaser_oracle(x, sr, 0.4, 0.74, 3.0, 0.8, 0.5, True)
    assert np.max(np.abs(got - ref)) <= 1e-5


def test_phaser_validates():
    x = jnp.zeros((1, 100))
    with pytest.raises(ValueError):
        tac.phaser(x, 8000, decay=0.0)
    with pytest.raises(ValueError):
        tac.phaser(x, 8000, delay_ms=0.0)


@pytest.mark.parametrize("interpolation", ["linear", "quadratic"])
def test_flanger_feedforward_matches_loop_oracle(interpolation):
    sr = 8000
    x = _sig((2, 5000), seed=5)
    got = np.asarray(tac.flanger(jnp.asarray(x), sr, delay=1.0,
                                 depth=2.0, interpolation=interpolation))
    ref = _flanger_oracle(x, sr, 1.0, 2.0, 0.0, 71.0, 0.5,
                          "sinusoidal", interpolation)
    assert np.max(np.abs(got - ref)) <= 1e-5


def test_flanger_feedback_matches_loop_oracle():
    sr = 8000
    x = _sig((2, 3000), seed=6)
    got = np.asarray(tac.flanger(jnp.asarray(x), sr, delay=0.0,
                                 depth=2.0, regen=40.0,
                                 modulation="triangular"))
    ref = _flanger_oracle(x, sr, 0.0, 2.0, 40.0, 71.0, 0.5,
                          "triangular", "linear")
    assert np.max(np.abs(got - ref)) <= 1e-5


def test_flanger_validates():
    x = jnp.zeros((1, 100))
    with pytest.raises(ValueError):
        tac.flanger(x, 8000, delay=40.0)
    with pytest.raises(ValueError):
        tac.flanger(x, 8000, regen=99.0)
    with pytest.raises(ValueError):
        tac.flanger(x, 8000, interpolation="cubic")


def test_modfx_jit_and_grad():
    """Effects stay jit-able and differentiable (library contract)."""
    sr = 8000
    x = jnp.asarray(_sig((1, 2000), seed=7))

    f = jax.jit(lambda w: jnp.sum(tac.phaser(w, sr) ** 2))
    g = jax.grad(lambda w: jnp.sum(tac.overdrive(w) ** 2))(x)
    assert np.isfinite(float(f(x)))
    assert np.all(np.isfinite(np.asarray(g)))
    gf = jax.grad(lambda w: jnp.sum(
        tac.flanger(w, sr, regen=30.0) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(gf)))


def test_add_noise_achieves_requested_snr():
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((3, 8000)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal((3, 8000)).astype(np.float32))
    snr = jnp.asarray([0.0, 10.0, -5.0])
    out = tac.add_noise(x, n, snr)
    added = np.asarray(out) - np.asarray(x)
    got_snr = 10 * np.log10(np.sum(np.asarray(x) ** 2, -1)
                            / np.sum(added ** 2, -1))
    np.testing.assert_allclose(got_snr, np.asarray(snr), atol=1e-3)


def test_add_noise_lengths_mask():
    x = jnp.ones((1, 100))
    n = jnp.ones((1, 100))
    out = tac.add_noise(x, n, 0.0, lengths=jnp.asarray([50]))
    # padded tail untouched
    np.testing.assert_allclose(np.asarray(out[0, 50:]), 1.0)
    assert not np.allclose(np.asarray(out[0, :50]), 1.0)
    with pytest.raises(ValueError):
        tac.add_noise(x, jnp.ones((1, 99)), 0.0)


def test_speed_shifts_duration_and_pitch():
    sr = 16000
    t = np.arange(sr) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 440.0 * t).astype(np.float32))
    out, lens = tac.speed(x[None], sr, 2.0, lengths=jnp.asarray([sr]))
    assert abs(out.shape[-1] - sr // 2) <= 2
    assert int(lens[0]) == sr // 2
    spec = np.abs(np.fft.rfft(np.asarray(out[0])))
    peak_hz = np.argmax(spec) * sr / out.shape[-1]
    assert abs(peak_hz - 880.0) < 10.0
    with pytest.raises(ValueError):
        tac.speed(x[None], sr, 0.0)


def test_phaser_strong_decay_scan_path_exact():
    """decay=0.99 needs ~1600 feedback terms — far beyond the 64-term
    unroll cap (52% error when truncated).  The scan path is exact."""
    sr = 8000
    x = _sig((1, 2000), seed=7)
    got = np.asarray(tac.phaser(jnp.asarray(x), sr, decay=0.99))
    ref = _phaser_oracle(x, sr, 0.4, 0.74, 3.0, 0.99, 0.5, True)
    assert np.max(np.abs(got - ref)) <= 1e-5


def test_flanger_sox_gain_balance_strong_regen():
    """regen=95: SoX feeds back the RAW 0.95 and scales the wet mix by
    (1-0.95) — the old code fed back 0.394 and mixed the wet signal
    ~20x louder."""
    sr = 8000
    x = _sig((2, 2500), seed=8)
    got = np.asarray(tac.flanger(jnp.asarray(x), sr, delay=1.0,
                                 depth=2.0, regen=95.0))
    ref = _flanger_oracle(x, sr, 1.0, 2.0, 95.0, 71.0, 0.5,
                          "sinusoidal", "linear")
    assert np.max(np.abs(got - ref)) <= 1e-5


def test_flanger_channel_phase():
    """phase decorrelates the channels' LFOs; phase=0 keeps them
    identical (and identical to the mono result)."""
    sr = 8000
    x1 = _sig((5000,), seed=9)
    x = np.stack([x1, x1])
    same = np.asarray(tac.flanger(jnp.asarray(x), sr, depth=2.0,
                                  phase=0.0))
    np.testing.assert_allclose(same[0], same[1], atol=1e-7)
    mono = np.asarray(tac.flanger(jnp.asarray(x1), sr, depth=2.0))
    np.testing.assert_allclose(same[0], mono, atol=1e-7)
    shifted = np.asarray(tac.flanger(jnp.asarray(x), sr, depth=2.0,
                                     phase=50.0))
    assert np.max(np.abs(shifted[0] - shifted[1])) > 1e-4
    ref = _flanger_oracle(x, sr, 0.0, 2.0, 0.0, 71.0, 0.5,
                          "sinusoidal", "linear", phase=50.0)
    assert np.max(np.abs(shifted - ref)) <= 1e-5
    with pytest.raises(ValueError, match="phase"):
        tac.flanger(jnp.asarray(x), sr, phase=150.0)
