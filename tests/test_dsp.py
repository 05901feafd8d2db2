"""DSP synthesis ops (`ops/dsp.py`): float64 NumPy oracles for the
oscillator bank and time-varying filter, envelope shape invariants,
FIR design frequency responses."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.ops import dsp


def test_oscillator_bank_vs_float64_oracle():
    sr = 8000
    T, n = 400, 3
    rng = np.random.default_rng(0)
    freq = rng.uniform(100, 900, (T, n))
    amp = rng.uniform(0.1, 1.0, (T, n))
    out = dsp.oscillator_bank(jnp.asarray(freq, jnp.float32),
                              jnp.asarray(amp, jnp.float32), sr)
    phase = 2 * np.pi * np.cumsum(freq / sr, axis=0)
    ref = (amp * np.sin(phase)).sum(-1)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3)
    # reductions + shape mismatch + bad reduction
    none = dsp.oscillator_bank(jnp.asarray(freq), jnp.asarray(amp),
                               sr, reduction="none")
    assert none.shape == (T, n)
    mean = dsp.oscillator_bank(jnp.asarray(freq), jnp.asarray(amp),
                               sr, reduction="mean")
    np.testing.assert_allclose(np.asarray(mean),
                               np.asarray(out) / n, atol=1e-5)
    with pytest.raises(ValueError, match="match"):
        dsp.oscillator_bank(jnp.zeros((4, 2)), jnp.zeros((4, 3)), sr)
    with pytest.raises(ValueError, match="reduction"):
        dsp.oscillator_bank(jnp.asarray(freq), jnp.asarray(amp), sr,
                            reduction="max")


def test_oscillator_bank_long_clip_precision():
    """60 s constant 10 kHz tone at 44.1 kHz, under jit: the phase
    reaches ~1.4e4 cycles, where a raw float32 cumsum leaves ~0.008-
    cycle ulps AND the fl32(f/sr) increment's deterministic rounding
    bias sums to ~0.03 cycles — both made the tail full-amplitude
    garbage (max err 1.25).  The exact-split mod-1 scan holds the
    float64 oracle to ~1e-6 (regression; also guards against XLA
    folding the bit-level splits under jit)."""
    sr, T = 44100, 60 * 44100
    f = jnp.full((T, 1), 10000.0, jnp.float32)
    a = jnp.ones((T, 1), jnp.float32)
    y = np.asarray(jax.jit(
        lambda ff, aa: dsp.oscillator_bank(ff, aa, sr))(f, a))
    ph = 2 * np.pi * (np.arange(1, T + 1, dtype=np.float64)
                      * (10000.0 / sr))
    ref = np.sin(ph)
    assert np.abs(y[-1000:] - ref[-1000:]).max() < 1e-4
    assert np.abs(y[:1000] - ref[:1000]).max() < 1e-4


def test_oscillator_bank_mutes_above_nyquist():
    sr = 8000
    freq = jnp.full((100, 1), 5000.0)        # > Nyquist
    amp = jnp.ones((100, 1))
    with pytest.warns(UserWarning, match="Nyquist"):
        out = dsp.oscillator_bank(freq, amp, sr)
    assert float(jnp.max(jnp.abs(out))) == 0.0
    # jittable (no warning machinery under trace)
    j = jax.jit(lambda f, a: dsp.oscillator_bank(f, a, sr))(freq, amp)
    assert float(jnp.max(jnp.abs(j))) == 0.0


def test_adsr_envelope_shape():
    env = np.asarray(dsp.adsr_envelope(
        100, attack=0.1, hold=0.1, decay=0.2, sustain=0.4,
        release=0.2))
    assert env.shape == (100,)
    assert abs(env[0]) < 1e-6                 # starts at 0
    # attack rises to 1, hold stays
    i_hold = int(0.15 * 100)
    np.testing.assert_allclose(env[i_hold], 1.0, atol=0.02)
    # sustain region sits at the sustain level
    np.testing.assert_allclose(env[55:75], 0.4, atol=0.02)
    # release decays to ~0 at the end
    assert env[-1] < 0.03
    # defaults: flat ones
    np.testing.assert_allclose(
        np.asarray(dsp.adsr_envelope(16)), 1.0)
    with pytest.raises(ValueError, match="<= 1"):
        dsp.adsr_envelope(10, attack=0.6, release=0.6)
    with pytest.raises(ValueError, match="attack"):
        dsp.adsr_envelope(10, attack=1.5)


def test_extend_pitch():
    base = jnp.asarray(np.linspace(100, 200, 50),
                       jnp.float32)[:, None]
    h = dsp.extend_pitch(base, 3)
    assert h.shape == (50, 3)
    np.testing.assert_allclose(np.asarray(h[:, 2]),
                               np.asarray(base[:, 0]) * 3, rtol=1e-6)
    pat = dsp.extend_pitch(base, [1.0, 1.5])
    np.testing.assert_allclose(np.asarray(pat[:, 1]),
                               np.asarray(base[:, 0]) * 1.5,
                               rtol=1e-6)
    with pytest.raises(ValueError, match="1-D"):
        dsp.extend_pitch(base, np.ones((2, 2)))


def test_sinc_impulse_response_frequency_behavior():
    cut = jnp.asarray([0.25, 0.5])
    ir = dsp.sinc_impulse_response(cut, window_size=257)
    assert ir.shape == (2, 257)
    # unit DC gain by construction
    np.testing.assert_allclose(np.asarray(ir.sum(-1)), 1.0, atol=1e-6)
    # response: passband ~1, stopband ~0 (cutoff relative to Nyquist)
    H = np.abs(np.fft.rfft(np.asarray(ir[0]), 2048))
    f = np.linspace(0, 1, H.size)             # in Nyquist units
    assert H[(f < 0.15)].min() > 0.9
    assert H[(f > 0.35)].max() < 0.05
    # high-pass inverts
    irh = dsp.sinc_impulse_response(cut, 257, high_pass=True)
    Hh = np.abs(np.fft.rfft(np.asarray(irh[0]), 2048))
    assert Hh[(f < 0.15)].max() < 0.1
    assert Hh[(f > 0.35)].min() > 0.9
    with pytest.raises(ValueError, match="odd"):
        dsp.sinc_impulse_response(cut, 256)


def test_frequency_impulse_response_matches_target():
    n_freqs = 65
    mag = np.zeros(n_freqs)
    mag[: n_freqs // 2] = 1.0                 # ideal half-band LPF
    ir = dsp.frequency_impulse_response(jnp.asarray(mag))
    assert ir.shape == (2 * (n_freqs - 1),)
    H = np.abs(np.fft.rfft(np.asarray(ir)))
    # windowed approximation: high in passband, low in stopband
    assert H[5:20].min() > 0.7
    assert H[45:].max() < 0.2
    # batched
    irb = dsp.frequency_impulse_response(
        jnp.stack([jnp.asarray(mag)] * 3))
    assert irb.shape == (3, 2 * (n_freqs - 1))
    with pytest.raises(ValueError, match="bins"):
        dsp.frequency_impulse_response(jnp.ones((4, 1)))


def test_filter_waveform_constant_kernel_equals_plain_fir():
    """With identical kernels per chunk, the block OLA filter must
    equal one plain 'same' convolution (float64 oracle)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal(300)
    kern = rng.standard_normal(9)
    ks = jnp.asarray(np.tile(kern, (4, 1)), jnp.float32)  # 4 chunks
    out = dsp.filter_waveform(jnp.asarray(x, jnp.float32), ks)
    ref = np.convolve(x, kern, mode="full")[9 // 2:][:300]
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_filter_waveform_time_varying_and_batched():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 200)), jnp.float32)
    # per-chunk kernels: first half identity, second half zero
    k = np.zeros((2, 2, 7), np.float32)
    k[:, 0, 3] = 1.0
    out = dsp.filter_waveform(x, jnp.asarray(k))
    assert out.shape == (2, 200)
    np.testing.assert_allclose(np.asarray(out[:, :97]),
                               np.asarray(x[:, :97]), atol=1e-6)
    assert float(jnp.max(jnp.abs(out[:, 105:]))) < 1e-6
    with pytest.raises(ValueError, match="num_filters"):
        dsp.filter_waveform(x, jnp.ones(5))
    # jit parity
    j = jax.jit(dsp.filter_waveform)(x, jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(j), np.asarray(out),
                               atol=1e-6)
