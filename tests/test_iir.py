"""IIR filtering (`ops/iir.py`): scipy.signal.lfilter is the oracle.

The associative-scan path (order ≤ 8) and the sequential-scan path
(order > 8) are both pinned against float64 scipy; the RBJ designs are
checked behaviorally (pass/stop-band gains on pure tones).
"""
import numpy as np
import pytest
import scipy.signal as sps

import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu.ops import iir


@pytest.fixture(scope="module")
def noise():
    return np.random.default_rng(7).standard_normal(
        (2, 3, 4096)).astype(np.float32)


def test_biquad_matches_scipy(noise):
    b, a = iir._rbj("lowpass", 16000, 2000, 0.707)
    y = np.asarray(iir.lfilter(jnp.asarray(noise), a, b))
    ref = sps.lfilter(np.asarray(b), np.asarray(a),
                      noise.astype(np.float64), axis=-1)
    assert np.abs(y - ref).max() < 1e-5


def test_order4_scan_path_matches_scipy(noise):
    b, a = sps.butter(4, 0.2)
    y = np.asarray(iir.lfilter(jnp.asarray(noise), a, b))
    ref = sps.lfilter(b, a, noise.astype(np.float64), axis=-1)
    assert np.abs(y - ref).max() < 5e-5


def test_high_order_sequential_path_matches_scipy(noise):
    b, a = sps.butter(10, 0.3)     # order 10 > _SCAN_MAX_ORDER
    x = noise[:1, :1, :1024]
    y = np.asarray(iir.lfilter(jnp.asarray(x), a, b))
    ref = sps.lfilter(b, a, x.astype(np.float64), axis=-1)
    assert np.abs(y - ref).max() < 5e-4


def test_unnormalized_a0(noise):
    x = jnp.asarray(noise[0, 0])
    b, a = (0.4, 0.2, 0.1), (2.0, 0.6, 0.2)
    y = np.asarray(iir.lfilter(x, a, b))
    ref = sps.lfilter(b, a, np.asarray(x, np.float64))
    assert np.abs(y - ref).max() < 1e-5


def test_pure_fir(noise):
    x = jnp.asarray(noise[0, 0])
    y = np.asarray(iir.lfilter(x, (1.0,), (0.5, 0.25, 0.125)))
    ref = sps.lfilter([0.5, 0.25, 0.125], [1.0], np.asarray(x))
    assert np.abs(y - ref).max() < 1e-6


def test_lfilter_grad_and_jit(noise):
    x = jnp.asarray(noise[0, 0, :512])
    f = jax.jit(lambda w: iir.lowpass_biquad(w, 16000, 2000).sum())
    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    # jit == eager
    y1 = iir.lowpass_biquad(x, 16000, 2000)
    y2 = jax.jit(lambda w: iir.lowpass_biquad(w, 16000, 2000))(x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               atol=1e-6)


def test_clamp():
    x = jnp.asarray(np.array([0.0, 10.0, -10.0], np.float32))
    y = np.asarray(iir.lfilter(x, (1.0,), (1.0,), clamp=True))
    assert y.max() <= 1.0 and y.min() >= -1.0


@pytest.mark.parametrize("design,kwargs,lo_gain,hi_gain", [
    ("lowpass_biquad", {"cutoff_freq": 1000}, (0.9, 1.1), (0.0, 0.1)),
    ("highpass_biquad", {"cutoff_freq": 1000}, (0.0, 0.1), (0.9, 1.1)),
])
def test_design_passbands(design, kwargs, lo_gain, hi_gain):
    sr = 16000
    t = np.arange(sr) / sr
    lo = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    hi = np.sin(2 * np.pi * 6000 * t).astype(np.float32)
    fn = getattr(iir, design)
    gl = float(np.std(np.asarray(fn(jnp.asarray(lo), sr, **kwargs))[sr // 4:])
               / np.std(lo))
    gh = float(np.std(np.asarray(fn(jnp.asarray(hi), sr, **kwargs))[sr // 4:])
               / np.std(hi))
    assert lo_gain[0] <= gl <= lo_gain[1]
    assert hi_gain[0] <= gh <= hi_gain[1]


def test_bandpass_and_notch():
    sr = 16000
    t = np.arange(sr) / sr
    mid = np.sin(2 * np.pi * 2000 * t).astype(np.float32)
    g_bp = float(np.std(np.asarray(
        iir.bandpass_biquad(jnp.asarray(mid), sr, 2000))[sr // 4:])
        / np.std(mid))
    g_notch = float(np.std(np.asarray(
        iir.bandreject_biquad(jnp.asarray(mid), sr, 2000))[sr // 4:])
        / np.std(mid))
    assert 0.9 <= g_bp <= 1.1
    assert g_notch <= 0.05


def test_allpass_preserves_magnitude():
    sr = 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 1500 * t).astype(np.float32)
    y = np.asarray(iir.allpass_biquad(jnp.asarray(x), sr, 700))
    assert abs(float(np.std(y[sr // 4:]) / np.std(x)) - 1.0) < 0.02


def test_equalizer_boosts_center():
    sr = 16000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = np.asarray(iir.equalizer_biquad(jnp.asarray(x), sr, 1000,
                                        gain_db=6.0))
    gain_db = 20 * np.log10(np.std(y[sr // 4:]) / np.std(x))
    assert 5.0 < gain_db < 7.0


def test_shelf_filters():
    sr = 16000
    t = np.arange(sr) / sr
    lo = np.sin(2 * np.pi * 50 * t).astype(np.float32)
    hi = np.sin(2 * np.pi * 7000 * t).astype(np.float32)
    yb = np.asarray(iir.bass_biquad(jnp.asarray(lo), sr, gain_db=6.0))
    yt = np.asarray(iir.treble_biquad(jnp.asarray(hi), sr, gain_db=6.0))
    gb = 20 * np.log10(np.std(yb[sr // 4:]) / np.std(lo))
    gt = 20 * np.log10(np.std(yt[sr // 4:]) / np.std(hi))
    assert 4.0 < gb < 8.0
    assert 4.0 < gt < 8.0


def test_bad_coeffs_raise():
    x = jnp.zeros(16)
    with pytest.raises(ValueError):
        iir.lfilter(x, (0.0, 1.0), (1.0,))
    with pytest.raises(ValueError):
        iir.lfilter(x, np.zeros((2, 2)), (1.0,))


def test_riaa_biquad_response():
    """RIAA playback EQ: ~0 dB at 1 kHz, bass boosted, treble cut;
    unsupported rates raise."""
    import numpy as np
    import jax.numpy as jnp
    from torchaudio_contrib_tpu import ops

    sr = 44100
    def resp(freq):
        t = np.arange(sr // 2) / sr
        x = jnp.asarray(np.sin(2 * np.pi * freq * t), jnp.float32)
        y = np.asarray(ops.riaa_biquad(x, sr))
        n = y.size // 2
        return np.sqrt(np.mean(y[n:] ** 2)) / np.sqrt(0.5)

    g1k = resp(1000.0)
    np.testing.assert_allclose(g1k, 1.0, rtol=0.05)
    assert resp(100.0) > 2.0 * g1k        # bass boost
    assert resp(10000.0) < 0.5 * g1k      # treble cut
    for rate in (48000, 88200, 96000):
        out = ops.riaa_biquad(jnp.ones(64, jnp.float32), rate)
        assert out.shape == (64,)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="supports"):
        ops.riaa_biquad(jnp.ones(8), 16000)


def test_fbanks_aliases_match_builders():
    import numpy as np
    from torchaudio_contrib_tpu import ops
    a = ops.melscale_fbanks(257, 0.0, 8000.0, 40, 16000,
                            norm="slaney", mel_scale="slaney")
    b = ops.create_mel_filter(40, 16000, 0.0, 8000.0, 257,
                              mel_scale="slaney", norm="slaney")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    a = ops.linear_fbanks(129, 0.0, 4000.0, 20, 8000)
    b = ops.create_linear_filter(20, 8000, 0.0, 4000.0, 129)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    a = ops.barkscale_fbanks(257, 0.0, 8000.0, 24, 16000)
    b = ops.create_bark_filter(24, 16000, 0.0, 8000.0, 257)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_band_biquad_matches_literal_sox_formula(noise):
    """`band_biquad` vs an independent transcription of the SoX
    single-pole-pair resonator coefficients through float64 scipy."""
    import math
    sr, f, Q = 16000.0, 1500.0, 2.0
    for use_noise in (False, True):
        w0 = 2 * math.pi * f / sr
        a2 = math.exp(-2 * math.pi * (f / Q) / sr)
        a1 = -4 * a2 / (1 + a2) * math.cos(w0)
        b0 = math.sqrt(1 - a1 * a1 / (4 * a2)) * (1 - a2)
        if use_noise:
            b0 = math.sqrt(((1 + a2) ** 2 - a1 * a1)
                           * (1 - a2) / (1 + a2))
        y = np.asarray(iir.band_biquad(jnp.asarray(noise), sr, f,
                                       Q=Q, noise=use_noise))
        ref = sps.lfilter([b0, 0.0, 0.0], [1.0, a1, a2],
                          noise.astype(np.float64), axis=-1)
        assert np.abs(y - ref).max() < 1e-5, use_noise


def test_band_biquad_passband():
    sr = 16000
    t = np.arange(sr, dtype=np.float32) / sr

    def rms(freq):
        x = jnp.asarray(np.sin(2 * np.pi * freq * t))
        y = np.asarray(iir.band_biquad(x, sr, 1000.0, Q=4.0))
        return float(np.sqrt(np.mean(np.square(y[sr // 4:]))))

    assert rms(1000.0) > 4.0 * rms(4000.0)


def test_deemph_biquad_response_and_validation():
    """CD de-emphasis: ~0 dB at low frequency, ≈ -9.5 dB shelf at
    10 kHz (gain parameter of the tabulated 44.1 kHz shelf)."""
    sr = 44100
    t = np.arange(sr, dtype=np.float32) / sr

    def gain_db(freq):
        x = jnp.asarray(np.sin(2 * np.pi * freq * t))
        y = np.asarray(iir.deemph_biquad(x, sr))
        r = np.sqrt(np.mean(np.square(y[sr // 4:])))
        return 20 * np.log10(r / np.sqrt(0.5))

    assert abs(gain_db(100.0)) < 0.2
    assert -10.5 < gain_db(16000.0) < -8.0
    # mid-shelf point: roughly half the cut around the center freq
    assert -7.5 < gain_db(5300.0) < -3.0
    iir.deemph_biquad(jnp.zeros(64), 48000)      # supported
    with pytest.raises(ValueError):
        iir.deemph_biquad(jnp.zeros(64), 22050)
