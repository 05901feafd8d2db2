"""Functional core: complex ops, mel filters, dB, mu-law, windows.

Oracle strategy per SURVEY.md §4: torch where it has the op; otherwise an
independent float64 NumPy implementation + algebraic properties (librosa
absent in this environment).
"""
import math

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops
from torchaudio_contrib_tpu.utils import view_as_real, view_as_complex


# ---------------------------------------------------------------- complex

def test_complex_norm_angle_magphase(rng):
    re = rng.standard_normal((2, 5, 7)).astype(np.float32)
    im = rng.standard_normal((2, 5, 7)).astype(np.float32)
    c = jnp.asarray(re + 1j * im)
    for power in (1.0, 2.0, 0.5):
        ours = ops.complex_norm(c, power)
        ref = np.abs(re + 1j * im) ** power
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-5,
                                   atol=1e-6)
    np.testing.assert_allclose(np.asarray(ops.angle(c)),
                               np.angle(re + 1j * im), atol=1e-6)
    mag, ph = ops.magphase(c, power=1.0)
    rec = np.asarray(mag) * np.exp(1j * np.asarray(ph))
    np.testing.assert_allclose(rec, re + 1j * im, atol=1e-5)


def test_complex_norm_trailing2_compat(rng):
    """Legacy (…, 2) real view accepted, matching the reference layout."""
    re = rng.standard_normal((3, 4)).astype(np.float32)
    im = rng.standard_normal((3, 4)).astype(np.float32)
    legacy = jnp.stack([jnp.asarray(re), jnp.asarray(im)], axis=-1)
    np.testing.assert_allclose(np.asarray(ops.complex_norm(legacy, 2.0)),
                               re ** 2 + im ** 2, rtol=1e-6)


def test_view_roundtrip(rng):
    c = jnp.asarray((rng.standard_normal((4, 5))
                     + 1j * rng.standard_normal((4, 5))).astype(np.complex64))
    assert jnp.allclose(view_as_complex(view_as_real(c)), c)


def test_complex_norm_grad_at_zero():
    """power=2 path must have a defined gradient at 0 (re²+im², no sqrt)."""
    g = jax.grad(lambda z: ops.complex_norm(z, 2.0).sum().real)(
        jnp.zeros((2,), jnp.complex64))
    assert np.all(np.isfinite(np.asarray(jnp.abs(g))))


# ---------------------------------------------------------------- filters

def test_mel_scale_roundtrip():
    f = np.linspace(0, 11025, 100)
    np.testing.assert_allclose(ops.mel_to_hertz(ops.hertz_to_mel(f)), f,
                               rtol=1e-10)
    # HTK anchor: 1000 Hz ≈ 999.99 mel
    assert abs(ops.hertz_to_mel(1000.0) - 2595.0 * math.log10(1 + 1000 / 700)) < 1e-9


def test_mel_filter_properties():
    fb = np.asarray(ops.create_mel_filter(num_mels=128, sample_rate=22050,
                                          f_min=0.0, f_max=None,
                                          num_bins=1025))
    assert fb.shape == (1025, 128)
    assert np.all(fb >= 0) and np.all(fb <= 1.0 + 1e-6)
    # every filter has support; centers increase monotonically
    assert np.all(fb.sum(axis=0) > 0)
    centers = fb.argmax(axis=0)
    assert np.all(np.diff(centers) >= 0)
    # triangles: each column unimodal (rises then falls)
    col = fb[:, 64]
    peak = col.argmax()
    assert np.all(np.diff(col[:peak + 1]) >= -1e-12)
    assert np.all(np.diff(col[peak:]) <= 1e-12)


def test_mel_filter_vs_independent_numpy():
    """Independent float64 reconstruction of HTK triangular filters."""
    num_mels, sr, fmin, fmax, nbins = 40, 16000, 50.0, 7600.0, 257
    fb = np.asarray(ops.create_mel_filter(num_mels, sr, fmin, fmax, nbins),
                    dtype=np.float64)
    freqs = np.linspace(0, sr / 2, nbins)
    mel = lambda f: 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)
    imel = lambda m: 700.0 * (10 ** (np.asarray(m) / 2595.0) - 1.0)
    pts = imel(np.linspace(mel(fmin), mel(fmax), num_mels + 2))
    ref = np.zeros((nbins, num_mels))
    for j in range(num_mels):
        lo, c, hi = pts[j], pts[j + 1], pts[j + 2]
        rise = (freqs - lo) / (c - lo)
        fall = (hi - freqs) / (hi - c)
        ref[:, j] = np.maximum(0, np.minimum(rise, fall))
    np.testing.assert_allclose(fb, ref, atol=1e-10)


def test_slaney_mel_scale_and_norm_vs_independent_numpy():
    """Slaney-scale round trip, anchors, and area-normalized filters
    vs an independent float64 reconstruction (librosa's algorithm)."""
    f = np.linspace(0, 11025, 100)
    m = ops.hertz_to_mel(f, mel_scale="slaney")
    np.testing.assert_allclose(ops.mel_to_hertz(m, mel_scale="slaney"),
                               f, rtol=1e-10, atol=1e-8)
    # anchors: linear region 200/3 Hz per mel; 1000 Hz -> 15 mel
    assert abs(ops.hertz_to_mel(200.0, mel_scale="slaney") - 3.0) < 1e-9
    assert abs(ops.hertz_to_mel(1000.0, mel_scale="slaney") - 15.0) < 1e-9
    with pytest.raises(ValueError):
        ops.hertz_to_mel(1.0, mel_scale="mel")
    with pytest.raises(ValueError):
        ops.mel_to_hertz(1.0, mel_scale="mel")

    num_mels, sr, fmin, fmax, nbins = 80, 22050, 0.0, 8000.0, 513
    fb = np.asarray(ops.create_mel_filter(
        num_mels, sr, fmin, fmax, nbins, mel_scale="slaney",
        norm="slaney"), np.float64)
    # independent reconstruction
    f_sp = 200.0 / 3.0
    lstep = np.log(6.4) / 27.0
    mel = lambda h: np.where(np.asarray(h) >= 1000.0,
                             15.0 + np.log(np.maximum(h, 1e-12) / 1000.0) / lstep,
                             np.asarray(h) / f_sp)
    imel = lambda mm: np.where(np.asarray(mm) >= 15.0,
                               1000.0 * np.exp(lstep * (np.asarray(mm) - 15.0)),
                               f_sp * np.asarray(mm))
    pts = imel(np.linspace(mel(fmin), mel(fmax), num_mels + 2))
    freqs = np.linspace(0, sr / 2, nbins)
    ref = np.zeros((nbins, num_mels))
    for j in range(num_mels):
        lo, c, hi = pts[j], pts[j + 1], pts[j + 2]
        tri = np.minimum((freqs - lo) / (c - lo),
                         (hi - freqs) / (hi - c))
        ref[:, j] = np.maximum(0, tri) * 2.0 / (hi - lo)
    np.testing.assert_allclose(fb, ref, atol=1e-12)
    with pytest.raises(ValueError):
        ops.create_mel_filter(8, sr, 0.0, None, 65, norm="l2")
    # jnp input path hits the jnp branch of the scale functions
    mj = ops.hertz_to_mel(jnp.asarray([500.0, 4000.0]),
                          mel_scale="slaney")
    np.testing.assert_allclose(np.asarray(
        ops.mel_to_hertz(mj, mel_scale="slaney")), [500.0, 4000.0],
        rtol=1e-5)


def test_apply_filterbank_is_projection(rng):
    x = rng.random((2, 3, 257, 50)).astype(np.float32)
    fb = ops.create_mel_filter(64, 16000, 0.0, None, 257)
    out = ops.apply_filterbank(jnp.asarray(x), fb)
    assert out.shape == (2, 3, 64, 50)
    ref = np.einsum("bcft,fm->bcmt", x, np.asarray(fb))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- dB

def test_amplitude_to_db_roundtrip(rng):
    x = (rng.random((4, 100)) + 1e-3).astype(np.float32)
    for power in (1.0, 2.0):
        db = ops.amplitude_to_db(jnp.asarray(x), ref=1.0, power=power)
        back = ops.db_to_amplitude(db, ref=1.0, power=power)
        np.testing.assert_allclose(np.asarray(back), x, rtol=1e-4)


def test_amplitude_to_db_semantics():
    x = jnp.asarray([1.0, 10.0, 100.0])
    # amplitude convention: 20·log10
    np.testing.assert_allclose(np.asarray(ops.amplitude_to_db(x)),
                               [0.0, 20.0, 40.0], atol=1e-5)
    # power convention: 10·log10 (librosa power_to_db equivalent)
    np.testing.assert_allclose(np.asarray(ops.amplitude_to_db(x, power=2.0)),
                               [0.0, 10.0, 20.0], atol=1e-5)


def test_amplitude_to_db_amin_clamp():
    out = ops.amplitude_to_db(jnp.asarray([0.0, 1e-12]), amin=1e-7)
    np.testing.assert_allclose(np.asarray(out), [-140.0, -140.0], atol=1e-4)
    # gradient finite at 0 thanks to the clamp
    g = jax.grad(lambda v: ops.amplitude_to_db(v, amin=1e-7).sum())(
        jnp.asarray([0.0]))
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------- mu-law

def test_mulaw_roundtrip(rng):
    x = (rng.random((3, 1000)) * 2 - 1).astype(np.float32)
    enc = ops.mu_law_encoding(jnp.asarray(x), 256)
    e = np.asarray(enc)
    assert e.dtype == np.int32 and e.min() >= 0 and e.max() <= 255
    dec = np.asarray(ops.mu_law_decoding(enc, 256))
    # quantization error bounded by one companded step
    assert np.max(np.abs(dec - x)) < 2.0 / 255 * 4


def test_mulaw_vs_independent_numpy(rng):
    x = (rng.random(500) * 2 - 1).astype(np.float64)
    mu = 255.0
    ref_enc = np.floor((np.sign(x) * np.log1p(mu * np.abs(x))
                        / np.log1p(mu) + 1) / 2 * mu + 0.5).astype(np.int32)
    ours = np.asarray(ops.mu_law_encoding(jnp.asarray(x, jnp.float32), 256))
    assert np.mean(ours != ref_enc) < 0.01  # float32 boundary flips only
    # decode parity exact in float64 formula
    codes = np.arange(256, dtype=np.int32)
    y = codes / mu * 2 - 1
    ref_dec = np.sign(y) * (np.expm1(np.abs(y) * np.log1p(mu))) / mu
    ours_dec = np.asarray(ops.mu_law_decoding(jnp.asarray(codes), 256))
    np.testing.assert_allclose(ours_dec, ref_dec, atol=1e-6)


def test_mulaw_extremes():
    enc = ops.mu_law_encoding(jnp.asarray([-1.0, 0.0, 1.0]), 256)
    # 0 → (0+1)/2·255+0.5 = 128 under trunc-to-int (torch semantics)
    np.testing.assert_array_equal(np.asarray(enc), [0, 128, 255])


# ---------------------------------------------------------------- windows

def test_hann_matches_torch():
    for n in (16, 256, 400, 512):
        ours = ops.hann_window(n)
        ref = torch.hann_window(n, dtype=torch.float64).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_hamming_blackman_match_torch():
    for n in (64, 257):
        np.testing.assert_allclose(
            ops.hamming_window(n),
            torch.hamming_window(n, dtype=torch.float64).numpy(), atol=1e-12)
        np.testing.assert_allclose(
            ops.blackman_window(n),
            torch.blackman_window(n, dtype=torch.float64).numpy(), atol=1e-9)


def test_get_window_forms():
    w = ops.get_window("hann", 64)
    np.testing.assert_allclose(ops.get_window(w, 64), w)
    np.testing.assert_allclose(ops.get_window(None, 8), np.ones(8))
    with pytest.raises(ValueError):
        ops.get_window("nosuch", 64)
    with pytest.raises(ValueError):
        ops.get_window(np.ones(10), 64)


def test_amplitude_to_db_top_db(rng):
    x = jnp.asarray([[1e-6, 1.0, 100.0]], jnp.float32)
    out = np.asarray(ops.amplitude_to_db(x, power=2.0, top_db=30.0))
    # peak is 20 dB (power conv): floor at -10 dB
    np.testing.assert_allclose(out, [[-10.0, 0.0, 20.0]], atol=1e-4)
    with pytest.raises(ValueError):
        ops.amplitude_to_db(x, top_db=-1.0)


def test_bartlett_kaiser_match_torch():
    for n in (64, 257):
        np.testing.assert_allclose(
            ops.bartlett_window(n),
            torch.bartlett_window(n, dtype=torch.float64).numpy(),
            atol=1e-12)
        np.testing.assert_allclose(
            ops.kaiser_window(n, beta=12.0),
            torch.kaiser_window(n, True, 12.0,
                                dtype=torch.float64).numpy(), atol=1e-9)


def test_nuttall_and_named_windows_in_stft(rng):
    w = ops.nuttall_window(128)
    assert abs(w[0]) < 1e-3 and abs(np.max(w) - 1.0) < 2e-2
    x = jnp.asarray(rng.standard_normal(2048).astype(np.float32))
    s = ops.stft(x, 256, 64, window="nuttall")
    assert s.shape[0] == 129


def test_mu_law_encoding_clamps_out_of_range():
    """Inputs outside [-1, 1] must clamp, keeping codes in range."""
    x = jnp.asarray([-5.0, -1.0, 0.0, 1.0, 5.0, np.float32(1.0 + 1e-6)])
    codes = np.asarray(ops.mu_law_encoding(x, 256))
    assert codes.min() >= 0 and codes.max() <= 255
    np.testing.assert_array_equal(codes[0], codes[1])   # -5 == -1
    np.testing.assert_array_equal(codes[3], codes[4])   # +5 == +1
    # in-range values unaffected by the clamp
    y = jnp.asarray(np.linspace(-1, 1, 101, dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(ops.mu_law_encoding(y)),
        np.asarray(ops.mu_law_encoding(jnp.clip(y, -1, 1))))


def test_bark_scale_round_trip_and_filterbank():
    tac = ops
    f = np.array([0.0, 50.0, 440.0, 2000.0, 8000.0, 11025.0])
    for sc in ("traunmuller", "schroeder", "wang"):
        b = tac.hertz_to_bark(f, sc)
        np.testing.assert_allclose(
            np.asarray(tac.bark_to_hertz(b, sc)), f, rtol=1e-8,
            atol=1e-6, err_msg=sc)
        assert (np.diff(np.asarray(b)) > 0).all()  # monotone
        fb = np.asarray(tac.create_bark_filter(24, 22050, num_bins=513,
                                               bark_scale=sc))
        assert fb.shape == (513, 24) and fb.min() >= 0.0
        # triangles: each filter has one contiguous support
        for m in range(24):
            nz = np.where(fb[:, m] > 0)[0]
            assert len(nz) > 0 and (np.diff(nz) == 1).all()
    # traunmuller low/high-frequency corrections are continuous
    eps = 1e-6
    for edge_hz in (np.asarray(tac.bark_to_hertz(2.0)),
                    np.asarray(tac.bark_to_hertz(20.1))):
        lo = float(tac.hertz_to_bark(float(edge_hz) - eps))
        hi = float(tac.hertz_to_bark(float(edge_hz) + eps))
        assert abs(hi - lo) < 1e-4
    with pytest.raises(ValueError):
        tac.hertz_to_bark(100.0, "bogus")
