"""Chroma filterbank and constant-Q transform (`ops/chroma.py`, `ops/cqt.py`).

The CQT's GEMM path is pinned EXACTLY against direct time-domain
windowed inner products (the definition); chroma/CQT semantics are
checked behaviorally on pure tones at known pitches.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu.ops import chroma as CH
import importlib
C = importlib.import_module("torchaudio_contrib_tpu.ops.cqt")
from torchaudio_contrib_tpu.ops.stft import stft
from torchaudio_contrib_tpu.models import (ChromaFilterbank,
                                           ApplyFilterbank)

SR = 22050


def _tone(freq, seconds=1.0, sr=SR):
    t = np.arange(int(sr * seconds)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


# ---------------------------------------------------------------- chroma

def test_chroma_filter_shape_and_norm():
    fb = np.asarray(CH.create_chroma_filter(12, SR, 1025))
    assert fb.shape == (1025, 12)
    assert (fb >= 0).all()
    # octwidth downweights columns, so norms are ≤ 1 (post-normalization)
    norms = np.linalg.norm(fb, axis=1)
    assert norms.max() <= 1.0 + 1e-6


@pytest.mark.parametrize("freq,pc", [
    (440.0, 9),     # A4 → pitch class A (row 9 with base_c)
    (261.63, 0),    # C4 → C
    (392.0, 7),     # G4 → G
])
def test_chroma_tone_pitch_class(freq, pc):
    mag = jnp.abs(stft(jnp.asarray(_tone(freq))[None], 2048, 512))
    fb = CH.create_chroma_filter(12, SR, 1025)
    ch = jnp.einsum("fc,bft->bct", fb, mag)
    assert int(np.asarray(ch)[0].mean(-1).argmax()) == pc


def test_chroma_octave_invariance():
    # A3 and A5 must land on the same pitch class
    fb = CH.create_chroma_filter(12, SR, 1025)
    rows = []
    for f in (220.0, 880.0):
        mag = jnp.abs(stft(jnp.asarray(_tone(f))[None], 2048, 512))
        ch = np.asarray(jnp.einsum("fc,bft->bct", fb, mag))[0].mean(-1)
        rows.append(int(ch.argmax()))
    assert rows[0] == rows[1] == 9


def test_chroma_base_a_rotation():
    fb_c = np.asarray(CH.create_chroma_filter(12, SR, 1025, base_c=True))
    fb_a = np.asarray(CH.create_chroma_filter(12, SR, 1025, base_c=False))
    np.testing.assert_allclose(np.roll(fb_a, -3, axis=1), fb_c,
                               atol=1e-12)


def test_chroma_layer_in_pipeline():
    bank = ChromaFilterbank(12, SR, num_bins=1025)
    apply_fb = ApplyFilterbank(bank)
    mag = jnp.abs(stft(jnp.asarray(_tone(440.0))[None], 2048, 512))
    out = apply_fb(mag)
    assert out.shape == (1, 12, mag.shape[-1])
    assert int(np.asarray(out)[0].mean(-1).argmax()) == 9


def test_chroma_bad_args():
    with pytest.raises(ValueError):
        CH.create_chroma_filter(12, SR, num_bins=1)


# ------------------------------------------------------------------ cqt

def test_cqt_matches_direct_inner_products():
    """GEMM CQT == direct windowed complex inner products (float64)."""
    fl, hop, n_bins, fmin = 4096, 512, 36, 110.0
    lengths = C._cqt_kernel_np(n_bins, fmin, 12, SR, fl, 1.0)[4]
    rng = np.random.default_rng(0)
    x = rng.standard_normal(SR).astype(np.float32)
    out = np.asarray(C.cqt(x[None], SR, hop_length=hop, n_bins=n_bins,
                           f_min=fmin, fft_length=fl))
    xp = np.pad(x, (fl // 2, fl // 2), mode="reflect")
    freqs = C.cqt_frequencies(n_bins, fmin, 12)
    kt = np.zeros((n_bins, fl), np.complex128)
    for k, (fk, lk) in enumerate(zip(freqs, lengths)):
        n = np.arange(lk) - (lk - 1) / 2
        w = np.hanning(lk)
        w /= w.sum()
        st = (fl - lk) // 2
        kt[k, st:st + lk] = w * np.exp(1j * 2 * np.pi * fk / SR * n)
    direct = np.abs(np.stack(
        [kt.conj() @ xp[t * hop:t * hop + fl]
         for t in range(out.shape[-1])], axis=-1))
    assert np.abs(out[0] - direct).max() / direct.max() < 1e-5


def test_cqt_tone_hits_bin():
    freqs = C.cqt_frequencies(36, 110.0, 12)
    for k in (5, 20, 30):
        o = np.asarray(C.cqt(jnp.asarray(_tone(freqs[k]))[None], SR,
                             n_bins=36, f_min=110.0, fft_length=4096))
        assert int(o[0, :, 10:30].mean(-1).argmax()) == k


def test_cqt_shapes_and_defaults():
    x = jnp.asarray(np.zeros((2, 3, SR), np.float32))
    o = C.cqt(x, SR, n_bins=24, f_min=220.0)     # fft_length inferred
    assert o.shape[:2] == (2, 3) and o.shape[2] == 24


def test_cqt_validation():
    with pytest.raises(ValueError, match="fft_length"):
        C.cqt(jnp.zeros((1, SR)), SR, n_bins=36, f_min=110.0,
              fft_length=2048)
    with pytest.raises(ValueError, match="Nyquist"):
        C.cqt(jnp.zeros((1, SR)), SR, n_bins=96, f_min=1000.0,
              fft_length=8192)


def test_cqt_grad_and_jit():
    x = jnp.asarray(_tone(440.0, 0.5))

    def f(w):
        return C.cqt(w[None], SR, n_bins=24, f_min=220.0,
                     fft_length=2048).sum()

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert abs(float(jax.jit(f)(x)) - float(f(x))) < 1e-2


def test_pseudo_cqt_tone():
    freqs = C.cqt_frequencies(36, 110.0, 12)
    mag = jnp.abs(stft(jnp.asarray(_tone(freqs[20]))[None], 4096, 512,
                       window="rectangular"))
    o = np.asarray(C.pseudo_cqt(mag, SR, n_bins=36, f_min=110.0))
    assert o.shape == (1, 36, mag.shape[-1])
    assert int(o[0, :, 10:30].mean(-1).argmax()) == 20
