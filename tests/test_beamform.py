"""Beamforming ops vs float64 NumPy oracles + end-to-end enhancement.

torchaudio is absent here, so every op is checked against a direct
complex128 NumPy implementation of its defining formula, plus semantic
tests (a planted steering vector is recovered; MVDR actually improves
SNR on a synthetic 2-channel mixture; distortionless constraint holds).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.ops import beamform as bf
import torchaudio_contrib_tpu as tac


def _spec(shape, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


def test_psd_matches_numpy():
    x = _spec((2, 3, 5, 7), seed=1)            # (batch, chan, freq, time)
    got = np.asarray(bf.psd(jnp.asarray(x)))
    x64 = x.astype(np.complex128)
    ref = np.einsum("bcft,beft->bfce", x64, np.conj(x64)) / x.shape[-1]
    assert np.max(np.abs(got - ref)) <= 1e-4
    h = np.asarray(got)
    np.testing.assert_allclose(h, np.conj(np.swapaxes(h, -1, -2)),
                               atol=1e-6)      # Hermitian


def test_psd_masked_normalization():
    x = _spec((2, 5, 9), seed=2)               # (chan, freq, time)
    rng = np.random.default_rng(3)
    m = rng.uniform(0.0, 1.0, (5, 9)).astype(np.float32)
    got = np.asarray(bf.psd(jnp.asarray(x), jnp.asarray(m)))
    x64 = x.astype(np.complex128)
    num = np.einsum("cft,eft->fce", x64 * m, np.conj(x64))
    ref = num / (m.sum(-1)[:, None, None] + 1e-10)
    assert np.max(np.abs(got - ref)) <= 1e-4
    un = np.asarray(bf.psd(jnp.asarray(x), jnp.asarray(m),
                           normalize=False))
    assert np.max(np.abs(un - num)) <= 1e-4


def test_mvdr_souden_matches_numpy():
    c, f = 4, 6
    ps = np.asarray(bf.psd(jnp.asarray(_spec((c, f, 32), 4))))
    pn = np.asarray(bf.psd(jnp.asarray(_spec((c, f, 32), 5))))
    got = np.asarray(bf.mvdr_weights_souden(
        jnp.asarray(ps), jnp.asarray(pn), reference_channel=1,
        diagonal_loading=False))
    ps64, pn64 = ps.astype(np.complex128), pn.astype(np.complex128)
    ref = np.empty((f, c), np.complex128)
    for i in range(f):
        num = np.linalg.solve(pn64[i], ps64[i])
        ref[i] = num[:, 1] / (np.trace(num) + 1e-10)
    assert np.max(np.abs(got - ref)) <= 1e-3


def test_mvdr_rtf_matches_numpy_and_distortionless():
    c, f = 3, 8
    pn = np.asarray(bf.psd(jnp.asarray(_spec((c, f, 64), 6))))
    rng = np.random.default_rng(7)
    v = (rng.standard_normal((f, c))
         + 1j * rng.standard_normal((f, c))).astype(np.complex64)
    v = v / v[:, :1]                            # relative TF, ref=0
    got = np.asarray(bf.mvdr_weights_rtf(
        jnp.asarray(v), jnp.asarray(pn), reference_channel=0,
        diagonal_loading=False))
    pn64, v64 = pn.astype(np.complex128), v.astype(np.complex128)
    ref = np.empty((f, c), np.complex128)
    for i in range(f):
        num = np.linalg.solve(pn64[i], v64[i])
        w = num / (np.conj(v64[i]) @ num + 1e-10)
        ref[i] = w * np.conj(v64[i, 0])
    assert np.max(np.abs(got - ref)) <= 1e-3
    # distortionless toward the steering vector at the ref channel:
    # wᴴ v = conj(v[ref]) ⇒ here = 1
    resp = np.einsum("fc,fc->f", np.conj(got), v64)
    np.testing.assert_allclose(resp, np.ones(f), atol=1e-3)


def test_rtf_evd_recovers_planted_steering_vector():
    f, c = 5, 4
    rng = np.random.default_rng(8)
    v = (rng.standard_normal((f, c))
         + 1j * rng.standard_normal((f, c)))
    psd_s = 4.0 * np.einsum("fc,fe->fce", v, np.conj(v))
    psd_s = psd_s + 1e-3 * np.eye(c)            # tiny isotropic floor
    got = np.asarray(bf.rtf_evd(jnp.asarray(psd_s.astype(np.complex64))))
    ref = v / v[:, :1]
    assert np.max(np.abs(got - ref)) <= 1e-2


def test_rtf_power_recovers_planted_steering_vector():
    f, c = 5, 4
    rng = np.random.default_rng(9)
    v = (rng.standard_normal((f, c))
         + 1j * rng.standard_normal((f, c)))
    psd_s = 4.0 * np.einsum("fc,fe->fce", v, np.conj(v))
    psd_n = np.stack([np.diag(rng.uniform(0.5, 2.0, c))
                      for _ in range(f)]).astype(np.complex128)
    got = np.asarray(bf.rtf_power(
        jnp.asarray(psd_s.astype(np.complex64)),
        jnp.asarray(psd_n.astype(np.complex64)),
        n_iter=6, diagonal_loading=False))
    ref = v / v[:, :1]
    assert np.max(np.abs(got - ref)) <= 1e-2
    with pytest.raises(ValueError):
        bf.rtf_power(jnp.asarray(psd_s.astype(np.complex64)),
                     jnp.asarray(psd_n.astype(np.complex64)), n_iter=0)


def test_apply_beamforming_matches_numpy():
    x = _spec((2, 3, 5, 7), 10)
    w = _spec((2, 5, 3), 11)
    got = np.asarray(bf.apply_beamforming(jnp.asarray(w),
                                          jnp.asarray(x)))
    ref = np.einsum("bfc,bcft->bft", np.conj(w.astype(np.complex128)),
                    x.astype(np.complex128))
    assert np.max(np.abs(got - ref)) <= 1e-4


def test_mvdr_end_to_end_improves_snr():
    """4-channel synthetic mixture: MVDR-Souden beats the raw channel.

    Source arrives with per-channel gains; independent noise on each
    channel (array gain ceiling ≈ 10·log10(C) ≈ 6 dB).  Oracle masks
    (clean source/noise spectrograms known) build the PSDs, like
    mask-based neural beamforming would.
    """
    t_len = 8000
    rng = np.random.default_rng(12)
    src = rng.standard_normal(t_len).astype(np.float32)
    gains = np.array([1.0, 0.8, 0.9, 0.7], np.float32)
    clean = gains[:, None] * src
    noise = rng.standard_normal((4, t_len)).astype(np.float32) * 0.7
    mix = clean + noise

    spec_mix = tac.stft(jnp.asarray(mix), 512, 128)     # (C, F, T)
    spec_src = tac.stft(jnp.asarray(clean), 512, 128)
    spec_noi = tac.stft(jnp.asarray(noise), 512, 128)

    psd_s = bf.psd(spec_src)
    psd_n = bf.psd(spec_noi)
    w = bf.mvdr_weights_souden(psd_s, psd_n, reference_channel=0)
    y = bf.apply_beamforming(w, spec_mix)

    # SNR in the STFT domain against the clean reference channel
    ref = np.asarray(jnp.abs(spec_src[0]))
    err_bf = np.asarray(jnp.abs(y - spec_src[0]))
    err_raw = np.asarray(jnp.abs(spec_mix[0] - spec_src[0]))
    snr_bf = 10 * np.log10(np.sum(ref ** 2) / np.sum(err_bf ** 2))
    snr_raw = 10 * np.log10(np.sum(ref ** 2) / np.sum(err_raw ** 2))
    assert snr_bf > snr_raw + 3.0, (snr_bf, snr_raw)


def test_beamforming_differentiable_and_jittable():
    """Grad flows from beamformed power back to the waveform."""
    rng = np.random.default_rng(13)
    wav = jnp.asarray(rng.standard_normal((2, 2048)).astype(np.float32))

    def loss(w):
        spec = tac.stft(w, 256, 64)
        p_s = bf.psd(spec)
        p_n = bf.psd(spec * 0.1)
        wts = bf.mvdr_weights_souden(p_s, p_n)
        y = bf.apply_beamforming(wts, spec)
        return jnp.sum(jnp.abs(y) ** 2)

    g = jax.grad(loss)(wav)
    assert np.all(np.isfinite(np.asarray(g)))
    v = jax.jit(loss)(wav)
    assert np.isfinite(float(v))
