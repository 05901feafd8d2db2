"""compliance.kaldi (spectrogram/fbank/mfcc) vs a literal float64
NumPy re-derivation of the Kaldi recipe (per-frame loops, loop-built
mel triangles) — catches vectorization/order-of-operations bugs in the
one-pipeline TPU implementation."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.compliance import kaldi

EPS = float(np.finfo(np.float32).eps)


def _win(window_type, n, bc=0.42):
    a = 2 * np.pi / (n - 1)
    k = np.arange(n)
    return {
        "hanning": 0.5 - 0.5 * np.cos(a * k),
        "hamming": 0.54 - 0.46 * np.cos(a * k),
        "povey": (0.5 - 0.5 * np.cos(a * k)) ** 0.85,
        "rectangular": np.ones(n),
        "blackman": bc - 0.5 * np.cos(a * k) + (0.5 - bc) * np.cos(2 * a * k),
    }[window_type]


def _oracle_frames(x, window, shift, snip_edges):
    n = len(x)
    out = []
    if snip_edges:
        m = 1 + (n - window) // shift if n >= window else 0
        for i in range(m):
            out.append(x[i * shift:i * shift + window].copy())
    else:
        m = (n + shift // 2) // shift
        for i in range(m):
            start = i * shift + shift // 2 - window // 2
            fr = np.empty(window)
            for j in range(window):
                s = start + j
                # Kaldi reflects REPEATEDLY until in range
                while s < 0 or s >= n:
                    if s < 0:
                        s = -s - 1
                    else:
                        s = 2 * n - 1 - s
                fr[j] = x[s]
            out.append(fr)
    return out


def _oracle_pre(x, window_type="povey", remove_dc=True, preemph=0.97,
                raw_energy=True, energy_floor=1.0, snip_edges=True,
                sr=16000.0, frame_ms=25.0, shift_ms=10.0, pow2=True):
    window = int(sr * frame_ms / 1000)
    shift = int(sr * shift_ms / 1000)
    padded = 1 << (window - 1).bit_length() if pow2 else window
    powers, log_es = [], []
    for fr in _oracle_frames(np.asarray(x, np.float64), window, shift,
                             snip_edges):
        if remove_dc:
            fr = fr - fr.mean()
        if raw_energy:
            log_e = np.log(max(np.dot(fr, fr), EPS))
        if preemph != 0.0:
            out = fr.copy()
            for i in range(window - 1, 0, -1):
                out[i] -= preemph * fr[i - 1]
            out[0] -= preemph * fr[0]
            fr = out
        fr = fr * _win(window_type, window)
        if not raw_energy:
            log_e = np.log(max(np.dot(fr, fr), EPS))
        if energy_floor > 0:
            log_e = max(log_e, math.log(energy_floor))
        fr = np.pad(fr, (0, padded - window))
        powers.append(np.abs(np.fft.rfft(fr)) ** 2)
        log_es.append(log_e)
    return np.array(powers), np.array(log_es), padded


def _mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


def _oracle_banks(num_bins, padded, sr, low=20.0, high=0.0):
    nyq = sr / 2
    if high <= 0:
        high = nyq + high
    delta = (_mel(high) - _mel(low)) / (num_bins + 1)
    banks = np.zeros((num_bins, padded // 2))
    for b in range(num_bins):
        left = _mel(low) + b * delta
        center, right = left + delta, left + 2 * delta
        for k in range(padded // 2):
            m = _mel(k * sr / padded)
            if left < m < right:
                banks[b, k] = ((m - left) / delta if m <= center
                               else (right - m) / delta)
    return banks


@pytest.fixture(scope="module")
def wave():
    rng = np.random.default_rng(0)
    t = np.arange(4000) / 16000.0
    return (0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * rng.standard_normal(4000)).astype(np.float32)


def test_spectrogram_matches_oracle(wave):
    got = np.asarray(kaldi.spectrogram(jnp.asarray(wave)))
    power, log_e, _ = _oracle_pre(wave)
    exp = np.log(np.maximum(power, EPS))
    exp[:, 0] = log_e
    assert got.shape == exp.shape == (23, 257)
    np.testing.assert_allclose(got, exp, atol=2e-4)


@pytest.mark.parametrize("wt", ["hanning", "hamming", "blackman",
                                "rectangular"])
def test_window_types(wave, wt):
    got = np.asarray(kaldi.spectrogram(jnp.asarray(wave), window_type=wt,
                                       raw_energy=False))
    power, log_e, _ = _oracle_pre(wave, window_type=wt, raw_energy=False)
    exp = np.log(np.maximum(power, EPS))
    exp[:, 0] = log_e
    np.testing.assert_allclose(got, exp, atol=2e-4)


def test_snip_edges_false(wave):
    got = np.asarray(kaldi.spectrogram(jnp.asarray(wave),
                                       snip_edges=False))
    power, log_e, _ = _oracle_pre(wave, snip_edges=False)
    exp = np.log(np.maximum(power, EPS))
    exp[:, 0] = log_e
    assert got.shape[0] == (4000 + 80) // 160 == 25
    np.testing.assert_allclose(got, exp, atol=2e-4)


def test_snip_edges_false_short_clip_double_reflection(wave):
    """A clip shorter than ~half the window needs MORE than one
    boundary reflection per sample (the old single-reflection path
    left out-of-range indices that silently wrapped via negative
    indexing)."""
    short = wave[:100]                 # window=400 at 16 kHz
    got = np.asarray(kaldi.spectrogram(jnp.asarray(short),
                                       snip_edges=False))
    power, log_e, _ = _oracle_pre(short, snip_edges=False)
    exp = np.log(np.maximum(power, EPS))
    exp[:, 0] = log_e
    np.testing.assert_allclose(got, exp, atol=2e-4)


def test_degenerate_frame_params_raise_on_short_clips():
    """frame_shift that floors to 0 samples raises even when the clip
    is ALSO shorter than the window (the error used to be swallowed
    into the empty-result path)."""
    with pytest.raises(ValueError, match="frame_length/frame_shift"):
        kaldi.fbank(jnp.zeros(300), frame_shift=0.05)


def test_fbank_matches_oracle(wave):
    got = np.asarray(kaldi.fbank(jnp.asarray(wave)))
    power, _, padded = _oracle_pre(wave)
    banks = _oracle_banks(23, padded, 16000.0)
    exp = np.log(np.maximum(power[:, :padded // 2] @ banks.T, EPS))
    assert got.shape == (23, 23)
    np.testing.assert_allclose(got, exp, atol=2e-4)


def test_fbank_energy_and_power_options(wave):
    power, log_e, padded = _oracle_pre(wave)
    banks = _oracle_banks(23, padded, 16000.0)
    # use_energy prepends; htk_compat appends
    got = np.asarray(kaldi.fbank(jnp.asarray(wave), use_energy=True))
    np.testing.assert_allclose(got[:, 0], log_e, atol=2e-4)
    got_htk = np.asarray(kaldi.fbank(jnp.asarray(wave), use_energy=True,
                                     htk_compat=True))
    np.testing.assert_allclose(got_htk[:, -1], log_e, atol=2e-4)
    np.testing.assert_allclose(got_htk[:, :-1], got[:, 1:], atol=1e-5)
    # magnitude + linear fbank
    got_mag = np.asarray(kaldi.fbank(jnp.asarray(wave), use_power=False,
                                     use_log_fbank=False))
    exp = np.sqrt(power[:, :padded // 2]) @ banks.T
    np.testing.assert_allclose(got_mag, exp, rtol=1e-4, atol=1e-4)


def test_mfcc_matches_oracle(wave):
    got = np.asarray(kaldi.mfcc(jnp.asarray(wave)))
    power, log_e, padded = _oracle_pre(wave)
    banks = _oracle_banks(23, padded, 16000.0)
    logmel = np.log(np.maximum(power[:, :padded // 2] @ banks.T, EPS))
    dct = np.zeros((13, 23))
    for i in range(13):
        for j in range(23):
            dct[i, j] = math.sqrt(2.0 / 23) * math.cos(
                math.pi / 23 * i * (j + 0.5))
    dct[0] = math.sqrt(1.0 / 23)
    ceps = logmel @ dct.T
    lift = 1.0 + 0.5 * 22.0 * np.sin(np.pi * np.arange(13) / 22.0)
    exp = ceps * lift
    assert got.shape == (23, 13)
    np.testing.assert_allclose(got, exp, atol=3e-4)
    # use_energy replaces c0 (lifter i=0 term is 1.0)
    got_e = np.asarray(kaldi.mfcc(jnp.asarray(wave), use_energy=True))
    np.testing.assert_allclose(got_e[:, 0], log_e, atol=2e-4)
    np.testing.assert_allclose(got_e[:, 1:], got[:, 1:], atol=1e-5)
    # htk_compat: c0*sqrt(2) moves last
    got_htk = np.asarray(kaldi.mfcc(jnp.asarray(wave), htk_compat=True))
    np.testing.assert_allclose(got_htk[:, -1], got[:, 0] * math.sqrt(2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_htk[:, :-1], got[:, 1:], atol=1e-6)


def test_batch_jit_dither_and_short_input(wave):
    x2 = jnp.stack([jnp.asarray(wave), jnp.asarray(wave[::-1].copy())])
    batched = np.asarray(jax.jit(kaldi.fbank)(x2))
    np.testing.assert_allclose(batched[0],
                               np.asarray(kaldi.fbank(jnp.asarray(wave))),
                               atol=1e-5)
    # dither requires a key and is deterministic given one
    with pytest.raises(ValueError):
        kaldi.fbank(jnp.asarray(wave), dither=1e-3)
    k = jax.random.PRNGKey(0)
    a = kaldi.fbank(jnp.asarray(wave), dither=1e-3, key=k)
    b = kaldi.fbank(jnp.asarray(wave), dither=1e-3, key=k)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # too-short input: zero frames but the REAL feature dim (a corpus
    # loop can still concatenate along the frame axis)
    assert kaldi.mfcc(jnp.zeros(100)).shape == (0, 13)
    assert kaldi.fbank(jnp.zeros(5000),
                       min_duration=1.0).shape == (0, 23)
    assert kaldi.fbank(jnp.zeros(100),
                       use_energy=True).shape == (0, 24)
    assert kaldi.spectrogram(jnp.zeros(100)).shape == (0, 257)


def test_subtract_mean_and_vtln(wave):
    got = np.asarray(kaldi.fbank(jnp.asarray(wave), subtract_mean=True))
    np.testing.assert_allclose(got.mean(0), 0.0, atol=1e-5)
    warped = np.asarray(kaldi.fbank(jnp.asarray(wave), vtln_warp=1.1))
    plain = np.asarray(kaldi.fbank(jnp.asarray(wave)))
    assert warped.shape == plain.shape
    assert np.abs(warped - plain).max() > 1e-2  # warp changes features
