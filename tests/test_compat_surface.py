"""torchaudio-signature compatibility surface added in round 4:
`amplitude_to_DB`/`DB_to_amplitude` (explicit multiplier form),
`inverse_spectrogram`, `chroma_filterbank`, and the torchaudio-named
transforms `AmplitudeToDB`, `MelSpectrogram`, `TimeStretch`,
`SpecAugment`, classic `MVDR`, plus `Wav2Vec2Model`/
`FluentSpeechCommands` aliases.  Each adapter is pinned against the
house op it wraps (those are torch/oracle-pinned elsewhere) or a
float64 NumPy restatement of torchaudio's formula."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu import ops


def _wave(n=2048, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(n) * 0.3, jnp.float32)


# ---------------------------------------------------------------- dB

def test_amplitude_to_DB_formula_and_house_equivalence():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 2.0, (8, 10)), jnp.float32)
    got = np.asarray(tac.amplitude_to_DB(x, 10.0, 1e-10, 0.0, 80.0))
    x64 = np.asarray(x, np.float64)
    ref = 10.0 * np.log10(np.maximum(x64, 1e-10))
    ref = np.maximum(ref, ref.max() - 80.0)
    np.testing.assert_allclose(got, ref, atol=1e-4)
    # house op with matching params (ref=1 -> db_multiplier 0)
    house = np.asarray(tac.amplitude_to_db(x, power=2.0, amin=1e-10,
                                           top_db=80.0))
    np.testing.assert_allclose(got, house, atol=1e-5)


def test_amplitude_to_DB_multichannel_shares_peak():
    """torchaudio's top_db peaks over (channel, freq, time) when a
    channel axis exists: a quiet channel is clamped against the LOUD
    channel's peak (regression: per-channel peaks deviated from
    torchaudio on every multichannel port)."""
    x = np.full((2, 3, 4), 1e-8, np.float32)
    x[0, 0, 0] = 1.0                       # channel-0 peak: 0 dB
    got = np.asarray(tac.amplitude_to_DB(
        jnp.asarray(x), 10.0, 1e-10, 0.0, 30.0))
    # channel 1 clamps at 0 - 30 = -30 dB, not at its own -80 + 30
    np.testing.assert_allclose(got[1], -30.0, atol=1e-4)
    # a batch of multichannel clips peaks per clip (last THREE axes)
    xb = np.stack([x, x * 1e-2])
    gb = np.asarray(tac.amplitude_to_DB(
        jnp.asarray(xb), 10.0, 1e-10, 0.0, 30.0))
    np.testing.assert_allclose(gb[1, 1], -50.0, atol=1e-4)


def test_DB_to_amplitude_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(1e-3, 4.0, (5, 7)), jnp.float32)
    db = tac.amplitude_to_DB(x, 10.0, 1e-10, 0.0)
    back = np.asarray(tac.DB_to_amplitude(db, 1.0, 1.0))
    np.testing.assert_allclose(back, np.asarray(x), rtol=1e-5)
    # power=0.5 returns the amplitude for a power-dB input
    amp = np.asarray(tac.DB_to_amplitude(db, 1.0, 0.5))
    np.testing.assert_allclose(amp, np.sqrt(np.asarray(x)), rtol=1e-5)


def test_AmplitudeToDB_transform():
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (4, 6)),
                    jnp.float32)
    t = tac.AmplitudeToDB(stype="power", top_db=60.0)
    np.testing.assert_allclose(
        np.asarray(t(x)),
        np.asarray(tac.amplitude_to_DB(x, 10.0, 1e-10, 0.0, 60.0)))
    t2 = tac.AmplitudeToDB(stype="magnitude")
    np.testing.assert_allclose(
        np.asarray(t2(x)),
        np.asarray(tac.amplitude_to_DB(x, 20.0, 1e-10, 0.0)))
    with pytest.raises(ValueError):
        tac.AmplitudeToDB(stype="db")


# ----------------------------------------------- inverse_spectrogram

def test_inverse_spectrogram_roundtrip_with_pad():
    x = _wave(1600, seed=4)
    pad, n_fft, hop = 8, 256, 64
    xp = jnp.pad(x, (pad, pad))
    spec = ops.stft(xp, n_fft, hop)            # complex
    out = tac.inverse_spectrogram(spec, length=x.shape[-1], pad=pad,
                                  n_fft=n_fft, hop_length=hop)
    assert out.shape[-1] == x.shape[-1]
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               atol=1e-4)


def test_inverse_spectrogram_normalized_window():
    x = _wave(1200, seed=5)
    n_fft, hop = 256, 64
    spec = ops.stft(x, n_fft, hop)
    w = np.hanning(n_fft + 1)[:-1]
    norm = spec / float(np.sqrt((w ** 2).sum()))
    out = tac.inverse_spectrogram(norm, length=x.shape[-1],
                                  n_fft=n_fft, hop_length=hop,
                                  normalized="window")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                               atol=1e-4)


def test_inverse_spectrogram_rejects_magnitude():
    mag = jnp.ones((129, 10), jnp.float32)
    with pytest.raises(ValueError, match="complex"):
        tac.inverse_spectrogram(mag, n_fft=256)


# ------------------------------------------------- chroma_filterbank

def test_chroma_filterbank_alias():
    a = np.asarray(tac.chroma_filterbank(16000, 201, 12))
    b = np.asarray(tac.create_chroma_filter(12, 16000, 201))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (201, 12)


# ----------------------------------------------------- MelSpectrogram

def test_melspectrogram_transform_matches_functional():
    x = _wave(4000, seed=6)
    t = tac.MelSpectrogram(sample_rate=16000, n_fft=400,
                           hop_length=160, n_mels=40, pad=0)
    got = np.asarray(t(x))
    ref = np.asarray(ops.melspectrogram(
        x, num_mels=40, sample_rate=16000, fft_length=400,
        hop_length=160, power=2.0))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    assert got.shape[0] == 40


def test_melspectrogram_transform_pad():
    x = _wave(1000, seed=7)
    t0 = tac.MelSpectrogram(sample_rate=8000, n_fft=128,
                            hop_length=64, n_mels=16, pad=32)
    ref = tac.MelSpectrogram(sample_rate=8000, n_fft=128,
                             hop_length=64, n_mels=16)(
        jnp.pad(x, (32, 32)))
    np.testing.assert_allclose(np.asarray(t0(x)), np.asarray(ref),
                               atol=1e-6)


# --------------------------------------------------------- TimeStretch

def test_time_stretch_matches_phase_vocoder():
    spec = jnp.asarray(
        (np.random.default_rng(8).standard_normal((201, 30, 2))
         @ np.array([1, 1j])).astype(np.complex64))
    t = tac.TimeStretch(hop_length=100, n_freq=201, fixed_rate=1.3)
    got = np.asarray(t(spec))
    adv = jnp.asarray(np.linspace(0, np.pi * 100, 201,
                                  dtype=np.float32))[:, None]
    ref = np.asarray(ops.phase_vocoder(spec, 1.3, adv))
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # identity at rate 1, override wins, config errors are loud
    np.testing.assert_array_equal(
        np.asarray(t(spec, overriding_rate=1.0)), np.asarray(spec))
    with pytest.raises(ValueError, match="n_freq"):
        t(spec[:100])
    with pytest.raises(ValueError, match="overriding_rate"):
        tac.TimeStretch(n_freq=201)(spec)


# --------------------------------------------------------- SpecAugment

def test_specaugment_masks_and_fill():
    x = jnp.asarray(np.random.default_rng(9)
                    .uniform(1.0, 2.0, (2, 40, 60)), jnp.float32)
    t = tac.SpecAugment(n_time_masks=2, time_mask_param=10,
                        n_freq_masks=2, freq_mask_param=8,
                        iid_masks=True, zero_masking=True)
    out = np.asarray(t(x, key=jax.random.PRNGKey(0)))
    assert out.shape == x.shape
    assert (out == 0).any()                      # something masked
    assert not np.array_equal(out[0] == 0, out[1] == 0)  # iid masks
    # mean fill: every masked cell equals the global mean
    tm = tac.SpecAugment(2, 10, 2, 8, zero_masking=False)
    out2 = np.asarray(tm(x, key=jax.random.PRNGKey(1)))
    changed = out2 != np.asarray(x)
    assert changed.any()
    np.testing.assert_allclose(out2[changed], float(np.asarray(x).mean()),
                               atol=1e-6)


def test_specaugment_p_caps_time_mask_and_jits():
    x = jnp.ones((1, 8, 50), jnp.float32)
    t = tac.SpecAugment(n_time_masks=1, time_mask_param=100,
                        n_freq_masks=0, freq_mask_param=0,
                        iid_masks=False, p=0.2)
    out = np.asarray(jax.jit(lambda a, k: t(a, key=k))(
        x, jax.random.PRNGKey(2)))
    # each time mask is at most p * T = 10 columns wide
    masked_cols = (out[0] == 0).all(axis=0).sum()
    assert masked_cols <= 10
    with pytest.raises(ValueError):
        tac.SpecAugment(1, 10, 1, 8, p=1.5)


# --------------------------------------------------------------- MVDR

def _scene(seed=0, c=4, f=32, t=64):
    rng = np.random.default_rng(seed)
    sig = (rng.standard_normal((1, f, t))
           + 1j * rng.standard_normal((1, f, t)))
    stv = (rng.standard_normal((c, f, 1))
           + 1j * rng.standard_normal((c, f, 1)))
    noise = 0.3 * (rng.standard_normal((c, f, t))
                   + 1j * rng.standard_normal((c, f, t)))
    x = (sig * stv + noise).astype(np.complex64)
    m_s = np.abs(sig[0]).astype(np.float32)
    m_s = (m_s / m_s.max()).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(m_s), jnp.asarray(1.0 - m_s)


def test_mvdr_ref_channel_equals_composed_ops():
    x, ms, mn = _scene(10)
    t = tac.MVDR(ref_channel=1, solution="ref_channel")
    got = np.asarray(t(x, mask_s=ms, mask_n=mn))
    w = ops.mvdr_weights_souden(ops.psd(x, ms), ops.psd(x, mn),
                                reference_channel=1)
    ref = np.asarray(ops.apply_beamforming(w, x))
    np.testing.assert_allclose(got, ref, atol=1e-6)


@pytest.mark.parametrize("solution", ["stv_evd", "stv_power"])
def test_mvdr_stv_solutions_run(solution):
    x, ms, mn = _scene(11)
    t = tac.MVDR(solution=solution)
    out = np.asarray(t(x, mask_s=ms, mask_n=mn))
    assert out.shape == x.shape[1:]
    assert np.isfinite(out).all()


def test_mvdr_loud_errors_and_multimask():
    x, ms, mn = _scene(12)
    with pytest.raises(NotImplementedError, match="online"):
        tac.MVDR(online=True)
    with pytest.raises(ValueError, match="solution"):
        tac.MVDR(solution="gev")
    with pytest.raises(TypeError, match="mask_s"):
        tac.MVDR()(x)
    # multi_mask: (channel, freq, time) masks average over channels
    mm = tac.MVDR(multi_mask=True)
    c = x.shape[0]
    got = np.asarray(mm(x, mask_s=jnp.broadcast_to(ms, (c,) + ms.shape),
                        mask_n=jnp.broadcast_to(mn, (c,) + mn.shape)))
    ref = np.asarray(tac.MVDR()(x, mask_s=ms, mask_n=mn))
    np.testing.assert_allclose(got, ref, atol=1e-6)


# -------------------------------------------------------------- aliases

def test_aliases():
    from torchaudio_contrib_tpu import models, datasets
    assert models.Wav2Vec2Model is models.Wav2Vec2
    assert tac.Wav2Vec2Model is models.Wav2Vec2
    assert datasets.FluentSpeechCommands is datasets.FLUENTSPEECHCOMMANDS
