"""Prototype-named Bark/Chroma transforms (`models/transforms.py`)
and `io.AudioEffector`: composition parity with the underlying ops,
inverse sanity, effect-chain + codec semantics."""
import numpy as np
import pytest

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu.io import AudioEffector


def _sig(n=4000, sr=16000):
    t = np.arange(n) / sr
    return (0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * np.sin(2 * np.pi * 97 * t)).astype(np.float32)


def test_bark_spectrogram_composition():
    x = np.stack([_sig(), _sig() * 0.5])
    bs = tac.BarkSpectrogram(n_fft=400, n_barks=24)(x)
    spec = tac.ops.spectrogram(x, fft_length=400, hop_length=200,
                               power=2.0)
    via_scale = tac.BarkScale(n_stft=201, n_barks=24)(spec)
    assert bs.shape == (2, 24, 21)
    np.testing.assert_allclose(np.asarray(bs), np.asarray(via_scale),
                               rtol=1e-6)


def test_chroma_spectrogram_composition():
    x = _sig()
    cs = tac.ChromaSpectrogram(n_fft=400)(x)
    spec = tac.ops.spectrogram(x, fft_length=400, hop_length=200,
                               power=2.0)
    via_scale = tac.ChromaScale(n_freqs=201)(spec)
    assert cs.shape == (12, 21)
    np.testing.assert_allclose(np.asarray(cs), np.asarray(via_scale),
                               rtol=1e-6)


def test_inverse_bark_scale_roundtrip():
    """Ridge pseudo-inverse recovers smooth spectra approximately."""
    rng = np.random.default_rng(0)
    base = np.abs(rng.normal(size=(1, 201, 1)))
    # smooth along frequency so it lies near the bark bank's range
    from scipy.ndimage import convolve1d
    smooth = convolve1d(np.broadcast_to(base, (1, 201, 4)).copy(),
                        np.hanning(31), axis=1, mode="nearest")
    smooth = np.asarray(smooth, np.float32) + 0.1
    fwd = tac.BarkScale(n_stft=201, n_barks=64)(smooth)
    rec = np.asarray(tac.InverseBarkScale(n_stft=201, n_barks=64)(fwd))
    assert rec.shape == smooth.shape and (rec >= 0).all()
    err = np.linalg.norm(rec - smooth) / np.linalg.norm(smooth)
    assert err < 0.5, err


def test_hop_defaults_to_half_win_length():
    """torchaudio semantics: hop_length defaults to win_length // 2
    (win_length defaulting to n_fft) in the torchaudio-named
    spectrogram transforms."""
    x = _sig()
    for cls, kw in ((tac.MelSpectrogram, dict(n_mels=8)),
                    (tac.BarkSpectrogram, dict(n_barks=8)),
                    (tac.ChromaSpectrogram, {})):
        short = cls(n_fft=400, win_length=200, **kw)(x)
        explicit = cls(n_fft=400, win_length=200, hop_length=100,
                       **kw)(x)
        assert short.shape == explicit.shape, cls.__name__
        np.testing.assert_allclose(np.asarray(short),
                                   np.asarray(explicit), rtol=1e-6)


def test_transforms_are_hashable_config():
    a = tac.BarkSpectrogram(n_fft=400)
    b = tac.BarkSpectrogram(n_fft=400)
    assert hash(a._config) == hash(b._config)


def test_audio_effector_effect_chain():
    x = _sig()[:, None]                       # (time, channel)
    eff = AudioEffector(effect="vol 0.5")
    out = eff.apply(x, 16000)
    assert out.shape == x.shape
    np.testing.assert_allclose(out, x * 0.5, atol=1e-6)


def test_audio_effector_codec():
    x = _sig()[:, None]
    eff = AudioEffector(format="wav", encoder="PCM_S",
                        bits_per_sample=8)
    out = eff.apply(x, 16000)
    assert out.shape == x.shape
    # 8-bit quantization: close but not equal
    assert 1e-4 < float(np.abs(out - x).max()) < 0.02


def test_audio_effector_stream_pads():
    x = _sig(1000)[:, None]
    eff = AudioEffector()
    chunks = list(eff.stream(x, 16000, 300))
    assert len(chunks) == 4
    assert all(c.shape == (300, 1) for c in chunks)
    np.testing.assert_allclose(np.concatenate(chunks)[:1000], x,
                               atol=1e-7)
    assert (chunks[-1][100:] == 0).all()
    nopad = list(AudioEffector(pad_end=False).stream(x, 16000, 300))
    assert nopad[-1].shape == (100, 1)


def test_audio_effector_validation():
    with pytest.raises(ValueError, match="unknown effect"):
        AudioEffector(effect="afftdn")
    with pytest.raises(ValueError, match="format='wav'"):
        AudioEffector(format="mp3")
    with pytest.raises(ValueError, match="time, channel"):
        AudioEffector().apply(np.zeros((1, 2, 100), np.float32), 16000)


def test_audio_effector_rate_changing_effect():
    x = _sig()[:, None]
    out = AudioEffector(effect="speed 2.0").apply(x, 16000)
    assert abs(out.shape[0] - x.shape[0] // 2) <= 2
