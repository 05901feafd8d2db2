"""Functional spectrogram/melspectrogram (`ops/spectro.py`):
functional ≡ factory pipeline, kwarg flow, filterbank injection,
torch parity through the composed chain."""
import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac


@pytest.fixture()
def wav():
    rng = np.random.default_rng(7)
    return rng.standard_normal((2, 1, 4000)).astype(np.float32)


def test_functional_equals_factory_pipeline(wav):
    x = jnp.asarray(wav)
    fn = tac.spectrogram(x, fft_length=512, hop_length=128, power=2.0)
    pipe = tac.Spectrogram(power=2.0, fft_length=512, hop_length=128)
    np.testing.assert_allclose(np.asarray(fn), np.asarray(pipe(x)),
                               rtol=1e-6, atol=1e-6)
    fnm = tac.melspectrogram(x, num_mels=64, sample_rate=16000,
                             fft_length=512, hop_length=128)
    pipem = tac.Melspectrogram(num_mels=64, sample_rate=16000,
                               fft_length=512, hop_length=128)
    np.testing.assert_allclose(np.asarray(fnm), np.asarray(pipem(x)),
                               rtol=1e-6, atol=1e-6)


def test_torch_parity_through_chain(wav):
    """stft→|.|²→mel vs the torch composition at the ≤1e-4 budget."""
    x = jnp.asarray(wav[:, 0])
    got = np.asarray(tac.melspectrogram(
        x, num_mels=64, sample_rate=16000, fft_length=512,
        hop_length=128))
    xt = torch.from_numpy(wav[:, 0])
    spec = torch.stft(xt, 512, 128, window=torch.hann_window(512),
                      center=True, pad_mode="reflect",
                      return_complex=True)
    mag2 = spec.abs() ** 2
    fb = np.asarray(tac.create_mel_filter(64, 16000, 0.0, None, 257),
                    np.float64)
    ref = np.einsum("bft,fm->bmt", mag2.numpy().astype(np.float64), fb)
    np.testing.assert_allclose(got, ref, atol=1e-4 * max(1.0, ref.max()))


def test_filterbank_injection_and_validation(wav):
    x = jnp.asarray(wav)
    fb = tac.create_mel_filter(32, 16000, 0.0, None, 257,
                               mel_scale="slaney", norm="slaney")
    out = tac.melspectrogram(x, filterbank=fb, fft_length=512,
                             hop_length=128)
    assert out.shape[-2] == 32
    with pytest.raises(ValueError, match="rows"):
        tac.melspectrogram(x, filterbank=fb, fft_length=1024)
    with pytest.raises(ValueError, match="onesided"):
        tac.melspectrogram(x, fft_length=512, onesided=False)


def test_power_one_magnitude(wav):
    x = jnp.asarray(wav)
    m1 = tac.spectrogram(x, fft_length=256, power=1.0)
    m2 = tac.spectrogram(x, fft_length=256, power=2.0)
    np.testing.assert_allclose(np.asarray(m1) ** 2, np.asarray(m2),
                               rtol=1e-4, atol=1e-5)
