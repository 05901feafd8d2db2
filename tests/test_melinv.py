"""Mel inversion: projection quality + full mel→audio round trip."""
import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops


def test_mel_roundtrip_projection(rng):
    """linear → mel → linear recovers in-band magnitudes closely."""
    num_bins, mels, sr = 513, 128, 22050
    fb = ops.create_mel_filter(mels, sr, 0.0, None, num_bins)
    inv = ops.create_inverse_mel_filter(mels, sr, 0.0, None, num_bins)
    # smooth positive spectrum (mel projection loses only fine detail)
    f = np.linspace(0, 1, num_bins)
    spec = (np.exp(-4 * f) + 0.2)[None, :, None] * \
        (1 + 0.1 * rng.random((2, num_bins, 30))).astype(np.float32)
    spec = jnp.asarray(spec, jnp.float32)
    mel = ops.apply_filterbank(spec, fb)
    back = ops.mel_to_linear(mel, inv)
    # compare away from the DC edge where triangles don't cover
    lo, hi = 10, 480
    rel = float(jnp.max(jnp.abs(back - spec)[:, lo:hi, :]
                        / (spec[:, lo:hi, :] + 1e-6)))
    assert rel < 0.15, rel


def test_mel_to_audio_pipeline(rng):
    """mel → linear → griffin_lim produces a signal with matching mel."""
    sr, fft_length, hop, mels = 8000, 512, 128, 64
    ts = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * ts)).astype(np.float32)

    fb = ops.create_mel_filter(mels, sr, 0.0, None, fft_length // 2 + 1)
    inv = ops.create_inverse_mel_filter(mels, sr, 0.0, None,
                                        fft_length // 2 + 1)
    mag = jnp.abs(ops.stft(jnp.asarray(x), fft_length, hop))
    mel = ops.apply_filterbank(mag, fb)

    lin = ops.mel_to_linear(mel, inv)
    y = ops.griffin_lim(lin, fft_length, hop, n_iter=32,
                        key=jax.random.PRNGKey(0), length=x.shape[-1])
    mel_y = ops.apply_filterbank(
        jnp.abs(ops.stft(y, fft_length, hop)), fb)
    sc = float(jnp.linalg.norm(mel_y - mel) / jnp.linalg.norm(mel))
    assert sc < 0.2, f"mel spectral convergence {sc}"
    assert np.all(np.isfinite(np.asarray(y)))


def test_mel_to_audio_end_to_end(rng):
    """One-call mel → waveform inversion recovers a recognizable signal:
    the reconstruction's mel features match the input mel closely."""
    sr, fft, hop = 16000, 512, 128
    t = np.arange(sr, dtype=np.float32) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.3 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    fb = ops.create_mel_filter(64, sr, 0.0, None, fft // 2 + 1)
    spec = ops.stft(jnp.asarray(x), fft, hop)
    mel_db = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb), power=2.0)

    y = ops.mel_to_audio(mel_db, sample_rate=sr, fft_length=fft,
                         hop_length=hop, power=2.0, from_db=True,
                         n_iter=32, length=sr,
                         key=jax.random.PRNGKey(0))
    assert y.shape == (sr,)
    spec_y = ops.stft(y, fft, hop)
    mel_y = ops.apply_filterbank(ops.complex_norm(spec_y, 2.0), fb)
    mel_in = ops.db_to_amplitude(mel_db, power=2.0)
    num = float(jnp.linalg.norm(jnp.sqrt(mel_y) - jnp.sqrt(mel_in)))
    den = float(jnp.linalg.norm(jnp.sqrt(mel_in)))
    assert num / den <= 0.35, num / den
