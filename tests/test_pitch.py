"""Pitch shift: tone moves by the expected frequency ratio, length kept."""
import numpy as np
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops


def _dominant_freq(y, sr):
    spec = np.abs(np.fft.rfft(np.asarray(y) * np.hanning(len(y))))
    return np.argmax(spec) * sr / len(y)


def test_shift_up_octave_tone():
    sr = 8000
    t = np.arange(2 * sr) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = ops.pitch_shift(jnp.asarray(x), sr, 12.0)  # +1 octave
    assert y.shape == x.shape
    f = _dominant_freq(np.asarray(y)[sr // 2: sr // 2 + 4096], sr)
    assert abs(f - 880) < 25, f


def test_shift_down_fifth():
    sr = 8000
    t = np.arange(2 * sr) / sr
    x = np.sin(2 * np.pi * 660 * t).astype(np.float32)
    y = ops.pitch_shift(jnp.asarray(x), sr, -7.0)  # down a fifth ≈ /1.498
    f = _dominant_freq(np.asarray(y)[sr // 2: sr // 2 + 4096], sr)
    assert abs(f - 660 / 1.4983) < 25, f


def test_zero_steps_identity():
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal(4000).astype(np.float32))
    assert ops.pitch_shift(x, 8000, 0.0) is x
