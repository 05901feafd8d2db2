"""Griffin-Lim: reconstruction quality on a synthetic harmonic signal."""
import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops


def _harmonic(sr=8000, t=1.0):
    ts = np.arange(int(sr * t)) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * ts)
         + 0.3 * np.sin(2 * np.pi * 440 * ts)
         + 0.2 * np.sin(2 * np.pi * 880 * ts))
    return x.astype(np.float32)


def test_reconstruction_spectral_convergence():
    x = _harmonic()
    fft_length, hop = 512, 128
    mag = jnp.abs(ops.stft(jnp.asarray(x), fft_length, hop))
    y = ops.griffin_lim(mag, fft_length, hop, n_iter=64,
                        key=jax.random.PRNGKey(3), length=x.shape[-1])
    assert y.shape == x.shape
    # spectral convergence: |STFT(y)| should match the target magnitudes
    mag_y = jnp.abs(ops.stft(y, fft_length, hop))
    sc = float(jnp.linalg.norm(mag_y - mag) / jnp.linalg.norm(mag))
    assert sc < 0.1, f"spectral convergence {sc}"


def test_batched_and_random_init():
    x = np.stack([_harmonic(), _harmonic()])[:, None, :]  # (2,1,T)
    mag = jnp.abs(ops.stft(jnp.asarray(x), 256, 64))
    y = ops.griffin_lim(mag, 256, 64, n_iter=8,
                        key=jax.random.PRNGKey(0), length=x.shape[-1])
    assert y.shape == x.shape
    assert np.all(np.isfinite(np.asarray(y)))


def test_jit_compiles_once():
    mag = jnp.ones((129, 20), jnp.float32)
    f = jax.jit(lambda m: ops.griffin_lim(m, 256, 64, n_iter=4))
    y1 = f(mag)
    y2 = f(mag * 2)
    assert y1.shape == y2.shape
