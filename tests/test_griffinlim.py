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


def test_pallas_method_interpret(rng, monkeypatch):
    """method='pallas' (one fused kernel per projection) converges like
    the matmul loop and honors length/shapes; ineligible configs fall
    back to matmul with a warning."""
    import pytest
    monkeypatch.setenv("TAC_FUSED_INTERPRET", "1")
    x = jnp.asarray(rng.standard_normal((2, 22050)).astype(np.float32))
    mag = jnp.abs(ops.stft(x, 1024, 256))
    T = 22050
    y = ops.griffin_lim(mag, 1024, 256, n_iter=8, length=T,
                        method="pallas")
    assert y.shape == (2, T)
    mg = jnp.abs(ops.stft(y, 1024, 256))
    sc = float(jnp.linalg.norm(mg - mag) / jnp.linalg.norm(mag))
    # matmul reference lands ~0.23 at 8 iters on this input; the free-
    # edge pallas variant must be in the same convergence class
    assert sc <= 0.35, sc
    # ineligible fft falls back to the matmul loop — LOUDLY
    m2 = jnp.abs(ops.stft(x, 400, 160))
    with pytest.warns(UserWarning, match="pallas"):
        y2 = ops.griffin_lim(m2, 400, 160, n_iter=2, length=T,
                             method="pallas")
    assert y2.shape == (2, T)
    assert bool(jnp.all(jnp.isfinite(y2)))


def test_pallas_method_fft2048_and_key(rng, monkeypatch):
    """The frequency-tiled kernel covers fft=2048 (round-2's kernel fell
    back: the untiled bases alone were 18.8 MB) and honors ``key=``
    random phase init on the kernel path."""
    monkeypatch.setenv("TAC_FUSED_INTERPRET", "1")
    x = jnp.asarray(rng.standard_normal((1, 22050)).astype(np.float32))
    mag = jnp.abs(ops.stft(x, 2048, 512))
    T = 22050
    y = ops.griffin_lim(mag, 2048, 512, n_iter=8, length=T,
                        method="pallas")
    assert y.shape == (1, T)
    mg = jnp.abs(ops.stft(y, 2048, 512))
    sc = float(jnp.linalg.norm(mg - mag) / jnp.linalg.norm(mag))
    assert sc <= 0.35, sc
    # key= no longer disables the kernel path (round-2 weak item)
    yk = ops.griffin_lim(mag, 2048, 512, n_iter=8, length=T,
                         method="pallas", key=jax.random.PRNGKey(7))
    assert yk.shape == (1, T)
    mk = jnp.abs(ops.stft(yk, 2048, 512))
    sck = float(jnp.linalg.norm(mk - mag) / jnp.linalg.norm(mag))
    assert sck <= 0.35, sck
    # different phase init -> genuinely different reconstruction
    assert float(jnp.max(jnp.abs(yk - y))) > 1e-3


def test_fused_gl_supported_matrix():
    assert ops.fused_gl_supported(1024, 256, 431)
    assert ops.fused_gl_supported(2048, 512, 216)       # basis-streamed
    assert ops.fused_gl_supported(1024, 512, 431)       # hop > fft/4
    assert ops.fused_gl_supported(1024, 1024, 431)      # no overlap
    assert not ops.fused_gl_supported(400, 160, 431)    # fft % 128
    assert not ops.fused_gl_supported(1024, 160, 431)   # hop % 128
    assert not ops.fused_gl_supported(1024, 384, 431)   # fft % hop
    assert not ops.fused_gl_supported(2048, 512, 9000)  # frames > VMEM
