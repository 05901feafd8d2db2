"""Spectral shape descriptors vs independent float64 NumPy references."""
import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops


def _mag(x, fft=512, hop=128):
    return jnp.abs(ops.stft(jnp.asarray(x), fft, hop))


def test_spectral_centroid_tone(rng):
    """A pure tone's centroid sits at the tone frequency."""
    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    c = ops.spectral_centroid(_mag(x), sr)
    mid = np.asarray(c)[4:-4]                 # skip edge frames
    assert np.all(np.abs(mid - 1000.0) < 40.0), (mid.min(), mid.max())


def test_spectral_centroid_numpy_parity(rng):
    sr, fft, hop = 16000, 512, 128
    x = rng.standard_normal(8000).astype(np.float32)
    m = np.asarray(_mag(x, fft, hop), np.float64)
    f = np.linspace(0, sr / 2, fft // 2 + 1)
    ref = (m * f[:, None]).sum(0) / np.maximum(m.sum(0), 1e-20)
    got = np.asarray(ops.spectral_centroid(_mag(x, fft, hop), sr))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-2)


def test_spectral_bandwidth_and_flatness(rng):
    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    tone = np.sin(2 * np.pi * 2000.0 * t).astype(np.float32)
    noise = rng.standard_normal(sr).astype(np.float32)
    bw_tone = np.median(np.asarray(
        ops.spectral_bandwidth(_mag(tone), sr))[4:-4])
    bw_noise = np.median(np.asarray(
        ops.spectral_bandwidth(_mag(noise), sr))[4:-4])
    assert bw_tone < bw_noise, (bw_tone, bw_noise)
    fl_tone = np.median(np.asarray(
        ops.spectral_flatness(_mag(tone)))[4:-4])
    fl_noise = np.median(np.asarray(
        ops.spectral_flatness(_mag(noise)))[4:-4])
    assert fl_tone < 0.01 < fl_noise <= 1.0, (fl_tone, fl_noise)


def test_spectral_rolloff(rng):
    sr = 16000
    x = rng.standard_normal(8000).astype(np.float32)
    m = _mag(x)
    r85 = np.asarray(ops.spectral_rolloff(m, sr, 0.85))
    r99 = np.asarray(ops.spectral_rolloff(m, sr, 0.99))
    assert np.all(r85 <= r99 + 1e-6)
    assert np.all((r85 >= 0) & (r85 <= sr / 2))
    # NumPy reference for one frame
    mf = np.asarray(m, np.float64)
    cum = np.cumsum(mf, axis=0)
    idx = np.argmax(cum >= 0.85 * cum[-1:], axis=0)
    f = np.linspace(0, sr / 2, m.shape[0])
    np.testing.assert_allclose(r85, f[idx], atol=1e-3)


def test_zero_crossing_rate(rng):
    sr = 16000
    t = np.arange(sr, dtype=np.float64) / sr
    # 1 kHz tone: 2000 sign changes/s -> rate = 2000/sr = 0.125
    x = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    z = np.asarray(ops.zero_crossing_rate(x, 2048, 512))
    assert np.all(np.abs(z[2:-2] - 0.125) < 0.01), z[2:-2]
    # batched + jit + shapes
    xb = jnp.asarray(rng.standard_normal((2, 3, 8192)).astype(np.float32))
    zb = jax.jit(lambda v: ops.zero_crossing_rate(v, 1024, 256))(xb)
    assert zb.shape[:2] == (2, 3)
    assert float(jnp.min(zb)) >= 0.0 and float(jnp.max(zb)) <= 1.0


def test_descriptors_batched_and_differentiable(rng):
    sr = 16000
    x = jnp.asarray(rng.standard_normal((2, 2, 8000)).astype(np.float32))
    m = _mag(x)
    for fn in (lambda v: ops.spectral_centroid(v, sr),
               lambda v: ops.spectral_bandwidth(v, sr),
               ops.spectral_flatness):
        out = fn(m)
        assert out.shape == m.shape[:2] + (m.shape[-1],)
        g = jax.grad(lambda v: jnp.sum(fn(v)))(m)
        assert bool(jnp.all(jnp.isfinite(g)))


def test_flatness_quiet_flat_spectrum_reads_one():
    """A uniform (white) magnitude spectrum must give flatness 1.0 at
    ANY level — the old magnitude-scale amin floor on the power-scale
    arithmetic mean crushed a 1e-8 white spectrum to ~1e-6."""
    from torchaudio_contrib_tpu.ops.spectral import spectral_flatness
    quiet = jnp.full((1, 64, 3), 1e-8)
    np.testing.assert_allclose(np.asarray(spectral_flatness(quiet)),
                               1.0, atol=1e-5)
    silent = jnp.zeros((1, 64, 3))
    # exp(mean(log(amin^2))) in float32 rounds to ~0.99999
    np.testing.assert_allclose(np.asarray(spectral_flatness(silent)),
                               1.0, atol=1e-4)
