"""TPU-only checks: fused-kernel parity on real hardware, method
agreement, and gradient sanity — the numerics that CPU tests cannot see
(MXU precision behavior, Mosaic lowering)."""
import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops


def test_fused_kernel_parity_on_device():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 66560)).astype(np.float32))
    fb = ops.create_mel_filter(128, 22050, 0.0, None, 1025)

    out = ops.fused_melspectrogram(x, fb, 2048, 512, to_db=False)
    spec = ops.stft(x, 2048, 512, center=False)
    ref = ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel <= 2e-5, f"fused split3 rel err {rel}"


def test_stft_methods_agree_on_device():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16384)).astype(np.float32))
    a = ops.stft(x, 2048, 512)
    g = ops.stft(x, 2048, 512, method="gemm")
    m = ops.stft(x, 2048, 512, method="matmul",
                 precision=jax.lax.Precision.HIGHEST)
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - g))) / scale <= 1e-5
    assert float(jnp.max(jnp.abs(a - m))) / scale <= 1e-5


def test_istft_roundtrip_on_device():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 2, 16384)).astype(np.float32))
    spec = ops.stft(x, 1024, 256)
    y = ops.istft(spec, 256, length=16384)
    assert float(jnp.max(jnp.abs(y - x))) <= 1e-4


def test_fused_gradient_on_device():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 66560)).astype(np.float32))
    fb = ops.create_mel_filter(64, 22050, 0.0, None, 1025)

    g_fused = jax.grad(lambda v: jnp.sum(
        ops.fused_melspectrogram(v, fb, 2048, 512)))(x)

    def chain(v):
        spec = ops.stft(v, 2048, 512, center=False)
        p = ops.complex_norm(spec, 2.0)
        return jnp.sum(ops.amplitude_to_db(ops.apply_filterbank(p, fb),
                                           power=2.0))

    g_ref = jax.grad(chain)(x)
    rel = float(jnp.max(jnp.abs(g_fused - g_ref))
                / (jnp.max(jnp.abs(g_ref)) + 1e-12))
    assert rel <= 1e-4, f"grad rel err {rel}"


def test_resample_and_mfcc_on_device():
    # small p/q and short clips keep the remote compile fast; numerics
    # are pinned by the CPU tests — this checks the TPU lowering runs
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    y = ops.resample(x, 16000, 8000)
    assert y.shape == (2, 4096)
    assert bool(jnp.all(jnp.isfinite(y)))

    a = ops.mfcc(x, 16000, 13, 64, 512, 128, center=False)
    b = ops.mfcc(x, 16000, 13, 64, 512, 128, use_fused=True)
    rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12))
    assert rel <= 1e-3, f"fused mfcc rel {rel}"
