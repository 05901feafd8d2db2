"""STFT parity vs torch.stft (the CPU oracle), shapes, gradients.

Mirrors the reference's test strategy [SURVEY.md §4]: shape/dtype
invariants across fft/hop/center combinations, oracle parity ≤1e-4
(BASELINE.json), gradient parity through the full chain.
"""
import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops


def _torch_stft(x_np, fft_length, hop_length, win_length=None, window="hann",
                center=True, pad_mode="reflect", normalized=False,
                onesided=True):
    if win_length is None:
        win_length = fft_length
    if window == "hann":
        w = torch.hann_window(win_length, dtype=torch.float64)
    elif window is None:
        w = torch.ones(win_length, dtype=torch.float64)
    else:
        w = torch.as_tensor(window, dtype=torch.float64)
    x = torch.as_tensor(x_np, dtype=torch.float64)
    flat = x.reshape(-1, x.shape[-1]) if x.dim() > 1 else x
    out = torch.stft(flat, n_fft=fft_length, hop_length=hop_length,
                     win_length=win_length, window=w, center=center,
                     pad_mode=pad_mode, normalized=normalized,
                     onesided=onesided, return_complex=True)
    return out.reshape(x.shape[:-1] + out.shape[-2:]).numpy()


CONFIGS = [
    # fft, hop, win, center, normalized, onesided
    (512, 128, None, True, False, True),     # BASELINE config 1
    (512, 256, None, True, False, True),
    (1024, 256, 400, True, False, True),     # win < n_fft
    (512, 128, None, False, False, True),    # no centering
    (256, 64, None, True, True, True),       # normalized
    (128, 32, None, True, False, False),     # two-sided
]


@pytest.mark.parametrize(
    "fft_length,hop,win,center,normalized,onesided", CONFIGS)
def test_stft_parity_torch(rng, fft_length, hop, win, center, normalized,
                           onesided):
    x = rng.standard_normal((2, 2, 16000)).astype(np.float32)
    ours = ops.stft(jnp.asarray(x), fft_length, hop, win_length=win,
                    window="hann", center=center, normalized=normalized,
                    onesided=onesided)
    ref = _torch_stft(x, fft_length, hop, win_length=win, center=center,
                      normalized=normalized, onesided=onesided)
    assert ours.shape == ref.shape
    err = np.max(np.abs(np.asarray(ours) - ref.astype(np.complex64)))
    assert err <= 1e-4, f"max abs err {err}"


@pytest.mark.parametrize("method", ["fft", "matmul", "gemm"])
def test_stft_methods_agree(rng, method):
    x = rng.standard_normal((3, 8000)).astype(np.float32)
    a = ops.stft(jnp.asarray(x), 512, 128, method="fft")
    b = ops.stft(jnp.asarray(x), 512, 128, method=method)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-4, rtol=0)


def test_stft_shapes_leading_dims(rng):
    # arbitrary leading dims preserved (reference flattens/restores)
    for shape in [(16000,), (4, 16000), (2, 3, 16000), (2, 2, 2, 8000)]:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        s = ops.stft(x, 512, 128)
        n_frames = ops.num_frames(shape[-1], 512, 128)
        assert s.shape == shape[:-1] + (257, n_frames)
        assert s.dtype == jnp.complex64


def test_stft_jit_no_recompile(rng):
    calls = []

    @jax.jit
    def f(x):
        calls.append(1)
        return ops.stft(x, 256, 64)

    x1 = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    f(x1).block_until_ready()
    f(x1 + 1).block_until_ready()
    assert len(calls) == 1  # traced once for a fixed shape


def test_stft_gradient_parity(rng):
    """d(sum |STFT|^2)/dx vs torch autograd — exercises the reflect-pad
    framing adjoint (SURVEY §3c hot spot)."""
    x = rng.standard_normal((2, 2048)).astype(np.float32)

    def loss_jax(xj):
        s = ops.stft(xj, 256, 64)
        return jnp.sum(ops.complex_norm(s, power=2.0))

    g_jax = jax.grad(loss_jax)(jnp.asarray(x))

    xt = torch.as_tensor(x, dtype=torch.float64, ).requires_grad_(True)
    w = torch.hann_window(256, dtype=torch.float64)
    s = torch.stft(xt, 256, 64, window=w, center=True, pad_mode="reflect",
                   return_complex=True)
    torch.sum(s.real ** 2 + s.imag ** 2).backward()
    g_ref = xt.grad.numpy()

    err = np.max(np.abs(np.asarray(g_jax) - g_ref))
    scale = np.max(np.abs(g_ref)) + 1e-12
    assert err / scale <= 1e-4, f"rel grad err {err / scale}"


def test_stft_too_short_raises():
    with pytest.raises(ValueError):
        ops.num_frames(100, 512, 128, center=False)


def test_stft_fuzz_configs_vs_torch(rng):
    """Randomized config sweep: parity must hold across the config space,
    not just the hand-picked cases."""
    r = np.random.default_rng(99)
    for _ in range(12):
        fft_exp = int(r.integers(6, 11))              # 64..1024
        fft_length = 2 ** fft_exp
        hop = int(r.choice([fft_length // 8, fft_length // 4,
                            fft_length // 2, 3 * fft_length // 8]))
        hop = max(hop, 1)
        win = int(r.integers(fft_length // 2, fft_length + 1))
        center = bool(r.integers(0, 2))
        t = int(r.integers(4 * fft_length, 6 * fft_length))
        x = r.standard_normal((2, t)).astype(np.float32)

        ours = ops.stft(jnp.asarray(x), fft_length, hop, win_length=win,
                        center=center)
        ref = _torch_stft(x, fft_length, hop, win_length=win,
                          center=center)
        assert ours.shape == ref.shape, (fft_length, hop, win, center, t)
        err = np.max(np.abs(np.asarray(ours) - ref.astype(np.complex64)))
        assert err <= 1e-4, (err, fft_length, hop, win, center, t)
