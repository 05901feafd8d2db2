"""ConvTasNet (`models/tasnet.py`) + si_snr/snr (`ops/metrics.py`):
shapes, gradient flow, separation training improves SI-SNR, metric
properties vs float64 NumPy."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu.models.tasnet import ConvTasNet


def test_si_snr_properties():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000)
    # perfect reconstruction → very high; scale-invariance exact
    hi = float(tac.si_snr(jnp.asarray(x), jnp.asarray(x)))
    assert hi > 60                       # eps-limited ceiling
    # scale invariance (checked where noise dominates eps)
    noisy = x + 0.2 * rng.standard_normal(1000)
    a = float(tac.si_snr(jnp.asarray(noisy), jnp.asarray(x)))
    s1 = float(tac.si_snr(jnp.asarray(3.7 * noisy), jnp.asarray(x)))
    np.testing.assert_allclose(s1, a, atol=1e-3)
    # plain snr is NOT scale invariant
    assert float(tac.snr(jnp.asarray(3.7 * x), jnp.asarray(x))) < 0
    # known value vs float64 oracle
    n = rng.standard_normal(1000)
    est = x + 0.1 * n
    xm = x - x.mean()
    em = est - est.mean()
    t = (em @ xm) / (xm @ xm) * xm
    exp = 10 * np.log10((t @ t) / ((em - t) @ (em - t)))
    np.testing.assert_allclose(
        float(tac.si_snr(jnp.asarray(est), jnp.asarray(x))), exp,
        rtol=1e-4)


@pytest.fixture(scope="module")
def tiny_net():
    net = ConvTasNet(num_sources=2, enc_kernel=8, enc_filters=32,
                     bottleneck=16, hidden=32, tcn_kernel=3,
                     num_blocks=3, num_repeats=2)
    return net, net.init(jax.random.PRNGKey(0))


def test_shapes_and_grads(tiny_net):
    net, params = tiny_net
    mix = jnp.asarray(np.random.default_rng(1)
                      .standard_normal((2, 803)), jnp.float32)
    out = jax.jit(net.apply)(params, mix)
    assert out.shape == (2, 2, 803)     # odd length round-trips
    g = jax.grad(lambda p: jnp.sum(net.apply(p, mix) ** 2))(params)
    dead = [jax.tree_util.keystr(k)
            for k, v in jax.tree_util.tree_leaves_with_path(g)
            if float(jnp.max(jnp.abs(v))) == 0.0]
    assert not dead, dead
    with pytest.raises(ValueError):
        net.apply(params, jnp.ones((2, 100, 1)))
    with pytest.raises(ValueError):
        ConvTasNet(enc_kernel=7)


def test_separation_training_improves(tiny_net):
    """A few PIT-free steps on fixed sources lift SI-SNR markedly."""
    net, params = tiny_net
    t = np.arange(1600) / 8000.0
    s1 = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    s2 = np.sign(np.sin(2 * np.pi * 97 * t)).astype(np.float32) * 0.5
    srcs = jnp.asarray(np.stack([s1, s2])[None])       # (1, 2, T)
    mix = jnp.asarray((s1 + s2)[None])

    def loss_fn(p):
        est = net.apply(p, mix)
        return -jnp.mean(tac.si_snr(est, srcs))

    step = jax.jit(lambda p: (loss_fn(p), jax.grad(loss_fn)(p)))
    first = None
    for _ in range(30):
        l, g = step(params)
        if first is None:
            first = float(l)
        params = jax.tree_util.tree_map(
            lambda w, gr: w - 1e-3 * gr, params, g)
    last = float(loss_fn(params))
    assert last < first - 3.0, (first, last)  # >3 dB SI-SNR gain
