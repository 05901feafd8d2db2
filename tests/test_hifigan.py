"""HiFi-GAN vocoder (`models/hifigan.py`): upsampling-length contract,
every-leaf gradients, jit==eager, training decreases, published
factory configs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.models.hifigan import (
    HiFiGANVocoder, hifigan_vocoder_v1, hifigan_vocoder_v2,
    hifigan_vocoder_v3,
)


@pytest.fixture(scope="module")
def tiny_net():
    net = HiFiGANVocoder(in_channels=8,
                         upsample_rates=(4, 2),
                         upsample_kernel_sizes=(8, 4),
                         upsample_initial_channel=16,
                         resblock_kernel_sizes=(3, 5),
                         resblock_dilation_sizes=((1, 3), (1, 2)))
    return net, net.init(jax.random.PRNGKey(0))


def test_shapes_and_grads(tiny_net):
    net, params = tiny_net
    assert net.upsample_factor == 8
    mel = jnp.asarray(np.random.default_rng(1)
                      .standard_normal((2, 8, 13)), jnp.float32)
    out = jax.jit(net.apply)(params, mel)
    assert out.shape == (2, 1, 13 * 8)   # exactly frames x prod(rates)
    np.testing.assert_allclose(np.asarray(net.apply(params, mel)),
                               np.asarray(out), atol=1e-5)
    # unbatched passthrough
    assert net.apply(params, mel[0]).shape == (1, 13 * 8)
    # every leaf receives gradient
    g = jax.grad(lambda p: jnp.sum(net.apply(p, mel) ** 2))(params)
    dead = [jax.tree_util.keystr(k)
            for k, v in jax.tree_util.tree_leaves_with_path(g)
            if float(jnp.max(jnp.abs(v))) == 0.0]
    assert not dead, dead
    with pytest.raises(ValueError):
        net.apply(params, jnp.ones((2, 7, 13)))   # wrong channel count
    with pytest.raises(ValueError):
        HiFiGANVocoder(upsample_rates=(4,), upsample_kernel_sizes=(7, 4))
    with pytest.raises(ValueError):
        HiFiGANVocoder(upsample_rates=(3,), upsample_kernel_sizes=(8,))
    with pytest.raises(ValueError):
        HiFiGANVocoder(resblock_type=3)


def test_resblock2_variant():
    net = HiFiGANVocoder(in_channels=4, upsample_rates=(2,),
                         upsample_kernel_sizes=(4,),
                         upsample_initial_channel=8,
                         resblock_kernel_sizes=(3,),
                         resblock_dilation_sizes=((1, 2),),
                         resblock_type=2)
    params = net.init(jax.random.PRNGKey(1))
    # one conv per dilation: no w2/b2 leaves anywhere
    names = {jax.tree_util.keystr(k)
             for k, _ in jax.tree_util.tree_leaves_with_path(params)}
    assert not any("w2" in n for n in names)
    out = net.apply(params, jnp.ones((1, 4, 5)))
    assert out.shape == (1, 1, 10)


def test_training_decreases(tiny_net):
    """Fit a short tone: waveform L2 drops under Adam (the 0.01-std
    init makes raw-SGD gradients vanishingly small at tiny width)."""
    import optax
    net, params = tiny_net
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal((1, 8, 12)), jnp.float32)
    t = np.arange(12 * 8) / 96.0
    target = jnp.asarray(0.3 * np.sin(2 * np.pi * 5 * t),
                         jnp.float32)[None, None]

    def loss_fn(p):
        return jnp.mean((net.apply(p, mel) - target) ** 2)

    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        upd, s = opt.update(g, s)
        return optax.apply_updates(p, upd), s, l

    first = None
    for _ in range(60):
        params, state, l = step(params, state)
        if first is None:
            first = float(l)
    last = float(loss_fn(params))
    assert last < 0.5 * first, (first, last)


def test_factory_configs():
    v1, v2, v3 = (hifigan_vocoder_v1(), hifigan_vocoder_v2(),
                  hifigan_vocoder_v3())
    assert (v1.upsample_factor, v2.upsample_factor,
            v3.upsample_factor) == (256, 256, 256)
    assert (v1.c0, v2.c0, v3.c0) == (512, 128, 256)
    assert v1.rb_type == 1 and v3.rb_type == 2
    # v3 is small enough to run on the CPU suite end to end
    params = v3.init(jax.random.PRNGKey(0))
    out = v3.apply(params, jnp.zeros((1, 80, 4)))
    assert out.shape == (1, 1, 4 * 256)
    n_params = sum(int(np.prod(v.shape))
                   for v in jax.tree_util.tree_leaves(params))
    assert 1e6 < n_params < 2e6          # published v3 is ~1.4 M
