"""HDemucs (`models/hdemucs.py`): geometry/shapes, mixture
consistency at init scale, every-leaf gradients, separation training
gain, and jit."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.models import HDemucs
from torchaudio_contrib_tpu.ops import si_snr


def tiny(sources=("a", "b"), **kw):
    cfg = dict(sources=sources, audio_channels=2, channels=4,
               growth=2.0, depth=2, shared_depth=1, nfft=32,
               kernel=8, stride=4, attn_window=4)
    cfg.update(kw)
    return HDemucs(**cfg)


@pytest.fixture(scope="module")
def small():
    model = tiny()
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_shapes_and_padding(small):
    """Output matches input length for non-unit-multiple T."""
    model, params = small
    for T in (160, 137, 64):
        x = jnp.asarray(np.random.default_rng(T)
                        .standard_normal((2, 2, T)), jnp.float32)
        y = model.apply(params, x)
        assert y.shape == (2, 2, 2, T), (T, y.shape)
        assert np.isfinite(np.asarray(y)).all()


def test_mono_and_many_sources():
    model = tiny(sources=("s1", "s2", "s3"), audio_channels=1)
    params = model.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 1, 96)), jnp.float32)
    y = model.apply(params, x)
    assert y.shape == (1, 3, 1, 96)


def test_input_validation(small):
    model, params = small
    with pytest.raises(ValueError, match="mix must be"):
        model.apply(params, jnp.zeros((2, 3, 64)))
    with pytest.raises(ValueError, match="divisible"):
        tiny(nfft=24)          # 12 not divisible by stride**depth=16
    with pytest.raises(ValueError, match="kernel"):
        tiny(kernel=3)


def test_gradients_reach_every_leaf(small):
    model, params = small
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((1, 2, 96)), jnp.float32)
    tgt = jnp.asarray(np.random.default_rng(3)
                      .standard_normal((1, 2, 2, 96)), jnp.float32)

    def loss(p):
        return jnp.mean((model.apply(p, x) - tgt) ** 2)

    g = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    dead = sum(bool(np.allclose(np.asarray(l), 0.0)) for l in flat)
    assert dead == 0, f"{dead} dead leaves"


def test_jit_matches_eager(small):
    model, params = small
    x = jnp.asarray(np.random.default_rng(4)
                    .standard_normal((1, 2, 96)), jnp.float32)
    y0 = model.apply(params, x)
    y1 = jax.jit(model.apply)(params, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               atol=1e-5)


def test_training_separates_tones():
    """Two fixed tones mixed; L1 training must give >5 dB SI-SNR
    improvement over the mixture baseline on both sources."""
    model = tiny()
    params = model.init(jax.random.PRNGKey(5))
    t = np.arange(192) / 16.0
    s1 = np.stack([np.sin(2 * np.pi * 1.0 * t),
                   np.sin(2 * np.pi * 1.0 * t + 0.5)])
    s2 = np.stack([np.sign(np.sin(2 * np.pi * 0.23 * t)),
                   np.sign(np.sin(2 * np.pi * 0.23 * t + 1.0))])
    tgt = jnp.asarray(np.stack([s1, s2])[None], jnp.float32)
    mix = jnp.asarray((s1 + s2)[None], jnp.float32)

    import optax
    opt = optax.adam(5e-3)
    ost = opt.init(params)

    def loss(p):
        return jnp.mean(jnp.abs(model.apply(p, mix) - tgt))

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(loss)(p)
        up, o = opt.update(g, o)
        return optax.apply_updates(p, up), o, l

    for i in range(300):
        params, ost, l = step(params, ost)
    out = model.apply(params, mix)
    base = float(jnp.mean(si_snr(jnp.stack([mix, mix], 1), tgt)))
    got = float(jnp.mean(si_snr(out, tgt)))
    assert got - base > 5.0, (base, got, float(l))
