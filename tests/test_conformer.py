"""Conformer encoder (`models/conformer.py`): shapes, padding
invariance, gradient flow, a loss-decreases training loop through
rnnt_loss, jit, and a sharded batch on the 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu.models.conformer import Conformer


@pytest.fixture(scope="module")
def small():
    enc = Conformer(input_dim=16, d_model=32, num_layers=2,
                    num_heads=4, ff_ratio=2, conv_kernel=7,
                    max_distance=8)
    params = enc.init(jax.random.PRNGKey(0))
    return enc, params


def test_shapes_and_param_count(small):
    enc, params = small
    x = jnp.ones((3, 20, 16))
    y = enc.apply(params, x)
    assert y.shape == (3, 20, 32)
    assert enc.num_params(params) > 10_000
    with pytest.raises(ValueError):
        enc.apply(params, jnp.ones((3, 20, 8)))
    with pytest.raises(ValueError):
        Conformer(16, d_model=30, num_heads=4)
    with pytest.raises(ValueError):
        Conformer(16, conv_kernel=8)


def test_padding_invariance(small):
    """Garbage in the padded region must not change valid outputs."""
    enc, params = small
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 24, 16)).astype(np.float32)
    lengths = jnp.asarray([24, 15])
    y1 = enc.apply(params, jnp.asarray(x), lengths)
    x2 = x.copy()
    x2[1, 15:] = 99.0
    y2 = enc.apply(params, jnp.asarray(x2), lengths)
    np.testing.assert_allclose(np.asarray(y1[1, :15]),
                               np.asarray(y2[1, :15]), atol=1e-5)
    # padded frames are zeroed
    assert np.abs(np.asarray(y2[1, 15:])).max() == 0.0


def test_gradients_reach_every_leaf(small):
    enc, params = small
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((2, 12, 16)), jnp.float32)

    g = jax.grad(lambda p: jnp.sum(enc.apply(p, x) ** 2))(params)
    flat = jax.tree_util.tree_leaves_with_path(g)
    dead = [jax.tree_util.keystr(k) for k, v in flat
            if float(jnp.max(jnp.abs(v))) == 0.0]
    assert not dead, f"zero-gradient leaves: {dead}"


def test_rnnt_training_loss_decreases(small):
    """End-to-end ASR stack: conformer → joint logits → rnnt_loss."""
    enc, params = small
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 10, 16)), jnp.float32)
    targets = jnp.asarray(rng.integers(1, 5, (2, 3)), jnp.int32)
    key = jax.random.PRNGKey(4)
    head = {"w": 0.1 * jax.random.normal(key, (32, (3 + 1) * 6))}
    state = {"enc": params, "head": head}

    def loss_fn(st):
        feats = enc.apply(st["enc"], x)              # (B, T, D)
        logits = (feats @ st["head"]["w"]).reshape(2, 10, 4, 6)
        return tac.rnnt_loss(logits, targets, blank=0)

    step = jax.jit(lambda st: (loss_fn(st), jax.grad(loss_fn)(st)))
    losses = []
    for _ in range(8):
        l, g = step(state)
        losses.append(float(l))
        state = jax.tree_util.tree_map(lambda p, gr: p - 0.05 * gr,
                                       state, g)
    assert losses[-1] < losses[0] * 0.9, losses


def test_sharded_batch_on_mesh(small):
    from torchaudio_contrib_tpu import parallel
    enc, params = small
    mesh = parallel.make_mesh()
    x = jnp.asarray(np.random.default_rng(5)
                    .standard_normal((8, 12, 16)), jnp.float32)
    xs = parallel.shard_batch(x, mesh)
    y = jax.jit(lambda p, v: enc.apply(p, v))(params, xs)
    y_ref = enc.apply(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-5)
