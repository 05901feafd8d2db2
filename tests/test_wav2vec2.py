"""Wav2Vec2 (`models/wav2vec2.py`): length formula, padding
invariance, gradient flow, CTC fine-tune decreases, jit."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu.models.wav2vec2 import Wav2Vec2


@pytest.fixture(scope="module")
def tiny():
    m = Wav2Vec2(extractor_conv_layers=((8, 10, 5), (8, 3, 2),
                                        (8, 2, 2)),
                 d_model=16, num_layers=2, num_heads=2, ff_dim=32,
                 pos_conv_kernel=9, pos_conv_groups=4)
    return m, m.init(jax.random.PRNGKey(0))


def test_output_length_formula(tiny):
    m, p = tiny
    for t in (200, 333, 1000):
        x = jnp.zeros((1, t))
        y, lens = m.apply(p, x)
        assert y.shape[1] == m.output_length(t) == int(lens[0])
    assert m.output_length(320) == ((((320 - 10) // 5 + 1) - 3) // 2
                                    + 1 - 2) // 2 + 1


def test_padding_invariance(tiny):
    m, p = tiny
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 400)).astype(np.float32)
    lengths = jnp.asarray([400, 250])
    y1, l1 = m.apply(p, jnp.asarray(x), lengths)
    x2 = x.copy()
    x2[1, 250:] = 42.0
    y2, _ = m.apply(p, jnp.asarray(x2), lengths)
    n = int(l1[1])
    np.testing.assert_allclose(np.asarray(y1[1, :n]),
                               np.asarray(y2[1, :n]), atol=2e-5)
    assert np.abs(np.asarray(y2[1, n:])).max() == 0.0
    with pytest.raises(ValueError):
        m.apply(p, jnp.zeros((2, 100, 1)))
    with pytest.raises(ValueError):
        Wav2Vec2(d_model=15, num_heads=2)


def test_padding_length_invariance_trained_params(tiny):
    """Same valid sequence under DIFFERENT padded lengths, with
    trained-like (nonzero-bias) params: at init every bias is zero so
    padded frames of the projected features are exactly zero and the
    positional conv cannot leak; with nonzero biases the padded frames
    carry proj_ln.b @ W + proj.b unless the model re-zeros them before
    the conv (regression for that leak)."""
    m, p0 = tiny
    # perturb every leaf so biases (incl. proj_ln.b, proj.b, pos_b)
    # are nonzero, as after any real training step
    leaves, treedef = jax.tree_util.tree_flatten(p0)
    rng = np.random.default_rng(7)
    p = jax.tree_util.tree_unflatten(
        treedef, [l + jnp.asarray(rng.standard_normal(l.shape) * 0.05,
                                  l.dtype) for l in leaves])
    x = rng.standard_normal((1, 250)).astype(np.float32)
    lengths = jnp.asarray([250])
    xa = jnp.asarray(np.pad(x, ((0, 0), (0, 150))))   # T = 400
    xb = jnp.asarray(np.pad(x, ((0, 0), (0, 350))))   # T = 600
    ya, la = m.apply(p, xa, lengths)
    yb, lb = m.apply(p, xb, lengths)
    n = int(la[0])
    assert int(lb[0]) == n
    np.testing.assert_allclose(np.asarray(ya[0, :n]),
                               np.asarray(yb[0, :n]),
                               atol=2e-5, rtol=1e-5)


def test_grads_and_jit(tiny):
    m, p = tiny
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((2, 300)), jnp.float32)
    y, _ = jax.jit(lambda pp, v: m.apply(pp, v))(p, x)
    g = jax.grad(lambda pp: jnp.sum(m.apply(pp, x)[0] ** 2))(p)
    dead = [jax.tree_util.keystr(k)
            for k, v in jax.tree_util.tree_leaves_with_path(g)
            if float(jnp.max(jnp.abs(v))) == 0.0]
    assert not dead, dead


def test_ctc_finetune_decreases():
    m = Wav2Vec2(extractor_conv_layers=((8, 10, 5), (8, 2, 2)),
                 d_model=16, num_layers=1, num_heads=2, ff_dim=24,
                 pos_conv_kernel=5, pos_conv_groups=2, aux_out=6)
    p = m.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 400)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, 6, (2, 3)), jnp.int32)

    def loss_fn(pp):
        logits, lens = m.apply(pp, x)
        lp = jax.nn.log_softmax(logits, -1)
        return tac.ctc_loss(lp, tgt, lens)

    def clipped_step(pp):
        l, g = loss_fn(pp), jax.grad(loss_fn)(pp)
        norm = jnp.sqrt(sum(jnp.sum(v * v)
                            for v in jax.tree_util.tree_leaves(g)))
        scale = jnp.minimum(1.0, 1.0 / (norm + 1e-9))
        return l, jax.tree_util.tree_map(lambda v: v * scale, g)

    step = jax.jit(clipped_step)
    losses = []
    for _ in range(30):
        l, g = step(p)
        losses.append(float(l))
        p = jax.tree_util.tree_map(lambda w, gr: w - 0.05 * gr, p, g)
    assert losses[-1] < losses[0] * 0.9, losses
