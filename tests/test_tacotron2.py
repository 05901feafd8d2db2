"""Tacotron2 (`models/tacotron2.py`): shapes, attention properties,
gradient flow, teacher-forced training decreases, inference stop
lengths, jit."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.models.tacotron2 import Tacotron2


@pytest.fixture(scope="module")
def tiny():
    m = Tacotron2(n_symbols=12, n_mels=8, embed_dim=16, encoder_dim=16,
                  attention_dim=12, attention_filters=4,
                  attention_kernel=7, decoder_dim=20, prenet_dim=12,
                  postnet_dim=16, postnet_kernel=3, encoder_kernel=3,
                  n_encoder_convs=2, n_postnet_convs=3)
    return m, m.init(jax.random.PRNGKey(0))


def test_shapes_and_alignment_rows_sum_to_one(tiny):
    m, p = tiny
    tokens = jnp.asarray([[1, 2, 3, 4, 0], [5, 6, 7, 0, 0]])
    tl = jnp.asarray([5, 3])
    mels = jnp.asarray(np.random.default_rng(0)
                       .standard_normal((2, 8, 11)), jnp.float32)
    mel, post, stop, ali = jax.jit(m.apply)(p, tokens, tl, mels)
    assert mel.shape == post.shape == (2, 8, 11)
    assert stop.shape == (2, 11)
    assert ali.shape == (2, 11, 5)
    np.testing.assert_allclose(np.asarray(ali).sum(-1), 1.0, atol=1e-5)
    # attention never lands on padded symbols
    assert np.abs(np.asarray(ali)[1, :, 3:]).max() < 1e-6
    with pytest.raises(ValueError):
        m.apply(p, tokens, tl, jnp.zeros((2, 9, 11)))
    with pytest.raises(ValueError):
        Tacotron2(encoder_dim=15)


def test_gradients_reach_every_leaf(tiny):
    m, p = tiny
    tokens = jnp.asarray([[1, 2, 3]])
    mels = jnp.asarray(np.random.default_rng(1)
                       .standard_normal((1, 8, 6)), jnp.float32)

    def loss(pp):
        mel, post, stop, _ = m.apply(pp, tokens, jnp.asarray([3]), mels)
        return (jnp.mean((mel - mels) ** 2)
                + jnp.mean((post - mels) ** 2) + jnp.mean(stop ** 2))

    g = jax.grad(loss)(p)
    dead = [jax.tree_util.keystr(k)
            for k, v in jax.tree_util.tree_leaves_with_path(g)
            if float(jnp.max(jnp.abs(v))) == 0.0]
    assert not dead, dead


def test_teacher_forced_training_decreases(tiny):
    m, p = tiny
    rng = np.random.default_rng(2)
    tokens = jnp.asarray([[1, 2, 3, 4]])
    tl = jnp.asarray([4])
    target = jnp.asarray(
        np.sin(np.linspace(0, 6, 8 * 10)).reshape(1, 8, 10)
        + 0.05 * rng.standard_normal((1, 8, 10)), jnp.float32)

    def loss(pp):
        mel, post, stop, _ = m.apply(pp, tokens, tl, target)
        stop_target = jnp.zeros_like(stop).at[:, -1].set(1.0)
        bce = jnp.mean(
            jnp.maximum(stop, 0) - stop * stop_target
            + jnp.log1p(jnp.exp(-jnp.abs(stop))))
        return (jnp.mean((mel - target) ** 2)
                + jnp.mean((post - target) ** 2) + bce)

    step = jax.jit(lambda pp: (loss(pp), jax.grad(loss)(pp)))
    losses = []
    for _ in range(15):
        l, g = step(p)
        losses.append(float(l))
        p = jax.tree_util.tree_map(lambda w, gr: w - 0.05 * gr, p, g)
    assert losses[-1] < losses[0] * 0.7, losses


def test_infer_stop_lengths(tiny):
    m, p = tiny
    tokens = jnp.asarray([[1, 2, 3]])
    mel, post, stop, ali, lengths = m.infer(
        p, tokens, jnp.asarray([3]), max_steps=12)
    assert mel.shape == (1, 8, 12) and ali.shape == (1, 12, 3)
    assert 1 <= int(lengths[0]) <= 12
    # bias the stop head positive -> stops at step 1
    p2 = dict(p)
    p2["stop"] = {"w": p["stop"]["w"],
                  "b": jnp.full((1,), 10.0)}
    _, _, _, _, l2 = m.infer(p2, tokens, jnp.asarray([3]), max_steps=12)
    assert int(l2[0]) == 1


def test_encoder_padding_invariance(tiny):
    """The bidirectional encoder's memory at valid positions must not
    depend on how much padding the batch carries (the backward pass
    reverses per-sample by length, never scanning the padded tail)."""
    m, params = tiny
    rng = np.random.default_rng(9)
    toks = rng.integers(1, 12, (1, 5)).astype(np.int32)
    alone = m._encode(params, jnp.asarray(toks),
                      jnp.asarray([5]))[0]
    padded_toks = np.concatenate(
        [toks, rng.integers(1, 12, (1, 4)).astype(np.int32)], 1)
    padded = m._encode(params, jnp.asarray(padded_toks),
                       jnp.asarray([5]))[0]
    np.testing.assert_allclose(np.asarray(padded[0, :5]),
                               np.asarray(alone[0, :5]), atol=1e-6)
    assert float(jnp.max(jnp.abs(padded[0, 5:]))) == 0.0
    # deep custom stacks init without exhausting the key pool
    big = Tacotron2(n_symbols=6, n_mels=4, embed_dim=8,
                    encoder_dim=8, attention_dim=8,
                    attention_filters=2, attention_kernel=3,
                    decoder_dim=8, prenet_dim=8, postnet_dim=8,
                    postnet_kernel=3, encoder_kernel=3,
                    n_encoder_convs=30, n_postnet_convs=25)
    big.init(jax.random.PRNGKey(1))
