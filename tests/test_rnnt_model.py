"""RNN-T model family (`models/rnnt.py`): joint-logits shapes, grads
through every leaf, training overfit + greedy decode recovery, padded
decode invariance, and beam search verified EXACTLY against the
``rnnt_loss`` sequence marginal on a small lattice."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu.models import RNNT, RNNTBeamSearch, Conformer


class TinyTranscriber:
    """Minimal pluggable acoustic encoder (the `transcriber` contract):
    a per-frame MLP, returns bare features (lengths pass through)."""

    def __init__(self, input_dim, output_dim):
        self.i, self.o = input_dim, output_dim

    def init(self, key):
        k1, k2 = jax.random.split(key)
        s1 = (6.0 / (self.i + 32)) ** 0.5
        s2 = (6.0 / (32 + self.o)) ** 0.5
        return {"w1": jax.random.uniform(k1, (self.i, 32),
                                         jnp.float32, -s1, s1),
                "w2": jax.random.uniform(k2, (32, self.o),
                                         jnp.float32, -s2, s2)}

    def apply(self, params, x, lengths=None):
        return jnp.tanh(x @ params["w1"]) @ params["w2"]


@pytest.fixture(scope="module")
def small():
    model = RNNT(TinyTranscriber(8, 24), num_symbols=5, encoding_dim=24,
                 joiner_dim=16, predictor_embed_dim=8,
                 predictor_hidden_dim=16)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_joint_logits_shapes(small):
    model, params = small
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((3, 7, 8)), jnp.float32)
    targets = jnp.asarray([[1, 2, 3], [4, 1, 0], [2, 0, 0]], jnp.int32)
    logits, out_lengths = model.joint_logits(params, x, targets)
    assert logits.shape == (3, 7, 4, 5)
    assert out_lengths.shape == (3,)
    np.testing.assert_array_equal(np.asarray(out_lengths), [7, 7, 7])


def test_conformer_transcriber_composes(small):
    enc = Conformer(input_dim=8, d_model=8, num_layers=1,
                    num_heads=2, conv_kernel=3)
    model = RNNT(enc, num_symbols=5, encoding_dim=8, joiner_dim=16)
    params = model.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((2, 6, 8)), jnp.float32)
    logits, _ = model.joint_logits(
        params, x, jnp.asarray([[1, 2], [3, 4]], jnp.int32))
    assert logits.shape == (2, 6, 3, 5)
    assert np.isfinite(np.asarray(logits)).all()


def test_gradients_reach_every_leaf(small):
    model, params = small
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((2, 6, 8)), jnp.float32)
    targets = jnp.asarray([[1, 2], [3, 4]], jnp.int32)

    def loss_fn(p):
        logits, out_lengths = model.joint_logits(params=p, x=x,
                                                 targets=targets)
        return tac.rnnt_loss(logits, targets, out_lengths, blank=0)

    g = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in flat)
    zero = [np.allclose(np.asarray(leaf), 0.0) for leaf in flat]
    assert not any(zero), f"{sum(zero)} dead leaves"


def test_training_overfits_and_greedy_recovers(small):
    """8 distinct frames → 3-token sequences; after SGD the jitted
    greedy decode must reproduce the training targets exactly."""
    model, params = small
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 8, 8)), jnp.float32)
    targets = jnp.asarray([[1, 2, 3], [4, 2, 1]], jnp.int32)

    def loss_fn(p):
        logits, _ = model.joint_logits(p, x, targets)
        return tac.rnnt_loss(logits, targets, blank=0)

    step = jax.jit(lambda p: (loss_fn(p), jax.grad(loss_fn)(p)))
    losses = []
    for _ in range(150):
        l, g = step(params)
        losses.append(float(l))
        params = jax.tree_util.tree_map(lambda p, gr: p - 0.1 * gr,
                                        params, g)
    assert losses[-1] < losses[0] * 0.2, (losses[0], losses[-1])
    hyp = model.greedy_decode(params, x)
    assert hyp == [[1, 2, 3], [4, 2, 1]], hyp
    # padded decode invariance: re-decode sample 0 alone
    one = model.greedy_decode(params, x[:1])
    assert one == [[1, 2, 3]]
    # raw emission grid mode
    grid = model.greedy_decode(params, x, compact=False)
    assert grid.shape == (2, 8, 4)


def test_greedy_respects_out_lengths(small):
    """Frames past `lengths` must emit nothing."""
    model, params = small
    x = jnp.asarray(np.random.default_rng(4)
                    .standard_normal((2, 6, 8)), jnp.float32)
    lengths = jnp.asarray([6, 3], jnp.int32)
    grid = model.greedy_decode(params, x, lengths=lengths,
                               compact=False)
    tail = np.asarray(grid)[1, 3:]
    assert (tail == model.blank).all()


def test_beam_search_matches_rnnt_loss_marginal():
    """On a tiny lattice with a beam wide enough to be exhaustive and
    max_symbols >= |y|, the beam score of each returned hypothesis is
    EXACTLY the sequence marginal  -rnnt_loss(logits, y).

    Exhaustiveness needs beam >= all distinct label sequences alive at
    once: with 2 non-blank symbols and length <= 3 that is 14 < 64
    (num_symbols=5 would give 84 > 64 and pruning would shave mass off
    low-ranked hypotheses)."""
    model = RNNT(TinyTranscriber(8, 24), num_symbols=3,
                 encoding_dim=24, joiner_dim=16,
                 predictor_embed_dim=8, predictor_hidden_dim=16)
    params = model.init(jax.random.PRNGKey(7))
    x = jnp.asarray(np.random.default_rng(5)
                    .standard_normal((1, 2, 8)), jnp.float32)
    search = RNNTBeamSearch(model, beam_width=64, max_symbols=3)
    hyps = search(params, x)[0]
    assert len(hyps) > 1
    scores = [s for _, s in hyps]
    assert scores == sorted(scores, reverse=True)
    checked = 0
    for toks, score in hyps:
        if not 0 < len(toks) <= 3:
            continue
        t = jnp.asarray(toks, jnp.int32)[None]
        logits, _ = model.joint_logits(params, x, t)
        marg = -float(tac.rnnt_loss(logits, t, blank=0,
                                    reduction="sum"))
        np.testing.assert_allclose(score, marg, rtol=0, atol=2e-4)
        checked += 1
    assert checked >= 3


def test_beam_search_batch_and_lengths(small):
    model, params = small
    x = jnp.asarray(np.random.default_rng(6)
                    .standard_normal((2, 5, 8)), jnp.float32)
    search = RNNTBeamSearch(model, beam_width=4, max_symbols=2)
    out = search(params, x, lengths=jnp.asarray([5, 2], jnp.int32))
    assert len(out) == 2
    for hyps in out:
        assert 1 <= len(hyps) <= 4
        assert all(isinstance(t, list) and isinstance(s, float)
                   for t, s in hyps)
