"""`rnnt_loss_fused` ≡ `rnnt_loss(join(...))` — values AND gradients
(enc, pred, joiner params), ragged lengths, chunk sizes that do and
don't divide T, tanh/relu joiners, and the model-level `RNNT.loss`."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu.ops import rnnt_loss, rnnt_loss_fused


def _setup(rng, B=3, T=11, U=4, J=8, V=7):
    enc = jnp.asarray(rng.standard_normal((B, T, J)), jnp.float32)
    pred = jnp.asarray(rng.standard_normal((B, U + 1, J)), jnp.float32)
    joiner = {"w": jnp.asarray(rng.standard_normal((J, V)) * 0.3,
                               jnp.float32),
              "b": jnp.asarray(rng.standard_normal((V,)) * 0.1,
                               jnp.float32)}
    targets = jnp.asarray(rng.integers(0, V - 1, (B, U)), jnp.int32)
    return enc, pred, joiner, targets


def _baseline(enc, pred, joiner, targets, act, **kw):
    logits = act(enc[:, :, None] + pred[:, None]) @ joiner["w"] \
        + joiner["b"]
    return rnnt_loss(logits, targets, **kw)


@pytest.mark.parametrize("chunk", [1, 4, 11, 16])
@pytest.mark.parametrize("act", [jax.nn.relu, jnp.tanh])
def test_fused_matches_baseline_values(rng, chunk, act):
    enc, pred, joiner, targets = _setup(rng)
    ll = jnp.asarray([11, 7, 5])
    tl = jnp.asarray([4, 2, 0])
    want = _baseline(enc, pred, joiner, targets, act,
                     logit_lengths=ll, target_lengths=tl, blank=-1,
                     reduction="none")
    got = rnnt_loss_fused(enc, pred, joiner, targets, act=act,
                          logit_lengths=ll, target_lengths=tl,
                          blank=-1, reduction="none",
                          time_chunk=chunk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


@pytest.mark.parametrize("B", [2, 600])
def test_fused_adaptive_chunk_default(rng, B):
    # time_chunk=None -> max(4, 512 // B): exercises both the large
    # chunk (B=2 -> 256, clipped to T) and the floor (B=600 -> 4);
    # values must equal the unfused baseline either way
    enc, pred, joiner, targets = _setup(rng, B=B, T=9)
    want = _baseline(enc, pred, joiner, targets, jax.nn.relu,
                     blank=-1, reduction="none")
    got = rnnt_loss_fused(enc, pred, joiner, targets, blank=-1,
                          reduction="none")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_fused_bf16_compute_f32_lattice(rng):
    # under utils.precision.mixed_precision the joint GEMMs run bf16
    # but the lattice recursion upcasts to f32 at the log-softmax:
    # loss must stay close to the f32 loss, grads exit f32
    from torchaudio_contrib_tpu.utils import mixed_precision
    enc, pred, joiner, targets = _setup(rng, B=4, T=40, U=6)

    def loss(jj, e, pr, tgt=targets):
        return rnnt_loss_fused(e, pr, jj, tgt, blank=-1,
                               reduction="mean")

    l32 = float(loss(joiner, enc, pred))
    mp = mixed_precision(loss)
    l16 = float(mp(joiner, enc, pred))
    assert abs(l16 - l32) / max(abs(l32), 1e-9) < 2e-2
    g = jax.grad(mp)(joiner, enc, pred)
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(g))
    # unfused path upcasts bf16 logits the same way
    logits = jnp.asarray(
        rng.standard_normal((4, 40, 7, 7)), jnp.bfloat16)
    tg = jnp.asarray(rng.integers(0, 6, (4, 6)), jnp.int32)
    out = rnnt_loss(logits, tg, blank=-1, reduction="none")
    assert out.dtype == jnp.float32


def test_fused_matches_baseline_grads(rng):
    enc, pred, joiner, targets = _setup(rng)
    ll = jnp.asarray([11, 9, 6])
    tl = jnp.asarray([4, 3, 1])

    def f_fused(enc, pred, joiner):
        return rnnt_loss_fused(enc, pred, joiner, targets,
                               logit_lengths=ll, target_lengths=tl,
                               time_chunk=4)

    def f_base(enc, pred, joiner):
        return _baseline(enc, pred, joiner, targets, jax.nn.relu,
                         logit_lengths=ll, target_lengths=tl)

    g_f = jax.jit(jax.grad(f_fused, argnums=(0, 1, 2)))(enc, pred,
                                                        joiner)
    g_b = jax.jit(jax.grad(f_base, argnums=(0, 1, 2)))(enc, pred,
                                                       joiner)
    for gf, gb in zip(jax.tree_util.tree_leaves(g_f),
                      jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gb),
                                   atol=2e-5)


def test_fused_clamp_matches(rng):
    enc, pred, joiner, targets = _setup(rng)

    def f_fused(enc):
        return rnnt_loss_fused(enc, pred, joiner, targets, clamp=0.01,
                               time_chunk=4)

    def f_base(enc):
        return _baseline(enc, pred, joiner, targets, jax.nn.relu,
                         clamp=0.01)

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_fused)(enc)),
        np.asarray(jax.grad(f_base)(enc)), atol=2e-5)


def test_model_level_fused_loss(rng):
    from torchaudio_contrib_tpu.models import RNNT
    from torchaudio_contrib_tpu.ops import rnnt_loss as rl

    class _Feats:
        def init(self, key):
            return {}

        def apply(self, params, v, lengths=None):
            return v

    V, J, B, T, U = 9, 8, 2, 7, 3
    m = RNNT(_Feats(), num_symbols=V, encoding_dim=J, joiner_dim=J,
             predictor_embed_dim=4, predictor_hidden_dim=8,
             predictor_layers=1)
    p = m.init(jax.random.PRNGKey(0))
    feats = jnp.asarray(rng.standard_normal((B, T, J)) * 0.3,
                        jnp.float32)
    tgts = jnp.asarray(rng.integers(1, V, (B, U)), jnp.int32)
    ll = jnp.asarray([T, T - 2])
    tl = jnp.asarray([U, U - 1])

    want_logits, out_len = m.joint_logits(p, feats, tgts, ll, tl)
    want = rl(want_logits, tgts, logit_lengths=out_len,
              target_lengths=tl, blank=m.blank, reduction="none")
    got = m.loss(p, feats, tgts, ll, tl, reduction="none",
                 time_chunk=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_fused_validates_shapes(rng):
    enc, pred, joiner, targets = _setup(rng)
    with pytest.raises(ValueError, match="targets"):
        rnnt_loss_fused(enc, pred, joiner, targets[:, :2])
    with pytest.raises(ValueError, match="reduction"):
        rnnt_loss_fused(enc, pred, joiner, targets, reduction="bad")
