"""ctc_loss (`ops/ctcloss.py`) vs torch.nn.functional.ctc_loss —
values AND gradients (the sanctioned torch oracle), plus reductions,
padding, zero_infinity, jit."""
import numpy as np
import torch
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac


def _case(b, t, c, lmax, seed, lens=None, tlens=None):
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((b, t, c))
    lp = z - np.log(np.exp(z).sum(-1, keepdims=True))
    tgt = rng.integers(1, c, (b, lmax))
    il = np.array(lens if lens else [t] * b)
    tl = np.array(tlens if tlens else [lmax] * b)
    return lp, tgt, il, tl


def _torch_loss(lp, tgt, il, tl, reduction="mean", zero_infinity=False):
    x = torch.tensor(np.transpose(lp, (1, 0, 2)), dtype=torch.float64,
                     requires_grad=True)
    loss = torch.nn.functional.ctc_loss(
        x, torch.tensor(tgt), torch.tensor(il), torch.tensor(tl),
        blank=0, reduction=reduction, zero_infinity=zero_infinity)
    if reduction != "none":
        loss.backward()
        grad = np.transpose(x.grad.numpy(), (1, 0, 2))
    else:
        grad = None
    return (loss.detach().numpy(), grad)


@pytest.mark.parametrize("reduction", ["none", "mean", "sum"])
def test_matches_torch_values(reduction):
    lp, tgt, il, tl = _case(3, 20, 6, 5, 0, lens=[20, 15, 12],
                            tlens=[5, 3, 2])
    exp, _ = _torch_loss(lp, tgt, il, tl, reduction)
    got = tac.ctc_loss(jnp.asarray(lp, jnp.float32), jnp.asarray(tgt),
                       jnp.asarray(il), jnp.asarray(tl),
                       reduction=reduction)
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-4,
                               atol=1e-5)


def test_matches_torch_gradients():
    """torch's ctc_loss backward BAKES IN the log_softmax chain
    (documented quirk: it returns softmax − occupancy); ours is the
    true d loss/d log_probs.  Compare both ways: (a) jax grads through
    an explicit log_softmax == torch's grads; (b) the chain-rule
    identity maps our raw grad onto torch's."""
    lp, tgt, il, tl = _case(2, 16, 5, 4, 1, lens=[16, 11],
                            tlens=[4, 3])
    _, exp_grad = _torch_loss(lp, tgt, il, tl, "sum")

    # (a) grads wrt pre-softmax logits (lp is normalized, so
    # log_softmax(lp) == lp and the comparison is exact)
    got_chain = jax.grad(
        lambda z: tac.ctc_loss(jax.nn.log_softmax(z, -1),
                               jnp.asarray(tgt), jnp.asarray(il),
                               jnp.asarray(tl), reduction="sum")
    )(jnp.asarray(lp, jnp.float32))
    np.testing.assert_allclose(np.asarray(got_chain), exp_grad,
                               atol=2e-4)

    # (b) raw grad g maps via dz = g - softmax * sum(g)
    g = np.asarray(jax.grad(
        lambda z: tac.ctc_loss(z, jnp.asarray(tgt), jnp.asarray(il),
                               jnp.asarray(tl), reduction="sum")
    )(jnp.asarray(lp, jnp.float32)))
    assert g.max() <= 1e-7  # true d/dlp is -occupancy <= 0
    mapped = g - np.exp(lp) * g.sum(-1, keepdims=True)
    np.testing.assert_allclose(mapped, exp_grad, atol=2e-4)


def test_repeated_tokens_and_jit():
    lp, _, il, tl = _case(1, 18, 4, 6, 2)
    tgt = np.array([[1, 1, 2, 2, 2, 3]])
    exp, _ = _torch_loss(lp, tgt, il, tl, "sum")
    got = jax.jit(lambda z: tac.ctc_loss(
        z, jnp.asarray(tgt), reduction="sum"))(jnp.asarray(lp, jnp.float32))
    np.testing.assert_allclose(float(got), exp, rtol=1e-4)


def test_zero_infinity_and_validation():
    # target longer than input frames allow -> infeasible
    lp, tgt, il, tl = _case(1, 3, 5, 3, 3)
    tgt = np.array([[1, 1, 1]])          # needs >= 5 frames with blanks
    loss = tac.ctc_loss(jnp.asarray(lp, jnp.float32), jnp.asarray(tgt),
                        reduction="none")
    assert float(loss[0]) > 1e20
    loss0 = tac.ctc_loss(jnp.asarray(lp, jnp.float32), jnp.asarray(tgt),
                         reduction="none", zero_infinity=True)
    assert float(loss0[0]) == 0.0
    with pytest.raises(ValueError):
        tac.ctc_loss(jnp.zeros((2, 3)), jnp.zeros((2, 2), jnp.int32))
    with pytest.raises(ValueError):
        tac.ctc_loss(jnp.zeros((1, 3, 4)), jnp.zeros((1, 2), jnp.int32),
                     reduction="bogus")


def test_empty_target():
    lp, _, _, _ = _case(1, 8, 4, 1, 4)
    got = tac.ctc_loss(jnp.asarray(lp, jnp.float32),
                       jnp.zeros((1, 0), jnp.int32), reduction="none")
    exp = -lp[0, :, 0].sum()
    np.testing.assert_allclose(float(got[0]), exp, rtol=1e-5)


def test_loss_decreases_training():
    """Sanity: SGD on emissions drives the loss toward the target."""
    rng = np.random.default_rng(5)
    z = jnp.asarray(rng.standard_normal((1, 12, 5)), jnp.float32)
    tgt = jnp.asarray([[1, 2, 3]], jnp.int32)

    def loss_fn(z):
        return tac.ctc_loss(jax.nn.log_softmax(z, -1), tgt)

    step = jax.jit(lambda z: (loss_fn(z), jax.grad(loss_fn)(z)))
    prev = None
    for _ in range(20):
        l, g = step(z)
        z = z - 0.5 * g
        cur = float(l)
    assert cur < 0.5 * float(loss_fn(jnp.asarray(
        rng.standard_normal((1, 12, 5)), jnp.float32)))
