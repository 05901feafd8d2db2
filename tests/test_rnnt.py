"""rnnt_loss (`ops/rnnt.py`) vs float64 oracles: brute-force path
enumeration (tiny lattices), an alpha-DP loss oracle, and an
alpha-beta occupancy GRADIENT oracle; plus padding, reductions,
clamp, jit."""
import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac


def _logsoftmax(x):
    x = x - x.max(-1, keepdims=True)
    return x - np.log(np.exp(x).sum(-1, keepdims=True))


def _rand_lp(t, u1, c, seed):
    rng = np.random.default_rng(seed)
    return _logsoftmax(rng.standard_normal((t, u1, c)))


def _oracle_alpha(lp, tgt, blank):
    """Float64 forward-variable DP. Returns (alpha, loss)."""
    t_max, u1, _ = lp.shape
    u_max = len(tgt)
    alpha = np.full((t_max, u1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_max):
        for u in range(u1):
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + lp[t - 1, u, blank])
            if u > 0 and u <= u_max:
                cands.append(alpha[t, u - 1] + lp[t, u - 1, tgt[u - 1]])
            if cands:
                alpha[t, u] = max(alpha[t, u],
                                  np.logaddexp.reduce(cands))
    loss = -(alpha[t_max - 1, u_max] + lp[t_max - 1, u_max, blank])
    return alpha, loss


def _oracle_grad(lp, tgt, blank):
    """Occupancy gradient of the loss w.r.t. LOG-PROBS (float64)."""
    t_max, u1, c = lp.shape
    u_max = len(tgt)
    alpha, loss = _oracle_alpha(lp, tgt, blank)
    beta = np.full((t_max + 1, u1), -np.inf)
    beta[t_max, u_max] = 0.0
    for t in range(t_max - 1, -1, -1):
        for u in range(u1 - 1, -1, -1):
            cands = [beta[t + 1, u] + lp[t, u, blank]]
            if u < u_max:
                cands.append(beta[t, u + 1] + lp[t, u, tgt[u]])
            beta[t, u] = np.logaddexp.reduce(cands)
    ll = -loss
    g = np.zeros_like(lp)
    for t in range(t_max):
        for u in range(u1):
            g[t, u, blank] -= np.exp(
                alpha[t, u] + lp[t, u, blank] + beta[t + 1, u] - ll)
            if u < u_max:
                g[t, u, tgt[u]] -= np.exp(
                    alpha[t, u] + lp[t, u, tgt[u]] + beta[t, u + 1] - ll)
    return g, loss


def test_loss_matches_brute_force_enumeration():
    """-log sum over ALL alignment paths on a tiny lattice."""
    t_max, u_max, c = 3, 2, 3
    lp = _rand_lp(t_max, u_max + 1, c, 0)
    tgt = [1, 2]
    blank = 0
    total = -np.inf
    # a path is an ordering of (t_max-1) non-final blanks + u_max emits
    for emit_pos in itertools.combinations(range(t_max - 1 + u_max),
                                           u_max):
        t, u, logp = 0, 0, 0.0
        for step in range(t_max - 1 + u_max):
            if step in emit_pos:
                logp += lp[t, u, tgt[u]]
                u += 1
            else:
                logp += lp[t, u, blank]
                t += 1
        logp += lp[t_max - 1, u_max, blank]   # final blank
        total = np.logaddexp(total, logp)
    got = tac.rnnt_loss(jnp.asarray(lp, jnp.float32)[None],
                        jnp.asarray([tgt], jnp.int32),
                        blank=0, reduction="none",
                        fused_log_softmax=False)
    np.testing.assert_allclose(float(got[0]), -total, atol=1e-5)


def test_loss_matches_alpha_oracle_batched_padded():
    t_max, u_max, c = 12, 5, 8
    lens = [(12, 5), (9, 3), (12, 0), (5, 5)]
    lps, tgts = [], []
    rng = np.random.default_rng(1)
    for k in range(len(lens)):
        lps.append(_rand_lp(t_max, u_max + 1, c, 10 + k))
        tgts.append(rng.integers(1, c, u_max))
    lp = np.stack(lps)
    tgt = np.stack(tgts)
    il = np.array([l[0] for l in lens])
    tl = np.array([l[1] for l in lens])
    got = tac.rnnt_loss(jnp.asarray(lp, jnp.float32),
                        jnp.asarray(tgt, jnp.int32),
                        jnp.asarray(il), jnp.asarray(tl), blank=0,
                        reduction="none", fused_log_softmax=False)
    exp = np.array([
        _oracle_alpha(lps[k][:il[k]], tgts[k][:tl[k]].tolist(), 0)[1]
        for k in range(len(lens))])
    np.testing.assert_allclose(np.asarray(got), exp, rtol=2e-5,
                               atol=2e-5)
    # reductions
    m = tac.rnnt_loss(jnp.asarray(lp, jnp.float32),
                      jnp.asarray(tgt, jnp.int32), jnp.asarray(il),
                      jnp.asarray(tl), blank=0, fused_log_softmax=False)
    np.testing.assert_allclose(float(m), exp.mean(), rtol=2e-5)
    s = tac.rnnt_loss(jnp.asarray(lp, jnp.float32),
                      jnp.asarray(tgt, jnp.int32), jnp.asarray(il),
                      jnp.asarray(tl), blank=0, reduction="sum",
                      fused_log_softmax=False)
    np.testing.assert_allclose(float(s), exp.sum(), rtol=2e-5)


def test_grad_matches_occupancy_oracle():
    """Autodiff through the scans == float64 alpha-beta occupancies."""
    t_max, u_max, c = 8, 4, 6
    rng = np.random.default_rng(2)
    logits = rng.standard_normal((t_max, u_max + 1, c))
    tgt = rng.integers(0, c - 1, u_max)  # blank is last class
    blank = c - 1

    lp64 = _logsoftmax(logits)
    g_lp, loss64 = _oracle_grad(lp64, tgt.tolist(), blank)
    # chain rule through log_softmax: dL/dz_k = g_k - p_k * sum_j g_j
    p = np.exp(lp64)
    g_logits = g_lp - p * g_lp.sum(-1, keepdims=True)

    fn = lambda z: tac.rnnt_loss(z[None], jnp.asarray([tgt], jnp.int32),
                                 blank=-1, reduction="sum")
    got_loss = fn(jnp.asarray(logits, jnp.float32))
    got_grad = jax.grad(fn)(jnp.asarray(logits, jnp.float32))
    np.testing.assert_allclose(float(got_loss), loss64, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_grad), g_logits,
                               atol=2e-5)


def test_clamp_and_jit():
    t_max, u_max, c = 6, 3, 5
    logits = jnp.asarray(_rand_lp(t_max, u_max + 1, c, 3) * 3,
                         jnp.float32)[None]
    tgt = jnp.asarray([[1, 2, 3]], jnp.int32)
    f = jax.jit(lambda z: tac.rnnt_loss(z, tgt, blank=0))
    l0 = float(f(logits))
    assert np.isfinite(l0) and l0 > 0
    clamp = 1e-4
    g = jax.grad(lambda z: tac.rnnt_loss(z, tgt, blank=0,
                                         clamp=clamp))(logits)
    assert float(jnp.max(jnp.abs(g))) <= clamp + 1e-9
    # clamp off: gradients exceed the tiny bound
    g2 = jax.grad(lambda z: tac.rnnt_loss(z, tgt, blank=0))(logits)
    assert float(jnp.max(jnp.abs(g2))) > clamp


def test_validation():
    with pytest.raises(ValueError):
        tac.rnnt_loss(jnp.zeros((2, 3, 4)), jnp.zeros((2, 3), jnp.int32))
    with pytest.raises(ValueError):
        tac.rnnt_loss(jnp.zeros((2, 3, 4, 5)),
                      jnp.zeros((2, 4), jnp.int32))
    with pytest.raises(ValueError):
        tac.rnnt_loss(jnp.zeros((1, 3, 2, 5)),
                      jnp.zeros((1, 1), jnp.int32), reduction="bogus")


def test_empty_target_is_pure_blank_path():
    lp = _rand_lp(5, 1, 4, 4)
    got = tac.rnnt_loss(jnp.asarray(lp, jnp.float32)[None],
                        jnp.zeros((1, 0), jnp.int32), blank=0,
                        reduction="none", fused_log_softmax=False)
    exp = -lp[:, 0, 0].sum()
    np.testing.assert_allclose(float(got[0]), exp, rtol=1e-5)
