"""RNN-T (transducer) loss — TPU-native log-semiring scan.

Not in the reference (SURVEY §2) — mirrors torchaudio's
``functional.rnnt_loss`` capability (Graves 2012 transducer
forward-variable loss).  Where torchaudio ships a hand-written CUDA/CPU
kernel with explicit alpha/beta kernels, the TPU formulation exploits
the lattice structure directly in XLA:

* ``alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
  alpha[t, u-1] + emit[t, u-1])`` — the within-row dependence on
  ``alpha[t, u-1]`` is a first-order *log-semiring* linear recurrence
  ``x[u] = logaddexp(a[u], x[u-1] + e[u])``, solved in log-depth with
  ``jax.lax.associative_scan`` over the combine
  ``(e1, a1)∘(e2, a2) = (e1+e2, logaddexp(a1+e2, a2))``.
* One ``lax.scan`` over time runs those row solves; everything is
  static-shape, ``vmap``-batched, and jit-able end to end.
* Gradients come from autodiff through the scans (the adjoint of the
  forward recursion IS the beta recursion — no hand-written backward
  kernel to drift out of sync), pinned against a float64 alpha-beta
  occupancy oracle in ``tests/test_rnnt.py``.
* Padded batches: ``logit_lengths`` / ``target_lengths`` mask the
  lattice, so one compiled program serves a bucketed batch.

``clamp`` matches torchaudio: logits gradients are clamped to
``[-clamp, clamp]`` via an identity-with-clipped-cotangent, applied
only when ``clamp > 0``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rnnt_loss"]

_NEG = -1e30


def _combine(x, y):
    e1, a1 = x
    e2, a2 = y
    return e1 + e2, jnp.logaddexp(a1 + e2, a2)


def _rnnt_single(lp, targets, in_len, tgt_len, blank_idx):
    """Negative log-likelihood for one (T, U+1, C) lattice."""
    t_max, u1, _ = lp.shape
    u_max = u1 - 1

    blank_lp = lp[:, :, blank_idx]                       # (T, U+1)
    if u_max > 0:
        emit_lp = jnp.take_along_axis(
            lp[:, :u_max, :], targets[None, :, None], axis=2)[..., 0]
        emit_lp = jnp.where(jnp.arange(u_max)[None, :] < tgt_len,
                            emit_lp, _NEG)               # (T, U)
    else:
        emit_lp = jnp.zeros((t_max, 0), lp.dtype)

    # row 0: alpha[0, u] = cumulative emits at t=0
    row0 = jnp.concatenate([jnp.zeros((1,), lp.dtype),
                            jnp.cumsum(emit_lp[0])])

    def step(prev, inputs):
        blank_prev, emit_t = inputs                      # rows t-1 / t
        a = prev + blank_prev
        es = jnp.concatenate([jnp.zeros((1,), lp.dtype), emit_t])
        _, row = jax.lax.associative_scan(_combine, (es, a))
        return row, row

    _, rows = jax.lax.scan(step, row0, (blank_lp[:-1], emit_lp[1:]))
    alpha = jnp.concatenate([row0[None], rows], 0)       # (T, U+1)

    t_end = jnp.clip(in_len - 1, 0, t_max - 1)
    u_end = jnp.clip(tgt_len, 0, u_max)
    return -(alpha[t_end, u_end] + blank_lp[t_end, u_end])


@jax.custom_vjp
def _clamp_grad(x, clamp):
    return x


def _clamp_grad_fwd(x, clamp):
    return x, clamp


def _clamp_grad_bwd(clamp, g):
    return jnp.clip(g, -clamp, clamp), None


_clamp_grad.defvjp(_clamp_grad_fwd, _clamp_grad_bwd)


def rnnt_loss(logits, targets, logit_lengths=None, target_lengths=None,
              blank: int = -1, clamp: float = -1.0,
              reduction: str = "mean", fused_log_softmax: bool = True):
    """Transducer loss (batched, jit-able, differentiable).

    ``logits`` is ``(batch, time, max_target_len + 1, n_classes)`` joint
    network output; ``targets`` ``(batch, max_target_len)`` token ids
    (must not contain ``blank``); lengths default to the padded sizes.
    ``blank`` may be negative (torchaudio's default ``-1`` = last
    class).  ``reduction`` in {"none", "mean", "sum"} over the batch.
    Set ``fused_log_softmax=False`` if ``logits`` are already
    log-probabilities.  Returns the loss (``(batch,)`` for "none").
    """
    logits = jnp.asarray(logits)
    targets = jnp.asarray(targets, jnp.int32)
    if logits.ndim != 4 or targets.ndim != 2:
        raise ValueError("logits must be (batch, time, max_target_len+1, "
                         "classes), targets (batch, max_target_len)")
    b, t_max, u1, n_classes = logits.shape
    if targets.shape != (b, u1 - 1):
        raise ValueError(
            f"targets must be (batch, {u1 - 1}) to match logits' "
            f"target axis of {u1}; got {targets.shape}")
    if reduction not in ("none", "mean", "sum"):
        raise ValueError(f"unknown reduction {reduction!r}")
    blank_idx = blank % n_classes

    if logit_lengths is None:
        logit_lengths = jnp.full((b,), t_max, jnp.int32)
    if target_lengths is None:
        target_lengths = jnp.full((b,), u1 - 1, jnp.int32)
    logit_lengths = jnp.asarray(logit_lengths, jnp.int32)
    target_lengths = jnp.asarray(target_lengths, jnp.int32)

    if clamp is not None and clamp > 0:
        logits = _clamp_grad(logits, jnp.asarray(clamp, logits.dtype))
    lp = jax.nn.log_softmax(logits, -1) if fused_log_softmax else logits

    losses = jax.vmap(
        lambda l, tg, il, tl: _rnnt_single(l, tg, il, tl, blank_idx)
    )(lp, targets, logit_lengths, target_lengths)
    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "sum":
        return jnp.sum(losses)
    return losses
