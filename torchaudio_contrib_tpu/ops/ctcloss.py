"""CTC loss — TPU-native forward algorithm on the blank-interleaved
lattice.

Not in the reference (SURVEY §2); complements ``ops/rnnt.py`` and
``ops/align.py`` so the library covers both standard ASR training
losses.  Torch keeps ``ctc_loss`` in core (cuDNN kernel); here the
structure maps directly onto XLA:

* Same ``S = 2L+1`` lattice as :func:`~.align.forced_align`, but in the
  log-semiring: ``alpha[t, s] = logsumexp(alpha[t-1, s], alpha[t-1,
  s-1], alpha[t-1, s-2 if skippable]) + emit[t, s]``.  Unlike RNN-T
  there is NO within-row dependency, so one ``lax.scan`` over time with
  two shifted adds is the whole recursion — O(T) depth, fully
  vectorized over states and (via ``vmap``) batch.
* Length masking freezes rows past ``input_lengths`` so one compiled
  program serves a padded, bucketed batch.
* Gradients via autodiff through the scan (the adjoint IS the beta
  recursion); forward AND gradients are pinned against
  ``torch.nn.functional.ctc_loss`` in ``tests/test_ctcloss.py``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ctc_loss"]

_NEG = -1e30


def _ctc_single(lp, targets, in_len, tgt_len, blank_idx):
    """Negative log-likelihood for one (T, C) emission matrix."""
    t_max, _ = lp.shape
    l_max = targets.shape[0]
    s_max = 2 * l_max + 1

    lab = jnp.full((s_max,), blank_idx, targets.dtype)
    lab = lab.at[1::2].set(targets)
    prev2 = jnp.full_like(lab, blank_idx).at[2:].set(lab[:-2])
    can_skip = (jnp.arange(s_max) % 2 == 1) & (lab != prev2)
    alive = jnp.arange(s_max) < 2 * tgt_len + 1

    emit = lp[:, lab]                                   # (T, S)

    init = jnp.full((s_max,), _NEG).at[0].set(emit[0, 0])
    if s_max > 1:
        init = init.at[1].set(jnp.where(tgt_len > 0, emit[0, 1], _NEG))
    init = jnp.where(alive, init, _NEG)

    def step(alpha, inputs):
        t, emit_t = inputs
        stay = alpha
        adv = jnp.full_like(alpha, _NEG).at[1:].set(alpha[:-1])
        skip = jnp.where(
            can_skip,
            jnp.full_like(alpha, _NEG).at[2:].set(alpha[:-2]), _NEG)
        new = jnp.logaddexp(jnp.logaddexp(stay, adv), skip) + emit_t
        new = jnp.where(alive, new, _NEG)
        return jnp.where(t < in_len, new, alpha), None

    alpha, _ = jax.lax.scan(
        step, init, (jnp.arange(1, t_max), emit[1:]))
    end_blank = alpha[2 * tgt_len]
    end_tok = jnp.where(tgt_len > 0,
                        alpha[jnp.maximum(2 * tgt_len - 1, 0)], _NEG)
    return -jnp.logaddexp(end_blank, end_tok)


def ctc_loss(log_probs, targets, input_lengths=None,
             target_lengths=None, blank: int = 0,
             reduction: str = "mean", zero_infinity: bool = False):
    """Connectionist temporal classification loss (batched, jit-able).

    ``log_probs`` ``(batch, time, classes)`` log-softmax emissions
    (note: batch-first, the library convention — torch's is
    time-first); ``targets`` ``(batch, max_target_len)`` token ids
    without ``blank``.  ``reduction`` matches torch: ``"mean"`` divides
    each sequence loss by its target length before averaging;
    ``zero_infinity`` zeroes infeasible-path losses (e.g. targets
    longer than inputs allow).  Differentiable; one compiled program
    per padded shape.
    """
    log_probs = jnp.asarray(log_probs)
    targets = jnp.asarray(targets, jnp.int32)
    if log_probs.ndim != 3 or targets.ndim != 2:
        raise ValueError("log_probs must be (batch, time, classes), "
                         "targets (batch, max_target_len)")
    if reduction not in ("none", "mean", "sum"):
        raise ValueError(f"unknown reduction {reduction!r}")
    b, t_max, n_classes = log_probs.shape
    blank_idx = blank % n_classes
    if input_lengths is None:
        input_lengths = jnp.full((b,), t_max, jnp.int32)
    if target_lengths is None:
        target_lengths = jnp.full((b,), targets.shape[1], jnp.int32)
    input_lengths = jnp.asarray(input_lengths, jnp.int32)
    target_lengths = jnp.asarray(target_lengths, jnp.int32)

    losses = jax.vmap(
        lambda l, tg, il, tl: _ctc_single(l, tg, il, tl, blank_idx)
    )(log_probs, targets, input_lengths, target_lengths)
    if zero_infinity:
        losses = jnp.where(losses >= -0.5 * _NEG, 0.0, losses)
    if reduction == "mean":
        denom = jnp.maximum(target_lengths, 1).astype(losses.dtype)
        return jnp.mean(losses / denom)
    if reduction == "sum":
        return jnp.sum(losses)
    return losses
