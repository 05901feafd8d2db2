"""CTC forced alignment (Viterbi over the blank-interleaved lattice).

Not in the reference (SURVEY §2) — mirrors torchaudio's
``forced_align`` capability (align a known transcript to emission
log-probs).  TPU formulation:

* The CTC state lattice (``S = 2L+1`` blank-interleaved states) is a
  static shape derived from the (padded) target length; the forward
  Viterbi pass is ONE ``lax.scan`` over time whose body is pure
  elementwise max/gather over the S axis — no data-dependent shapes.
* Back-pointers (values in {0,1,2} = stay/advance/skip) are stored as
  int8 ``(T, S)`` and the traceback is a second ``lax.scan`` run in
  reverse — everything jit-able and batchable with ``vmap``.
* Padded batches: ``input_lengths``/``target_lengths`` mask the
  lattice, so one compiled program serves a whole bucketed batch
  (torchaudio's implementation requires ``batch == 1``).

Semantics pinned against a float64 NumPy Viterbi oracle in
``tests/test_align.py``; the emission restriction (``blank`` must be a
valid class, repeated targets must be separated through blank states)
is the standard CTC topology.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["forced_align", "merge_tokens", "TokenSpan"]

_NEG = -1e30


def _align_single(log_probs: jnp.ndarray, targets: jnp.ndarray,
                  in_len: jnp.ndarray, tgt_len: jnp.ndarray,
                  blank: int):
    """Viterbi alignment for one sequence.

    ``log_probs`` ``(T, C)``, ``targets`` ``(L,)``; returns
    ``(alignment (T,), scores (T,))`` — blank-expanded frame labels and
    the per-frame emission log-prob of the chosen path.  Frames beyond
    ``in_len`` hold ``blank`` / 0.
    """
    t_max, _ = log_probs.shape
    l_max = targets.shape[0]
    s_max = 2 * l_max + 1

    # lattice labels: blank at even states, target tokens at odd
    lab = jnp.full((s_max,), blank, targets.dtype)
    lab = lab.at[1::2].set(targets)
    # skip transition s-2 → s allowed only into an odd state whose
    # token differs from the token two states back
    prev2 = jnp.full_like(lab, blank).at[2:].set(lab[:-2])
    can_skip = (jnp.arange(s_max) % 2 == 1) & (lab != prev2)
    # states beyond the true target length are dead
    alive = jnp.arange(s_max) < 2 * tgt_len + 1

    emit = log_probs[:, lab]                       # (T, S) gather once

    def fwd(delta, emit_t):
        stay = delta
        adv = jnp.full_like(delta, _NEG).at[1:].set(delta[:-1])
        skip = jnp.where(can_skip,
                         jnp.full_like(delta, _NEG).at[2:].set(delta[:-2]),
                         _NEG)
        stacked = jnp.stack([stay, adv, skip])     # (3, S)
        choice = jnp.argmax(stacked, axis=0).astype(jnp.int8)
        best = jnp.max(stacked, axis=0)
        new = jnp.where(alive, best + emit_t, _NEG)
        return new, choice

    init = jnp.full((s_max,), _NEG).at[0].set(emit[0, 0])
    init = jnp.where(alive, init, _NEG)
    if s_max > 1:
        init = init.at[1].set(jnp.where(tgt_len > 0, emit[0, 1], _NEG))

    # keep per-step deltas so the terminal read happens at the last
    # VALID frame (in_len−1), not the padded end
    def fwd_keep(delta, emit_t):
        new, choice = fwd(delta, emit_t)
        return new, (choice, new)

    _, (bp, all_delta) = jax.lax.scan(fwd_keep, init, emit[1:])
    all_delta = jnp.concatenate([init[None], all_delta], 0)  # (T, S)
    last = all_delta[jnp.maximum(in_len - 1, 0)]

    # the path must end in the last blank or last token state
    end_blank = 2 * tgt_len
    end_tok = jnp.maximum(2 * tgt_len - 1, 0)
    s_end = jnp.where(last[end_blank] >= last[end_tok],
                      end_blank, end_tok)
    score_total = jnp.maximum(last[end_blank], last[end_tok])

    # traceback (reverse scan over the stored back-pointers)
    bp_full = jnp.concatenate([jnp.zeros((1, s_max), jnp.int8), bp], 0)

    def back(s, inputs):
        t, bp_t = inputs
        inside = t < in_len
        step = jnp.where((t >= 1) & inside, bp_t[s].astype(jnp.int32), 0)
        prev_s = jnp.clip(s - step, 0, s_max - 1)
        out_s = jnp.where(inside, s, 0)
        return prev_s, out_s

    ts = jnp.arange(t_max - 1, -1, -1)
    _, states_rev = jax.lax.scan(back, s_end, (ts, bp_full[ts]))
    states = states_rev[::-1]                      # (T,)
    frames = jnp.arange(t_max)
    inside = frames < in_len
    alignment = jnp.where(inside, lab[states], blank)
    scores = jnp.where(inside, emit[frames, states], 0.0)
    return alignment, scores, score_total


def forced_align(log_probs: jnp.ndarray, targets: jnp.ndarray,
                 input_lengths=None, target_lengths=None,
                 blank: int = 0):
    """Align transcripts to CTC emissions (Viterbi, batched, jit-able).

    ``log_probs`` is ``(batch, time, n_classes)`` log-softmax emissions;
    ``targets`` ``(batch, L)`` token ids (``blank`` must not appear);
    lengths default to the full padded sizes.  Returns ``(alignments
    (batch, time) int32, scores (batch, time) float32)`` — the
    blank-expanded frame labels of the best path and each frame's
    emission log-prob (0 past ``input_lengths``).  Unlike torchaudio's
    CPU implementation, any batch size works (padded + masked lattice,
    one compiled program).
    """
    log_probs = jnp.asarray(log_probs)
    targets = jnp.asarray(targets, jnp.int32)
    if log_probs.ndim != 3 or targets.ndim != 2:
        raise ValueError(
            "log_probs must be (batch, time, classes), targets "
            "(batch, length)")
    b, t_max, _ = log_probs.shape
    if input_lengths is None:
        input_lengths = jnp.full((b,), t_max, jnp.int32)
    if target_lengths is None:
        target_lengths = jnp.full((b,), targets.shape[1], jnp.int32)
    input_lengths = jnp.asarray(input_lengths, jnp.int32)
    target_lengths = jnp.asarray(target_lengths, jnp.int32)

    align, scores, _ = jax.vmap(
        lambda lp, tg, il, tl: _align_single(lp, tg, il, tl, blank)
    )(log_probs, targets, input_lengths, target_lengths)
    return align.astype(jnp.int32), scores


class TokenSpan:
    """One aligned token occurrence: ``token`` over frames
    ``[start, end)`` with the mean of its frame ``score`` s."""

    __slots__ = ("token", "start", "end", "score")

    def __init__(self, token, start, end, score):
        self.token, self.start = int(token), int(start)
        self.end, self.score = int(end), float(score)

    def __len__(self):
        return self.end - self.start

    def __repr__(self):
        return (f"TokenSpan(token={self.token}, start={self.start}, "
                f"end={self.end}, score={self.score:.4f})")

    def __eq__(self, other):
        return (isinstance(other, TokenSpan)
                and (self.token, self.start, self.end)
                == (other.token, other.start, other.end))


def merge_tokens(tokens, scores, blank: int = 0):
    """Collapse a frame-level alignment into ``TokenSpan`` s.

    ``tokens``/``scores`` are one sequence's ``(time,)`` outputs of
    :func:`forced_align`.  Consecutive equal non-blank frames form one
    span (CTC separates repeated tokens with blanks, so contiguity is
    unambiguous); a span's ``score`` is the mean of its frame scores.
    Host-side (variable-length output — inherently not jit-able).
    """
    tokens = np.asarray(tokens)
    scores = np.asarray(scores)
    if tokens.ndim != 1 or scores.shape != tokens.shape:
        raise ValueError("merge_tokens takes one sequence: tokens and "
                         "scores must both be (time,)")
    t_len = tokens.shape[0]
    spans = []
    start = None
    for t in range(t_len + 1):
        here = int(tokens[t]) if t < t_len else blank
        if start is not None and (t == t_len or here != int(tokens[start])):
            spans.append(TokenSpan(tokens[start], start, t,
                                   scores[start:t].mean()))
            start = None
        if t < t_len and here != blank and start is None:
            start = t
    return spans
