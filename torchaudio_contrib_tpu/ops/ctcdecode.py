"""CTC decoding: batched greedy (on-device) + prefix beam search (host).

Not in the reference (SURVEY §2) — mirrors the capability of
torchaudio's ``models.decoder.ctc_decoder`` family.  Split by nature of
the computation, as torchaudio itself does (its decoder is a CPU-side
flashlight binding):

* :func:`ctc_greedy_decode` — the throughput path.  Argmax, collapse
  repeats, drop blanks — all static-shape on device: the collapse is a
  keep-mask + cumsum compaction scatter, so a whole padded batch
  decodes in one jitted program (no host round-trip in the serving
  loop).
* :func:`ctc_prefix_beam_search` — the accuracy path.  Standard
  log-space prefix beam search (Hannun et al. 2014): per step each
  prefix keeps separate blank-ending / non-blank-ending masses so
  repeats merge correctly.  Inherently dynamic (a dict of growing
  prefixes), so it runs host-side in float64 — same division of labor
  as torchaudio's CPU decoder.  Verified exact against exhaustive
  label-sequence enumeration on small lattices.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ctc_greedy_decode", "ctc_prefix_beam_search",
           "ctc_beam_decode", "CTCHypothesis"]


def ctc_greedy_decode(log_probs, input_lengths=None, blank: int = 0,
                      pad_value: int = -1):
    """Best-path CTC decode, batched and jit-able.

    ``log_probs`` ``(batch, time, classes)``; frames past
    ``input_lengths`` are ignored.  Returns ``(tokens, lengths,
    scores)``: ``tokens`` ``(batch, time)`` int32 holds each clip's
    collapsed label sequence left-packed and padded with ``pad_value``;
    ``lengths`` ``(batch,)`` the number of valid labels; ``scores``
    ``(batch,)`` the summed frame log-probs of the best path.
    """
    log_probs = jnp.asarray(log_probs)
    if log_probs.ndim != 3:
        raise ValueError("log_probs must be (batch, time, classes)")
    b, t_max, _ = log_probs.shape
    if input_lengths is None:
        input_lengths = jnp.full((b,), t_max, jnp.int32)
    input_lengths = jnp.asarray(input_lengths, jnp.int32)

    path = jnp.argmax(log_probs, -1).astype(jnp.int32)      # (B, T)
    best = jnp.max(log_probs, -1)
    frames = jnp.arange(t_max)[None, :]
    inside = frames < input_lengths[:, None]
    scores = jnp.sum(jnp.where(inside, best, 0.0), -1)

    prev = jnp.concatenate([jnp.full((b, 1), -1, jnp.int32),
                            path[:, :-1]], 1)
    keep = (path != blank) & (path != prev) & inside
    pos = jnp.cumsum(keep, -1) - 1                          # target slot
    lengths = jnp.sum(keep, -1).astype(jnp.int32)
    out = jnp.full((b, t_max), pad_value, jnp.int32)
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, t_max))
    # dump dropped frames into a scratch column beyond the output
    cols = jnp.where(keep, pos, t_max)
    out = jnp.concatenate([out, jnp.zeros((b, 1), jnp.int32)], 1)
    out = out.at[rows, cols].set(jnp.where(keep, path, 0))
    return out[:, :t_max], lengths, scores


class CTCHypothesis:
    """One beam-search result: ``tokens`` (list[int]) and its total
    log-probability ``score`` (sum over all alignments)."""

    __slots__ = ("tokens", "score")

    def __init__(self, tokens, score):
        self.tokens, self.score = list(tokens), float(score)

    def __repr__(self):
        return f"CTCHypothesis(tokens={self.tokens}, score={self.score:.4f})"


def _ctc_beam_frame(carry, row, valid, blank: int, K: int, L: int):
    """Advance every sample's prefix beam by one frame (vectorized
    over batch and beam; the device counterpart of one
    ``ctc_prefix_beam_search`` time step).

    The prefix-merge that the host algorithm does with a dict is exact
    here because a collision can ONLY happen between "extend prefix k
    by token c" and an existing beam entry j with
    ``prefix_j == prefix_k + (c,)``: two distinct-prefix extensions
    can never collide with each other (dropping the last token would
    make their parents equal), so the merge reduces to a
    (child, parent) one-token-extension mask over the current beam.
    """
    toks, lens, pb, pnb = carry               # (B,K,L) (B,K) (B,K) (B,K)
    B, _, V = row.shape[0], K, row.shape[-1]
    neg = -jnp.inf
    total = jnp.logaddexp(pb, pnb)
    has = lens > 0
    last = jnp.take_along_axis(
        toks, jnp.maximum(lens - 1, 0)[..., None], -1)[..., 0]  # (B,K)

    # one-token-parent mask: parent_mask[b, j, p] == prefix_j extends
    # prefix_p by exactly one token (which is then last_j)
    pos = jnp.arange(L)
    len_ok = lens[:, :, None] == lens[:, None, :] + 1       # (B,Kc,Kp)
    inside_p = pos[None, None, None, :] < lens[:, None, :, None]
    prefix_eq = jnp.all(
        (toks[:, :, None, :] == toks[:, None, :, :]) | ~inside_p, -1)
    parent_mask = len_ok & prefix_eq                        # (B,Kc,Kp)

    # contribution of each parent p extending by c = last_j
    row_c = jnp.take_along_axis(row, last, 1)               # (B,Kc)
    par_rep = has[:, None, :] & (last[:, None, :] == last[:, :, None])
    base = jnp.where(par_rep, pb[:, None, :], total[:, None, :])
    contrib = jnp.where(parent_mask, base + row_c[..., None], neg)
    parent_contrib = jax.nn.logsumexp(contrib, axis=-1)     # (B,Kc)

    # "same prefix" candidates (blank extension + merged mass).
    # Structural duplicates (identical buffers — only ever -inf-mass
    # filler admitted by a wide top-k, finite prefixes stay distinct
    # by induction) are dropped to -inf so the parent merge above
    # cannot duplicate a prefix's mass into two beam slots.
    eq = (lens[:, :, None] == lens[:, None, :]) \
        & jnp.all(toks[:, :, None, :] == toks[:, None, :, :], -1)
    dup = jnp.any(jnp.tril(eq, -1), -1)                     # (B,K)
    pb_s = jnp.where(dup, neg, total + row[:, None, blank])
    pnb_s = jnp.where(dup, neg, jnp.logaddexp(
        jnp.where(has, pnb + row_c, neg), parent_contrib))
    score_s = jnp.logaddexp(pb_s, pnb_s)                    # (B,K)

    # extension candidates (B, K, V): repeat-last needs a blank in
    # between (blank mass only), everything else gets the total mass
    ext_rep = (jnp.arange(V)[None, None, :] == last[..., None]) \
        & has[..., None]
    ext = jnp.where(ext_rep, pb[..., None], total[..., None]) \
        + row[:, None, :]
    ext = ext.at[..., blank].set(neg)
    # kill extensions whose result prefix is already a beam entry
    # (their mass was folded into that entry's pnb above)
    onehot = jax.nn.one_hot(last, V, dtype=jnp.float32) \
        * has[..., None]
    killed = jnp.einsum("bjp,bjv->bpv", parent_mask.astype(jnp.float32),
                        onehot) > 0.5
    ext = jnp.where(killed, neg, ext)
    ext = jnp.where((lens >= L)[..., None], neg, ext)       # full buffer

    # top-K over all K + K*V candidates
    scores_all = jnp.concatenate(
        [score_s, ext.reshape(B, K * V)], axis=1)
    top, idx = jax.lax.top_k(scores_all, K)
    is_same = idx < K
    src = jnp.where(is_same, idx, (idx - K) // V)           # beam slot
    tok_c = ((idx - K) % V).astype(jnp.int32)

    g = lambda a: jnp.take_along_axis(a, src, 1)
    new_toks = jnp.take_along_axis(toks, src[..., None], 1)
    new_lens = g(lens)
    hit = (pos[None, None, :] == new_lens[..., None]) \
        & ~is_same[..., None]
    new_toks = jnp.where(hit, tok_c[..., None], new_toks)
    new_pb = jnp.where(is_same, g(pb_s), neg)
    new_pnb = jnp.where(is_same, g(pnb_s), top)
    new_lens = jnp.where(is_same, new_lens,
                         jnp.minimum(new_lens + 1, L))

    keep = lambda n, o: jnp.where(
        valid.reshape((B,) + (1,) * (n.ndim - 1)), n, o)
    return (keep(new_toks, toks), keep(new_lens, lens),
            keep(new_pb, pb), keep(new_pnb, pnb))


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _ctc_beam_run(log_probs, input_lengths, beam_width: int,
                  blank: int, max_tokens: int, pad_value: int):
    B, T, V = log_probs.shape
    K, L = beam_width, max_tokens
    toks = jnp.zeros((B, K, L), jnp.int32)
    lens = jnp.zeros((B, K), jnp.int32)
    pb = jnp.full((B, K), -jnp.inf).at[:, 0].set(0.0)
    pnb = jnp.full((B, K), -jnp.inf)

    def step(carry, inp):
        row, t = inp
        return _ctc_beam_frame(carry, row, t < input_lengths,
                               blank, K, L), None

    (toks, lens, pb, pnb), _ = jax.lax.scan(
        step, (toks, lens, pb, pnb),
        (jnp.swapaxes(log_probs, 0, 1), jnp.arange(T)))
    scores = jnp.logaddexp(pb, pnb)
    order = jnp.argsort(-scores, axis=1)
    toks = jnp.take_along_axis(toks, order[..., None], 1)
    lens = jnp.take_along_axis(lens, order, 1)
    scores = jnp.take_along_axis(scores, order, 1)
    toks = jnp.where(jnp.arange(L)[None, None, :] < lens[..., None],
                     toks, pad_value)
    return toks, lens, scores


def ctc_beam_decode(log_probs, input_lengths=None,
                    beam_width: int = 16, blank: int = 0,
                    max_tokens: int | None = None,
                    pad_value: int = -1):
    """Batched prefix beam search as ONE compiled program (the
    device/TPU counterpart of :func:`ctc_prefix_beam_search` — same
    algorithm, fixed beam width, whole batch per dispatch; equality of
    sequences and logaddexp-merged scores is pinned by test).

    ``log_probs`` ``(batch, time, classes)`` log-softmax emissions;
    frames past ``input_lengths`` are ignored.  Returns ``(tokens,
    lengths, scores)``: ``tokens`` ``(batch, beam_width, max_tokens)``
    int32 label sequences ranked by posterior (padded with
    ``pad_value``), ``lengths`` ``(batch, beam_width)``, ``scores``
    ``(batch, beam_width)`` — the log TOTAL label-sequence
    probability, summed over alignments (``-inf`` marks unused beam
    slots).  ``max_tokens`` bounds output length (default: ``time``).
    """
    log_probs = jnp.asarray(log_probs)
    if log_probs.ndim != 3:
        raise ValueError("log_probs must be (batch, time, classes)")
    B, T, V = log_probs.shape
    if input_lengths is None:
        input_lengths = jnp.full((B,), T, jnp.int32)
    input_lengths = jnp.asarray(input_lengths, jnp.int32)
    if blank < 0:
        blank += V
    L = T if max_tokens is None else int(max_tokens)
    return _ctc_beam_run(log_probs, input_lengths, int(beam_width),
                         int(blank), L, int(pad_value))


def ctc_prefix_beam_search(log_probs, beam_width: int = 16,
                           blank: int = 0, nbest: int = 1,
                           input_length=None):
    """Prefix beam search over one clip's emissions (host, float64).

    ``log_probs`` ``(time, classes)`` (device array or NumPy) —
    log-softmax emissions.  Returns the ``nbest`` highest-posterior
    label sequences as :class:`CTCHypothesis` (score = log of the
    TOTAL probability of the label sequence, summed over alignments —
    not a single best path).
    """
    lp = np.asarray(log_probs, np.float64)
    if lp.ndim != 2:
        raise ValueError("log_probs must be (time, classes)")
    if input_length is not None:
        lp = lp[:int(input_length)]
    t_max, n_classes = lp.shape
    if blank < 0:
        blank += n_classes

    # prefix -> [log p(ending in blank), log p(ending in non-blank)]
    beams = {(): [0.0, -math.inf]}
    for t in range(t_max):
        row = lp[t]
        new = {}

        def _add(prefix, which, val):
            cur = new.setdefault(prefix, [-math.inf, -math.inf])
            cur[which] = np.logaddexp(cur[which], val)

        for prefix, (pb, pnb) in beams.items():
            total = np.logaddexp(pb, pnb)
            _add(prefix, 0, total + row[blank])          # extend blank
            if prefix:
                # repeat last symbol without a blank: merges into the
                # SAME prefix only from the non-blank mass
                _add(prefix, 1, pnb + row[prefix[-1]])
            for c in range(n_classes):
                if c == blank:
                    continue
                ext = prefix + (c,)
                if prefix and c == prefix[-1]:
                    # need a blank in between: only the blank mass
                    _add(ext, 1, pb + row[c])
                else:
                    _add(ext, 1, total + row[c])
        beams = dict(sorted(
            new.items(),
            key=lambda kv: -np.logaddexp(kv[1][0], kv[1][1])
        )[:beam_width])

    ranked = sorted(
        ((np.logaddexp(pb, pnb), prefix)
         for prefix, (pb, pnb) in beams.items()), key=lambda x: -x[0])
    return [CTCHypothesis(prefix, score)
            for score, prefix in ranked[:nbest]]
