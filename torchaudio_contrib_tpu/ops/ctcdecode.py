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

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ctc_greedy_decode", "ctc_prefix_beam_search",
           "CTCHypothesis"]


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
