"""Levenshtein edit distance (WER/CER building block).

Not in the reference (SURVEY §2) — mirrors torchaudio's
``functional.edit_distance`` (plain Python DP over two sequences).
TPU formulation for the batched path: the row recurrence

    new[j] = min(row[j] + 1, row[j-1] + cost_j, new[j-1] + 1)

has a sequential insertion chain (``new[j-1] + 1``), which is resolved
in closed form: ``new[j] = j + cummin_{k<=j}(tmp[k] - k)`` where
``tmp`` holds the two non-sequential candidates.  The cummin is an
``associative_scan`` (log-depth VPU), so one ``lax.scan`` over the
reference tokens scores a whole padded batch under ``vmap``/``jit``
with static shapes — no per-pair host DP at eval time.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["edit_distance", "edit_distance_batched"]


def edit_distance(seq1, seq2) -> int:
    """Levenshtein distance between two sequences (host-side, eager).

    Accepts any element type with ``!=`` (token ids, chars, words),
    like torchaudio's version.  Unit costs for insert/delete/substitute.
    """
    a = list(seq1)
    b = list(seq2)
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    b_arr = np.empty(m, object)
    b_arr[:] = b
    js = np.arange(m + 1)
    row = js.copy()
    for i in range(1, n + 1):
        cost = (b_arr != a[i - 1]).astype(np.int64)
        tmp = np.minimum(row[1:] + 1, row[:-1] + cost)
        g = np.concatenate([[i], tmp - js[1:]])
        row = np.minimum.accumulate(g) + js
    return int(row[m])


def _levenshtein_one(ref, hyp, ref_len, hyp_len):
    m = hyp.shape[0]
    js = jnp.arange(m + 1, dtype=jnp.int32)

    def step(row, inp):
        i, a = inp
        cost = (a != hyp).astype(jnp.int32)
        tmp = jnp.minimum(row[1:] + 1, row[:-1] + cost)
        g = jnp.concatenate([(i + 1)[None], tmp - js[1:]])
        new = jax.lax.associative_scan(jnp.minimum, g) + js
        return jnp.where(i < ref_len, new, row), None

    row, _ = jax.lax.scan(
        step, js, (jnp.arange(ref.shape[0], dtype=jnp.int32), ref))
    return row[jnp.clip(hyp_len, 0, m)]


def edit_distance_batched(refs, hyps, ref_lengths=None, hyp_lengths=None):
    """Batched Levenshtein distance on device (jit/vmap-able).

    ``refs`` ``(batch, N)`` / ``hyps`` ``(batch, M)`` padded int token
    ids; lengths default to the padded sizes.  Returns ``(batch,)``
    int32.  One compiled program per padded shape serves the whole
    eval corpus (bucket by length as with any static-shape pipeline).
    """
    refs = jnp.asarray(refs, jnp.int32)
    hyps = jnp.asarray(hyps, jnp.int32)
    if refs.ndim != 2 or hyps.ndim != 2:
        raise ValueError("refs and hyps must be (batch, length)")
    if ref_lengths is None:
        ref_lengths = jnp.full((refs.shape[0],), refs.shape[1], jnp.int32)
    if hyp_lengths is None:
        hyp_lengths = jnp.full((hyps.shape[0],), hyps.shape[1], jnp.int32)
    return jax.vmap(_levenshtein_one)(
        refs, hyps, jnp.asarray(ref_lengths, jnp.int32),
        jnp.asarray(hyp_lengths, jnp.int32))
