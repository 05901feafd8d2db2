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

__all__ = ["rnnt_loss", "rnnt_loss_fused"]

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
    else:
        emit_lp = jnp.zeros((t_max, 0), lp.dtype)
    return _rnnt_from_lps(blank_lp, emit_lp, in_len, tgt_len)


def _rnnt_from_lps(blank_lp, emit_lp, in_len, tgt_len):
    """The lattice recursion from the only two log-prob planes it
    needs: ``blank_lp (T, U+1)`` and ``emit_lp (T, U)`` (the target
    token's log-prob at each (t, u)) — shared by :func:`rnnt_loss`
    (full-lattice input) and :func:`rnnt_loss_fused` (planes computed
    chunkwise, the (T, U+1, V) grid never stored)."""
    t_max, u1 = blank_lp.shape
    u_max = u1 - 1
    if u_max > 0:
        emit_lp = jnp.where(jnp.arange(u_max)[None, :] < tgt_len,
                            emit_lp, _NEG)               # (T, U)

    # row 0: alpha[0, u] = cumulative emits at t=0
    row0 = jnp.concatenate([jnp.zeros((1,), blank_lp.dtype),
                            jnp.cumsum(emit_lp[0])])

    def step(prev, inputs):
        blank_prev, emit_t = inputs                      # rows t-1 / t
        a = prev + blank_prev
        es = jnp.concatenate([jnp.zeros((1,), blank_lp.dtype),
                              emit_t])
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
    c = jnp.asarray(clamp)
    return jnp.clip(g, -c, c), None


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
    # the lattice recursion needs f32 (bf16's 8-bit mantissa drifts
    # over T accumulation steps) — upcast sub-f32 inputs here so the
    # loss is mixed-precision-safe like rnnt_loss_fused
    if jnp.issubdtype(logits.dtype, jnp.floating) and \
            jnp.finfo(logits.dtype).bits < 32:
        logits = logits.astype(jnp.float32)
    lp = jax.nn.log_softmax(logits, -1) if fused_log_softmax else logits

    losses = jax.vmap(
        lambda l, tg, il, tl: _rnnt_single(l, tg, il, tl, blank_idx)
    )(lp, targets, logit_lengths, target_lengths)
    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "sum":
        return jnp.sum(losses)
    return losses


def rnnt_loss_fused(enc, pred, joiner, targets, *,
                    act=jax.nn.relu,
                    logit_lengths=None, target_lengths=None,
                    blank: int = -1, clamp: float = -1.0,
                    reduction: str = "mean", time_chunk=None):
    """Transducer loss straight from the encoder/predictor encodings —
    the ``(B, T, U+1, V)`` joint grid is NEVER materialized.

    The recursion (:func:`_rnnt_from_lps`) only needs two planes —
    the blank log-prob and the target token's log-prob at each
    ``(t, u)`` — so the joint (``act(enc + pred) @ w + b`` →
    log-softmax, this package's :class:`~..models.RNNT.join` shape) is
    computed ``time_chunk`` frames at a time under ``jax.checkpoint``:
    the forward stores ``(B, T, 2U+1)`` floats instead of
    ``(B, T, (U+1)·V)`` (≈256× less at V=512), and the backward
    recomputes each chunk's joint on the fly.  Past the batch knee the
    baseline step is CAPACITY-bound on exactly this tensor
    (docs/PERFORMANCE.md round 5), so the recompute buys throughput,
    not just memory.  Equality with ``rnnt_loss(join(...))`` — values
    and gradients — is pinned by ``tests/test_rnnt_fused.py``.

    ``enc (B, T, J)``, ``pred (B, U+1, J)``, ``joiner`` =
    ``{"w": (J, V), "b": (V,)}``; other args as :func:`rnnt_loss`.
    ``time_chunk`` bounds the transient joint block
    (``B·time_chunk·(U+1)·V`` floats).  ``None`` (default) picks
    ``max(4, 512 // B)`` — the v5e sweep (docs/PERFORMANCE.md round 5,
    ``r5_mfu.py --only fused_chunk``) puts the best point at
    ``B·time_chunk ≈ 512``; too-large chunks fall out of
    VMEM-friendly sizes (B=128: chunk16 is 1.5× slower than chunk8),
    too-small ones serialize the scan.
    """
    enc = jnp.asarray(enc)
    pred = jnp.asarray(pred)
    targets = jnp.asarray(targets, jnp.int32)
    if enc.ndim != 3 or pred.ndim != 3 or targets.ndim != 2:
        raise ValueError("enc must be (batch, time, J), pred (batch, "
                         "max_target_len+1, J), targets (batch, "
                         "max_target_len)")
    B, T, J = enc.shape
    u1 = pred.shape[1]
    if targets.shape != (B, u1 - 1):
        raise ValueError(
            f"targets must be (batch, {u1 - 1}) to match pred's "
            f"target axis of {u1}; got {targets.shape}")
    if reduction not in ("none", "mean", "sum"):
        raise ValueError(f"unknown reduction {reduction!r}")
    V = joiner["w"].shape[-1]
    blank_idx = blank % V
    if logit_lengths is None:
        logit_lengths = jnp.full((B,), T, jnp.int32)
    if target_lengths is None:
        target_lengths = jnp.full((B,), u1 - 1, jnp.int32)
    logit_lengths = jnp.asarray(logit_lengths, jnp.int32)
    target_lengths = jnp.asarray(target_lengths, jnp.int32)

    if time_chunk is None:
        time_chunk = max(4, 512 // B)
    c = max(1, min(int(time_chunk), T))
    n_pad = (-T) % c
    enc_p = jnp.pad(enc, ((0, 0), (0, n_pad), (0, 0)))
    n_chunks = enc_p.shape[1] // c

    def chunk_planes(enc_c):
        """(B, c, J) → blank (B, c, U+1), emit (B, c, U)."""
        logits = act(enc_c[:, :, None, :] + pred[:, None]) \
            @ joiner["w"] + joiner["b"]               # (B, c, U+1, V)
        if clamp is not None and clamp > 0:
            logits = _clamp_grad(logits, jnp.asarray(clamp,
                                                     logits.dtype))
        # the GEMMs above follow the input dtype (bf16 under
        # utils.precision.mixed_precision — the MXU/bandwidth win),
        # but the log-semiring lattice cannot run at bf16's 8-bit
        # mantissa: upcast at the log-softmax so the recursion below
        # is always f32 (grads flow back bf16 through the cast)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        blank_lp = lp[..., blank_idx]
        if u1 > 1:
            emit_lp = jnp.take_along_axis(
                lp[:, :, :u1 - 1, :],
                targets[:, None, :, None], axis=3)[..., 0]
        else:
            emit_lp = jnp.zeros((B, enc_c.shape[1], 0), lp.dtype)
        return blank_lp, emit_lp

    chunks = jnp.swapaxes(
        enc_p.reshape(B, n_chunks, c, J), 0, 1)       # (nc, B, c, J)
    blank_lp, emit_lp = jax.lax.map(jax.checkpoint(chunk_planes),
                                    chunks)
    blank_lp = jnp.swapaxes(blank_lp, 0, 1).reshape(B, -1, u1)[:, :T]
    emit_lp = jnp.swapaxes(emit_lp, 0, 1).reshape(
        B, -1, max(u1 - 1, 0))[:, :T]

    losses = jax.vmap(_rnnt_from_lps)(blank_lp, emit_lp,
                                      logit_lengths, target_lengths)
    if reduction == "mean":
        return jnp.mean(losses)
    if reduction == "sum":
        return jnp.sum(losses)
    return losses
