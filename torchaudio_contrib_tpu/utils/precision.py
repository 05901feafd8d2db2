"""Mixed-precision training helpers (TPU bf16 compute path).

The production TPU pattern, validated by ``benchmarks/r5_mfu.py
--only knee_bf16`` (docs/PERFORMANCE.md, round 5): keep the parameter
tree in float32 (optimizer-grade master weights) and cast params +
inputs to bfloat16 *inside* the differentiated function.  The MXU
multiplies bf16 natively (f32 accumulation), every activation tensor
halves its HBM footprint, and because ``astype`` has a dtype-restoring
VJP the gradients leave the wrapped function in float32 — no loss
scaling needed on TPU (bf16 shares float32's exponent range, unlike
fp16).

Measured on a bandwidth-bound HuBERT-pretrain step at the batch knee
(v5e, B=64): 44.9 ms (f32) → 36.5 ms (bf16), 33.5 % → 41.1 % MFU,
loss relative error ~4e-5.  At small, latency-bound batches the cast
moves nothing — this is a large-batch lever.

No reference counterpart (the reference is a pure-Python frontend
library); this serves the adopted training zoo (wav2vec2 / HuBERT /
Conformer-RNNT pretraining examples).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["cast_floats", "mixed_precision"]


def cast_floats(tree, dtype):
    """Cast every floating-point array leaf of ``tree`` to ``dtype``.

    Integer, boolean and complex leaves pass through untouched (bf16
    complex does not exist; label/index tensors must stay integral).
    Non-array leaves (Python scalars, None, strings) also pass through.
    """
    dtype = jnp.dtype(dtype)

    def cast(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype,
                                                     jnp.floating):
            return leaf.astype(dtype)
        return leaf

    return jax.tree_util.tree_map(cast, tree)


def mixed_precision(fn, compute_dtype=jnp.bfloat16, *,
                    cast_args=True, output_dtype=jnp.float32):
    """Wrap ``fn(params, *args, **kwargs)`` to run in ``compute_dtype``.

    The wrapper casts the floating leaves of ``params`` (and of the
    remaining arguments when ``cast_args``) to ``compute_dtype`` before
    calling ``fn``, then casts floating outputs to ``output_dtype``
    (pass ``output_dtype=None`` to return ``fn``'s raw dtypes).

    Because the casts happen *inside* the wrapper, differentiating the
    wrapped function with respect to ``params`` yields gradients in the
    original (float32) parameter dtypes::

        loss_bf16 = mixed_precision(model.loss)
        grads = jax.grad(loss_bf16)(params_f32, batch)   # grads: f32

    jit-compatible; composes with ``jax.value_and_grad``, ``pjit`` and
    the FSDP/PP wrappers (cast is elementwise, sharding-preserving).
    """
    def wrapped(params, *args, **kwargs):
        params = cast_floats(params, compute_dtype)
        if cast_args:
            args = cast_floats(args, compute_dtype)
            kwargs = cast_floats(kwargs, compute_dtype)
        out = fn(params, *args, **kwargs)
        if output_dtype is not None:
            out = cast_floats(out, output_dtype)
        return out

    return wrapped
