"""SpecAugment-style spectrogram masking (rebuild-only addition).

Time and frequency masking for training trainable frontends (the
reference's headline use case) — SpecAugment, Park et al. 2019.

TPU-first: masks are built from ``broadcasted_iota`` comparisons against
PRNG-sampled offsets — fully static shapes, no dynamic slicing, one
fused select per mask; everything jits and vmaps, and the gradient is an
exact pass-through outside the masked region.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["mask_along_axis", "time_mask", "freq_mask"]


def mask_along_axis(key: jax.Array, spec: jnp.ndarray, mask_param: int,
                    axis: int, num_masks: int = 1,
                    mask_value: float = 0.0) -> jnp.ndarray:
    """Zero (or fill) ``num_masks`` random contiguous bands along ``axis``.

    Each mask has width ``~U[0, mask_param]`` and a uniform random start;
    per-call randomness comes from ``key`` (split per mask).  Applies the
    same masks across leading batch dims — ``jax.vmap`` over a batch of
    keys for independent per-example masks.
    """
    if mask_param <= 0:
        return spec
    axis = axis % spec.ndim
    size = spec.shape[axis]
    idx_shape = [1] * spec.ndim
    idx_shape[axis] = size
    idx = jax.lax.broadcasted_iota(jnp.int32, tuple(idx_shape), axis)

    out = spec
    for k in jax.random.split(key, num_masks):
        k1, k2 = jax.random.split(k)
        width = jax.random.randint(k1, (), 0, mask_param + 1)
        start = jax.random.randint(k2, (), 0, jnp.maximum(size - width, 1))
        band = (idx >= start) & (idx < start + width)
        out = jnp.where(band, jnp.asarray(mask_value, spec.dtype), out)
    return out


def time_mask(key: jax.Array, spec: jnp.ndarray, mask_param: int,
              num_masks: int = 1, mask_value: float = 0.0) -> jnp.ndarray:
    """Mask random time bands of ``(..., freq, time)``."""
    return mask_along_axis(key, spec, mask_param, axis=-1,
                           num_masks=num_masks, mask_value=mask_value)


def freq_mask(key: jax.Array, spec: jnp.ndarray, mask_param: int,
              num_masks: int = 1, mask_value: float = 0.0) -> jnp.ndarray:
    """Mask random frequency bands of ``(..., freq, time)``."""
    return mask_along_axis(key, spec, mask_param, axis=-2,
                           num_masks=num_masks, mask_value=mask_value)


def mask_along_axis_iid(key: jax.Array, specs: jnp.ndarray,
                        mask_param: int, axis: int, num_masks: int = 1,
                        mask_value: float = 0.0) -> jnp.ndarray:
    """Independent masks per leading-batch element (torchaudio's
    ``mask_along_axis_iid``): splits ``key`` over ``specs.shape[0]`` and
    vmaps :func:`mask_along_axis`."""
    if specs.ndim < 2:
        raise ValueError("mask_along_axis_iid needs a leading batch dim")
    axis = axis % specs.ndim
    if axis == 0:
        raise ValueError("cannot mask the batch axis")
    keys = jax.random.split(key, specs.shape[0])
    return jax.vmap(
        lambda k, s: mask_along_axis(k, s, mask_param, axis - 1,
                                     num_masks, mask_value)
    )(keys, specs)
