"""Compatibility helpers bridging the reference's tensor conventions.

The reference (pre-torch-1.8) represents complex spectrograms as real
tensors with a trailing ``(…, 2)`` re/im dim [SURVEY.md §1 shape
conventions].  Our native representation is complex64; these views convert
losslessly in both directions for users/tests that need the legacy layout.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["view_as_real", "view_as_complex"]


def view_as_real(spec: jnp.ndarray) -> jnp.ndarray:
    """Complex ``(...,)`` → real ``(..., 2)`` trailing re/im view."""
    if not jnp.iscomplexobj(spec):
        raise ValueError(f"expected complex input, got {spec.dtype}")
    return jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)


def view_as_complex(spec: jnp.ndarray) -> jnp.ndarray:
    """Real ``(..., 2)`` trailing re/im view → complex array."""
    if jnp.iscomplexobj(spec):
        return spec
    if spec.shape[-1] != 2:
        raise ValueError(
            f"expected trailing dim 2, got shape {spec.shape}")
    return jax.lax.complex(spec[..., 0], spec[..., 1])
