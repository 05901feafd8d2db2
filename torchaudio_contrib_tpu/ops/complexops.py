"""Complex-spectrogram utilities: magnitude, phase, magphase.

Capability parity with [ref: torchaudio_contrib/functional.py::complex_norm,
angle, magphase — UNVERIFIED].  The reference operates on trailing-``(…, 2)``
real views (pre-torch-1.8); we operate on **native complex arrays** — the
idiomatic JAX/XLA representation — and accept trailing-2 views for
compatibility (auto-detected on real inputs whose last dim is 2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["complex_norm", "angle", "magphase"]


def _as_complex(x: jnp.ndarray) -> jnp.ndarray:
    if jnp.iscomplexobj(x):
        return x
    if x.shape[-1] == 2:
        # legacy trailing-(re, im) real view
        return jax.lax.complex(x[..., 0], x[..., 1])
    raise ValueError(
        "expected a complex array or a real array with trailing dim 2, "
        f"got dtype={x.dtype} shape={x.shape}")


def complex_norm(spec: jnp.ndarray, power: float = 1.0) -> jnp.ndarray:
    """``|spec|**power``.  power=1 → magnitude, power=2 → power spectrogram.

    The power=2 case is computed as ``re²+im²`` directly (no sqrt) — one
    fused VPU pass, and the gradient at 0 is defined (unlike ``abs`` there).
    """
    c = _as_complex(spec)
    re, im = jnp.real(c), jnp.imag(c)
    sq = re * re + im * im
    if power == 2.0:
        return sq
    if power == 1.0:
        return jnp.sqrt(sq)
    return jnp.power(sq, power / 2.0)


def angle(spec: jnp.ndarray) -> jnp.ndarray:
    """Element-wise phase ``atan2(im, re)``."""
    c = _as_complex(spec)
    return jnp.arctan2(jnp.imag(c), jnp.real(c))


def magphase(spec: jnp.ndarray, power: float = 1.0):
    """Separate a complex spectrogram into ``(|spec|**power, phase)``."""
    return complex_norm(spec, power), angle(spec)
