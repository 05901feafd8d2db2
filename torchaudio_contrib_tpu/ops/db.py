"""Decibel conversion.

Capability parity with [ref: torchaudio_contrib/functional.py::
amplitude_to_db, db_to_amplitude — UNVERIFIED].

Semantics note (SURVEY §2 #6 flags this as unresolved reference debate):
``amplitude_to_db`` treats the input as an **amplitude** and uses
``20·log10``; for power inputs (e.g. ``complex_norm(spec, power=2)``) pass
``power=2`` to get the ``10·log10`` convention (librosa ``power_to_db``
equivalent).  The default matches the reference's amplitude convention.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["amplitude_to_db", "db_to_amplitude"]


def amplitude_to_db(x: jnp.ndarray, ref: float = 1.0, amin: float = 1e-7,
                    power: float = 1.0,
                    top_db: float | None = None) -> jnp.ndarray:
    """Log-compress ``x`` to decibels: ``(20/power)·log10(clamp(x, amin)/ref)``.

    ``amin`` clamps the input away from 0 (default 1e-7, the reference's
    choice); the gradient through the clamp is 0 below ``amin`` and exact
    above — one fused VPU pass under jit.  ``top_db`` (librosa-style)
    clamps the result to ``[max - top_db, max]``, with the max taken over
    each spectrogram's (freq, time) plane independently.
    """
    if amin <= 0:
        raise ValueError("amin must be > 0")
    mult = 20.0 / power
    x_db = mult * jnp.log10(jnp.maximum(x, amin))
    x_db = x_db - mult * math.log10(max(amin, ref))
    if top_db is not None:
        if top_db < 0:
            raise ValueError("top_db must be >= 0")
        axes = tuple(range(max(x_db.ndim - 2, 0), x_db.ndim))
        peak = jnp.max(x_db, axis=axes, keepdims=True)
        x_db = jnp.maximum(x_db, peak - top_db)
    return x_db


def db_to_amplitude(x_db: jnp.ndarray, ref: float = 1.0,
                    power: float = 1.0) -> jnp.ndarray:
    """Inverse of :func:`amplitude_to_db` (exact above the ``amin`` clamp)."""
    mult = 20.0 / power
    return ref * jnp.power(10.0, x_db / mult)
