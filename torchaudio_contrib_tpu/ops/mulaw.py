"""μ-law companding codec.

Capability parity with [ref: torchaudio_contrib/functional.py::
mu_law_encoding, mu_law_decoding — UNVERIFIED].  Input waveforms are
assumed normalized to [-1, 1]; encoding maps to integers in
``[0, n_quantize-1]``; decode(encode(x)) ≈ x within one quantization step.
Pure element-wise VPU work; the encode's round-to-int is (as in the
reference) not differentiable — decoding is.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

__all__ = ["mu_law_encoding", "mu_law_decoding"]


def mu_law_encoding(x: jnp.ndarray, n_quantize: int = 256) -> jnp.ndarray:
    """Compand ``x ∈ [-1,1]`` to int32 codes in ``[0, n_quantize-1]``.

    Inputs outside [-1, 1] are clamped so codes always stay in range.
    """
    mu = float(n_quantize - 1)
    x = jnp.clip(x, -1.0, 1.0)
    x_mu = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / math.log1p(mu)
    return ((x_mu + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)


def mu_law_decoding(x_mu: jnp.ndarray, n_quantize: int = 256,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Expand integer codes back to waveform amplitudes in [-1, 1]."""
    mu = float(n_quantize - 1)
    x = x_mu.astype(dtype) / mu * 2.0 - 1.0
    return jnp.sign(x) * (jnp.expm1(jnp.abs(x) * math.log1p(mu))) / mu
