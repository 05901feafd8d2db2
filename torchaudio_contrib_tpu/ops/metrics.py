"""Signal-quality metrics: SNR and scale-invariant SNR (SI-SNR/SI-SDR).

Not in the reference (SURVEY §2); the standard training objective and
eval metric for time-domain source separation (ConvTasNet et al.).
Pure VPU reductions — differentiable, batched over leading dims.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["snr", "si_snr"]


def snr(estimate, reference, eps: float = 1e-8):
    """Plain signal-to-noise ratio in dB along the last axis."""
    estimate = jnp.asarray(estimate)
    reference = jnp.asarray(reference)
    noise = estimate - reference
    p_ref = jnp.sum(reference * reference, -1)
    p_noise = jnp.sum(noise * noise, -1)
    return 10.0 * jnp.log10((p_ref + eps) / (p_noise + eps))


def si_snr(estimate, reference, zero_mean: bool = True,
           eps: float = 1e-8):
    """Scale-invariant SNR (SI-SDR, Le Roux 2019) in dB, last axis.

    Projects the estimate onto the reference (optimal gain) so the
    metric ignores scaling; ``zero_mean`` removes per-signal DC first
    (the convention separation papers use).  Negate for a loss.
    """
    estimate = jnp.asarray(estimate)
    reference = jnp.asarray(reference)
    if zero_mean:
        estimate = estimate - jnp.mean(estimate, -1, keepdims=True)
        reference = reference - jnp.mean(reference, -1, keepdims=True)
    dot = jnp.sum(estimate * reference, -1, keepdims=True)
    p_ref = jnp.sum(reference * reference, -1, keepdims=True)
    target = dot / (p_ref + eps) * reference
    noise = estimate - target
    return 10.0 * jnp.log10(
        (jnp.sum(target * target, -1) + eps)
        / (jnp.sum(noise * noise, -1) + eps))
