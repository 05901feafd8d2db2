"""Signal-quality metrics: SNR and scale-invariant SNR (SI-SNR/SI-SDR).

Not in the reference (SURVEY §2); the standard training objective and
eval metric for time-domain source separation (ConvTasNet et al.).
Pure VPU reductions — differentiable, batched over leading dims.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["snr", "si_snr", "frechet_distance"]


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


def _sqrtm_psd(mat):
    """Symmetric-PSD matrix square root via eigendecomposition
    (clamping tiny negative eigenvalues from roundoff)."""
    w, v = jnp.linalg.eigh(mat)
    w = jnp.clip(w, 0.0, None)
    return (v * jnp.sqrt(w)[..., None, :]) @ jnp.swapaxes(v, -1, -2)


def frechet_distance(mu_x, sigma_x, mu_y, sigma_y):
    """Squared Fréchet (2-Wasserstein) distance between Gaussians
    ``N(mu_x, sigma_x)`` and ``N(mu_y, sigma_y)`` — the FAD metric
    [ref-recon: torchaudio.prototype.functional.frechet_distance —
    UNVERIFIED, mount empty].

    ``||mu_x-mu_y||² + tr(Σx + Σy − 2·(Σx Σy)^½)``, with the cross
    term computed as ``tr(sqrtm(√Σx · Σy · √Σx))`` — a symmetric-PSD
    similarity transform of the non-symmetric product, so both square
    roots are plain ``eigh`` (batched jittable device solves; no
    Schur/iterative sqrtm).  Leading batch dims broadcast.
    """
    mu_x, mu_y = jnp.asarray(mu_x), jnp.asarray(mu_y)
    sigma_x, sigma_y = jnp.asarray(sigma_x), jnp.asarray(sigma_y)
    if mu_x.shape[-1] != sigma_x.shape[-1] or \
            sigma_x.shape[-1] != sigma_x.shape[-2]:
        raise ValueError(
            f"mu {mu_x.shape} / sigma {sigma_x.shape} mismatch")
    if mu_y.shape[-1] != mu_x.shape[-1] or \
            sigma_y.shape[-2:] != sigma_x.shape[-2:]:
        raise ValueError(
            f"y-side shapes mu {mu_y.shape} / sigma {sigma_y.shape} "
            f"do not match x-side mu {mu_x.shape} / "
            f"sigma {sigma_x.shape}")
    dtype = jnp.promote_types(
        jnp.promote_types(mu_x.dtype, mu_y.dtype),
        jnp.promote_types(sigma_x.dtype, sigma_y.dtype))
    dtype = jnp.promote_types(dtype, jnp.float32)
    mu_x, mu_y = mu_x.astype(dtype), mu_y.astype(dtype)
    sigma_x, sigma_y = sigma_x.astype(dtype), sigma_y.astype(dtype)
    a = _sqrtm_psd(sigma_x)
    cross = _sqrtm_psd(a @ sigma_y @ a)
    diff = mu_x - mu_y
    tr = lambda m: jnp.trace(m, axis1=-2, axis2=-1)
    return (jnp.sum(diff * diff, -1) + tr(sigma_x) + tr(sigma_y)
            - 2.0 * tr(cross))
