"""Multichannel beamforming: PSD matrices, RTF estimation, MVDR.

Not in the reference (SURVEY §2) — this is the multichannel
speech-enhancement toolkit torchaudio ships (``psd``,
``mvdr_weights_souden``, ``mvdr_weights_rtf``, ``rtf_evd``,
``rtf_power``, ``apply_beamforming``), rebuilt TPU-first:

* Everything is batched complex einsums over ``(…, freq, channel,
  channel)`` stacks — per-frequency C×C problems (C is small, 2–8)
  batched across the freq axis, which XLA maps onto the MXU as one
  batched GEMM per op rather than a per-frequency loop.
* The only dense solves are C×C (``jnp.linalg.solve`` on the batched
  stack); RTF extraction offers the iteration-free ``rtf_evd``
  (Hermitian ``eigh``) and the solve-only ``rtf_power`` (fixed
  ``n_iter`` power iterations — compiler-friendly static loop).
* Complex values are built with ``jax.lax.complex`` / complex-dtype
  einsums only — never via host Python complex scalars (axon
  constraint, CLAUDE.md).

Shape conventions follow the library: spectrograms are ``(…, channel,
freq, time)`` complex; PSD stacks are ``(…, freq, channel, channel)``;
weights are ``(…, freq, channel)``.  Semantics are pinned against
float64 NumPy oracles in ``tests/test_beamform.py`` (torchaudio is not
installed in this environment).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "psd",
    "mvdr_weights_souden",
    "mvdr_weights_rtf",
    "rtf_evd",
    "rtf_power",
    "apply_beamforming",
]


def _ctype(x):
    return jnp.promote_types(x.dtype, jnp.complex64)


def psd(specgram: jnp.ndarray, mask: jnp.ndarray | None = None,
        normalize: bool = True, eps: float = 1e-10) -> jnp.ndarray:
    """Cross-channel power spectral density matrix per frequency.

    ``specgram`` is ``(…, channel, freq, time)`` complex; returns
    ``(…, freq, channel, channel)``.  ``mask`` is an optional
    time-frequency weighting ``(…, freq, time)`` (e.g. a speech
    presence probability); ``normalize`` divides by the mask sum per
    frequency (plain time average otherwise).
    """
    spec = specgram.astype(_ctype(specgram))
    if mask is not None:
        m = mask.astype(spec.real.dtype)
        weighted = spec * m[..., None, :, :]
        out = jnp.einsum("...cft,...eft->...fce", weighted,
                         jnp.conj(spec),
                         precision=jax.lax.Precision.HIGHEST)
        if normalize:
            denom = jnp.sum(m, axis=-1)[..., None, None] + eps
            out = out / denom
    else:
        out = jnp.einsum("...cft,...eft->...fce", spec, jnp.conj(spec),
                         precision=jax.lax.Precision.HIGHEST)
        if normalize:
            out = out / spec.shape[-1]
    return out


def _diag_load(mat: jnp.ndarray, eps_scale: float) -> jnp.ndarray:
    """Tikhonov-load a Hermitian stack: ``M + ε·tr(M)/C·I``."""
    c = mat.shape[-1]
    tr = jnp.einsum("...ii->...", mat).real / c
    eye = jnp.eye(c, dtype=mat.dtype)
    return mat + (eps_scale * tr[..., None, None] + 1e-12) * eye


def mvdr_weights_souden(psd_s: jnp.ndarray, psd_n: jnp.ndarray,
                        reference_channel: int = 0,
                        diagonal_loading: bool = True,
                        diag_eps: float = 1e-7) -> jnp.ndarray:
    """MVDR weights via the Souden formulation (no explicit steering).

    ``w = (Φₙ⁻¹ Φₛ / tr(Φₙ⁻¹ Φₛ)) · e_ref`` on each ``(…, freq, C, C)``
    stack.  ``diagonal_loading`` regularizes Φₙ before the solve.
    Returns ``(…, freq, channel)`` complex weights.
    """
    psd_n = psd_n.astype(_ctype(psd_n))
    psd_s = psd_s.astype(psd_n.dtype)
    if diagonal_loading:
        psd_n = _diag_load(psd_n, diag_eps)
    num = jnp.linalg.solve(psd_n, psd_s)          # Φₙ⁻¹ Φₛ, batched C×C
    tr = jnp.einsum("...ii->...", num)
    w = num[..., reference_channel] / (tr[..., None] + 1e-10)
    return w


def mvdr_weights_rtf(rtf: jnp.ndarray, psd_n: jnp.ndarray,
                     reference_channel: int = 0,
                     diagonal_loading: bool = True,
                     diag_eps: float = 1e-7) -> jnp.ndarray:
    """MVDR weights from a relative transfer function (steering vector).

    ``w = (Φₙ⁻¹ v) / (vᴴ Φₙ⁻¹ v) · conj(v[ref])`` with ``rtf`` of shape
    ``(…, freq, channel)``.  The ``conj(v[ref])`` factor undistorts the
    reference channel (torchaudio semantics).
    """
    psd_n = psd_n.astype(_ctype(psd_n))
    rtf = rtf.astype(psd_n.dtype)
    if diagonal_loading:
        psd_n = _diag_load(psd_n, diag_eps)
    num = jnp.linalg.solve(psd_n, rtf[..., None])[..., 0]   # Φₙ⁻¹ v
    den = jnp.einsum("...c,...c->...", jnp.conj(rtf), num)
    w = num / (den[..., None] + 1e-10)
    return w * jnp.conj(rtf[..., reference_channel, None])


def rtf_evd(psd_s: jnp.ndarray,
            reference_channel: int = 0) -> jnp.ndarray:
    """RTF as the principal eigenvector of the speech PSD (per freq).

    Hermitian ``eigh`` on the batched C×C stack; the eigenvector is
    rescaled so the reference channel equals 1 (relative TF).
    """
    psd_s = psd_s.astype(_ctype(psd_s))
    _, vecs = jnp.linalg.eigh(psd_s)              # ascending eigenvalues
    v = vecs[..., -1]                             # principal
    return v / (v[..., reference_channel, None] + 1e-15)


def rtf_power(psd_s: jnp.ndarray, psd_n: jnp.ndarray,
              reference_channel: int = 0, n_iter: int = 3,
              diagonal_loading: bool = True,
              diag_eps: float = 1e-7) -> jnp.ndarray:
    """RTF by power iteration on ``Φₙ⁻¹ Φₛ`` (solve-only, no EVD).

    ``n_iter`` is static (fixed unrolled iterations — XLA-friendly).
    The generalized-eigenvector estimate is mapped back through Φₙ and
    normalized to the reference channel, per the standard GEV→RTF
    recipe.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    psd_n = psd_n.astype(_ctype(psd_n))
    psd_s = psd_s.astype(psd_n.dtype)
    if diagonal_loading:
        psd_n = _diag_load(psd_n, diag_eps)
    c = psd_s.shape[-1]
    phi = jnp.linalg.solve(psd_n, psd_s)          # Φₙ⁻¹ Φₛ
    # one-hot start vector, built real-first (eager complex-zeros
    # creation is UNIMPLEMENTED on the axon TPU backend — CLAUDE.md)
    real = jnp.zeros(psd_s.shape[:-1], psd_s.real.dtype)
    real = real.at[..., reference_channel].set(1.0)
    v = jax.lax.complex(real, jnp.zeros_like(real))
    for _ in range(n_iter - 1):
        v = jnp.einsum("...ce,...e->...c", phi, v)
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-15)
    # last step maps through Φₛ side: rtf ∝ Φₙ · (Φₙ⁻¹Φₛ) v = Φₛ v
    rtf = jnp.einsum("...ce,...e->...c", psd_s, v)
    return rtf / (rtf[..., reference_channel, None] + 1e-15)


def apply_beamforming(beamform_weights: jnp.ndarray,
                      specgram: jnp.ndarray) -> jnp.ndarray:
    """Apply per-frequency weights: ``y[f,t] = Σ_c conj(w[f,c])·x[c,f,t]``.

    ``beamform_weights`` is ``(…, freq, channel)``; ``specgram`` is
    ``(…, channel, freq, time)``; returns ``(…, freq, time)`` — one
    batched GEMM over the time axis.
    """
    spec = specgram.astype(_ctype(specgram))
    w = beamform_weights.astype(spec.dtype)
    return jnp.einsum("...fc,...cft->...ft", jnp.conj(w), spec,
                      precision=jax.lax.Precision.HIGHEST)
