"""Griffin-Lim phase reconstruction (rebuild-only addition).

Not in the reference (SURVEY §2), but the natural companion to its
STFT/ISTFT pair: recover a waveform from a magnitude spectrogram by
alternating projections.  Included because a feature library without an
inversion path strands its users at the spectrogram; torchaudio later
shipped the same op alongside the reference's layers.

TPU-first: the iteration is a ``lax.fori_loop`` over jitted
stft/istft round-trips (momentum variant of Perraudin et al. 2013) —
one compiled program regardless of ``n_iter``, no host sync inside.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .stft import stft as _stft, istft as _istft, stft_output_length

__all__ = ["griffin_lim"]


def griffin_lim(mag_specgrams: jnp.ndarray,
                fft_length: Optional[int] = None,
                hop_length: Optional[int] = None,
                window="hann",
                n_iter: int = 32,
                momentum: float = 0.99,
                length: Optional[int] = None,
                center: bool = True,
                key: Optional[jax.Array] = None,
                method: str = "fft") -> jnp.ndarray:
    """Reconstruct a waveform from magnitudes ``(..., freq, time)``.

    ``mag_specgrams`` is a *magnitude* (power=1) spectrogram.  Returns
    ``(..., samples)``.  ``key`` seeds the initial random phase (zeros
    phase if None — deterministic, converges similarly with momentum).
    ``method`` selects the stft/istft execution path for the inner loop
    ("matmul" keeps the whole iteration on the MXU — the faster choice
    on TPU for vocoder-style serving; "pallas" runs each projection as
    ONE fused, frequency-tiled kernel per clip — measured 1.6–1.8× over
    "matmul" at equal convergence; free-edge least-squares boundary
    semantics, see fused_griffinlim.py.  Ineligible configs fall back
    to "matmul" with a ``UserWarning``).
    """
    n_freqs = mag_specgrams.shape[-2]
    n_frames = mag_specgrams.shape[-1]
    if fft_length is None:
        fft_length = 2 * (n_freqs - 1)
    if hop_length is None:
        hop_length = fft_length // 4
    if length is None:
        length = stft_output_length(n_frames, fft_length, hop_length,
                                    center=center)
    if momentum < 0 or momentum >= 1:
        raise ValueError("momentum must be in [0, 1)")

    if method == "pallas":
        from .fused import _interpret
        from .fused_griffinlim import fused_gl_supported, _gl_pallas
        on_kernel_backend = (jax.default_backend() == "tpu"
                             or _interpret())
        if (fused_gl_supported(fft_length, hop_length, n_frames)
                and on_kernel_backend):
            return _gl_pallas(mag_specgrams, fft_length, hop_length,
                              window, n_iter, momentum, length, center,
                              key=key)
        if on_kernel_backend:
            # config ineligible (alignment / VMEM) — fall back LOUDLY:
            # a silent engine switch hides a 1.6x perf cliff
            import warnings
            warnings.warn(
                f"griffin_lim(method='pallas'): config fft={fft_length} "
                f"hop={hop_length} n_frames={n_frames} is outside the "
                "kernel's envelope (needs fft%128==0, hop%128==0, "
                "fft%hop==0, and the per-clip working set in VMEM) — "
                "falling back to method='matmul'", stacklevel=2)
        method = "matmul"

    mag = mag_specgrams.astype(jnp.float32)
    if key is not None:
        phase = jax.random.uniform(key, mag.shape, jnp.float32,
                                   -jnp.pi, jnp.pi)
        # cos/sin instead of exp(1j·phase): no complex scalar crosses the
        # host→device boundary when run eagerly (axon UNIMPLEMENTED)
        spec = mag * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    else:
        spec = mag.astype(jnp.complex64)

    def project(s):
        """istft → stft: project onto the set of consistent spectrograms."""
        y = _istft(s, hop_length, window=window, center=center,
                   length=length, fft_length=fft_length, method=method)
        return _stft(y, fft_length, hop_length, window=window,
                     center=center, method=method)

    def body(_, carry):
        spec, prev = carry
        rebuilt = project(spec)
        # momentum acceleration on the (unnormalized) phase estimate
        update = rebuilt + momentum * (rebuilt - prev)
        norm = jnp.abs(update)
        update = update / jnp.maximum(norm, 1e-16)
        return mag * update, rebuilt

    # NOT jnp.zeros_like(spec): eagerly (outside jit) that broadcasts a
    # complex scalar through the host→device path, which the axon TPU
    # tunnel rejects (UNIMPLEMENTED) — build the complex zero on device
    # from real zeros instead
    rz = jnp.zeros(spec.shape, jnp.float32)
    spec, _ = jax.lax.fori_loop(0, n_iter, body,
                                (spec, jax.lax.complex(rz, rz)))
    return _istft(spec, hop_length, window=window, center=center,
                  length=length, fft_length=fft_length, method=method)
