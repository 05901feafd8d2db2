"""Shoebox room impulse response via the image-source method (ISM).

Not in the reference (SURVEY §2) — mirrors torchaudio's
``simulate_rir_ism`` capability (rectangular room, frequency-flat wall
absorption).  TPU-first formulation: the whole image lattice is ONE
vectorized computation —

* image positions for all ``8·(2N+1)³`` (order ≤ N) images are built by
  broadcasting the ``(n, p)`` lattice (``x_img = (1−2p)·x_s + 2nL``),
* per-image attenuation is a product of powers of the wall reflection
  coefficients (``r = √(1−α)``), computed with one ``exp∘sum∘log``,
* each image contributes a Hann-windowed fractional-delay sinc of
  ``delay_filter_length`` taps; all contributions land in the RIR with
  ONE batched ``scatter-add`` (no Python loop over images or mics).

Amplitude convention: ``1/(4π·dist)`` spherical spreading (the
pyroomacoustics/torchaudio family convention), direct path included.
Apply an RIR to a waveform with :func:`~.convolve.fftconvolve`.

Semantics are pinned against a float64 NumPy per-image loop oracle in
``tests/test_rir.py`` (torchaudio is not installed here).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["simulate_rir_ism"]


def simulate_rir_ism(room, source, mic_array, max_order: int = 3,
                     absorption=0.3, output_length: int | None = None,
                     delay_filter_length: int = 81,
                     sound_speed: float = 343.0,
                     sample_rate: float = 16000.0) -> jnp.ndarray:
    """Room impulse responses ``(n_mics, rir_length)``.

    ``room`` is ``(3,)`` box dimensions in meters, ``source`` ``(3,)``,
    ``mic_array`` ``(n_mics, 3)`` (all inside the room).
    ``absorption`` is a scalar or ``(6,)`` per-wall energy absorption in
    ``[0, 1)`` — order ``(x0, x1, y0, y1, z0, z1)`` walls (frequency-flat;
    band-dependent absorption is out of scope and raises).
    ``output_length`` fixes the RIR length (required under ``jit``;
    defaults to the max image delay + filter length, computed
    host-side).  ``delay_filter_length`` must be odd (centered sinc).
    """
    if delay_filter_length % 2 != 1:
        raise ValueError("delay_filter_length must be odd")
    if max_order < 0:
        raise ValueError("max_order must be >= 0")
    room_np = np.asarray(room, np.float64)
    if room_np.shape != (3,):
        raise ValueError("room must be (3,) box dimensions")
    alpha = np.asarray(absorption, np.float64)
    if alpha.ndim == 0:
        alpha = np.full(6, float(alpha))
    if alpha.shape != (6,):
        raise ValueError(
            "absorption must be a scalar or (6,) per-wall values "
            "(band-dependent absorption is not supported)")
    if np.any(alpha < 0) or np.any(alpha >= 1):
        raise ValueError("absorption must be in [0, 1)")
    refl = np.sqrt(1.0 - alpha)                   # amplitude coefficients

    source = jnp.asarray(source, jnp.float32)
    mics = jnp.atleast_2d(jnp.asarray(mic_array, jnp.float32))

    n_rng = np.arange(-max_order, max_order + 1)
    nx, ny, nz, px, py, pz = np.meshgrid(
        n_rng, n_rng, n_rng, [0, 1], [0, 1], [0, 1], indexing="ij")
    n = np.stack([nx, ny, nz], -1).reshape(-1, 3)   # (n_img, 3)
    p = np.stack([px, py, pz], -1).reshape(-1, 3)
    # reflection counts: wall d0 hit |n_d − p_d| times, wall d1 |n_d|
    hits0 = np.abs(n - p)
    hits1 = np.abs(n)
    order = (hits0 + hits1).sum(-1)
    keep = order <= max_order
    n, p = n[keep], p[keep]
    # amplitude attenuation from wall absorption (float64 host build)
    logr = np.concatenate([np.log(np.maximum(refl[0::2], 1e-300))[None],
                           np.log(np.maximum(refl[1::2], 1e-300))[None]])
    att = np.exp((hits0[keep] * logr[0] + hits1[keep] * logr[1])
                 .sum(-1))                         # (n_img,)

    sign = jnp.asarray(1.0 - 2.0 * p, jnp.float32)      # (n_img, 3)
    offs = jnp.asarray(2.0 * n * room_np, jnp.float32)
    img = sign * source + offs                          # (n_img, 3)

    dist = jnp.linalg.norm(img[:, None, :] - mics[None, :, :],
                           axis=-1)                     # (n_img, n_mics)
    dist = jnp.maximum(dist, 1e-3)
    delay = dist * (sample_rate / sound_speed)
    amp = jnp.asarray(att, jnp.float32)[:, None] / (4.0 * np.pi * dist)

    half = delay_filter_length // 2
    if output_length is None:
        # host-side bound: the farthest image corner
        far = np.linalg.norm(np.abs(np.asarray(room_np))
                             * (2 * max_order + 2))
        output_length = int(math.ceil(far * sample_rate / sound_speed)
                            + delay_filter_length)
    t_len = int(output_length)

    # fractional-delay sinc taps around each integer delay
    base = jnp.floor(delay).astype(jnp.int32)           # (n_img, n_mics)
    frac = delay - base
    k = jnp.arange(-half, half + 1, dtype=jnp.float32)  # (taps,)
    arg = k[None, None, :] - frac[..., None]            # (img, mic, taps)
    win = 0.5 * (1.0 + jnp.cos(np.pi * arg / (half + 1)))
    win = jnp.where(jnp.abs(arg) <= half + 1, win, 0.0)
    taps = jnp.sinc(arg) * win * amp[..., None]

    idx = base[..., None] + jnp.arange(-half, half + 1)  # (img, mic, taps)
    valid = (idx >= 0) & (idx < t_len)
    idx = jnp.clip(idx, 0, t_len - 1)
    taps = jnp.where(valid, taps, 0.0)

    n_mics = mics.shape[0]
    # one scatter-add per mic row: (n_img·taps) values into (t_len,)
    flat_idx = jnp.swapaxes(idx, 0, 1).reshape(n_mics, -1)
    flat_val = jnp.swapaxes(taps, 0, 1).reshape(n_mics, -1)
    rir = jnp.zeros((n_mics, t_len), jnp.float32)
    rir = jax.vmap(lambda r, i, v: r.at[i].add(v))(rir, flat_idx,
                                                   flat_val)
    return rir
