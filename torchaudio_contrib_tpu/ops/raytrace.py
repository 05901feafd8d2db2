"""Stochastic acoustic ray tracing for shoebox rooms
(``ray_tracing`` — torchaudio prototype surface).

[ref-recon: torchaudio.prototype.functional.ray_tracing — UNVERIFIED,
mount empty.]  torchaudio binds a C++ tracer (pyroomacoustics
lineage); this is a from-scratch JAX formulation of the same
capability with a documented, self-consistent energy model (the
binding's exact bookkeeping is unverifiable here), pinned by physical
behavioral tests (inverse-square direct sound, absorption-ordered
decay, banded absorption, conservation bounds) rather than bit parity.

Model:

- ``num_rays`` directions from a deterministic Fibonacci sphere
  (uniform solid-angle coverage; torchaudio samples pseudo-randomly —
  determinism is a deliberate divergence: results are exactly
  reproducible and jit-cache-friendly).
- Each ray carries per-band energy ``1 / num_rays``.  Specular
  reflection at the six axis-aligned walls multiplies by
  ``1 − absorption[band, wall]``.
- A ray whose segment passes within ``mic_radius`` of a microphone
  deposits its current energy into that channel's histogram at the
  closest-approach time.  Sphere capture is statistical: the expected
  captured fraction of isotropic rays equals the sphere's solid-angle
  fraction ``0.5·(1 − √(1 − (r/d)²)) ≈ r²/4d²`` — the inverse-square
  law emerges from ray statistics, as in pyroomacoustics.
- ``scattering`` (diffuse rain): at every wall hit a ``scattering``
  fraction of the post-absorption energy is sent directly to each
  microphone, weighted by the mic sphere's solid-angle fraction seen
  from the hit point (Lambert cosine weighting omitted — documented
  simplification); the specular ray continues with the remaining
  ``1 − scattering`` fraction.

TPU-first: ALL rays advance in lockstep — the bounce loop is one
``lax.scan`` whose body is pure vectorized geometry (axis-aligned
wall intersection = one min over 3 closed forms; segment–sphere tests
are batched over rays × mics) and one scatter-add into the energy
histogram.  Static shapes throughout: the bounce count is derived
from ``time_thres`` at trace time, dead rays (energy/time thresholds)
keep flying with zeroed deposits.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ray_tracing"]


def _fibonacci_sphere(n: int) -> np.ndarray:
    """(n, 3) unit vectors, near-uniform on the sphere."""
    i = np.arange(n, dtype=np.float64) + 0.5
    z = 1.0 - 2.0 * i / n
    phi = (2.0 * math.pi * (2.0 - (1.0 + math.sqrt(5.0)) / 2.0)) * i
    r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=1)


def ray_tracing(room, source, mic_array, num_rays: int,
                absorption=0.0, scattering: float = 0.0,
                mic_radius: float = 0.5,
                sound_speed: float = 343.0,
                energy_thres: float = 1e-7,
                time_thres: float = 10.0,
                hist_bin_size: float = 0.004,
                max_bounces: Optional[int] = None) -> jnp.ndarray:
    """Energy histograms ``(channels, num_bands, num_bins)`` for a
    shoebox room.

    ``room (3,)`` dimensions (meters, walls at 0 and ``room[i]``);
    ``source (3,)``; ``mic_array (channels, 3)`` (a single ``(3,)``
    mic is promoted).  ``absorption`` is a scalar or
    ``(num_bands, 6)`` per-band/per-wall energy absorption in
    ``[0, 1]`` — wall order ``(-x, +x, -y, +y, -z, +z)``.
    ``num_bins = ceil(time_thres / hist_bin_size)``.
    """
    room_np = np.asarray(room, np.float64).reshape(3)
    src_np = np.asarray(source, np.float64).reshape(3)
    mics_np = np.atleast_2d(np.asarray(mic_array, np.float64))
    if mics_np.shape[-1] != 3 or mics_np.ndim != 2:
        raise ValueError("mic_array must be (channels, 3)")
    if (room_np <= 0).any():
        raise ValueError("room dimensions must be positive")
    for name, pts in (("source", src_np[None]), ("mic", mics_np)):
        if (pts < 0).any() or (pts > room_np).any():
            raise ValueError(f"{name} must lie inside the room")
    if not 0.0 <= float(scattering) < 1.0:
        raise ValueError("scattering must be in [0, 1)")
    if num_rays < 1:
        raise ValueError("num_rays must be >= 1")

    absorb = np.asarray(absorption, np.float64)
    if absorb.ndim == 0:
        absorb = np.full((1, 6), float(absorb))
    elif absorb.shape == (6,):
        absorb = absorb[None]
    if absorb.ndim != 2 or absorb.shape[1] != 6:
        raise ValueError(
            "absorption must be a scalar, (6,), or (num_bands, 6)")
    if (absorb < 0).any() or (absorb > 1).any():
        raise ValueError("absorption must be in [0, 1]")
    num_bands = absorb.shape[0]

    num_bins = int(math.ceil(time_thres / hist_bin_size))
    n_mics = mics_np.shape[0]
    if max_bounces is None:
        # farthest a ray can travel is time_thres·c; the shortest
        # wall-to-wall leg bounds bounces (cap keeps compiles sane)
        max_bounces = min(
            int(math.ceil(time_thres * sound_speed / room_np.min()))
            + 1, 4000)

    dirs = jnp.asarray(_fibonacci_sphere(int(num_rays)), jnp.float32)
    pos0 = jnp.broadcast_to(jnp.asarray(src_np, jnp.float32),
                            dirs.shape)
    room_j = jnp.asarray(room_np, jnp.float32)
    mics = jnp.asarray(mics_np, jnp.float32)        # (M, 3)
    trans = jnp.asarray(1.0 - absorb, jnp.float32)  # (bands, 6)
    e0 = jnp.full((int(num_rays), num_bands), 1.0 / num_rays,
                  jnp.float32)
    scat = float(scattering)
    inv_bin = 1.0 / (hist_bin_size * sound_speed)   # dist -> bin

    eps = 1e-5

    def deposit(hist, dist, energy, valid):
        """Scatter ``energy (R, M, bands)`` at path length
        ``dist (R, M)`` into ``hist (M, num_bins + 1, bands)`` —
        bands INNERMOST so the flat view's row m·(bins+1)+bin is
        exactly one (bin, all-bands) slot (a (M, bands, bins) layout
        here would scramble band against bin whenever bands > 1)."""
        bins = jnp.floor(dist * inv_bin).astype(jnp.int32)
        bins = jnp.where(valid & (bins >= 0) & (bins < num_bins),
                         bins, num_bins)            # overflow slot
        mic_ids = jnp.arange(n_mics, dtype=jnp.int32)[None, :]
        flat = (jnp.broadcast_to(mic_ids, bins.shape)
                * (num_bins + 1) + bins).reshape(-1)
        flat_hist = hist.reshape(n_mics * (num_bins + 1), num_bands)
        flat_hist = flat_hist.at[flat].add(
            energy.reshape(-1, num_bands))
        return flat_hist.reshape(hist.shape)

    def bounce(carry, _):
        pos, direc, energy, dist, hist = carry
        alive = (jnp.max(energy, axis=-1) > energy_thres) & \
            (dist * (1.0 / sound_speed) < time_thres)   # (R,)

        # nearest axis-aligned wall along the ray
        safe = jnp.where(jnp.abs(direc) < eps, eps, direc)
        t_pos = (room_j[None, :] - pos) / safe
        t_neg = (0.0 - pos) / safe
        t_axis = jnp.where(direc > 0, t_pos, t_neg)     # (R, 3)
        t_axis = jnp.where(jnp.abs(direc) < eps, jnp.inf, t_axis)
        t_hit = jnp.min(t_axis, axis=-1)                # (R,)
        axis = jnp.argmin(t_axis, axis=-1)              # (R,)
        going_up = jnp.take_along_axis(
            direc, axis[:, None], axis=1)[:, 0] > 0
        wall = axis.astype(jnp.int32) * 2 + going_up.astype(jnp.int32)

        # segment–sphere capture for every mic
        rel = mics[None, :, :] - pos[:, None, :]        # (R, M, 3)
        t_ca = jnp.einsum("rmk,rk->rm", rel, direc)
        d2 = jnp.sum(rel * rel, axis=-1) - t_ca * t_ca
        crossed = (t_ca > 0) & (t_ca < t_hit[:, None]) & \
            (d2 < mic_radius * mic_radius) & alive[:, None]
        e_cross = jnp.where(crossed[..., None], energy[:, None, :],
                            0.0)
        hist = deposit(hist, dist[:, None] + t_ca, e_cross, crossed)

        hit = pos + t_hit[:, None] * direc
        dist_wall = dist + t_hit
        e_wall = energy * trans.T[wall]                 # (R, bands)

        if scat > 0.0:
            relw = mics[None, :, :] - hit[:, None, :]
            dmic = jnp.sqrt(jnp.sum(relw * relw, axis=-1))
            ratio = jnp.clip(mic_radius / jnp.maximum(dmic,
                                                      mic_radius),
                             0.0, 1.0)
            omega = 0.5 * (1.0 - jnp.sqrt(1.0 - ratio * ratio))
            e_rain = (e_wall[:, None, :] * scat
                      * omega[..., None]
                      * alive[:, None, None])
            hist = deposit(hist, dist_wall[:, None] + dmic, e_rain,
                           jnp.broadcast_to(alive[:, None],
                                            dmic.shape))
            e_wall = e_wall * (1.0 - scat)

        # specular reflection, nudged off the wall
        sign = jnp.where(
            jnp.arange(3)[None, :] == axis[:, None],
            -1.0, 1.0)
        new_dir = direc * sign
        new_pos = jnp.clip(hit + eps * new_dir, 0.0, room_j)
        energy = jnp.where(alive[:, None], e_wall, energy)
        pos = jnp.where(alive[:, None], new_pos, pos)
        direc = jnp.where(alive[:, None], new_dir, direc)
        dist = jnp.where(alive, dist_wall, dist)
        return (pos, direc, energy, dist, hist), None

    hist0 = jnp.zeros((n_mics, num_bins + 1, num_bands), jnp.float32)
    dist0 = jnp.zeros((int(num_rays),), jnp.float32)
    (_, _, _, _, hist), _ = jax.lax.scan(
        bounce, (pos0, dirs, e0, dist0, hist0), None,
        length=int(max_bounces))
    # drop the overflow slot; present (channels, bands, bins)
    return jnp.swapaxes(hist[:, :num_bins, :], 1, 2)
