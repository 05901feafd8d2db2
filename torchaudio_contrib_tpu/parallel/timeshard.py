"""Time(sequence)-sharded STFT/mel — split the TIME axis over the mesh.

The library's batch data-parallelism (`sharding.py`) covers corpora of
clips; for a SINGLE very long recording the scaling axis is time.  Here
the waveform's time axis lives on a mesh axis and each shard computes
the frames that START in its chunk.  Frames straddling a shard boundary
need the next shard's leading ``fft − hop`` samples — one
``jax.lax.ppermute`` halo exchange per call, riding the ICI.  Everything
else (window, DFT, mel GEMM, dB) is frame-local, so this scales a
multi-hour recording across a pod slice with a single tiny collective.

This is the sequence-parallel analog for audio (SURVEY.md §5: the
"long-context" axis here is long audio); ring attention/Ulysses do not
apply — the STFT's dependency footprint is exactly the ``fft − hop``
halo.

Semantics: ``center=False`` framing (matching the streaming/fused
paths); the time length must divide evenly into hop-aligned shards
(pad the tail up front — the trailing frames are sliced off exactly as
a one-shot ``stft`` would).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.stft import stft as _stft
from ..ops.filters import create_mel_filter, apply_filterbank
from ..ops.complexops import complex_norm
from ..ops.db import amplitude_to_db
from ..ops.fused import _hashable_window

__all__ = ["time_sharded_stft", "time_sharded_melspectrogram"]


def _halo_from_right(xl: jnp.ndarray, axis_name: str,
                     halo: int) -> jnp.ndarray:
    """Each shard receives the leading ``halo`` samples of its RIGHT
    neighbor (the last shard receives zeros — ppermute's fill)."""
    n = jax.lax.axis_size(axis_name)
    perm = [(i, i - 1) for i in range(1, n)]
    return jax.lax.ppermute(xl[..., :halo], axis_name, perm)


def _shard_frames(xl, axis_name, fft_length, hop_length, window,
                  win_length, fb, to_db, power, use_fused=False,
                  precision="auto"):
    halo = _halo_from_right(xl, axis_name, fft_length - hop_length)
    xbuf = jnp.concatenate([xl, halo], axis=-1)
    if fb is not None and use_fused:
        # shard-local single-kernel path: same frames as the chain (the
        # halo'd buffer IS the center=False input), Pallas under
        # shard_map exactly as the corpus driver composes it
        from ..ops.fused import fused_melspectrogram
        return fused_melspectrogram(xbuf, fb, fft_length, hop_length,
                                    window, power, to_db,
                                    precision=precision,
                                    win_length=win_length)
    spec = _stft(xbuf, fft_length, hop_length, win_length=win_length,
                 window=window, center=False)   # (..., F, T_loc/hop)
    if fb is None:
        return spec
    mel = apply_filterbank(complex_norm(spec, power), fb)
    if to_db:
        mel = amplitude_to_db(mel, power=power)
    return mel


@functools.lru_cache(maxsize=32)
def _build_sharded_call(mesh, axis, nd, fft_length, hop_length, win_key,
                        win_length, with_fb, to_db, power, use_fused,
                        precision, interpret):
    """ONE jitted shard_map per (mesh, axis, config): repeated calls hit
    jit's trace cache instead of paying a fresh trace+compile each time
    (the filterbank — possibly trainable — enters as a replicated jit
    argument, not a closure constant).  ``interpret`` (the Pallas
    interpreter toggle) is part of the key because it is baked in at
    trace time."""
    del interpret  # key-only
    in_spec = P(*([None] * (nd - 1) + [axis]))
    out_spec = P(*([None] * nd + [axis]))  # (..., F/mels, frames)

    # check_vma=False: pallas_call (the use_fused path) cannot declare
    # varying-mesh-axes metadata, and every output here is trivially
    # sharded exactly as out_spec says
    if with_fb:
        fn = jax.shard_map(
            lambda xl, fb: _shard_frames(xl, axis, fft_length, hop_length,
                                         win_key, win_length, fb, to_db,
                                         power, use_fused, precision),
            mesh=mesh, in_specs=(in_spec, P(None, None)),
            out_specs=out_spec, check_vma=False)
    else:
        fn = jax.shard_map(
            lambda xl: _shard_frames(xl, axis, fft_length, hop_length,
                                     win_key, win_length, None, to_db,
                                     power, use_fused, precision),
            mesh=mesh, in_specs=in_spec, out_specs=out_spec,
            check_vma=False)
    return jax.jit(fn), in_spec


def _run(waveform, mesh, axis, fft_length, hop_length, window, win_length,
         fb, to_db, power, use_fused=False, precision="auto"):
    S = mesh.shape[axis]
    T = waveform.shape[-1]
    if T % (S * hop_length) != 0:
        raise ValueError(
            f"time length {T} must divide into {S} hop-aligned shards "
            f"(multiple of {S * hop_length}); zero-pad the tail")
    if T // S < fft_length - hop_length:
        raise ValueError(
            f"per-shard length {T // S} is shorter than the halo "
            f"(fft_length - hop_length = {fft_length - hop_length}); "
            f"use fewer shards or longer clips — frames spanning "
            "more than two shards are not representable")
    n_frames = 1 + (T - fft_length) // hop_length

    from ..ops.fused import _interpret
    call, in_spec = _build_sharded_call(
        mesh, axis, waveform.ndim, fft_length, hop_length,
        _hashable_window(window), win_length, fb is not None, to_db,
        power, use_fused, precision, _interpret())

    x = jax.device_put(waveform, NamedSharding(mesh, in_spec))
    if fb is not None:
        fbr = jax.device_put(fb, NamedSharding(mesh, P(None, None)))
        out = call(x, fbr)
    else:
        out = call(x)
    # the last shard's tail frames used a zero halo — exactly the frames
    # a one-shot center=False stft would not produce
    return out[..., :n_frames]


def time_sharded_stft(waveform: jnp.ndarray, mesh: Mesh,
                      axis: str = "data",
                      fft_length: int = 2048,
                      hop_length: int = 512,
                      window="hann",
                      win_length: Optional[int] = None) -> jnp.ndarray:
    """STFT of ``waveform (..., T)`` with TIME sharded over ``mesh[axis]``.

    Returns complex ``(..., n_freqs, n_frames)`` with the frame axis
    sharded over the same mesh axis; one ``ppermute`` halo exchange is
    the only collective.  ``center=False`` semantics.
    """
    return _run(waveform, mesh, axis, fft_length, hop_length, window,
                win_length, None, False, 2.0)


def time_sharded_melspectrogram(waveform: jnp.ndarray, mesh: Mesh,
                                axis: str = "data",
                                num_mels: int = 128,
                                sample_rate: float = 22050,
                                f_min: float = 0.0,
                                f_max: Optional[float] = None,
                                fft_length: int = 2048,
                                hop_length: int = 512,
                                window="hann",
                                to_db: bool = True,
                                power: float = 2.0,
                                use_fused: bool = False,
                                precision: str = "auto") -> jnp.ndarray:
    """Log-mel of a long ``(..., T)`` recording with time sharded over
    ``mesh[axis]`` — the whole chain (halo → frames → DFT → mel → dB)
    runs shard-local after the single halo exchange.

    ``use_fused=True`` runs each shard through the single Pallas kernel
    (sequence parallelism × the fused fast path; ``precision`` as in
    :func:`~torchaudio_contrib_tpu.ops.fused_melspectrogram`).  Off-TPU
    it transparently falls back to the shard-local XLA chain."""
    fb = create_mel_filter(num_mels, sample_rate, f_min, f_max,
                           fft_length // 2 + 1)
    return _run(waveform, mesh, axis, fft_length, hop_length, window,
                None, fb, to_db, power, use_fused, precision)
