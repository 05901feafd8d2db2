"""Device-resident benchmark timing — the pinned measurement methodology.

On the 1-core axon dev host each dispatch costs 1-4 ms of tunnel
latency, so dispatch-timed loops over-report kernel time.  The fix:
chain ``k`` applications of the function inside ONE jit dispatch via a
scalar accumulator and divide the wall time by ``k``.  The
``x * (1 + 1e-30*i)`` input scale is loop-varying — defeating XLA's
loop-invariant code motion (which would otherwise hoist ``f(x)`` out and
run it once) — while ``1 + 1e-30`` rounds to exactly ``1.0f``, so the
computation is bit-identical to ``f(x)``.

Used by ``bench.py`` (the driver-run headline) and
``benchmarks/run_configs.py``; keep both on this single implementation
so their numbers stay comparable.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp

__all__ = ["device_loop", "time_device_loop", "time_device_loop_p"]


def device_loop(f, k: int = 16):
    """Jitted ``x -> scalar`` running ``f`` ``k`` times device-side."""

    @jax.jit
    def looped(x):
        def body(i, acc):
            out = f(x * (1.0 + 1e-30 * i.astype(jnp.float32)))
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    return looped


def time_device_loop(f, x, k: int = 16, reps: int = 3) -> float:
    """Best-of-``reps`` seconds per single application of ``f(x)``.

    The first call compiles and warms up; each rep fetches the scalar
    result (on the axon tunnel ``block_until_ready`` alone does not
    force execution before the first real fetch).
    """
    looped = device_loop(f, k)
    float(looped(x))  # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(looped(x))
        best = min(best, (time.perf_counter() - t0) / k)
    return best


def time_device_loop_p(f, params, x, k: int = 2, reps: int = 3) -> float:
    """Like ``time_device_loop`` but with the parameter pytree as a jit
    ARGUMENT: closed-over params are baked into the HLO as constants —
    at wav2vec2-base scale that is a ~380 MB compile payload, which the
    axon remote-compile tunnel rejects (HTTP 413).  Same
    loop-varying-scale / scalar-fetch methodology."""

    @jax.jit
    def looped(pp, v):
        def body(i, acc):
            out = f(pp, v * (1.0 + 1e-30 * i.astype(jnp.float32)))
            return acc + jnp.sum(out)
        return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

    float(looped(params, x))                      # compile + warmup
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(looped(params, x))
        best = min(best, (time.perf_counter() - t0) / k)
    return best
