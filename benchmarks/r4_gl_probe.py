"""Round-4 GL kernel layout probe (PERFORMANCE.md 'FBT probe' named
next lever): tile-major state ``(ft, rows, 2FBT)`` (per-tile accesses
index a leading dim — whole-tile aligned offsets) vs the shipped
wide-plane layout (dynamic lane-offset ``pl.ds`` slices).

Both variants run in THIS session back-to-back (cross-session variance
is ±10 % — CLAUDE.md), same inputs, pinned device-loop methodology.

    env PYTHONPATH=/root/.axon_site:/root/repo \
        python benchmarks/r4_gl_probe.py
"""
from __future__ import annotations

import json

import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops
from torchaudio_contrib_tpu.ops.fused_griffinlim import (
    _gl_pallas, fused_gl_supported)
from torchaudio_contrib_tpu.utils.timing import time_device_loop


def run(fft, hop, seconds, n_iter=32, batch=8):
    rng = np.random.default_rng(0)
    T = int(22050 * seconds)
    x = rng.standard_normal((batch, T)).astype(np.float32)
    mag = jnp.abs(ops.stft(jnp.asarray(x), fft, hop, center=True))
    assert fused_gl_supported(fft, hop, mag.shape[-1]), (fft, hop)
    results = {}
    for name, tm in (("baseline", False), ("tile_major", True)):
        sec = time_device_loop(
            lambda m, tm=tm: _gl_pallas(m, fft, hop, "hann", n_iter,
                                        0.99, T, True, tile_major=tm),
            mag, k=4)
        results[name] = sec
        print(json.dumps({"metric": f"gl-fft{fft}-{name}",
                          "ms": round(sec * 1e3, 2)}), flush=True)
    # parity: same math modulo layout → same waveform (bf16 state)
    ya = _gl_pallas(mag, fft, hop, "hann", 8, 0.99, T, True)
    yb = _gl_pallas(mag, fft, hop, "hann", 8, 0.99, T, True,
                    tile_major=True)
    err = float(jnp.max(jnp.abs(ya - yb))
                / (jnp.max(jnp.abs(ya)) + 1e-12))
    speedup = results["baseline"] / results["tile_major"]
    print(json.dumps({"metric": f"gl-fft{fft}-summary",
                      "speedup": round(speedup, 3),
                      "rel_err": err}), flush=True)


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} "
          f"{getattr(dev, 'device_kind', '')}", flush=True)
    run(1024, 256, 5.0)
    run(2048, 512, 5.0)


if __name__ == "__main__":
    main()
