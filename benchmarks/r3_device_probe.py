"""Round-3 device probe: new-kernel compile checks, parity, and timing.

One process, sequential (never interleave TPU processes — CLAUDE.md).
Emits JSON lines.  Sections gate on CLI args so a crash mid-way can be
resumed per-section:

    python benchmarks/r3_device_probe.py bwd whisper split6 gl
"""
import json
import sys
import time

import numpy as np


def emit(name, **kw):
    print(json.dumps({"probe": name, **kw}), flush=True)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from torchaudio_contrib_tpu import ops
    from torchaudio_contrib_tpu.ops import fused
    from torchaudio_contrib_tpu.utils.timing import time_device_loop

    picks = sys.argv[1:] or ["bwd", "whisper", "split6", "gl"]
    rng = np.random.default_rng(0)

    if "bwd" in picks:
        # config 2: fwd + fwd+bwd at split3 — the N-tiled backward
        # (TB=512, n_nt=2) vs round 2's TB=256 25.9 ms
        x = jnp.asarray(rng.standard_normal((32, 1, 661500))
                        .astype(np.float32))
        fb = ops.create_mel_filter(128, 22050, 0.0, None, 1025)
        tb, n_nt = fused._bwd_tiles(2048, 128, 2, 9)
        log(f"config2 split3 bwd tiles: TB={tb} n_nt={n_nt}")
        f3 = lambda v: fused.fused_melspectrogram(v, fb, 2048, 512,
                                                  precision="split3")
        dt_f = time_device_loop(f3, x)
        dt_b = time_device_loop(jax.grad(lambda v: jnp.sum(f3(v))), x, k=8)
        ff = lambda v: fused.fused_melspectrogram(v, fb, 2048, 512,
                                                  precision="fast")
        dt_bf = time_device_loop(jax.grad(lambda v: jnp.sum(ff(v))), x,
                                 k=8)
        emit("config2-bwd", fwd_split3_ms=round(dt_f * 1e3, 2),
             fwd_bwd_split3_ms=round(dt_b * 1e3, 2),
             fwd_bwd_fast_ms=round(dt_bf * 1e3, 2),
             bwd_tiles=[tb, n_nt])
        # grad parity vs the fft-chain VJP (r2: dx 2.8e-5 / dfb 3.8e-5)
        xs = x[:2]
        gx, gf = jax.grad(lambda v, f: jnp.sum(
            fused.fused_melspectrogram(v, f, 2048, 512,
                                       precision="split3")),
            argnums=(0, 1))(xs, fb)

        def chain(v, f):
            spec = ops.stft(v, 2048, 512, center=False)
            return jnp.sum(ops.amplitude_to_db(ops.apply_filterbank(
                ops.complex_norm(spec, 2.0), f), power=2.0))

        rx, rf = jax.grad(chain, argnums=(0, 1))(xs, fb)
        emit("config2-bwd-parity",
             dx_rel=float(jnp.max(jnp.abs(gx - rx))
                          / jnp.max(jnp.abs(rx))),
             dfb_rel=float(jnp.max(jnp.abs(gf - rf))
                           / jnp.max(jnp.abs(rf))))

    if "whisper" in picks:
        x = jnp.asarray(rng.standard_normal((32, 480000))
                        .astype(np.float32))
        fb = ops.create_mel_filter(80, 16000, 0.0, None, 201)
        out = {}
        for prec in ("split6", "split3", "fast"):
            f = lambda v, p=prec: fused.fused_melspectrogram(
                v, fb, 400, 160, precision=p)
            out[f"fwd_{prec}_ms"] = round(
                time_device_loop(f, x) * 1e3, 2)
        for prec in ("split6", "split3"):
            f = lambda v, p=prec: jnp.sum(fused.fused_melspectrogram(
                v, fb, 400, 160, precision=p))
            out[f"fwd_bwd_{prec}_ms"] = round(
                time_device_loop(jax.grad(f), x, k=8) * 1e3, 2)
        emit("whisper-timing", **out)
        # parity at x10 scale vs the f32 XLA chain (r2 split3: 7.9e-4)
        xs = 10.0 * x[:4]

        def chain(v):
            spec = ops.stft(v, 400, 160, center=False)
            return ops.amplitude_to_db(ops.apply_filterbank(
                ops.complex_norm(spec, 2.0), fb), power=2.0)

        ref = chain(xs)
        par = {}
        for prec in ("split6", "split3"):
            o = fused.fused_melspectrogram(xs, fb, 400, 160,
                                           precision=prec)
            par[f"fwd_{prec}"] = float(jnp.max(jnp.abs(o - ref))
                                       / jnp.max(jnp.abs(ref)))
        gx6, gf6 = jax.grad(lambda v, f: jnp.sum(
            fused.fused_melspectrogram(v, f, 400, 160,
                                       precision="split6")),
            argnums=(0, 1))(xs, fb)
        rx, rf = jax.grad(lambda v, f: jnp.sum(ops.amplitude_to_db(
            ops.apply_filterbank(ops.complex_norm(
                ops.stft(v, 400, 160, center=False), 2.0), f),
            power=2.0)), argnums=(0, 1))(xs, fb)
        par["dx_split6"] = float(jnp.max(jnp.abs(gx6 - rx))
                                 / jnp.max(jnp.abs(rx)))
        par["dfb_split6"] = float(jnp.max(jnp.abs(gf6 - rf))
                                  / jnp.max(jnp.abs(rf)))
        emit("whisper-parity", **par)

    if "split6" in picks:
        # config 2 at split6 for the record (auto picks split3 there)
        x = jnp.asarray(rng.standard_normal((32, 1, 661500))
                        .astype(np.float32))
        fb = ops.create_mel_filter(128, 22050, 0.0, None, 1025)
        f6 = lambda v: fused.fused_melspectrogram(v, fb, 2048, 512,
                                                  precision="split6")
        dt = time_device_loop(f6, x)
        xs = x[:2]
        spec = ops.stft(xs, 2048, 512, center=False)
        ref = ops.amplitude_to_db(ops.apply_filterbank(
            ops.complex_norm(spec, 2.0), fb), power=2.0)
        o = f6(xs)
        emit("config2-split6", fwd_ms=round(dt * 1e3, 2),
             fwd_rel=float(jnp.max(jnp.abs(o - ref))
                           / jnp.max(jnp.abs(ref))))

    if "gl" in picks:
        for fft, hop in ((1024, 256), (2048, 512)):
            x = jnp.asarray(rng.standard_normal((8, 110250))
                            .astype(np.float32))
            mag = jnp.abs(ops.stft(x, fft, hop))
            res = {}
            for method in ("pallas", "matmul"):
                gl = jax.jit(lambda m, me=method: ops.griffin_lim(
                    m, fft, hop, n_iter=32, length=110250, method=me))
                y = gl(mag)
                float(jnp.sum(jnp.abs(y)))  # compile+force
                t0 = time.perf_counter()
                for _ in range(3):
                    y = gl(mag)
                float(jnp.sum(jnp.abs(y)))
                res[f"{method}_ms"] = round(
                    (time.perf_counter() - t0) / 3 * 1e3, 1)
                mg = jnp.abs(ops.stft(y, fft, hop))
                res[f"{method}_sc"] = round(float(
                    jnp.linalg.norm(mg - mag) / jnp.linalg.norm(mag)), 4)
            emit(f"gl-{fft}", **res)


if __name__ == "__main__":
    main()
