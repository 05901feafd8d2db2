"""TPU tile/precision sweep for the fused mel kernels (round 2).

Times BASELINE config 2 (batch 32 x 30 s @ 22.05 kHz, fft 2048/hop 512,
128 mels) across forward tile variants, then the full fwd+bwd with the
backward Pallas kernels, plus the hop=160 ASR config.  Scalar-fetch
synchronization per docs/PERFORMANCE.md.  Run on the TPU:

    python benchmarks/sweep_fused.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops
from torchaudio_contrib_tpu.ops import fused


def sync(x):
    return float(jnp.sum(x if not isinstance(x, tuple) else x[0]))


def timeit(fn, *args, iters=20, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = sync(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    return dt, s


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    sr = 22050
    x = jnp.asarray(rng.standard_normal((32, sr * 30)).astype(np.float32))
    fb = ops.create_mel_filter(128, sr, 0.0, None, 1025)
    n_frames = 1 + (sr * 30 - 2048) // 512
    frames_tot = 32 * n_frames
    print(f"config 2: {frames_tot} frames/iter")

    def run_fwd(tb, fbt, prec):
        fused._TB, fused._TB_FAST, fused._FREQ_TILE = tb, tb, fbt
        f = jax.jit(lambda v: fused.fused_melspectrogram(
            v, fb, 2048, 512, precision=prec))
        return timeit(f, x)

    results = {}
    for prec in ("split3", "fast"):
        for tb, fbt in ((256, 256), (256, 320), (384, 256), (512, 128),
                        (512, 192), (512, 256)):
            key = f"fwd {prec} TB={tb} FBT={fbt}"
            try:
                dt, _ = run_fwd(tb, fbt, prec)
                results[key] = dt
                print(f"{key}: {dt:.2f} ms "
                      f"({frames_tot / dt * 1000 / 1e6:.2f} Mframes/s)")
            except Exception as e:
                print(f"{key}: FAILED {type(e).__name__} "
                      f"{str(e)[:200]}")

    # parity probe (dB domain) at the best split3 config
    best = min((k for k in results if "split3" in k), key=results.get)
    fused._TB = int(best.split("TB=")[1].split()[0])
    fused._FREQ_TILE = int(best.split("FBT=")[1].split()[0])
    out = fused.fused_melspectrogram(x, fb, 2048, 512)
    spec = ops.stft(x, 2048, 512, center=False)
    ref = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb), power=2.0)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    print(f"parity probe ({best}): rel {rel:.2e}")

    # fwd+bwd with the backward kernels
    w = jnp.asarray(rng.standard_normal((32, 128, n_frames))
                    .astype(np.float32))
    for tb_bwd in (128, 256, 512):
        fused._TB_BWD = tb_bwd
        try:
            f = jax.jit(jax.grad(lambda v, fbv: jnp.sum(
                fused.fused_melspectrogram(v, fbv, 2048, 512) * w),
                argnums=(0, 1)))
            dt, _ = timeit(f, x, fb, iters=10)
            print(f"fwd+bwd kernels TB_BWD={tb_bwd}: {dt:.2f} ms "
                  f"({frames_tot / dt * 1000 / 1e6:.2f} Mframes/s)")
        except Exception as e:
            print(f"fwd+bwd TB_BWD={tb_bwd}: FAILED {type(e).__name__} "
                  f"{str(e)[:200]}")
    fused._TB_BWD = 256

    # XLA-chain fwd+bwd baseline (round-1 number: ~32 ms)
    def chain_loss(v, fbv):
        spec = ops.stft(v, 2048, 512, center=False, method="matmul",
                        precision=jax.lax.Precision.HIGH)
        p = ops.complex_norm(spec, 2.0)
        return jnp.sum(ops.amplitude_to_db(ops.apply_filterbank(p, fbv),
                                           power=2.0) * w)
    f = jax.jit(jax.grad(chain_loss, argnums=(0, 1)))
    dt, _ = timeit(f, x, fb, iters=10)
    print(f"fwd+bwd XLA chain (matmul/HIGH): {dt:.2f} ms")

    # gradient parity: kernels vs XLA fft-chain VJP
    gx, gf = jax.jit(jax.grad(lambda v, fbv: jnp.sum(
        fused.fused_melspectrogram(v, fbv, 2048, 512) * w),
        argnums=(0, 1)))(x, fb)
    def chain_fft(v, fbv):
        spec = ops.stft(v, 2048, 512, center=False)
        p = ops.complex_norm(spec, 2.0)
        return jnp.sum(ops.amplitude_to_db(ops.apply_filterbank(p, fbv),
                                           power=2.0) * w)
    rx, rf = jax.jit(jax.grad(chain_fft, argnums=(0, 1)))(x, fb)
    ex = float(jnp.max(jnp.abs(gx - rx)) / jnp.max(jnp.abs(rx)))
    ef = float(jnp.max(jnp.abs(gf - rf)) / jnp.max(jnp.abs(rf)))
    print(f"grad parity vs fft chain: dx {ex:.2e}  dfb {ef:.2e}")

    # hop=160 ASR config (fft 512, 16 kHz, 30 s, 64 mels)
    sr2 = 16000
    x2 = jnp.asarray(rng.standard_normal((32, sr2 * 30))
                     .astype(np.float32))
    fb2 = ops.create_mel_filter(64, sr2, 0.0, None, 257)
    nf2 = 1 + (sr2 * 30 - 512) // 160
    ft2 = 32 * nf2
    f = jax.jit(lambda v: fused.fused_melspectrogram(v, fb2, 512, 160))
    dt, _ = timeit(f, x2)
    print(f"hop160 fused fwd: {dt:.2f} ms ({ft2/dt*1000/1e6:.2f} Mframes/s)")
    def chain160(v):
        spec = ops.stft(v, 512, 160, center=False)
        p = ops.complex_norm(spec, 2.0)
        return ops.amplitude_to_db(ops.apply_filterbank(p, fb2),
                                   power=2.0)
    f = jax.jit(chain160)
    dt_c, _ = timeit(f, x2)
    out = fused.fused_melspectrogram(x2, fb2, 512, 160)
    ref = chain160(x2)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    print(f"hop160 XLA chain fwd: {dt_c:.2f} ms; fused parity rel {rel:.2e}")


if __name__ == "__main__":
    main()
