"""Bisect the GL v3 kernel's per-iteration cost at fft=2048.

Times kernel variants with stages neutralized (results are WRONG for
every variant except 'full' — timing only):

  full        the shipped kernel
  nonorm      momentum/normalize replaced by a plain bf16 copy
  nodynslice  state read/write at static tile 0 (no dynamic lane slices)
  nodma       DMA waits still issued but GEMMs read the (stale) buffer
              without per-tile copies (one copy at start)
  noola       overlap-add/env/reframe skipped

Each delta against 'full' attributes that stage's cost.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from torchaudio_contrib_tpu import ops
    from torchaudio_contrib_tpu.ops import fused_griffinlim as fg
    from torchaudio_contrib_tpu.ops.fused import _round_up, _cdiv

    from torchaudio_contrib_tpu.ops.stft import (_idft_matrices,
                                                 _dft_matrices,
                                                 _resolve_window)
    import ml_dtypes

    def _bases(N, fbt):
        F = N // 2 + 1
        ftc = _cdiv(F, fbt)
        FP = ftc * fbt
        w = _resolve_window("hann", N, N)
        icr, ici = _idft_matrices(N)
        icr_p = np.zeros((FP, N), np.float32)
        ici_p = np.zeros((FP, N), np.float32)
        icr_p[:F] = icr * w[None, :]
        ici_p[:F] = ici * w[None, :]
        cos_m, msin_m = _dft_matrices(N, True)
        cos_p = np.zeros((N, FP), np.float32)
        sin_p = np.zeros((N, FP), np.float32)
        cos_p[:, :F] = w[:, None] * cos_m
        sin_p[:, :F] = w[:, None] * msin_m
        syn = np.concatenate(
            [np.concatenate([icr_p[t * fbt:(t + 1) * fbt],
                             ici_p[t * fbt:(t + 1) * fbt]], axis=0)
             for t in range(ftc)], axis=0)
        ana = np.concatenate(
            [np.concatenate([cos_p[:, t * fbt:(t + 1) * fbt],
                             sin_p[:, t * fbt:(t + 1) * fbt]], axis=1)
             for t in range(ftc)], axis=0)
        return (syn.astype(ml_dtypes.bfloat16),
                ana.astype(ml_dtypes.bfloat16), w, ftc, FP)

    N, HOP, n_iter, momentum = 2048, 512, 32, 0.99
    FBT = int(os.environ.get("GL_FBT", fg._FBT))
    SLOTS = int(os.environ.get("GL_SLOTS", "2"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 110250)).astype(np.float32))
    mag = jnp.abs(ops.stft(x, N, HOP))
    F = N // 2 + 1
    n_frames = mag.shape[-1]
    bc = mag.shape[0] if mag.ndim == 3 else 8
    rows = _round_up(n_frames, 8)
    ft = _cdiv(F, FBT)
    W2T = 2 * FBT
    W2 = ft * W2T
    r = N // HOP
    lrows = rows - 1 + r

    syn, ana, w, ft2, FP = _bases(N, FBT)
    assert ft2 == ft
    from torchaudio_contrib_tpu.ops.windows import cola_window_sum
    env = cola_window_sum(w, HOP, n_frames, lrows * HOP)
    inv_env = jnp.asarray(
        np.where(env > 1e-3 * env.max(),
                 1.0 / np.maximum(env, 1e-8), 0.0).astype(np.float32))
    env2d = inv_env.reshape(lrows, HOP)
    syn_j, ana_j = jnp.asarray(syn), jnp.asarray(ana)

    mag2 = mag.reshape(-1, F, n_frames)
    magL = jnp.swapaxes(mag2, -1, -2)
    magL = jnp.pad(magL, ((0, 0), (0, rows - n_frames), (0, FP - F)))
    magT4 = magL.reshape(bc, rows, ft, FBT)
    state0 = jnp.stack([magT4, jnp.zeros_like(magT4)], axis=-2) \
        .reshape(bc, rows, W2).astype(jnp.bfloat16)
    magT = magT4.reshape(bc, rows, ft * FBT).astype(jnp.bfloat16)

    def build(variant):
        def kernel(state0_ref, mag_ref, syn_hbm, ana_hbm, env_ref, o_ref,
                   prev, fr, xv, sbuf, abuf, sem_s, sem_a):
            o_ref[0] = state0_ref[0]
            prev[:] = jnp.zeros((rows, W2), jnp.bfloat16)

            def syn_copy(t, slot):
                return pltpu.make_async_copy(
                    syn_hbm.at[pl.ds(t * W2T, W2T), :], sbuf.at[slot],
                    sem_s.at[slot])

            def ana_copy(t, slot):
                return pltpu.make_async_copy(
                    ana_hbm.at[pl.ds(t * N, N), :], abuf.at[slot],
                    sem_a.at[slot])

            if variant == "nodma":
                syn_copy(0, 0).start()
                syn_copy(0, 0).wait()
                ana_copy(0, 0).start()
                ana_copy(0, 0).wait()

            def iteration(it, carry):
                if variant != "nodma":
                    syn_copy(0, 0).start()

                def syn_t(t, c):
                    slot = jax.lax.rem(t, SLOTS)
                    if variant != "nodma":
                        if SLOTS == 2:
                            @pl.when(t + 1 < ft)
                            def _p():
                                syn_copy(t + 1,
                                         jax.lax.rem(t + 1, 2)).start()
                        else:
                            @pl.when(t > 0)
                            def _p():
                                syn_copy(t, 0).start()
                        syn_copy(t, slot).wait()
                        buf = sbuf[slot]
                    else:
                        buf = sbuf[0]
                    if variant == "nodynslice":
                        spec_t = o_ref[0, :, 0:W2T]
                    else:
                        spec_t = o_ref[0, :, pl.ds(t * W2T, W2T)]
                    part = jnp.dot(spec_t, buf,
                                   preferred_element_type=jnp.float32)

                    @pl.when(t == 0)
                    def _i():
                        fr[:] = part.astype(jnp.bfloat16)

                    @pl.when(t > 0)
                    def _a():
                        fr[:] = (fr[:].astype(jnp.float32)
                                 + part).astype(jnp.bfloat16)
                    return c

                jax.lax.fori_loop(0, ft, syn_t, 0)
                if variant != "nodma":
                    ana_copy(0, 0).start()

                if variant != "noola":
                    xv[:] = jnp.zeros((lrows, HOP), jnp.float32)
                    for k in range(r):
                        xv[k:k + rows, :] = (xv[k:k + rows, :]
                                             + fr[:, k * HOP:(k + 1) * HOP]
                                             .astype(jnp.float32))
                    xv[:] = xv[:] * env_ref[:]
                    for k in range(r):
                        fr[:, k * HOP:(k + 1) * HOP] = \
                            xv[k:k + rows, :].astype(jnp.bfloat16)

                def ana_t(t, c):
                    slot = jax.lax.rem(t, SLOTS)
                    if variant != "nodma":
                        if SLOTS == 2:
                            @pl.when(t + 1 < ft)
                            def _p():
                                ana_copy(t + 1,
                                         jax.lax.rem(t + 1, 2)).start()
                        else:
                            @pl.when(t > 0)
                            def _p():
                                ana_copy(t, 0).start()
                        ana_copy(t, slot).wait()
                        buf = abuf[slot]
                    else:
                        buf = abuf[0]
                    reim = jnp.dot(fr[:], buf,
                                   preferred_element_type=jnp.float32)
                    if variant == "nodynslice":
                        sl = slice(0, W2T)
                        slm = slice(0, FBT)
                    else:
                        sl = pl.ds(t * W2T, W2T)
                        slm = pl.ds(t * FBT, FBT)
                    if variant == "nonorm":
                        o_ref[0, :, sl] = reim.astype(jnp.bfloat16)
                    else:
                        pv = prev[:, sl].astype(jnp.float32)
                        prev[:, sl] = reim.astype(jnp.bfloat16)
                        upd = reim + momentum * (reim - pv)
                        re, im = upd[:, :FBT], upd[:, FBT:]
                        nrm = jnp.sqrt(re * re + im * im)
                        sc = (mag_ref[0, :, slm]
                              / jnp.maximum(nrm, 1e-16))
                        o_ref[0, :, sl] = jnp.concatenate(
                            [re * sc, im * sc], axis=1) \
                            .astype(jnp.bfloat16)
                    return c

                jax.lax.fori_loop(0, ft, ana_t, 0)
                return carry

            jax.lax.fori_loop(0, n_iter, iteration, 0)

        return pl.pallas_call(
            kernel,
            grid=(bc,),
            in_specs=[
                pl.BlockSpec((1, rows, W2), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, rows, ft * FBT), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((lrows, HOP), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, W2), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bc, rows, W2), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((rows, W2), jnp.bfloat16),
                            pltpu.VMEM((rows, N), jnp.bfloat16),
                            pltpu.VMEM((lrows, HOP), jnp.float32),
                            pltpu.VMEM((SLOTS, W2T, N), jnp.bfloat16),
                            pltpu.VMEM((SLOTS, N, W2T), jnp.bfloat16),
                            pltpu.SemaphoreType.DMA((SLOTS,)),
                            pltpu.SemaphoreType.DMA((SLOTS,))],
        )

    for variant in (sys.argv[1:] or ["full", "nonorm", "nodynslice",
                                     "nodma", "noola"]):
        try:
            call = jax.jit(lambda s, m: build(variant)(s, m, syn_j, ana_j,
                                                       env2d))
            out = call(state0, magT)
            float(jnp.sum(out.astype(jnp.float32)))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = call(state0, magT)
                float(jnp.sum(out.astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({"variant": variant,
                              "kernel_ms": round(best * 1e3, 2)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"variant": variant,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
