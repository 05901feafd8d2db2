#!/usr/bin/env python
"""Benchmark: BASELINE config 2 — batched 128-band Melspectrogram +
AmplitudeToDb (batch 32, 30 s clips, 22.05 kHz) on the ambient device
(TPU v5e under the driver), vs the reference implementation style in
torch on CPU (the only reference oracle available; SURVEY.md §6).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}
vs_baseline is (our frames/s) / (torch-CPU frames/s); the north star is
>=20.  Details (fwd+bwd, parity) go to stderr.
"""
import argparse
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def torch_cpu_baseline(x_np, fft_length, hop, num_mels, sr, iters=2):
    """Reference-style melspec+dB in torch (stft → |.|² → mel GEMM → log).

    Methodology pin (round deltas must be attributable): threads fixed
    to the machine's core count, best-of-``iters`` timing (min, not
    mean) so transient host load cannot deflate the baseline and
    inflate ``vs_baseline``.
    """
    import torch
    import torchaudio_contrib_tpu as tac

    torch.set_num_threads(os.cpu_count() or 1)
    log(f"torch threads: {torch.get_num_threads()}")
    x = torch.as_tensor(x_np.reshape(-1, x_np.shape[-1]))
    w = torch.hann_window(fft_length)
    fb = torch.as_tensor(
        np.asarray(tac.create_mel_filter(num_mels, sr, 0.0, None,
                                         fft_length // 2 + 1),
                   dtype=np.float32))

    def run():
        s = torch.stft(x, fft_length, hop, window=w, center=True,
                       pad_mode="reflect", return_complex=True)
        p = s.real ** 2 + s.imag ** 2
        mel = torch.matmul(p.transpose(-2, -1), fb).transpose(-2, -1)
        db = 10.0 * torch.log10(torch.clamp(mel, min=1e-7))
        return db

    run()  # warmup
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run()
        best = min(best, time.perf_counter() - t0)
    n_frames_total = int(np.prod(x_np.shape[:-1])) * out.shape[-1]
    return n_frames_total / best, out.shape[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--channels", type=int, default=1)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--sr", type=int, default=22050)
    ap.add_argument("--fft", type=int, default=2048)
    ap.add_argument("--hop", type=int, default=512)
    ap.add_argument("--mels", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--baseline-iters", type=int, default=2)
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--skip-decode", action="store_true",
                    help="skip the beam-decoder regression metrics")
    ap.add_argument("--profile", default=None,
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--force-cpu", action="store_true",
                    help="run on the CPU backend (tests/smoke; env vars "
                         "alone can't override the axon sitecustomize)")
    args = ap.parse_args()

    import jax
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    # persistent compilation cache: remote TPU compiles are erratically
    # slow (4-430 s); cached executables make reruns start in seconds
    try:
        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log(f"compilation cache unavailable: {e}")
    import jax.numpy as jnp
    import torchaudio_contrib_tpu as tac

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    t_samples = int(args.seconds * args.sr)
    rng = np.random.default_rng(0)
    x_np = rng.standard_normal(
        (args.batch, args.channels, t_samples)).astype(np.float32)

    # headline path: the fused Pallas kernel at parity precision (split3,
    # ~4e-6 relative); the composed XLA chain and the fast bf16 kernel are
    # reported to stderr for context
    fused = tac.FusedMelspectrogram(
        num_mels=args.mels, sample_rate=args.sr, fft_length=args.fft,
        hop_length=args.hop, precision="split3")
    fused_fast = tac.FusedMelspectrogram(
        num_mels=args.mels, sample_rate=args.sr, fft_length=args.fft,
        hop_length=args.hop, precision="fast")
    mel = tac.Melspectrogram(num_mels=args.mels, sample_rate=args.sr,
                             fft_length=args.fft, hop_length=args.hop)
    to_db = tac.AmplitudeToDb(power=2.0)

    @jax.jit
    def fwd(x):
        return fused(x)

    @jax.jit
    def fwd_fast(x):
        return fused_fast(x)

    @jax.jit
    def fwd_chain(x):
        return to_db(mel(x))

    @jax.jit
    def fwd_bwd(x):
        return jax.grad(lambda v: jnp.sum(fwd(v)))(x)

    @jax.jit
    def probe(o):
        return jnp.sum(o)

    # device-resident timing loop: K applications chained inside ONE jit
    # dispatch, so the per-dispatch tunnel latency (1-4 ms on this
    # 1-core dev host — an artifact of the axon tunnel, not the chip) is
    # amortized away.  Single shared implementation: utils/timing.py.
    from torchaudio_contrib_tpu.utils.timing import time_device_loop
    K_LOOP = 16

    x = jnp.asarray(x_np)

    # compile + warmup.  NOTE: on the axon TPU tunnel, block_until_ready
    # alone does not reliably force execution until a value has actually
    # been fetched once — so every sync point below fetches a scalar.
    t0 = time.perf_counter()
    try:
        float(probe(fwd(x)))
    except Exception as e:
        # keep the headline alive if the kernel path breaks on this
        # backend: fall back to the composed XLA chain
        log(f"fused path failed ({e}); falling back to XLA chain")
        fwd = fwd_chain
        float(probe(fwd(x)))
    log(f"fwd compile+run: {time.perf_counter() - t0:.1f}s")

    # best-of-3 groups: host dispatch jitter on the 1-core tunnel host
    # adds 1-4 ms/iter of noise; the best group reflects device time
    # (mirrors the pinned best-of-N CPU-baseline methodology)
    group = max(args.iters // 3, 1)
    dt_fwd = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(group):
            out = fwd(x)
        float(probe(out))
        dt_fwd = min(dt_fwd, (time.perf_counter() - t0) / group)
    n_frames_total = args.batch * args.channels * out.shape[-1]
    fps_fwd = n_frames_total / dt_fwd
    log(f"fwd: {dt_fwd * 1e3:.2f} ms/iter (best of 3 groups), "
        f"{fps_fwd:,.0f} frames/s "
        f"({out.shape[-1]} frames x {args.batch * args.channels} streams)")

    # headline: device-resident loop (pure chip throughput)
    try:
        dt_loop = time_device_loop(fwd, x, k=K_LOOP, reps=3)
        log(f"fwd device-loop: {dt_loop * 1e3:.2f} ms/iter "
            f"({K_LOOP} iters/dispatch), "
            f"{n_frames_total / dt_loop:,.0f} frames/s")
        if dt_loop < dt_fwd:
            dt_fwd, fps_fwd = dt_loop, n_frames_total / dt_loop
    except Exception as e:
        log(f"device-loop timing failed ({e}); keeping dispatch timing")

    try:
        t0 = time.perf_counter()
        float(probe(fwd_bwd(x)))
        log(f"fwd+bwd compile+run: {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(max(args.iters // 3, 1)):
            g = fwd_bwd(x)
        float(probe(g))
        dt_bwd = (time.perf_counter() - t0) / max(args.iters // 3, 1)
        log(f"fwd+bwd: {dt_bwd * 1e3:.2f} ms/iter, "
            f"{n_frames_total / dt_bwd:,.0f} frames/s")
        dt_bl = time_device_loop(fwd_bwd, x, k=K_LOOP, reps=3)
        log(f"fwd+bwd device-loop: {dt_bl * 1e3:.2f} ms/iter, "
            f"{n_frames_total / dt_bl:,.0f} frames/s")
    except Exception as e:  # keep the headline metric alive
        log(f"fwd+bwd failed: {e}")

    # secondary paths for context
    for name, f in [("fast-bf16 kernel", fwd_fast),
                    ("XLA chain", fwd_chain)]:
        try:
            float(probe(f(x)))
            t0 = time.perf_counter()
            for _ in range(max(args.iters // 2, 1)):
                o2 = f(x)
            float(probe(o2))
            dt = (time.perf_counter() - t0) / max(args.iters // 2, 1)
            log(f"{name}: {dt * 1e3:.2f} ms/iter, "
                f"{n_frames_total / dt:,.0f} frames/s")
        except Exception as e:
            log(f"{name} failed: {e}")

    # device-side parity probe vs torch float64 (center=True handled by
    # comparing against our own XLA chain which is torch-parity-tested)
    try:
        xs = jnp.asarray(x_np[:2, :, : args.sr * 4])
        a = fused(xs, )
        spec = tac.ops.stft(xs, args.fft, args.hop, center=False)
        ref = tac.ops.amplitude_to_db(
            tac.ops.apply_filterbank(tac.ops.complex_norm(spec, 2.0),
                                     mel[2].filterbank()), power=2.0)
        rel = float(jnp.max(jnp.abs(a - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-12))
        log(f"parity probe (fused vs f32 XLA chain, dB domain, rel): "
            f"{rel:.2e}")
    except Exception as e:
        log(f"parity probe failed: {e}")

    # decode regression guard (VERDICT r4 ask 6): the two batched jitted
    # beam decoders, reported as extra keys on the same headline JSON
    # line so the driver records them every round.  Failures degrade to
    # null, never kill the headline.
    decode_ms = {"ctc_beam_ms": None, "rnnt_beam_ms": None}
    if not args.skip_decode:
        try:
            from torchaudio_contrib_tpu.ops import ctc_beam_decode
            Bc, Tc, Vc = 8, 1000, 1024          # 8 x 10 s at 10 ms hop
            lp = jax.nn.log_softmax(jnp.asarray(
                rng.standard_normal((Bc, Tc, Vc)), jnp.float32), -1)

            def ctc_f(v):
                toks, lens, scores = ctc_beam_decode(v, beam_width=16)
                return jnp.where(jnp.isfinite(scores), scores, 0.0)

            dt = time_device_loop(ctc_f, lp, k=4, reps=3)
            decode_ms["ctc_beam_ms"] = round(dt * 1e3, 2)
            log(f"ctc_beam_decode (B=8x10s, V=1024, beam 16): "
                f"{dt * 1e3:.2f} ms = {Bc * 10.0 / dt:,.0f}x realtime")
        except Exception as e:
            log(f"ctc beam bench failed: {e}")
        try:
            from torchaudio_contrib_tpu.models import RNNT, \
                RNNTBeamSearch

            class _Feats:                 # features-in transcriber
                def init(self, key):
                    return {}

                def apply(self, params, v, lengths=None):
                    return v

            J, Vr, Tr, Br = 1024, 4097, 250, 8   # emformer_rnnt scale
            rmodel = RNNT(_Feats(), num_symbols=Vr, encoding_dim=J,
                          joiner_dim=J, predictor_embed_dim=512,
                          predictor_hidden_dim=512, predictor_layers=3)
            rp = rmodel.init(jax.random.PRNGKey(7))
            search = RNNTBeamSearch(rmodel, beam_width=8)
            feats = jnp.asarray(
                rng.standard_normal((Br, Tr, J)) * 0.1, jnp.float32)
            lens = jnp.full((Br,), Tr, jnp.int32)
            carry = search.init_batched_state(rp, Br, max_tokens=200)

            def rnnt_f(v):
                c = search._run_batched(rp, v, lens, carry)
                return jnp.where(jnp.isfinite(c["scores"]),
                                 c["scores"], 0.0)

            dt = time_device_loop(rnnt_f, feats, k=2, reps=3)
            decode_ms["rnnt_beam_ms"] = round(dt * 1e3, 2)
            log(f"rnnt decode_batched (B=8x10s enc, V=4097, beam 8): "
                f"{dt * 1e3:.2f} ms = {Br * 10.0 / dt:,.0f}x realtime")
        except Exception as e:
            log(f"rnnt beam bench failed: {e}")

    if args.profile:
        with jax.profiler.trace(args.profile):
            fwd(x).block_until_ready()
        log(f"profile written to {args.profile}")

    if args.skip_baseline:
        fps_cpu = None
    else:
        log("running torch CPU baseline...")
        fps_cpu, frames_ref = torch_cpu_baseline(
            x_np, args.fft, args.hop, args.mels, args.sr,
            args.baseline_iters)
        log(f"torch CPU: {fps_cpu:,.0f} frames/s")

    vs = (fps_fwd / fps_cpu) if fps_cpu else None
    print(json.dumps({
        "metric": "melspec_db_fwd_frames_per_sec_per_chip",
        "value": round(fps_fwd, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        **decode_ms,
    }), flush=True)


if __name__ == "__main__":
    main()
