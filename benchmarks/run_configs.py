"""Per-config benchmark runner for the five BASELINE.json configs.

Writes one JSON line per config to stdout (details to stderr).  Heavier
than bench.py (which the driver runs); use this for full coverage:

    python benchmarks/run_configs.py            # all configs
    python benchmarks/run_configs.py 1 4        # subset
"""
import json
import os
import sys
import time

import numpy as np

# runnable from anywhere: the package lives one level up
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(name, **kw):
    print(json.dumps({"config": name, **kw}), flush=True)


def _sync(probe, x):
    return float(probe(x))


def _devloop(f, x, k=16, reps=3):
    """Device-resident timing (shared implementation: utils/timing.py —
    excludes the 1-4 ms/dispatch tunnel latency of the 1-core host)."""
    from torchaudio_contrib_tpu.utils.timing import time_device_loop
    return time_device_loop(f, x, k=k, reps=reps)


def config1():
    """1 s 16 kHz mono wav → STFT magnitude (n_fft=512, hop=128), CPU
    parity vs torch float64."""
    import torch
    import jax.numpy as jnp
    from torchaudio_contrib_tpu import ops

    x = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    mag = np.asarray(jnp.abs(ops.stft(jnp.asarray(x), 512, 128)))

    w = torch.hann_window(512, dtype=torch.float64)
    ref = torch.stft(torch.as_tensor(x, dtype=torch.float64), 512, 128,
                     window=w, center=True, pad_mode="reflect",
                     return_complex=True).abs().numpy()
    err = float(np.max(np.abs(mag - ref)))
    emit("1:stft-parity", max_abs_err=err, passed=bool(err <= 1e-4))


def config2():
    """Batched 128-band Melspectrogram+dB (batch 32, 30 s, 22.05 kHz)."""
    import jax
    import jax.numpy as jnp
    import torchaudio_contrib_tpu as tac

    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((32, 1, 661500)).astype(np.float32))
    fused = tac.FusedMelspectrogram(num_mels=128, sample_rate=22050,
                                    fft_length=2048, hop_length=512)
    fast = tac.FusedMelspectrogram(num_mels=128, sample_rate=22050,
                                   fft_length=2048, hop_length=512,
                                   precision="fast")
    n_frames = 1 + (661500 - 2048) // 512
    dt = _devloop(fused, x)
    dt_fast = _devloop(fast, x)
    dt_bwd = _devloop(
        jax.grad(lambda v: jnp.sum(fused(v))), x, k=8)
    emit("2:melspec-batch", ms_per_iter=round(dt * 1e3, 2),
         frames_per_sec=round(32 * n_frames / dt),
         fast_ms=round(dt_fast * 1e3, 2),
         fwd_bwd_ms=round(dt_bwd * 1e3, 2),
         timing="device-loop")


def config3():
    """Fwd+bwd through STFT→mel→dB into a small CNN (trainable frontend)."""
    import jax
    import jax.numpy as jnp
    from torchaudio_contrib_tpu.models import MelFrontendClassifier

    model = MelFrontendClassifier(num_classes=10, num_mels=64,
                                  sample_rate=16000, fft_length=512,
                                  hop_length=128)
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 1, 160000)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, 32))

    n_frames = 32 * (1 + 160000 // 128)

    def time_train(m, p0, k=8, reps=3):
        """Device-resident loop of REAL sequential train steps (params
        chain through the carry — nothing for XLA to hoist)."""
        @jax.jit
        def looped(p):
            def body(i, carry):
                pp, _ = carry
                return m.train_step(pp, x, y, 1e-3)
            return jax.lax.fori_loop(0, k, body, (p, jnp.float32(0.0)))
        p1, l1 = looped(p0)
        float(l1)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _, l1 = looped(p0)
            float(l1)
            best = min(best, (time.perf_counter() - t0) / k)
        return best, float(l1)

    dt, loss = time_train(model, params)
    emit("3:trainable-frontend", ms_per_step=round(dt * 1e3, 2),
         frames_per_sec=round(n_frames / dt), loss=loss,
         timing="device-loop")

    # fused-frontend variants (single-kernel log-mel; 'fast' also runs
    # the backward kernels single-pass — the SGD-throughput mode)
    for prec in ("split3", "fast"):
        m2 = MelFrontendClassifier(num_classes=10, num_mels=64,
                                   sample_rate=16000, fft_length=512,
                                   hop_length=128, fused=True,
                                   precision=prec)
        p2 = m2.init(jax.random.PRNGKey(0))
        dt2, l2 = time_train(m2, p2)
        emit(f"3:trainable-frontend-fused-{prec}",
             ms_per_step=round(dt2 * 1e3, 2),
             frames_per_sec=round(n_frames / dt2), loss=l2,
             timing="device-loop")


def config4():
    """ISTFT round-trip, COLA windows, stereo batch."""
    import jax.numpy as jnp
    from torchaudio_contrib_tpu import ops

    x = np.random.default_rng(0).standard_normal((4, 2, 32768)) \
        .astype(np.float32)
    spec = ops.stft(jnp.asarray(x), 1024, 256)
    y = ops.istft(spec, 256, length=32768)
    err = float(jnp.max(jnp.abs(y - jnp.asarray(x))))
    emit("4:istft-roundtrip", max_abs_err=err, passed=bool(err <= 1e-4))


def config5():
    """Corpus shard: sharded, fault-tolerant, streamed chunked STFT."""
    import jax
    from torchaudio_contrib_tpu import parallel as par

    sr = 16000
    n = 512
    rng = np.random.default_rng(0)
    clips = rng.standard_normal((8, 1, sr * 10)).astype(np.float32)

    def loader(i):
        return clips[i % 8]

    nd = jax.device_count()
    # batch 256: the axon tunnel's per-dispatch latency dominates on this
    # 1-core host, so fewer/larger transfers win over thread parallelism
    pre = par.CorpusPreprocessor(
        loader, clip_samples=sr * 10, batch_size=max(nd * 4, 256),
        mesh=par.make_mesh(n_data=nd),
        num_workers=2, wire_format="int16", prefetch_batches=3,
        use_fused=True,
        fft_length=2048, hop_length=512, num_mels=128, sample_rate=22050,
        frames_per_chunk=64)
    pre.run(range(pre.batch_size))  # warm-up: compile outside the timing
    stats = pre.run(range(n))
    emit("5:corpus", files=stats.files_done, failed=stats.files_failed,
         frames_per_sec=round(stats.frames_per_sec),
         devices=nd, wire_format="int16")


def config6():
    """Extras: griffin-lim vocoder loop, resample, fused MFCC (tracking
    numbers for the rebuild-only ops)."""
    import jax
    import jax.numpy as jnp
    from torchaudio_contrib_tpu import ops

    @jax.jit
    def probe(o):
        return jnp.sum(jnp.abs(o))

    def timeit(f, x, n=3):
        float(probe(f(x)))
        t0 = time.perf_counter()
        for _ in range(n):
            o = f(x)
        float(probe(o))
        return (time.perf_counter() - t0) / n

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 110250)).astype(np.float32))
    mag = jnp.abs(ops.stft(x, 1024, 256))
    gl = jax.jit(lambda m: ops.griffin_lim(m, 1024, 256, n_iter=32,
                                           length=110250,
                                           method="pallas"))
    dt_gl = timeit(gl, mag)

    xb = jnp.asarray(rng.standard_normal((32, 1, 661500))
                     .astype(np.float32))
    rs = jax.jit(lambda v: ops.resample(v, 22050, 16000))
    dt_rs = timeit(rs, xb)
    mf = jax.jit(lambda v: ops.mfcc(v, 22050, 20, 128, 2048, 512,
                                    center=False, use_fused=True))
    dt_mf = timeit(mf, xb)
    emit("6:extras",
         griffinlim_ms_batch8=round(dt_gl * 1e3, 1),
         resample_x_realtime=round(32 * 30 / dt_rs),
         mfcc_frames_per_sec=round(32 * 1292 / dt_mf))


def config7():
    """Whisper-style ASR frontend: fft=400, hop=160, 80 mels, 16 kHz,
    batch 32 x 30 s — the non-128-multiple-fft kernel path."""
    import jax
    import jax.numpy as jnp
    from torchaudio_contrib_tpu import ops

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 480000)).astype(np.float32))
    fb = ops.create_mel_filter(80, 16000, 0.0, None, 201)
    n_frames = 1 + (480000 - 400) // 160

    def chain(v):
        spec = ops.stft(v, 400, 160, center=False)
        return ops.amplitude_to_db(ops.apply_filterbank(
            ops.complex_norm(spec, 2.0), fb), power=2.0)

    # precision="auto" resolves to split6 here (2.5 bins/mel — the
    # config where split3 has measured dB tails); report both tiers
    assert ops.resolve_precision("auto", 400, 80) == "split6"
    dt6 = _devloop(lambda v: ops.fused_melspectrogram(v, fb, 400, 160), x)
    dt3 = _devloop(lambda v: ops.fused_melspectrogram(
        v, fb, 400, 160, precision="split3"), x)
    dt_fast = _devloop(lambda v: ops.fused_melspectrogram(
        v, fb, 400, 160, precision="fast"), x)
    dt_bwd6 = _devloop(jax.grad(lambda v: jnp.sum(
        ops.fused_melspectrogram(v, fb, 400, 160))), x, k=8)
    dt_bwd3 = _devloop(jax.grad(lambda v: jnp.sum(
        ops.fused_melspectrogram(v, fb, 400, 160,
                                 precision="split3"))), x, k=8)
    dt_chain = _devloop(chain, x, k=8)
    ref = chain(x[:4])

    def rel(prec):
        out = ops.fused_melspectrogram(x[:4], fb, 400, 160,
                                       precision=prec)
        return float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))

    emit("7:whisper-fft400", ms_per_iter=round(dt6 * 1e3, 2),
         frames_per_sec=round(32 * n_frames / dt6),
         split3_ms=round(dt3 * 1e3, 2),
         fast_ms=round(dt_fast * 1e3, 2),
         fwd_bwd_ms=round(dt_bwd6 * 1e3, 2),
         fwd_bwd_split3_ms=round(dt_bwd3 * 1e3, 2),
         xla_chain_ms=round(dt_chain * 1e3, 2),
         parity_rel_db=rel("split6"), parity_rel_db_split3=rel("split3"),
         precision="split6(auto)", timing="device-loop")


CONFIGS = {"1": config1, "2": config2, "3": config3, "4": config4,
           "5": config5, "6": config6, "7": config7}

if __name__ == "__main__":
    picks = sys.argv[1:] or list(CONFIGS)
    for k in picks:
        log(f"--- config {k} ---")
        t0 = time.time()
        try:
            CONFIGS[k]()
        except Exception as e:  # report, keep going
            emit(f"{k}:error", error=str(e)[:300])
        log(f"config {k} took {time.time() - t0:.1f}s")
