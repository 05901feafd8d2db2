"""Sharding + streaming tests on the 8-virtual-device CPU mesh
(SURVEY.md §4(d): the standard way to test GSPMD without a pod)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu import ops
from torchaudio_contrib_tpu import parallel as par


def test_mesh_shapes():
    mesh = par.make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh2 = par.make_mesh(n_data=4, n_model=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2
    with pytest.raises(ValueError):
        par.make_mesh(n_data=3, n_model=2)


def test_data_parallel_melspec_matches_local(rng):
    mesh = par.make_mesh()
    mel = tac.Melspectrogram(num_mels=64, fft_length=512, hop_length=128,
                             sample_rate=16000)
    x = rng.standard_normal((16, 1, 8000)).astype(np.float32)
    out_dp = par.data_parallel(mel, mesh)(jnp.asarray(x))
    out_local = mel(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_dp), np.asarray(out_local),
                               rtol=1e-5, atol=1e-6)
    # batch axis actually sharded over the mesh
    assert len(out_dp.sharding.device_set) == 8


def test_shard_batch_placement(rng):
    mesh = par.make_mesh()
    x = par.shard_batch(jnp.asarray(rng.standard_normal((8, 100))
                                    .astype(np.float32)), mesh)
    assert len(x.sharding.device_set) == 8


def test_streaming_stft_matches_oneshot(rng):
    """Chunked STFT with overlap carry == one-shot center=False STFT."""
    fft_length, hop, k = 256, 64, 8
    stream = par.StreamingSTFT(fft_length, hop)
    x = rng.standard_normal((2, stream.carry_len + hop * k * 5)) \
        .astype(np.float32)
    xj = jnp.asarray(x)

    ref = ops.stft(xj, fft_length, hop, center=False)

    state = stream.init_state((2,))
    state = state.at[..., :].set(xj[..., :stream.carry_len])
    specs = []
    pos = stream.carry_len
    while pos + hop * k <= x.shape[-1]:
        state, s = stream.process(state, xj[..., pos:pos + hop * k])
        specs.append(s)
        pos += hop * k
    got = jnp.concatenate(specs, axis=-1)
    assert got.shape == ref.shape
    err = np.max(np.abs(np.asarray(got - ref)))
    assert err <= 1e-5, err


def test_streaming_chunk_validation():
    stream = par.StreamingSTFT(256, 64)
    with pytest.raises(ValueError):
        stream.process(stream.init_state(), jnp.zeros(100))
    with pytest.raises(ValueError):
        par.StreamingSTFT(256, 512)


def test_chunked_melspectrogram_matches_oneshot(rng):
    """30 s-clip pipeline (BASELINE config 5 core): scan-chunked log-mel
    equals the one-shot computation."""
    sr, fft_length, hop, mels = 22050, 2048, 512, 128
    x = rng.standard_normal((2, 1, sr * 3)).astype(np.float32)
    xj = jnp.asarray(x)

    got = par.chunked_melspectrogram(
        xj, fft_length, hop, mels, sr, frames_per_chunk=16)

    spec = ops.stft(xj, fft_length, hop, center=False)
    fb = ops.create_mel_filter(mels, sr, 0.0, None, fft_length // 2 + 1)
    ref = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb), power=2.0)

    n = got.shape[-1]
    assert abs(ref.shape[-1] - n) <= 16  # scan drops the ragged tail chunk
    err = np.max(np.abs(np.asarray(got) - np.asarray(ref[..., :n])))
    assert err <= 1e-3, err


def test_corpus_preprocessor_fault_tolerance(rng):
    """Bad files are retried then skipped; shard completes (SURVEY §5)."""
    sr = 16000
    clips = {i: rng.standard_normal((1, sr)).astype(np.float32)
             for i in range(20)}

    calls = {"n": 0}

    def loader(i):
        calls["n"] += 1
        if i == 7:
            raise IOError("synthetic decode failure")
        if i == 13 and calls.setdefault(f"first13", True):
            calls["first13"] = False
            raise IOError("transient failure")  # succeeds on retry
        return clips[i]

    outs = {}
    pre = par.CorpusPreprocessor(
        loader, clip_samples=sr, batch_size=8, retries=1,
        sink=lambda i, m: outs.__setitem__(i, m.shape),
        fft_length=512, hop_length=128, num_mels=64, sample_rate=sr,
        frames_per_chunk=16)
    stats = pre.run(range(20))
    assert stats.files_failed == 1
    assert stats.files_done == 19
    assert len(outs) == 19 and 7 not in outs
    assert stats.frames_per_sec > 0


def test_corpus_prefetch_workers(rng):
    """Threaded loader path produces the same set of outputs."""
    sr = 8000
    clips = {i: rng.standard_normal((1, sr)).astype(np.float32)
             for i in range(24)}

    def loader(i):
        if i == 5:
            raise IOError("bad file")
        return clips[i]

    outs = {}
    pre = par.CorpusPreprocessor(
        loader, clip_samples=sr, batch_size=8, retries=0, num_workers=4,
        sink=lambda i, m: outs.__setitem__(i, True),
        fft_length=512, hop_length=128, num_mels=32, sample_rate=sr,
        frames_per_chunk=8)
    stats = pre.run(range(24))
    assert stats.files_failed == 1
    assert stats.files_done == 23
    assert len(outs) == 23 and 5 not in outs


def test_corpus_use_fused(rng):
    """Fused-kernel corpus path (falls back to the XLA chain on CPU)."""
    sr = 8000
    clips = {i: rng.standard_normal((1, sr)).astype(np.float32)
             for i in range(8)}
    shapes = {}
    pre = par.CorpusPreprocessor(
        lambda i: clips[i], clip_samples=sr, batch_size=8, use_fused=True,
        sink=lambda i, m: shapes.__setitem__(i, m.shape),
        fft_length=512, hop_length=128, num_mels=32, sample_rate=sr)
    stats = pre.run(range(8))
    assert stats.files_done == 8
    n_frames = 1 + (sr - 512) // 128
    assert all(s == (1, 32, n_frames) for s in shapes.values())


def test_make_pod_mesh_single_host():
    mesh = par.make_pod_mesh(n_model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    par.initialize_multihost(num_processes=1)  # no-op path


def test_corpus_use_fused_sharded(rng):
    """use_fused on a multi-device mesh runs under shard_map (pallas is
    GSPMD-opaque); on the CPU test mesh the per-shard fallback chain runs
    and results must match the unsharded path."""
    sr = 8000
    clips = {i: rng.standard_normal((1, sr)).astype(np.float32)
             for i in range(16)}
    outs = {}
    pre = par.CorpusPreprocessor(
        lambda i: clips[i], clip_samples=sr, batch_size=16,
        mesh=par.make_mesh(), use_fused=True,
        sink=lambda i, m: outs.__setitem__(i, np.asarray(m)),
        fft_length=512, hop_length=128, num_mels=32, sample_rate=sr)
    stats = pre.run(range(16))
    assert stats.files_done == 16

    # reference: unsharded single-device path
    from torchaudio_contrib_tpu import ops
    x0 = jnp.asarray(clips[3])
    spec = ops.stft(x0, 512, 128, center=False)
    fb = ops.create_mel_filter(32, sr, 0.0, None, 257)
    ref = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb), power=2.0)
    np.testing.assert_allclose(outs[3], np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_data_parallel_fused_layer(rng):
    """data_parallel keeps FusedMelspectrogram partitioned via shard_map."""
    mesh = par.make_mesh()
    layer = tac.FusedMelspectrogram(num_mels=32, sample_rate=16000,
                                    fft_length=512, hop_length=128)
    x = rng.standard_normal((16, 1, 8000)).astype(np.float32)
    out_dp = par.data_parallel(layer, mesh)(jnp.asarray(x))
    out_local = layer(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_dp), np.asarray(out_local),
                               rtol=1e-5, atol=1e-5)
    assert len(out_dp.sharding.device_set) == 8


def test_dryrun_multichip_hermetic_cpu():
    """Regression for the round-1 driver failure: dryrun_multichip must
    never initialize a non-CPU backend, even when the ambient environment
    points JAX at the axon TPU (a TPU-side fault like a libtpu version
    skew must not be able to fail the sharding dry run)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)  # keep the ambient JAX_PLATFORMS as-is
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(8)\n"
        "from jax._src import xla_bridge\n"
        "plats = sorted(xla_bridge._backends)\n"
        "assert plats == ['cpu'], f'non-CPU backend initialized: {plats}'\n"
        "print('HERMETIC_OK')\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], cwd=repo, env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "HERMETIC_OK" in proc.stdout, proc.stdout


def test_sharded_apply(rng):
    mesh = par.make_mesh()
    f = par.sharded_apply(lambda x: x * 2.0, mesh)
    x = jnp.asarray(rng.standard_normal((8, 64)).astype(np.float32))
    out = f(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0)
    assert len(out.sharding.device_set) == 8


def test_corpus_int16_wire_format(rng):
    """int16 wire (peak-normalized, on-device dequant) matches the f32
    pipeline to int16 quantization accuracy."""
    sr = 8000
    clips = {i: (rng.standard_normal((1, sr)) * (0.1 + i)).astype(np.float32)
             for i in range(8)}
    outs16, outs32 = {}, {}
    common = dict(clip_samples=sr, batch_size=8,
                  fft_length=512, hop_length=128, num_mels=32,
                  sample_rate=sr, frames_per_chunk=16)
    pre16 = par.CorpusPreprocessor(
        lambda i: clips[i], wire_format="int16", prefetch_batches=3,
        sink=lambda i, m: outs16.__setitem__(i, np.asarray(m)), **common)
    pre32 = par.CorpusPreprocessor(
        lambda i: clips[i],
        sink=lambda i, m: outs32.__setitem__(i, np.asarray(m)), **common)
    s16 = pre16.run(range(8))
    s32 = pre32.run(range(8))
    assert s16.files_done == 8 and s32.files_done == 8
    for i in range(8):
        # dB-domain comparison: int16 SNR ~96 dB -> tight everywhere the
        # signal is above the amin clamp
        np.testing.assert_allclose(outs16[i], outs32[i], atol=3e-2)


def test_corpus_mulaw8_wire_format(rng):
    """mulaw8 wire (peak-normalized μ-law uint8, on-device expand via the
    library's own codec) quarters the wire bytes; LOSSY by design —
    features must stay within μ-law (~38 dB SNR) tolerance of the f32
    pipeline, and the round-trip must use the exact ops.mulaw inverse."""
    sr = 8000
    clips = {i: (rng.standard_normal((1, sr)) * (0.1 + i)).astype(np.float32)
             for i in range(8)}
    outs8, outs32 = {}, {}
    common = dict(clip_samples=sr, batch_size=8,
                  fft_length=512, hop_length=128, num_mels=32,
                  sample_rate=sr, frames_per_chunk=16, to_db=False)
    pre8 = par.CorpusPreprocessor(
        lambda i: clips[i], wire_format="mulaw8", prefetch_batches=3,
        sink=lambda i, m: outs8.__setitem__(i, np.asarray(m)), **common)
    pre32 = par.CorpusPreprocessor(
        lambda i: clips[i],
        sink=lambda i, m: outs32.__setitem__(i, np.asarray(m)), **common)
    s8 = pre8.run(range(8))
    s32 = pre32.run(range(8))
    assert s8.files_done == 8 and s32.files_done == 8
    for i in range(8):
        # linear-power domain, relative to each clip's peak mel energy:
        # μ-law quantization error is signal-proportional
        scale = np.max(outs32[i])
        err = np.max(np.abs(outs8[i] - outs32[i])) / scale
        assert err <= 2e-2, (i, err)

    # host-side encoder tracks ops.mu_law_encoding; NumPy and XLA libm
    # may round log1p differently by 1 ulp at integer-boundary points,
    # so pin to within one code step (well inside the ~38 dB budget)
    from torchaudio_contrib_tpu import ops as _ops
    x = np.linspace(-1, 1, 513, dtype=np.float32)
    y = np.sign(x) * np.log1p(255.0 * np.abs(x)) / np.log1p(255.0)
    code = ((y + 1.0) / 2.0 * 255.0 + 0.5).astype(np.uint8)
    ref_code = np.asarray(_ops.mu_law_encoding(jnp.asarray(x)))
    assert int(np.max(np.abs(code.astype(np.int32)
                             - ref_code.astype(np.int32)))) <= 1


def test_time_sharded_stft_matches_oneshot(rng):
    """Sequence-parallel STFT: time axis over 8 shards with a ppermute
    halo exchange == one-shot center=False STFT."""
    fft_length, hop = 512, 128
    mesh = par.make_mesh()                       # 8 on 'data'
    T = 8 * hop * 16                             # 16 frames per shard
    x = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
    got = par.time_sharded_stft(x, mesh, "data", fft_length, hop)
    ref = ops.stft(x, fft_length, hop, center=False)
    assert got.shape == ref.shape
    assert len(got.sharding.device_set) == 8
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err <= 1e-5, err


def test_time_sharded_mel_2d_mesh(rng):
    """Time over 'model' while batch stays on 'data' (2-axis mesh)."""
    mesh = par.make_mesh(n_data=4, n_model=2)
    fft_length, hop = 256, 64
    T = 2 * hop * 32
    x = jnp.asarray(rng.standard_normal((4, 1, T)).astype(np.float32))
    got = par.time_sharded_melspectrogram(
        x, mesh, "model", num_mels=32, sample_rate=16000,
        fft_length=fft_length, hop_length=hop)
    spec = ops.stft(x, fft_length, hop, center=False)
    fb = ops.create_mel_filter(32, 16000, 0.0, None, fft_length // 2 + 1)
    ref = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb), power=2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_time_sharded_validation(rng):
    mesh = par.make_mesh()
    x = jnp.zeros((2, 1000), jnp.float32)        # not hop-aligned over 8
    with pytest.raises(ValueError, match="hop-aligned"):
        par.time_sharded_stft(x, mesh, "data", 256, 64)


def test_time_sharded_mel_fused_kernel(rng, monkeypatch):
    """Sequence parallelism x the fused kernel: each shard runs the REAL
    Pallas program (interpret mode) under shard_map after the halo
    exchange — output equals the one-shot XLA chain."""
    monkeypatch.setenv("TAC_FUSED_INTERPRET", "1")
    fft_length, hop = 256, 128
    mesh = par.make_mesh()                       # 8 on 'data'
    T = 8 * hop * 8
    x = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
    got = par.time_sharded_melspectrogram(
        x, mesh, "data", num_mels=32, sample_rate=16000,
        fft_length=fft_length, hop_length=hop, use_fused=True,
        precision="split3")
    spec = ops.stft(x, fft_length, hop, center=False)
    fb = ops.create_mel_filter(32, 16000, 0.0, None, fft_length // 2 + 1)
    ref = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb), power=2.0)
    assert got.shape == ref.shape
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert err <= 5e-5, err


def test_time_sharded_no_recompile(rng):
    """Round-2 verdict weak #4: repeated time_sharded_* calls must hit
    one cached jitted shard_map instead of re-tracing per call."""
    from torchaudio_contrib_tpu.parallel import timeshard

    mesh = par.make_mesh()
    hop, fft_length = 64, 256
    T = 8 * hop * 16
    x = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))

    calls = []
    orig = timeshard._shard_frames

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    timeshard._shard_frames = counting
    timeshard._build_sharded_call.cache_clear()
    try:
        a = par.time_sharded_stft(x, mesh, "data", fft_length, hop)
        n_first = len(calls)
        assert n_first >= 1
        b = par.time_sharded_stft(x + 1.0, mesh, "data", fft_length, hop)
        assert len(calls) == n_first, "second call re-traced"
        # mel config builds its own cache entry, also reused
        m1 = par.time_sharded_melspectrogram(
            x, mesh, "data", num_mels=32, sample_rate=16000,
            fft_length=fft_length, hop_length=hop)
        n_mel = len(calls)
        m2 = par.time_sharded_melspectrogram(
            2.0 * x, mesh, "data", num_mels=32, sample_rate=16000,
            fft_length=fft_length, hop_length=hop)
        assert len(calls) == n_mel, "mel second call re-traced"
    finally:
        timeshard._shard_frames = orig
    assert a.shape == b.shape and m1.shape == m2.shape
