"""TPU-only checks: fused-kernel parity on real hardware, method
agreement, and gradient sanity — the numerics that CPU tests cannot see
(MXU precision behavior, Mosaic lowering)."""
import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu import ops


def test_fused_kernel_parity_on_device():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 66560)).astype(np.float32))
    fb = ops.create_mel_filter(128, 22050, 0.0, None, 1025)

    out = ops.fused_melspectrogram(x, fb, 2048, 512, to_db=False)
    spec = ops.stft(x, 2048, 512, center=False)
    ref = ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel <= 2e-5, f"fused split3 rel err {rel}"


def test_stft_methods_agree_on_device():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16384)).astype(np.float32))
    a = ops.stft(x, 2048, 512)
    g = ops.stft(x, 2048, 512, method="gemm")
    m = ops.stft(x, 2048, 512, method="matmul",
                 precision=jax.lax.Precision.HIGHEST)
    scale = float(jnp.max(jnp.abs(a)))
    assert float(jnp.max(jnp.abs(a - g))) / scale <= 1e-5
    assert float(jnp.max(jnp.abs(a - m))) / scale <= 1e-5


def test_istft_roundtrip_on_device():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 2, 16384)).astype(np.float32))
    spec = ops.stft(x, 1024, 256)
    y = ops.istft(spec, 256, length=16384)
    assert float(jnp.max(jnp.abs(y - x))) <= 1e-4


def test_fused_gradient_on_device():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 66560)).astype(np.float32))
    fb = ops.create_mel_filter(64, 22050, 0.0, None, 1025)

    g_fused = jax.grad(lambda v: jnp.sum(
        ops.fused_melspectrogram(v, fb, 2048, 512)))(x)

    def chain(v):
        spec = ops.stft(v, 2048, 512, center=False)
        p = ops.complex_norm(spec, 2.0)
        return jnp.sum(ops.amplitude_to_db(ops.apply_filterbank(p, fb),
                                           power=2.0))

    g_ref = jax.grad(chain)(x)
    rel = float(jnp.max(jnp.abs(g_fused - g_ref))
                / (jnp.max(jnp.abs(g_ref)) + 1e-12))
    assert rel <= 1e-4, f"grad rel err {rel}"


def test_resample_and_mfcc_on_device():
    # small p/q and short clips keep the remote compile fast; numerics
    # are pinned by the CPU tests — this checks the TPU lowering runs
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 8192)).astype(np.float32))
    y = ops.resample(x, 16000, 8000)
    assert y.shape == (2, 4096)
    assert bool(jnp.all(jnp.isfinite(y)))

    # use_fused honors center (it used to force center=False); compare
    # both paths at matching semantics
    a = ops.mfcc(x, 16000, 13, 64, 512, 128, center=False)
    b = ops.mfcc(x, 16000, 13, 64, 512, 128, center=False,
                 use_fused=True)
    rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-12))
    assert rel <= 1e-3, f"fused mfcc rel {rel}"


def test_fused_gradient_under_jit_on_device():
    """Regression for the allow-excess-precision bug: jit'd gradients
    must match eager bit-for-bit (the traced-side hi/lo splits must
    survive XLA simplification)."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 66560)).astype(np.float32))
    fb = ops.create_mel_filter(64, 22050, 0.0, None, 1025)
    loss = lambda v, f: jnp.sum(ops.fused_melspectrogram(v, f, 2048, 512))
    ge = jax.grad(loss, argnums=(0, 1))(x, fb)
    gj = jax.jit(jax.grad(loss, argnums=(0, 1)))(x, fb)
    # benign fusion reassociation only — the excess-precision bug showed
    # up as ~2e-3 relative here
    for e, j in zip(ge, gj):
        rel = float(jnp.max(jnp.abs(e - j)) / (jnp.max(jnp.abs(e)) + 1e-30))
        assert rel <= 1e-4, rel


def test_fused_hop160_parity_on_device():
    """Unaligned-hop (10 ms ASR) fused path on real hardware (auto →
    split6 at this bins/mel ratio — parity-budget tolerance)."""
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 48000)).astype(np.float32))
    fb = ops.create_mel_filter(64, 16000, 0.0, None, 257)
    out = ops.fused_melspectrogram(x, fb, 512, 160)
    spec = ops.stft(x, 512, 160, center=False)
    ref = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb), power=2.0)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel <= 1e-4, f"hop160 rel err {rel}"


def test_fused_fft400_whisper_parity_on_device():
    """Non-128-multiple fft (Whisper's 400/160) pads the frame axis to
    512 inside the kernel; forward + grads vs the XLA chain.  The
    default precision here resolves to split6 (2.5 bins/mel), which
    closes round 2's small-fft dB tails — tolerance is back at the
    1e-4 parity budget.  The input is scaled x10 away from the amin
    clamp so the comparison measures kernel numerics, not clamp-edge
    gate semantics."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(10.0 * rng.standard_normal((2, 48000))
                    .astype(np.float32))
    fb = ops.create_mel_filter(80, 16000, 0.0, None, 201)
    assert ops.resolve_precision("auto", 400, 80) == "split6"
    out = ops.fused_melspectrogram(x, fb, 400, 160)
    spec = ops.stft(x, 400, 160, center=False)
    ref = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb), power=2.0)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel <= 1e-4, f"fft400 fwd rel err {rel}"

    gx = jax.grad(lambda v: jnp.sum(
        ops.fused_melspectrogram(v, fb, 400, 160)))(x)
    rx = jax.grad(lambda v: jnp.sum(ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(
            ops.stft(v, 400, 160, center=False), 2.0), fb),
        power=2.0)))(x)
    rel_g = float(jnp.max(jnp.abs(gx - rx)) / jnp.max(jnp.abs(rx)))
    assert rel_g <= 1e-4, f"fft400 grad rel err {rel_g}"

    # explicit split3 stays honored-as-requested (its documented tails)
    out3 = ops.fused_melspectrogram(x, fb, 400, 160, precision="split3")
    rel3 = float(jnp.max(jnp.abs(out3 - ref)) / jnp.max(jnp.abs(ref)))
    assert rel3 <= 1e-3, f"fft400 split3 rel err {rel3}"


def test_fused_silence_zero_grads_on_device():
    """amin-clamped outputs must give exactly zero gradients (the
    exp∘log gate round-trip regression)."""
    xz = jnp.zeros((1, 4096), jnp.float32)
    fb = ops.create_mel_filter(32, 16000, 0.0, None, 257)
    gx, gf = jax.grad(lambda v, f: jnp.sum(
        ops.fused_melspectrogram(v, f, 512, 128)), argnums=(0, 1))(xz, fb)
    assert float(jnp.max(jnp.abs(gx))) == 0.0
    assert float(jnp.max(jnp.abs(gf))) == 0.0


def test_griffin_lim_on_device():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 8192)).astype(np.float32))
    mag = jnp.abs(ops.stft(x, 512, 128))
    y = ops.griffin_lim(mag, 512, 128, n_iter=8, length=8192,
                        method="matmul")
    assert y.shape == (1, 8192)
    assert bool(jnp.all(jnp.isfinite(y)))
    # reconstruction actually locks onto the target magnitude
    mag_y = jnp.abs(ops.stft(y, 512, 128))
    err = float(jnp.linalg.norm(mag_y - mag) / jnp.linalg.norm(mag))
    assert err <= 0.5, err


def test_pitch_shift_on_device():
    rng = np.random.default_rng(8)
    t = jnp.arange(16384, dtype=jnp.float32) / 16000.0
    x = jnp.sin(2 * jnp.pi * 440.0 * t)[None, :]
    y = ops.pitch_shift(x, 16000, 12.0)          # one octave up
    assert y.shape == x.shape
    spec = jnp.abs(ops.stft(y, 2048, 512))
    peak = int(jnp.argmax(jnp.mean(spec[0], axis=-1)))
    want = round(880.0 * 2048 / 16000)
    assert abs(peak - want) <= 3, (peak, want)


def test_streaming_stft_on_device():
    from torchaudio_contrib_tpu import parallel as par
    rng = np.random.default_rng(9)
    fft_length, hop, k = 512, 128, 16
    stream = par.StreamingSTFT(fft_length, hop)
    x = jnp.asarray(rng.standard_normal(
        (2, stream.carry_len + hop * k * 4)).astype(np.float32))
    ref = ops.stft(x, fft_length, hop, center=False)
    state = stream.init_state((2,))
    state = state.at[..., :].set(x[..., :stream.carry_len])
    specs, pos = [], stream.carry_len
    while pos + hop * k <= x.shape[-1]:
        state, s = stream.process(state, x[..., pos:pos + hop * k])
        specs.append(s)
        pos += hop * k
    got = jnp.concatenate(specs, axis=-1)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err <= 1e-4, err


def test_corpus_preprocessor_on_device():
    """Miniature corpus run on the real chip: int16 wire + fused kernel,
    single-device mesh, fault tolerance intact."""
    from jax.sharding import Mesh
    from torchaudio_contrib_tpu import parallel as par

    rng = np.random.default_rng(10)
    sr = 16000
    clips = {i: rng.standard_normal((1, sr)).astype(np.float32)
             for i in range(8)}

    def loader(i):
        if i == 3:
            raise IOError("synthetic decode failure")
        return clips[i]

    outs = {}
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                axis_names=("data", "model"))
    pre = par.CorpusPreprocessor(
        loader, clip_samples=sr, batch_size=4, retries=0, mesh=mesh,
        use_fused=True, wire_format="int16",
        sink=lambda i, m: outs.__setitem__(i, np.asarray(m)),
        fft_length=512, hop_length=128, num_mels=64, sample_rate=sr)
    stats = pre.run(range(8))
    assert stats.files_done == 7 and stats.files_failed == 1
    assert 3 not in outs and len(outs) == 7

    spec = ops.stft(jnp.asarray(clips[0]), 512, 128, center=False)
    fb = ops.create_mel_filter(64, sr, 0.0, None, 257)
    ref = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb), power=2.0)
    # int16 wire + 'fast' bf16 kernel precision: dB-domain tolerance
    # (~0.25 dB worst-case on low-energy bins; guards gross corruption)
    np.testing.assert_allclose(outs[0], np.asarray(ref), atol=0.5)


def test_corpus_mulaw8_wire_on_device():
    """μ-law uint8 wire (quarter bytes) decodes on the real chip; mel
    output within μ-law (~38 dB SNR) tolerance of the exact chain."""
    from jax.sharding import Mesh
    from torchaudio_contrib_tpu import parallel as par

    rng = np.random.default_rng(11)
    sr = 16000
    clips = {i: rng.standard_normal((1, sr)).astype(np.float32)
             for i in range(4)}
    outs = {}
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                axis_names=("data", "model"))
    pre = par.CorpusPreprocessor(
        lambda i: clips[i], clip_samples=sr, batch_size=4, mesh=mesh,
        use_fused=True, wire_format="mulaw8", to_db=False,
        sink=lambda i, m: outs.__setitem__(i, np.asarray(m)),
        fft_length=512, hop_length=128, num_mels=64, sample_rate=sr)
    stats = pre.run(range(4))
    assert stats.files_done == 4
    spec = ops.stft(jnp.asarray(clips[1]), 512, 128, center=False)
    fb = ops.create_mel_filter(64, sr, 0.0, None, 257)
    ref = np.asarray(ops.apply_filterbank(ops.complex_norm(spec, 2.0),
                                          fb))
    rel = np.max(np.abs(outs[1] - ref)) / np.max(ref)
    assert rel <= 3e-2, rel


def test_deltas_and_emphasis_on_device():
    """compute_deltas conv + the associative-scan de-emphasis IIR lower
    and run on the chip; round-trip holds."""
    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 32768)).astype(np.float32))
    y = ops.deemphasis(ops.preemphasis(x, 0.97), 0.97)
    err = float(jnp.max(jnp.abs(y - x)))
    assert err <= 1e-3, err
    m = jnp.asarray(rng.standard_normal((2, 13, 256)).astype(np.float32))
    d = ops.compute_deltas(m)
    assert d.shape == m.shape
    assert bool(jnp.all(jnp.isfinite(d)))


def test_time_sharded_fused_kernel_on_device():
    """Pallas kernel under shard_map on the real chip (1-device mesh —
    the same composition the corpus/SP paths use on pods; check_vma and
    GSPMD-opacity handling must hold on hardware, not just interpret)."""
    from jax.sharding import Mesh
    from torchaudio_contrib_tpu import parallel as par

    rng = np.random.default_rng(13)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1,),
                axis_names=("data",))
    hop, fft = 128, 512
    T = hop * 64
    x = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32))
    got = par.time_sharded_melspectrogram(
        x, mesh, "data", num_mels=32, sample_rate=16000,
        fft_length=fft, hop_length=hop, use_fused=True)
    spec = ops.stft(x, fft, hop, center=False)
    fb = ops.create_mel_filter(32, 16000, 0.0, None, fft // 2 + 1)
    ref = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb), power=2.0)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel <= 5e-4, rel


def test_griffin_lim_pallas_on_device():
    """method='pallas' (one fused, frequency-tiled kernel per
    projection) matches the matmul loop's convergence class."""
    rng = np.random.default_rng(14)
    x = jnp.asarray(rng.standard_normal((2, 22050)).astype(np.float32))
    mag = jnp.abs(ops.stft(x, 1024, 256))
    y = ops.griffin_lim(mag, 1024, 256, n_iter=16, length=22050,
                        method="pallas")
    assert y.shape == (2, 22050)
    mg = jnp.abs(ops.stft(y, 1024, 256))
    sc = float(jnp.linalg.norm(mg - mag) / jnp.linalg.norm(mag))
    assert sc <= 0.3, sc


def test_griffin_lim_pallas_fft2048_on_device():
    """fft=2048 (the most common vocoder config) runs the kernel now —
    the frequency-tiled grid keeps only one basis tile resident — and
    key= random phase init stays on the kernel path."""
    rng = np.random.default_rng(15)
    x = jnp.asarray(rng.standard_normal((2, 22050)).astype(np.float32))
    mag = jnp.abs(ops.stft(x, 2048, 512))
    n_frames = mag.shape[-1]
    assert ops.fused_gl_supported(2048, 512, n_frames)
    y = ops.griffin_lim(mag, 2048, 512, n_iter=16, length=22050,
                        method="pallas", key=jax.random.PRNGKey(2))
    assert y.shape == (2, 22050)
    mg = jnp.abs(ops.stft(y, 2048, 512))
    sc = float(jnp.linalg.norm(mg - mag) / jnp.linalg.norm(mag))
    assert sc <= 0.35, sc


def test_fused_split6_on_device():
    """split6 at a dense-mel big-fft config compiles and holds f32-grade
    parity on hardware (the tier is mostly exercised at small ffts by
    the Whisper test; this pins the 3-way-split GEMM lowering at
    fft=1024 where the concat operands are widest)."""
    rng = np.random.default_rng(16)
    x = jnp.asarray(rng.standard_normal((2, 33280)).astype(np.float32))
    fb = ops.create_mel_filter(128, 22050, 0.0, None, 513)
    out = ops.fused_melspectrogram(x, fb, 1024, 256, precision="split6")
    spec = ops.stft(x, 1024, 256, center=False)
    ref = ops.amplitude_to_db(
        ops.apply_filterbank(ops.complex_norm(spec, 2.0), fb), power=2.0)
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert rel <= 1e-4, f"split6 fft1024 rel err {rel}"


def test_iir_scan_on_device():
    """The associative-scan IIR lowers correctly on TPU: biquad parity
    vs the CPU-verified scipy math, and the order-4 companion-matrix
    scan path (einsum-of-2x2s under associative_scan)."""
    from torchaudio_contrib_tpu.ops import iir
    import scipy.signal as sps
    rng = np.random.default_rng(20)
    x = jnp.asarray(rng.standard_normal((4, 32768)).astype(np.float32))
    # order-2 path: RBJ lowpass vs the float64 scipy recurrence
    y = iir.lowpass_biquad(x, 16000, 2000)
    b2, a2 = iir._rbj("lowpass", 16000, 2000, 0.707)
    ref2 = sps.lfilter(np.asarray(b2) / a2[0], np.asarray(a2) / a2[0],
                       np.asarray(x, np.float64), axis=-1)
    rel = float(jnp.max(jnp.abs(y - jnp.asarray(ref2, jnp.float32)))
                / np.max(np.abs(ref2)))
    assert rel <= 1e-3, f"biquad rel err {rel}"
    # order-4 companion-matrix scan path
    b4, a4 = sps.butter(4, 0.2)
    y4 = iir.lfilter(x[:1, :4096], a4, b4)
    ref = sps.lfilter(b4, a4, np.asarray(x[:1, :4096], np.float64),
                      axis=-1)
    assert float(jnp.max(jnp.abs(y4 - jnp.asarray(ref,
                                                  jnp.float32)))) <= 1e-3


def test_loudness_on_device():
    """BS.1770 loudness on hardware: the reference sine measures
    -3.01 LKFS and gating stays shape-static under jit."""
    import importlib
    L = importlib.import_module("torchaudio_contrib_tpu.ops.loudness")
    sr = 48000
    t = np.arange(sr * 2) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 997 * t).astype(np.float32))
    lk = float(jax.jit(lambda w: L.loudness(w, sr))(x[None, None, :])[0])
    assert abs(lk - (-3.01)) < 0.1, lk


def test_cqt_and_chroma_on_device():
    """CQT spectral-kernel GEMM + chroma projection on the MXU: a 440 Hz
    tone lands on the right CQT bin and pitch class."""
    import importlib
    C = importlib.import_module("torchaudio_contrib_tpu.ops.cqt")
    from torchaudio_contrib_tpu.ops import chroma as CH
    sr = 22050
    t = np.arange(sr) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 440.0 * t).astype(np.float32))
    o = C.cqt(x[None], sr, n_bins=36, f_min=110.0, fft_length=4096)
    bin_idx = int(jnp.argmax(jnp.mean(o[0, :, 10:30], axis=-1)))
    assert bin_idx == 24, bin_idx     # 440 = 110·2^(24/12)
    fb = CH.create_chroma_filter(12, sr, 1025)
    mag = ops.complex_norm(ops.stft(x[None], 2048, 512))
    ch = ops.apply_filterbank(mag, fb)
    assert int(jnp.argmax(jnp.mean(ch[0], axis=-1))) == 9


def test_pitch_and_cmn_on_device():
    """FFT-batched NCCF pitch detector + cumsum CMN on hardware."""
    from torchaudio_contrib_tpu.ops import pitchdetect as P
    from torchaudio_contrib_tpu.ops import effects as E
    sr = 22050
    t = np.arange(sr) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 220.0 * t).astype(np.float32))
    est = P.detect_pitch_frequency(x[None], sr)
    med = float(jnp.median(est))
    assert abs(med - 220.0) < 5.0, med
    rng = np.random.default_rng(21)
    s = jnp.asarray(rng.standard_normal((2, 13, 300)).astype(np.float32))
    out = E.sliding_window_cmn(s, 100, 50, center=True, norm_vars=True)
    assert abs(float(jnp.mean(out))) < 0.1


def test_modfx_and_vad_on_device():
    """SoX effects (gather-unrolled phaser, scan flanger) and the VAD
    measure/trigger chain lower and run on hardware."""
    import importlib
    from torchaudio_contrib_tpu.ops import modfx as M
    V = importlib.import_module("torchaudio_contrib_tpu.ops.vad")
    sr = 16000
    rng = np.random.default_rng(30)
    x = jnp.asarray((0.3 * rng.standard_normal((2, sr)))
                    .astype(np.float32))
    ph = M.phaser(x, sr)
    fl = M.flanger(x, sr, depth=2.0, regen=30.0)
    od = M.overdrive(x)
    assert np.isfinite(float(jnp.sum(ph + fl + od)))
    # CPU-vs-device parity for the parallel phaser path
    import jax as _jax
    cpu = _jax.devices("cpu")
    if cpu:
        with _jax.default_device(cpu[0]):
            ph_cpu = M.phaser(jnp.asarray(np.asarray(x)), sr)
        rel = (float(jnp.max(jnp.abs(ph - jnp.asarray(np.asarray(ph_cpu)))))
               / float(jnp.max(jnp.abs(ph))))
        assert rel <= 1e-4, rel

    t = np.arange(int(1.5 * sr)) / sr
    harm = sum(np.sin(2 * np.pi * 120.0 * k * t) / k
               for k in range(1, 9))
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t - np.pi / 2))
    sp = (0.3 * env * harm).astype(np.float32)
    clip = jnp.asarray(np.concatenate(
        [np.zeros(sr, np.float32), sp]))[None]
    on = int(jax.jit(lambda w: V.vad_onset(w, sr))(clip)[0])
    assert 0.8 * sr <= on <= 1.5 * sr, on / sr


def test_beamforming_on_device():
    """Batched complex C×C solves + MVDR einsums on TPU; only real
    scalars are fetched (complex device→host is UNIMPLEMENTED on axon).
    """
    from torchaudio_contrib_tpu.ops import beamform as bf
    rng = np.random.default_rng(31)
    src = rng.standard_normal(16384).astype(np.float32)
    gains = np.array([1.0, 0.8, 0.9, 0.7], np.float32)
    clean = gains[:, None] * src
    noise = (0.7 * rng.standard_normal((4, 16384))).astype(np.float32)
    mix = jnp.asarray(clean + noise)

    def pipeline(m, c, n):
        spec = ops.stft(m, 512, 128)
        s_spec = ops.stft(c, 512, 128)
        n_spec = ops.stft(n, 512, 128)
        w = bf.mvdr_weights_souden(bf.psd(s_spec), bf.psd(n_spec))
        y = bf.apply_beamforming(w, spec)
        ref = s_spec[0]
        e_bf = jnp.sum(jnp.abs(y - ref) ** 2)
        e_raw = jnp.sum(jnp.abs(spec[0] - ref) ** 2)
        return jnp.stack([e_bf, e_raw, jnp.sum(jnp.abs(ref) ** 2)])

    out = np.asarray(jax.jit(pipeline)(
        mix, jnp.asarray(clean), jnp.asarray(noise)))
    snr_bf = 10 * np.log10(out[2] / out[0])
    snr_raw = 10 * np.log10(out[2] / out[1])
    assert snr_bf > snr_raw + 3.0, (snr_bf, snr_raw)


def test_asr_ops_on_device():
    """forced_align / rnnt_loss / edit_distance_batched on real TPU:
    integer outputs exact, losses vs float64 NumPy DP."""
    from torchaudio_contrib_tpu.ops import (forced_align, rnnt_loss,
                                            edit_distance_batched)
    rng = np.random.default_rng(40)
    # peaked emissions align exactly
    frames = [0, 1, 1, 0, 2, 2, 0, 0, 3, 0]
    logits = rng.standard_normal((10, 5))
    for i, k in enumerate(frames):
        logits[i, k] += 6.0
    lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    a, s = forced_align(jnp.asarray(lp, jnp.float32)[None],
                        jnp.asarray([[1, 2, 3]], jnp.int32))
    assert np.asarray(a)[0].tolist() == frames

    # rnnt_loss vs float64 alpha DP
    t_max, u_max, c = 8, 3, 5
    lp4 = rng.standard_normal((t_max, u_max + 1, c))
    lp4 = lp4 - np.log(np.exp(lp4).sum(-1, keepdims=True))
    tgt = rng.integers(1, c, u_max)
    alpha = np.full((t_max, u_max + 1), -np.inf)
    alpha[0, 0] = 0.0
    for t in range(t_max):
        for u in range(u_max + 1):
            cands = []
            if t > 0:
                cands.append(alpha[t - 1, u] + lp4[t - 1, u, 0])
            if u > 0:
                cands.append(alpha[t, u - 1] + lp4[t, u - 1, tgt[u - 1]])
            if cands:
                alpha[t, u] = max(alpha[t, u], np.logaddexp.reduce(cands))
    exp = -(alpha[-1, -1] + lp4[-1, -1, 0])
    got = rnnt_loss(jnp.asarray(lp4, jnp.float32)[None],
                    jnp.asarray(tgt, jnp.int32)[None], blank=0,
                    reduction="none", fused_log_softmax=False)
    np.testing.assert_allclose(float(got[0]), exp, rtol=1e-4)

    d = edit_distance_batched(jnp.asarray([[1, 2, 3, 4]]),
                              jnp.asarray([[1, 3, 3, 5]]))
    assert int(d[0]) == 2


def test_kaldi_features_on_device():
    """compliance.kaldi fbank/mfcc on TPU vs the float64 NumPy recipe
    (same oracle as tests/test_kaldi.py, spot values)."""
    from torchaudio_contrib_tpu.compliance import kaldi
    rng = np.random.default_rng(41)
    t = np.arange(4000) / 16000.0
    wave = (0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.1 * rng.standard_normal(4000)).astype(np.float32)

    fb = np.asarray(kaldi.fbank(jnp.asarray(wave)))
    mf = np.asarray(kaldi.mfcc(jnp.asarray(wave)))
    assert fb.shape == (23, 23) and mf.shape == (23, 13)

    # float64 oracle (vectorized but independent order of operations)
    window, shift, padded = 400, 160, 512
    m = 1 + (4000 - window) // shift
    idx = np.arange(m)[:, None] * shift + np.arange(window)
    fr = wave.astype(np.float64)[idx]
    fr -= fr.mean(-1, keepdims=True)
    pre = np.concatenate([fr[:, :1] * (1 - 0.97),
                          fr[:, 1:] - 0.97 * fr[:, :-1]], -1)
    k = np.arange(window)
    w = (0.5 - 0.5 * np.cos(2 * np.pi * k / (window - 1))) ** 0.85
    fr = np.pad(pre * w, ((0, 0), (0, padded - window)))
    power = np.abs(np.fft.rfft(fr)) ** 2
    mel = lambda f: 1127.0 * np.log(1.0 + np.asarray(f) / 700.0)
    delta = (mel(8000.0) - mel(20.0)) / 24
    edges = mel(20.0) + np.arange(25) * delta
    bins = mel(np.arange(256) * 16000.0 / padded)
    up = (bins[None] - edges[:23, None]) / delta
    down = (edges[2:, None] - bins[None]) / delta
    banks = np.maximum(0, np.minimum(up, down))
    eps = float(np.finfo(np.float32).eps)
    exp_fb = np.log(np.maximum(power[:, :256] @ banks.T, eps))
    np.testing.assert_allclose(fb, exp_fb, atol=5e-3)


def test_asr_models_on_device():
    """Conformer / Wav2Letter / ConvTasNet forward+loss on real TPU:
    finite outputs, one jitted step each, grads finite."""
    from torchaudio_contrib_tpu.models.conformer import Conformer
    from torchaudio_contrib_tpu.models.asr import Wav2Letter
    from torchaudio_contrib_tpu.models.tasnet import ConvTasNet
    from torchaudio_contrib_tpu.ops import ctc_loss, si_snr
    rng = np.random.default_rng(50)

    enc = Conformer(input_dim=80, d_model=64, num_layers=2,
                    num_heads=4, conv_kernel=15)
    p = enc.init(jax.random.PRNGKey(0))
    feats = jnp.asarray(rng.standard_normal((4, 50, 80)), jnp.float32)
    tgt = jnp.asarray(rng.integers(1, 30, (4, 8)), jnp.int32)
    head = 0.05 * jax.random.normal(jax.random.PRNGKey(1), (64, 30))

    def conf_loss(pp):
        lp = jax.nn.log_softmax(enc.apply(pp["e"], feats) @ pp["h"], -1)
        return ctc_loss(lp, tgt)

    state = {"e": p, "h": head}
    l, g = jax.jit(lambda s: (conf_loss(s),
                              jax.grad(conf_loss)(s)))(state)
    assert np.isfinite(float(l))
    gmax = max(float(jnp.max(jnp.abs(v)))
               for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gmax) and gmax > 0

    w2l = Wav2Letter(num_classes=20)
    wp = w2l.init(jax.random.PRNGKey(2))
    y = jax.jit(w2l.apply)(wp, jnp.asarray(
        rng.standard_normal((2, 16000)) * 0.1, jnp.float32))
    assert y.shape == (2, 50, 20)
    assert bool(jnp.all(jnp.isfinite(y)))

    net = ConvTasNet(num_sources=2, enc_kernel=16, enc_filters=64,
                     bottleneck=32, hidden=64, num_blocks=4,
                     num_repeats=2)
    tp = net.init(jax.random.PRNGKey(3))
    mix = jnp.asarray(rng.standard_normal((2, 8000)) * 0.1, jnp.float32)
    est = jax.jit(net.apply)(tp, mix)
    assert est.shape == (2, 2, 8000)
    s = si_snr(est, jnp.stack([mix, mix], 1))
    assert bool(jnp.all(jnp.isfinite(s)))


def test_hifigan_and_dsp_on_device():
    """HiFi-GAN vocoder fwd+bwd and the DSP synthesis ops on real
    TPU: shapes, finite values, gradients flow.

    Runs at matmul precision HIGHEST: the filter_waveform check
    compares a device conv against a float64 NumPy oracle at atol
    2e-4, which the default bf16 MXU pass legitimately misses
    (measured 2.4e-2 abs at default precision, round 4)."""
    from torchaudio_contrib_tpu.models.hifigan import HiFiGANVocoder
    from torchaudio_contrib_tpu.ops import dsp
    rng = np.random.default_rng(60)
    with jax.default_matmul_precision("highest"):

        net = HiFiGANVocoder(in_channels=16, upsample_rates=(8, 4),
                             upsample_kernel_sizes=(16, 8),
                             upsample_initial_channel=64,
                             resblock_kernel_sizes=(3, 5),
                             resblock_dilation_sizes=((1, 3), (1, 2)))
        p = net.init(jax.random.PRNGKey(0))
        mel = jnp.asarray(rng.standard_normal((2, 16, 20)), jnp.float32)
        out = jax.jit(net.apply)(p, mel)
        assert out.shape == (2, 1, 20 * 32)
        assert bool(jnp.all(jnp.isfinite(out)))
        g = jax.jit(jax.grad(
            lambda q: jnp.sum(net.apply(q, mel) ** 2)))(p)
        gmax = max(float(jnp.max(jnp.abs(v)))
                   for v in jax.tree_util.tree_leaves(g))
        assert np.isfinite(gmax) and gmax > 0

        # oscillator bank matches the CPU float64 oracle on device
        freq = rng.uniform(100, 3000, (128, 4))
        amp = rng.uniform(0.1, 1.0, (128, 4))
        got = jax.jit(lambda f, a: dsp.oscillator_bank(f, a, 16000.0))(
            jnp.asarray(freq, jnp.float32), jnp.asarray(amp, jnp.float32))
        phase = 2 * np.pi * np.cumsum(freq / 16000.0, axis=0)
        ref = (amp * np.sin(phase)).sum(-1)
        np.testing.assert_allclose(np.asarray(got), ref, atol=5e-3)

        # time-varying FIR: constant kernel == plain convolution
        x = rng.standard_normal(512)
        k = rng.standard_normal(9)
        got = jax.jit(dsp.filter_waveform)(
            jnp.asarray(x, jnp.float32),
            jnp.asarray(np.tile(k, (4, 1)), jnp.float32))
        ref = np.convolve(x, k, mode="full")[4:][:512]
        np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


def test_sox_chain_and_slaney_mel_on_device():
    """A sox effect chain end-to-end on TPU + Slaney-mel parity
    against the float64 filterbank construction."""
    from torchaudio_contrib_tpu import sox_effects as SE
    from torchaudio_contrib_tpu import ops
    rng = np.random.default_rng(61)
    t = np.arange(8000) / 16000.0
    tone = jnp.asarray(0.4 * np.sin(2 * np.pi * 440 * t),
                       jnp.float32)[None]
    out, sr = SE.apply_effects_tensor(
        tone, 16000,
        [["gain", "-3"], ["lowpass", "2k"], ["rate", "8k"],
         ["fade", "q", "0.05"]])
    assert sr == 8000 and out.shape[-1] == 4000
    assert bool(jnp.all(jnp.isfinite(out)))
    # dominant frequency preserved through the chain
    spec = np.abs(np.fft.rfft(np.asarray(out[0])))
    f = np.fft.rfftfreq(4000, 1 / 8000)
    assert abs(f[spec.argmax()] - 440.0) < 10.0

    fb = ops.create_mel_filter(64, 16000, 0.0, 8000.0, 257,
                               mel_scale="slaney", norm="slaney")
    mag = jnp.asarray(rng.random((257, 40)), jnp.float32)
    mel = jax.jit(ops.apply_filterbank)(mag, fb)
    ref = np.asarray(mag, np.float64) .T @ np.asarray(fb, np.float64)
    np.testing.assert_allclose(np.asarray(mel), ref.T, atol=1e-4)
