"""compute_kaldi_pitch (`ops/kaldipitch.py`): behavioral pinning of
the Kaldi pitch-tracker algorithm — tone accuracy, chirp tracking,
voicing contrast, scale invariance, batch/jit consistency.  (Bit
parity with Kaldi is not claimable — the binding is unverifiable
here; see the module docstring's provenance note.)"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchaudio_contrib_tpu import compute_kaldi_pitch

SR = 16000


def _tone(freq, seconds=1.0, sr=SR, amp=0.3):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_frame_count_and_shape():
    out = compute_kaldi_pitch(_tone(220, 2.0), SR)
    # 2 s -> 8000 samples at 4 kHz; window 100, shift 40
    assert out.shape == (1 + (8000 - 100) // 40, 2)
    out2 = compute_kaldi_pitch(_tone(220, 2.0), SR, snip_edges=False)
    assert out2.shape == (200, 2)


@pytest.mark.parametrize("freq", [80.0, 120.0, 220.0, 330.0])
def test_tone_pitch_accuracy(freq):
    out = compute_kaldi_pitch(_tone(freq), SR)
    interior = np.asarray(out[10:-10])
    med = float(np.median(interior[:, 1]))
    assert abs(med - freq) / freq < 0.02, (freq, med)
    # voiced: NCCF near 1 on a pure tone
    assert float(np.median(interior[:, 0])) > 0.8


def test_harmonic_rich_tone():
    """f0 recovery with strong harmonics (sawtooth-ish)."""
    t = np.arange(SR) / SR
    f0 = 150.0
    x = sum((0.5 / k) * np.sin(2 * np.pi * k * f0 * t)
            for k in range(1, 5)).astype(np.float32)
    out = compute_kaldi_pitch(x, SR)
    med = float(np.median(np.asarray(out[10:-10, 1])))
    assert abs(med - f0) / f0 < 0.02, med


def test_chirp_tracks_and_is_continuous():
    t = np.arange(SR * 2) / SR
    f = 100.0 + 75.0 * t                       # 100 -> 250 Hz
    phase = 2 * np.pi * np.cumsum(f) / SR
    x = (0.3 * np.sin(phase)).astype(np.float32)
    out = np.asarray(compute_kaldi_pitch(x, SR))
    pitch = out[10:-10, 1]
    # instantaneous frequency at frame centers (10 ms shift)
    centers = (10 + np.arange(pitch.size)) * 0.01 + 0.0125
    expect = 100.0 + 75.0 * centers
    assert np.median(np.abs(pitch - expect) / expect) < 0.03
    # Viterbi smoothness: no octave jumps frame to frame
    assert float(np.abs(np.diff(np.log(pitch))).max()) < 0.2


def test_voicing_contrast():
    rng = np.random.default_rng(0)
    noise = rng.normal(size=SR).astype(np.float32)
    tone = _tone(200.0)
    n_nccf = float(np.median(np.asarray(
        compute_kaldi_pitch(noise, SR))[5:-5, 0]))
    t_nccf = float(np.median(np.asarray(
        compute_kaldi_pitch(tone, SR))[5:-5, 0]))
    assert t_nccf > 0.9 and n_nccf < 0.5


def test_scale_invariance():
    x = _tone(180.0)
    a = np.asarray(compute_kaldi_pitch(x, SR))
    b = np.asarray(compute_kaldi_pitch(x * 1000.0, SR))
    c = np.asarray(compute_kaldi_pitch(x * 1e-3, SR))
    np.testing.assert_allclose(a, b, atol=1e-4)
    np.testing.assert_allclose(a, c, atol=1e-4)


def test_quiet_frames_damped():
    """The ballast damps NCCF where energy is far below average."""
    x = np.concatenate([_tone(200.0, 0.5),
                        _tone(200.0, 0.5, amp=0.003)])
    out = np.asarray(compute_kaldi_pitch(x, SR))
    loud = out[5:40, 0]
    quiet = out[60:-5, 0]
    assert float(np.median(loud)) > 0.9
    # reported NCCF stays high (ballast-free) but pitch remains locked
    assert abs(float(np.median(out[60:-5, 1])) - 200.0) < 5.0


def test_batch_matches_single_and_jit():
    x1, x2 = _tone(140.0), _tone(260.0)
    batch = np.stack([x1, x2])
    ob = compute_kaldi_pitch(batch, SR)
    o1 = compute_kaldi_pitch(x1, SR)
    o2 = compute_kaldi_pitch(x2, SR)
    assert ob.shape == (2,) + o1.shape
    np.testing.assert_allclose(np.asarray(ob[0]), np.asarray(o1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ob[1]), np.asarray(o2),
                               atol=1e-5)
    jitted = jax.jit(lambda w: compute_kaldi_pitch(w, SR))
    np.testing.assert_allclose(np.asarray(jitted(batch)),
                               np.asarray(ob), atol=1e-5)


def test_pitch_range_respected():
    out = np.asarray(compute_kaldi_pitch(
        _tone(200.0), SR, min_f0=80.0, max_f0=300.0))
    assert (out[:, 1] >= 80.0 - 1e-3).all()
    assert (out[:, 1] <= 300.0 + 1e-3).all()


def test_viterbi_oracle():
    """The scan Viterbi against a literal float64 DP (catches the
    traceback off-by-one a tone test cannot: random costs make every
    frame's state distinct)."""
    from torchaudio_contrib_tpu.ops.kaldipitch import _viterbi
    rng = np.random.default_rng(7)
    B, T, S = 3, 11, 6
    local = rng.normal(size=(B, T, S))
    trans = np.abs(rng.normal(size=(S, S)))
    got = np.asarray(_viterbi(jnp.asarray(local, jnp.float32),
                              jnp.asarray(trans, jnp.float32)))
    for b in range(B):
        cost = local[b, 0].copy()
        bps = np.zeros((T, S), np.int64)
        for t in range(1, T):
            total = cost[:, None] + trans
            bps[t] = total.argmin(axis=0)
            cost = total.min(axis=0) + local[b, t]
        path = np.zeros(T, np.int64)
        path[-1] = cost.argmin()
        for t in range(T - 1, 0, -1):
            path[t - 1] = bps[t][path[t]]
        np.testing.assert_array_equal(got[b], path)


def test_pitch_switch_frame_alignment():
    """An abrupt 150→300 Hz switch lands at the right frame (a
    one-frame traceback shift moves every boundary)."""
    half = _tone(150.0, 0.5)
    x = np.concatenate([half, _tone(300.0, 0.5)])
    out = np.asarray(compute_kaldi_pitch(x, SR))
    pitch = out[:, 1]
    switch = int(np.argmax(pitch > 220.0))
    # frame covering the 0.5 s boundary: (0.5·4000 − 100/2) / 40 ≈ 48.75
    assert 46 <= switch <= 52, switch
    assert abs(np.median(pitch[5:switch - 3]) - 150.0) < 5
    assert abs(np.median(pitch[switch + 3:-5]) - 300.0) < 10


def test_validation_raises():
    x = _tone(200.0)
    with pytest.raises(ValueError, match="min_f0"):
        compute_kaldi_pitch(x, SR, min_f0=400.0, max_f0=100.0)
    with pytest.raises(ValueError, match="lowpass_cutoff"):
        compute_kaldi_pitch(x, SR, lowpass_cutoff=3000.0)
    with pytest.raises(ValueError, match="lowpass_cutoff"):
        compute_kaldi_pitch(x, SR, max_f0=1200.0)
    with pytest.raises(ValueError, match="too short"):
        compute_kaldi_pitch(x[:64], SR)
