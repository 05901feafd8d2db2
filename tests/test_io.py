"""Native WAV codec: round-trips across formats, native<->fallback parity."""
import numpy as np
import pytest

from torchaudio_contrib_tpu import io as wavio


@pytest.fixture(scope="module")
def clip(rng=None):
    r = np.random.default_rng(7)
    # strictly inside [-1, 1): int encodings clip outside it
    return r.uniform(-0.9, 0.9, (2, 4801)).astype(np.float32)


def test_native_builds():
    assert wavio.have_native(), "C++ codec failed to build"


@pytest.mark.parametrize("bits", [16, 32])
def test_roundtrip(tmp_path, clip, bits):
    p = str(tmp_path / f"t{bits}.wav")
    wavio.write_wav(p, clip, 16000, bits=bits)
    out, sr = wavio.read_wav(p)
    assert sr == 16000 and out.shape == clip.shape
    tol = 2.5 / 32768 if bits == 16 else 1e-7
    assert np.max(np.abs(out - clip)) <= tol


def test_info(tmp_path, clip):
    p = str(tmp_path / "t.wav")
    wavio.write_wav(p, clip, 22050, bits=16)
    info = wavio.wav_info(p)
    assert info == {"sample_rate": 22050, "channels": 2, "bits": 16,
                    "num_frames": 4801, "float": False}


def test_native_matches_fallback(tmp_path, clip):
    p = str(tmp_path / "t.wav")
    wavio.write_wav(p, clip, 16000, bits=16)
    buf = open(p, "rb").read()
    native, _ = wavio.read_wav(buf)
    fb = wavio._py_decode(buf, wavio._py_info(buf))
    np.testing.assert_allclose(native, fb, atol=1e-7)


def test_24bit_decode(tmp_path, clip):
    """Hand-built 24-bit PCM file decodes on both paths."""
    import struct
    mono = clip[0]
    v = np.clip(mono * 8388607, -8388608, 8388607).astype(np.int32)
    raw = bytearray()
    for s in v:
        raw += int(s & 0xFFFFFF).to_bytes(3, "little")
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVEfmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 16000 * 3, 3, 24)
           + b"data" + struct.pack("<I", len(raw)))
    buf = bytes(hdr) + bytes(raw)
    out, sr = wavio.read_wav(buf)
    assert sr == 16000
    np.testing.assert_allclose(out[0], v / 8388608.0, atol=1e-6)
    fb = wavio._py_decode(buf, wavio._py_info(buf))
    np.testing.assert_allclose(out, fb, atol=1e-7)


def test_mono_1d_write(tmp_path):
    x = np.sin(np.linspace(0, 20, 1000)).astype(np.float32)
    p = str(tmp_path / "m.wav")
    wavio.write_wav(p, x, 8000, bits=32)
    out, sr = wavio.read_wav(p)
    assert out.shape == (1, 1000)
    np.testing.assert_allclose(out[0], x, atol=1e-7)


def test_invalid_raises():
    with pytest.raises(ValueError):
        wavio.wav_info(b"not a wav file at all........")


def test_wav_loader_with_corpus(tmp_path, clip):
    """io + corpus integration: decode real WAV files through the
    preprocessor (native codec on the host thread pool)."""
    import jax.numpy as jnp  # noqa: F401
    from torchaudio_contrib_tpu import parallel as par

    paths = []
    for i in range(8):
        p = str(tmp_path / f"f{i}.wav")
        wavio.write_wav(p, clip * (0.1 + 0.1 * i), 16000, bits=16)
        paths.append(p)

    outs = {}
    pre = par.CorpusPreprocessor(
        wavio.make_wav_loader(paths, target_channels=1),
        clip_samples=4801, batch_size=8, num_workers=2,
        sink=lambda i, m: outs.__setitem__(i, m.shape),
        fft_length=512, hop_length=128, num_mels=32, sample_rate=16000,
        frames_per_chunk=8)
    stats = pre.run(range(8))
    assert stats.files_done == 8 and len(outs) == 8


def test_toplevel_load_save_info(tmp_path):
    import numpy as np
    import torchaudio_contrib_tpu as tac
    rng = np.random.default_rng(3)
    wav = np.clip(rng.standard_normal((2, 500)) * 0.3, -1, 1
                  ).astype(np.float32)
    p = str(tmp_path / "t.wav")
    tac.save(p, wav, 16000)
    meta = tac.info(p)
    assert meta["sample_rate"] == 16000
    assert meta["num_frames"] == 500 and meta["channels"] == 2
    out, sr = tac.load(p)
    assert sr == 16000 and out.shape == (2, 500)
    np.testing.assert_allclose(np.asarray(out), wav, atol=2 ** -14)
    # time-major round trip
    tm, _ = tac.load(p, channels_first=False)
    assert tm.shape == (500, 2)
    p2 = str(tmp_path / "t2.wav")
    tac.save(p2, np.asarray(tm), 16000, channels_first=False)
    out2, _ = tac.load(p2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out),
                               atol=2 ** -14)


def test_wav_loader_channel_targets(tmp_path, clip):
    """target_channels tiles mono up (the old slice was a silent
    no-op), truncates down, downmixes to mono, and raises on
    impossible expansions."""
    mono = str(tmp_path / "mono.wav")
    stereo = str(tmp_path / "stereo.wav")
    wavio.write_wav(mono, clip[:1], 16000, bits=16)
    wavio.write_wav(stereo, clip, 16000, bits=16)
    up = wavio.make_wav_loader([mono], target_channels=2)(0)
    assert up.shape == (2, clip.shape[1])
    np.testing.assert_array_equal(up[0], up[1])
    down = wavio.make_wav_loader([stereo], target_channels=1)(0)
    assert down.shape == (1, clip.shape[1])
    trunc = wavio.make_wav_loader([stereo], target_channels=2)(0)
    assert trunc.shape == (2, clip.shape[1])
    with pytest.raises(ValueError, match="cannot expand"):
        wavio.make_wav_loader([stereo], target_channels=4)(0)


def test_fallback_rejects_nonstandard_float_bits(tmp_path, clip):
    """A float-format (tag 3) WAV with 16-bit samples must be rejected
    by the NumPy fallback exactly like the native codec — decoding a
    2-byte payload as '<f4' reads garbage across sample boundaries."""
    import struct
    p = str(tmp_path / "f16.wav")
    wavio.write_wav(p, clip[:1], 16000, bits=16)
    buf = bytearray(open(p, "rb").read())
    fmt_off = buf.index(b"fmt ") + 8
    struct.pack_into("<H", buf, fmt_off, 3)          # tag: PCM -> float
    from torchaudio_contrib_tpu.io import _py_info
    with pytest.raises(ValueError, match="unsupported WAV format"):
        _py_info(bytes(buf))
