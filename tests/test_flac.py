"""FLAC codec (`io/flacio.cpp` + `io/_flac.py`): lossless round trips
across subframe types / stereo modes / bit depths / block sizes,
native-vs-Python-decoder agreement (no external FLAC tool exists in
this environment, so correctness rests on three independent
implementations agreeing: the C++ decoder, the Python fallback
decoder, and the Python encoder — plus hand-crafted streams for the
features the encoder never emits), CRC corruption detection, loud
unsupported errors, format-dispatching `read_audio`/top-level
`load`/`save`, and `LIBRISPEECH` over an unconverted FLAC tree."""
import struct

import numpy as np
import pytest

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu import datasets as D
from torchaudio_contrib_tpu import io as tio
from torchaudio_contrib_tpu.io import _flac


def _sig(n=5000, ch=2, seed=0, sr=16000):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = np.stack([0.5 * np.sin(2 * np.pi * (440 + 100 * c) * t)
                  + 0.02 * rng.standard_normal(n)
                  for c in range(ch)])
    return x.astype(np.float32)


def _quantized(x, bits):
    full = 1 << (bits - 1)
    return (np.clip(np.rint(x.astype(np.float64) * full),
                    -full, full - 1) / full).astype(np.float32)


@pytest.mark.parametrize("stereo", ["independent", "left_side",
                                    "right_side", "mid_side"])
@pytest.mark.parametrize("mode", ["auto", "verbatim", "fixed", "lpc"])
def test_roundtrip_modes(tmp_path, stereo, mode):
    x = _sig()
    path = str(tmp_path / "t.flac")
    _flac.write_flac(path, x, 16000, bits=16, block_size=256,
                     subframe=mode, stereo=stereo)
    y, sr = _flac.read_flac(path)
    assert sr == 16000
    np.testing.assert_array_equal(y, _quantized(x, 16))


@pytest.mark.parametrize("bits", [8, 16, 24])
def test_roundtrip_bit_depths(tmp_path, bits):
    x = _sig(n=3001, ch=1)          # non-multiple final frame
    path = str(tmp_path / "t.flac")
    _flac.write_flac(path, x, 22050, bits=bits, block_size=500)
    y, sr = _flac.read_flac(path)
    assert sr == 22050 and y.shape == x.shape
    np.testing.assert_array_equal(y, _quantized(x, bits))
    info = _flac.flac_info(path)
    assert info == {"sample_rate": 22050, "channels": 1,
                    "bits": bits, "num_frames": 3001, "float": False}


def test_constant_and_silence(tmp_path):
    x = np.zeros((1, 1000), np.float32)
    x[:, 500:] = 0.25
    path = str(tmp_path / "c.flac")
    _flac.write_flac(path, x, 8000, block_size=500)
    y, _ = _flac.read_flac(path)
    np.testing.assert_array_equal(y, _quantized(x, 16))


def test_native_and_python_decoders_agree(tmp_path):
    if not _flac.have_native_flac():
        pytest.skip("no native codec (toolchain missing)")
    x = _sig(n=4097, seed=3)
    path = str(tmp_path / "t.flac")
    _flac.write_flac(path, x, 16000, block_size=1024,
                     stereo="mid_side")
    with open(path, "rb") as f:
        buf = f.read()
    y_native, _ = _flac.read_flac(buf)
    y_py = _flac._py_flac_decode(buf)
    np.testing.assert_array_equal(y_native, y_py)


def _handcrafted_frame(samples, bps, build_subframe, sr=8000):
    """Single-frame mono FLAC via the module's own bit plumbing —
    lets tests emit features the encoder never writes."""
    n = len(samples)
    out = bytearray(b"fLaC")
    si = _flac._BitWriter()
    si.bits(16, 16); si.bits(65535, 16)
    si.bits(0, 24); si.bits(0, 24)
    si.bits(sr, 20); si.bits(0, 3); si.bits(bps - 1, 5)
    si.bits(n, 36)
    body = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    hw = _flac._BitWriter()
    hw.bits(0b11111111111110, 14)
    hw.bits(0, 1); hw.bits(0, 1)
    hw.bits(7, 4); hw.bits(0, 4)      # 16-bit blocksize; sr from SI
    hw.bits(0, 4)                      # mono
    hw.bits({8: 1, 16: 4, 24: 6}[bps], 3)
    hw.bits(0, 1)
    hw.align()
    header = hw.bytes() + _flac._utf8_number(0) \
        + struct.pack(">H", n - 1)
    header += bytes([_flac._crc8(header)])
    bw = _flac._BitWriter()
    build_subframe(bw)
    bw.align()
    frame = header + bw.bytes()
    frame += struct.pack(">H", _flac._crc16(frame))
    return bytes(out + frame)


def test_wasted_bits():
    """Verbatim subframe with 2 wasted bits (every sample divisible
    by 4) — a feature the encoder never emits."""
    samples = [4 * v for v in (-100, 25, 3000, -8000, 0, 4096)]

    def build(bw):
        bw.bits(0, 1); bw.bits(1, 6)   # verbatim
        bw.bits(1, 1); bw.unary(1)     # wasted: unary(1) -> 2 bits
        for v in samples:
            bw.bits(v >> 2, 14)
    buf = _handcrafted_frame(samples, 16, build)
    y = _flac._py_flac_decode(buf)
    np.testing.assert_array_equal(
        np.rint(y[0] * 32768).astype(int), samples)
    if _flac.have_native_flac():
        yn, _ = _flac.read_flac(buf)
        np.testing.assert_array_equal(yn, y)


def test_rice_escape_and_partitions():
    """Fixed order-1 subframe, partition order 2 (4 partitions), one
    escaped raw-bits partition and one zero-raw-bits (all-zero)
    partition."""
    res = [7, -3, 100, -100, 0, 0, 0, 0, 5, -5, 2, -2, 1, -1, 3, -3]
    n = 16
    samples = [1000]
    for r in res[1:]:
        samples.append(samples[-1] + r)

    def build(bw):
        bw.bits(0, 1); bw.bits(8 + 1, 6); bw.bits(0, 1)  # fixed o=1
        bw.bits(samples[0], 16)                           # warmup
        bw.bits(0, 2)                                     # rice 4-bit
        bw.bits(2, 4)                                     # porder 2
        # partition 0: 3 residuals (4 - order), escaped 9 raw bits
        bw.bits(0xF, 4); bw.bits(9, 5)
        for r in res[1:4]:
            bw.bits(r, 9)
        # partition 1: rice param 3
        bw.bits(3, 4)
        for r in res[4:8]:
            v = (r << 1) if r >= 0 else ((-r) << 1) - 1
            bw.unary(v >> 3); bw.bits(v & 7, 3)
        # partition 2: escaped, 0 raw bits -> all zero residuals
        bw.bits(0xF, 4); bw.bits(0, 5)
        # partition 3: rice param 0
        bw.bits(0, 4)
        for r in res[12:16]:
            v = (r << 1) if r >= 0 else ((-r) << 1) - 1
            bw.unary(v)
    # zero-escape partition forces residuals 8..11 to 0
    expect = list(samples)
    for i in range(8, 12):
        expect[i] = expect[i - 1]
    for i in range(12, 16):
        expect[i] = expect[i - 1] + res[i]
    buf = _handcrafted_frame(samples, 16, build)
    y = _flac._py_flac_decode(buf)
    np.testing.assert_array_equal(
        np.rint(y[0] * 32768).astype(int), expect)
    if _flac.have_native_flac():
        yn, _ = _flac.read_flac(buf)
        np.testing.assert_array_equal(yn, y)


def test_crc_corruption_detected(tmp_path):
    x = _sig(n=1000, ch=1)
    path = str(tmp_path / "t.flac")
    _flac.write_flac(path, x, 16000)
    with open(path, "rb") as f:
        buf = bytearray(f.read())
    buf[-40] ^= 0x10                  # flip a payload bit
    with pytest.raises(ValueError, match="CRC|overrun|subframe|frame"):
        _flac.read_flac(bytes(buf))


def test_unsupported_is_loud(tmp_path):
    x = _sig(n=100, ch=1)
    path = str(tmp_path / "t.flac")
    _flac.write_flac(path, x, 16000)
    with open(path, "rb") as f:
        buf = bytearray(f.read())
    # STREAMINFO bits-per-sample field: byte 16 of the 34-byte body
    # (bits 4-8 of the byte at offset 8+12 within the block) — patch
    # to 32 bps: easier to rebuild the header via the writer
    si = _flac._BitWriter()
    si.bits(16, 16); si.bits(65535, 16); si.bits(0, 24); si.bits(0, 24)
    si.bits(16000, 20); si.bits(0, 3); si.bits(32 - 1, 5)
    si.bits(100, 36)
    body = si.bytes() + b"\x00" * 16
    bad = b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") \
        + body + bytes(buf[len(body) + 8:])
    with pytest.raises(ValueError, match="bit depth"):
        _flac.flac_info(bad)
    with pytest.raises(ValueError, match="not a FLAC"):
        _flac.read_flac(b"OggS" + bytes(buf)[4:])
    # unknown total sample count
    si2 = _flac._BitWriter()
    si2.bits(16, 16); si2.bits(65535, 16); si2.bits(0, 24)
    si2.bits(0, 24); si2.bits(16000, 20); si2.bits(0, 3)
    si2.bits(15, 5); si2.bits(0, 36)
    body2 = si2.bytes() + b"\x00" * 16
    bad2 = b"fLaC" + bytes([0x80]) + len(body2).to_bytes(3, "big") \
        + body2
    with pytest.raises(ValueError, match="total sample count"):
        _flac.flac_info(bad2)


def test_read_audio_dispatch_and_top_level(tmp_path):
    x = _sig(n=800, ch=1)
    fpath = str(tmp_path / "a.flac")
    wpath = str(tmp_path / "a.wav")
    tac.save(fpath, x, 16000)
    tac.save(wpath, x, 16000)
    yf, srf = tio.read_audio(fpath)
    yw, srw = tio.read_audio(wpath)
    assert srf == srw == 16000
    np.testing.assert_allclose(yf, yw, atol=2 / 32768)
    assert tio.audio_info(fpath)["num_frames"] == 800
    assert tac.info(fpath)["sample_rate"] == 16000
    wav, sr = tac.load(fpath)
    assert wav.shape == (1, 800) and sr == 16000
    with pytest.raises(ValueError, match="unrecognized audio"):
        p = tmp_path / "x.mp3"
        p.write_bytes(b"ID3\x04xxxxxx")
        tio.read_audio(str(p))


def test_librispeech_flac_tree(tmp_path):
    """The VERDICT ask: LIBRISPEECH works on an unconverted FLAC
    corpus tree end-to-end (auto-detected ext)."""
    base = tmp_path / "LibriSpeech" / "dev-clean" / "84" / "121123"
    base.mkdir(parents=True)
    lines = []
    rng = np.random.default_rng(0)
    for i, n in enumerate((1600, 2400, 800)):
        utt = f"84-121123-{i:04d}"
        tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(n) / 16000)
                + 0.01 * rng.standard_normal(n)).astype(np.float32)
        _flac.write_flac(str(base / f"{utt}.flac"), tone, 16000)
        lines.append(f"{utt} FLAC NATIVE {i}")
    (base / "84-121123.trans.txt").write_text("\n".join(lines))
    ds = D.LIBRISPEECH(str(tmp_path), url="dev-clean")
    assert len(ds) == 3
    assert ds.num_frames(1) == 2400        # header-only length
    wav, sr, text, spk, chap, uid = ds[1]
    assert sr == 16000 and wav.shape == (1, 2400)
    assert text == "FLAC NATIVE 1"
    assert (spk, chap, uid) == (84, 121123, 1)
