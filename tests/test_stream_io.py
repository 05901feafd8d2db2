"""StreamReader/StreamWriter (chunked WAV/FLAC IO).

Mirrors torchaudio.io's StreamReader/StreamWriter contract on the
natively-codable containers: chunks are float32 (frames, channels),
the final chunk is shorter (never padded), seek is by seconds, and
the writer patches container sizes on close.
"""
import io as pyio

import numpy as np
import pytest

from torchaudio_contrib_tpu import io as taio
from torchaudio_contrib_tpu.io import (
    StreamReader, StreamWriter, read_wav, write_wav, read_flac,
    write_flac, audio_info)
from torchaudio_contrib_tpu.io import _flac


def _signal(ch, n, sr=8000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = np.stack([0.5 * np.sin(2 * np.pi * (220 + 70 * c) * t)
                  for c in range(ch)])
    return (x + 0.01 * rng.standard_normal((ch, n))).astype(np.float32)


def _collect(reader):
    outs = [[] for _ in range(reader.num_out_streams)]
    for chunks in reader.stream():
        for i, c in enumerate(chunks):
            if c is not None:
                outs[i].append(c)
    return [np.concatenate(o, axis=0) for o in outs]


# ------------------------------------------------------------------ #
# reader                                                             #
# ------------------------------------------------------------------ #

def test_wav_stream_matches_full_decode(tmp_path):
    x = _signal(2, 5000)
    path = tmp_path / "a.wav"
    write_wav(path, x, 8000)
    full, sr = read_wav(path)

    r = StreamReader(str(path))
    info = r.get_src_stream_info(0)
    assert info.sample_rate == 8000 and info.num_channels == 2
    assert info.media_type == "audio"
    r.add_basic_audio_stream(frames_per_chunk=1600)
    chunks = []
    for (c,) in r.stream():
        chunks.append(c)
    assert [c.shape[0] for c in chunks] == [1600, 1600, 1600, 200]
    assert all(c.shape[1] == 2 for c in chunks)
    np.testing.assert_array_equal(
        np.concatenate(chunks, axis=0), full.T)
    r.close()


def test_flac_stream_native_matches_full_decode(tmp_path):
    x = _signal(1, 3000)
    path = tmp_path / "a.flac"
    write_flac(path, x, 8000, block_size=512)
    full, _ = read_flac(path)
    r = StreamReader(str(path))
    r.add_basic_audio_stream(frames_per_chunk=700)
    got = _collect(r)[0]
    np.testing.assert_array_equal(got, full.T)


def test_flac_stream_python_fallback(tmp_path, monkeypatch):
    x = _signal(2, 2100)
    path = tmp_path / "a.flac"
    write_flac(path, x, 8000, block_size=256, stereo="mid_side")
    full, _ = read_flac(path)
    monkeypatch.setattr(_flac, "_lib", False)   # force pure-Python
    r = StreamReader(str(path))
    r.add_basic_audio_stream(frames_per_chunk=500)
    got = _collect(r)[0]
    np.testing.assert_array_equal(got, full.T)


def test_flac_python_seek_and_unaligned_chunks(tmp_path, monkeypatch):
    x = _signal(1, 1500)
    path = tmp_path / "a.flac"
    write_flac(path, x, 8000, block_size=256)
    full, _ = read_flac(path)
    monkeypatch.setattr(_flac, "_lib", False)
    r = StreamReader(str(path))
    r.add_basic_audio_stream(frames_per_chunk=333)  # crosses blocks
    got = _collect(r)[0]
    np.testing.assert_array_equal(got, full.T)
    # backward seek re-decodes from the head
    r.seek(0.05)  # frame 400
    got = _collect(r)[0]
    np.testing.assert_array_equal(got, full.T[400:])


def test_seek_wav(tmp_path):
    x = _signal(1, 4000)
    path = tmp_path / "a.wav"
    write_wav(path, x, 8000)
    full, _ = read_wav(path)
    r = StreamReader(str(path))
    r.add_basic_audio_stream(frames_per_chunk=1000)
    r.seek(0.25)  # frame 2000
    got = _collect(r)[0]
    np.testing.assert_array_equal(got, full.T[2000:])
    # seek back after exhaustion restarts the stream
    r.seek(0.0)
    got = _collect(r)[0]
    np.testing.assert_array_equal(got, full.T)


def test_two_output_streams_different_chunk_sizes(tmp_path):
    x = _signal(1, 2500)
    path = tmp_path / "a.wav"
    write_wav(path, x, 8000)
    full, _ = read_wav(path)
    r = StreamReader(str(path))
    r.add_basic_audio_stream(frames_per_chunk=600)
    r.add_basic_audio_stream(frames_per_chunk=1000)
    assert r.num_out_streams == 2
    a, b = _collect(r)
    np.testing.assert_array_equal(a, full.T)
    np.testing.assert_array_equal(b, full.T)


def test_bytes_source_and_pop_chunks(tmp_path):
    x = _signal(1, 1200)
    path = tmp_path / "a.wav"
    write_wav(path, x, 8000)
    with open(path, "rb") as f:
        blob = f.read()
    r = StreamReader(blob)
    r.add_basic_audio_stream(frames_per_chunk=500)
    assert r.fill_buffer() == 0
    c1 = r.pop_chunks()[0]
    c2 = r.pop_chunks()[0]
    c3 = r.pop_chunks()[0]
    assert r.pop_chunks()[0] is None
    got = np.concatenate([c1, c2, c3], axis=0)
    np.testing.assert_array_equal(got, read_wav(blob)[0].T)


def test_reader_loud_errors(tmp_path):
    x = _signal(1, 100)
    path = tmp_path / "a.wav"
    write_wav(path, x, 8000)
    r = StreamReader(str(path))
    with pytest.raises(NotImplementedError, match="resampl"):
        r.add_basic_audio_stream(400, sample_rate=16000)
    with pytest.raises(RuntimeError, match="add_basic_audio_stream"):
        next(iter(r.stream()))
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"\x00\x01\x02\x03junk")
    with pytest.raises(ValueError, match="unrecognized audio container"):
        StreamReader(str(bad))


# ------------------------------------------------------------------ #
# writer                                                             #
# ------------------------------------------------------------------ #

def test_stream_writer_wav_roundtrip(tmp_path):
    x = _signal(2, 3100)
    path = tmp_path / "w.wav"
    w = StreamWriter(str(path))
    w.add_audio_stream(8000, 2)
    with w.open():
        for lo in range(0, 3100, 700):     # ragged chunks
            w.write_audio_chunk(0, x.T[lo:lo + 700])
    info = audio_info(str(path))
    assert info["num_frames"] == 3100 and info["channels"] == 2
    got, sr = read_wav(str(path))
    assert sr == 8000
    # encode scale 32767 + round, decode scale 32768: <= 1.5 LSB
    assert np.max(np.abs(got - x)) <= 1.5 / 32768 + 1e-7


def test_stream_writer_wav_float32_exact(tmp_path):
    x = _signal(1, 900)
    path = tmp_path / "w.wav"
    w = StreamWriter(str(path))
    w.add_audio_stream(8000, 1, encoder_format="pcm_f32le")
    with w.open():
        w.write_audio_chunk(0, x.T[:400])
        w.write_audio_chunk(0, x.T[400:])
    got, _ = read_wav(str(path))
    np.testing.assert_array_equal(got, x)


def test_stream_writer_flac_matches_one_shot(tmp_path):
    x = _signal(1, 2000)
    a, b = tmp_path / "one.flac", tmp_path / "stream.flac"
    write_flac(a, x, 8000, block_size=512)
    w = StreamWriter(str(b))
    w.add_audio_stream(8000, 1, block_size=512)
    with w.open():
        for lo in range(0, 2000, 300):     # chunk != block size
            w.write_audio_chunk(0, x.T[lo:lo + 300])
    ga, _ = read_flac(str(a))
    gb, srb = read_flac(str(b))
    assert srb == 8000
    np.testing.assert_array_equal(ga, gb)
    assert audio_info(str(b))["num_frames"] == 2000


def test_stream_writer_flac_24bit_stereo(tmp_path):
    x = _signal(2, 700)
    path = tmp_path / "w.flac"
    w = StreamWriter(str(path))
    w.add_audio_stream(16000, 2, encoder_format="pcm_s24le",
                       block_size=256)
    with w.open():
        w.write_audio_chunk(0, x.T)
    got, _ = read_flac(str(path))
    assert np.max(np.abs(got - x)) <= 1.0 / (1 << 23) + 1e-9


def test_stream_writer_loud_errors(tmp_path):
    w = StreamWriter(str(tmp_path / "w.wav"))
    with pytest.raises(RuntimeError, match="add_audio_stream"):
        w.open()
    w.add_audio_stream(8000, 1)
    with pytest.raises(RuntimeError, match="open"):
        w.write_audio_chunk(0, np.zeros((10, 1), np.float32))
    with w.open():
        with pytest.raises(ValueError, match="frames, 1"):
            w.write_audio_chunk(0, np.zeros((10, 3), np.float32))
    w2 = StreamWriter(str(tmp_path / "x.flac"))
    with pytest.raises(ValueError, match="encoder_format"):
        w2.add_audio_stream(8000, 1, encoder_format="pcm_f32le")


def test_stream_added_after_consumption_starts_at_position(tmp_path):
    """A stream configured after chunks were consumed (or after seek)
    starts at the reader's CURRENT position (regression: cursor 0
    under a dropped buffer head sliced negative indices → silently
    wrong frames)."""
    x = _signal(1, 1000)
    path = str(tmp_path / "a.wav")
    write_wav(path, x, 8000)
    r = StreamReader(path)
    r.add_basic_audio_stream(200)
    first = r.pop_chunks()[0]
    second = r.pop_chunks()[0]
    np.testing.assert_allclose(first[:, 0], x[0, :200], atol=2e-4)
    r.add_basic_audio_stream(100)
    late = r.pop_chunks()[1]
    # the late stream's first chunk is frames 400..500, not 0..100
    np.testing.assert_allclose(late[:, 0], x[0, 400:500], atol=2e-4)
    assert second.shape == (200, 1)
    r.close()


def test_truncated_flac_raises_loudly(tmp_path, monkeypatch):
    monkeypatch.setattr(_flac, "have_native_flac", lambda: False)
    monkeypatch.setattr("torchaudio_contrib_tpu.io.stream."
                        "_FlacSource._native", lambda self: None)
    x = _signal(1, 4000)
    path = tmp_path / "t.flac"
    write_flac(str(path), x, 8000)
    whole = path.read_bytes()
    cut = whole[:len(whole) * 2 // 3]
    r = StreamReader(cut, format="flac")
    r.add_basic_audio_stream(1024)
    # loud ValueError (bit-reader truncation or the generator-
    # exhausted guard), never a PEP-479 RuntimeError from a bare
    # StopIteration escaping the stream() generator
    with pytest.raises(ValueError, match="FLAC"):
        for _ in r.stream():
            pass


def test_stream_writer_flac_streaminfo_fixed_blocksize(tmp_path):
    """STREAMINFO min == max == block size even when the final block
    is short (FLAC spec: the last block is excluded; min != max marks
    a variable-blocksize stream) — matching write_flac."""
    x = _signal(1, 2000)
    path = str(tmp_path / "s.flac")
    w = StreamWriter(path)
    w.add_audio_stream(8000, 1, block_size=512)
    with w.open():
        w.write_audio_chunk(0, x.T)
    head = open(path, "rb").read(64)
    # STREAMINFO payload starts at byte 8: min_bs u16, max_bs u16
    min_bs = int.from_bytes(head[8:10], "big")
    max_bs = int.from_bytes(head[10:12], "big")
    assert min_bs == max_bs == 512
    data, sr = read_flac(path)
    np.testing.assert_allclose(data, np.asarray(
        read_flac(_roundtrip_ref(x, tmp_path))[0]), atol=1e-4)


def _roundtrip_ref(x, tmp_path):
    ref = str(tmp_path / "ref.flac")
    write_flac(ref, x, 8000)
    return ref


def test_module_surface():
    assert taio.StreamReader is StreamReader
    assert taio.StreamWriter is StreamWriter
    assert taio.SourceAudioStream.__dataclass_fields__  # torchaudio names
