"""Datasets (`datasets/__init__.py`): layout parsers on synthesized
corpus trees (written with the package's own WAV codec), torchaudio
tuple shapes, padded collation, bucketing, deterministic iteration."""
import os

import numpy as np
import pytest

from torchaudio_contrib_tpu import datasets as D
from torchaudio_contrib_tpu.io import write_wav


def _tone(n, sr=16000, f=440.0):
    t = np.arange(n) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


@pytest.fixture(scope="module")
def librispeech_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ls")
    base = root / "LibriSpeech" / "dev-clean" / "84" / "121123"
    base.mkdir(parents=True)
    lines = []
    for i, n in enumerate((1600, 2400, 800)):
        utt = f"84-121123-{i:04d}"
        write_wav(str(base / f"{utt}.wav"), _tone(n), 16000)
        lines.append(f"{utt} HELLO WORLD {i}")
    (base / "84-121123.trans.txt").write_text("\n".join(lines))
    return str(root)


def test_librispeech(librispeech_root):
    ds = D.LIBRISPEECH(librispeech_root, url="dev-clean")
    assert len(ds) == 3
    wav, sr, text, spk, chap, uid = ds[1]
    assert sr == 16000 and wav.shape[-1] == 2400
    assert text == "HELLO WORLD 1"
    assert (spk, chap, uid) == (84, 121123, 1)


def test_librispeech_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="cannot download"):
        D.LIBRISPEECH(str(tmp_path))


def test_ljspeech(tmp_path):
    base = tmp_path / "LJSpeech-1.1"
    (base / "wavs").mkdir(parents=True)
    rows = []
    for i in range(2):
        fid = f"LJ001-{i:04d}"
        write_wav(str(base / "wavs" / f"{fid}.wav"),
                  _tone(1000 + 100 * i, 22050), 22050)
        rows.append(f"{fid}|raw {i}|normalized {i}")
    (base / "metadata.csv").write_text("\n".join(rows))
    ds = D.LJSPEECH(str(tmp_path))
    assert len(ds) == 2
    wav, sr, text, norm = ds[1]
    assert sr == 22050 and wav.shape[-1] == 1100
    assert (text, norm) == ("raw 1", "normalized 1")


def test_speechcommands(tmp_path):
    base = tmp_path / "SpeechCommands" / "speech_commands_v0.02"
    for label in ("yes", "no"):
        (base / label).mkdir(parents=True)
        write_wav(str(base / label / "spkA_nohash_0.wav"),
                  _tone(1600), 16000)
    (base / "_background_noise_").mkdir()
    write_wav(str(base / "_background_noise_" / "pink.wav"),
              _tone(3200), 16000)
    ds = D.SPEECHCOMMANDS(str(tmp_path))
    assert len(ds) == 2            # background noise excluded
    wav, sr, label, spk, num = ds[0]
    assert label in ("yes", "no") and spk == "spkA" and num == 0


def test_yesno(tmp_path):
    base = tmp_path / "waves_yesno"
    base.mkdir()
    name = "0_1_0_1_1_0_1_0"
    write_wav(str(base / f"{name}.wav"), _tone(800, 8000), 8000)
    ds = D.YESNO(str(tmp_path))
    wav, sr, labels = ds[0]
    assert labels == [0, 1, 0, 1, 1, 0, 1, 0]


def test_audiofolder_and_path(tmp_path):
    (tmp_path / "a").mkdir()
    write_wav(str(tmp_path / "a" / "x.wav"), _tone(500), 16000)
    write_wav(str(tmp_path / "y.wav"), _tone(700), 16000)
    ds = D.AudioFolder(str(tmp_path))
    assert len(ds) == 2
    rels = [ds[i][2] for i in range(2)]
    assert sorted(rels) == [os.path.join("a", "x.wav"), "y.wav"]


def test_pad_collate_mono_and_multichannel():
    batch, lengths = D.pad_collate([_tone(100), _tone(60)])
    assert batch.shape == (2, 100) and lengths.tolist() == [100, 60]
    assert (batch[1, 60:] == 0).all()
    stereo = [np.stack([_tone(80), _tone(80)]),
              np.stack([_tone(50), _tone(50)])]
    batch2, l2 = D.pad_collate(stereo)
    assert batch2.shape == (2, 2, 80) and l2.tolist() == [80, 50]
    with pytest.raises(ValueError, match="channel"):
        D.pad_collate([_tone(10), np.zeros((2, 10))])


def test_bucket_indices_minimizes_padding():
    lengths = [100, 900, 120, 880, 110, 890]
    batches = D.bucket_indices(lengths, 3)
    got = sorted(tuple(sorted(b)) for b in batches)
    assert got == [(0, 2, 4), (1, 3, 5)]


def test_batch_iterator(librispeech_root):
    ds = D.LIBRISPEECH(librispeech_root, url="dev-clean")
    out = list(D.batch_iterator(ds, batch_size=2, bucket=True))
    assert len(out) == 2
    wavs, lengths, rest = out[0]
    assert wavs.shape[0] == len(lengths) == len(rest)
    assert wavs.shape[-1] == lengths.max()
    assert isinstance(rest[0][0], str)          # transcript
    # deterministic under the same key
    a = [l.tolist() for _, l, _ in
         D.batch_iterator(ds, 2, shuffle_key=3)]
    b = [l.tolist() for _, l, _ in
         D.batch_iterator(ds, 2, shuffle_key=3)]
    assert a == b
    # drop_last
    c = list(D.batch_iterator(ds, 2, drop_last=True))
    assert len(c) == 1
