"""Dataset layout parsers + batching utilities (local files only).

Not in the reference (SURVEY §2 — torchaudio-contrib ships no
datasets); mirrors torchaudio's ``datasets`` capability for the
common corpora as *local-directory* parsers: this environment has no
network egress, so unlike torchaudio these classes never download —
they index an existing directory tree laid out the standard way and
raise with a clear message when it is missing.

Audio decoding rides the package's native WAV codec
(:mod:`..io`); corpora distributed as FLAC (LibriSpeech) must be
converted to WAV once (any ffmpeg/sox invocation) — the parsers take
an ``ext`` argument so converted trees index identically.

TPU-first batching: ``pad_collate`` produces fixed-shape padded
arrays + lengths (jit/shard-ready), ``bucket_indices`` groups
similar-length clips to cut padding FLOPs, and ``batch_iterator``
is a deterministic, seedable host-side loader (threaded decode
prefetch belongs to :class:`..parallel.CorpusPreprocessor`, which
consumes these datasets' file lists directly).
"""
from __future__ import annotations

import os
import csv
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..io import read_wav

__all__ = [
    "AudioFolder", "LIBRISPEECH", "LJSPEECH", "SPEECHCOMMANDS",
    "YESNO", "pad_collate", "bucket_indices", "batch_iterator",
]


def _require_dir(path: str, hint: str) -> None:
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"{path} does not exist. This environment cannot download "
            f"datasets; place the extracted corpus there ({hint}).")


class AudioFolder:
    """Generic recursive folder dataset: every ``ext`` file under
    ``root``.  ``__getitem__`` → ``(waveform (C, T) float32 np,
    sample_rate, relpath)``."""

    def __init__(self, root: str, ext: str = ".wav"):
        _require_dir(root, f"any tree of {ext} files")
        self.root = root
        self._files: List[str] = []
        for dirpath, _, names in sorted(os.walk(root)):
            for n in sorted(names):
                if n.endswith(ext):
                    self._files.append(os.path.join(dirpath, n))
        self.ext = ext

    def __len__(self):
        return len(self._files)

    def path(self, n: int) -> str:
        return self._files[n]

    def _load(self, path):
        data, sr = read_wav(path)
        return np.asarray(data, np.float32), sr

    def __getitem__(self, n: int):
        path = self._files[n]
        wav, sr = self._load(path)
        return wav, sr, os.path.relpath(path, self.root)


class LIBRISPEECH(AudioFolder):
    """LibriSpeech layout:
    ``root/LibriSpeech/<url>/<speaker>/<chapter>/<spk>-<chap>-<utt>{ext}``
    with per-chapter ``<spk>-<chap>.trans.txt`` transcript files.

    ``__getitem__`` → ``(waveform, sample_rate, transcript,
    speaker_id, chapter_id, utterance_id)`` (torchaudio's tuple).
    ``ext`` defaults to ``.wav`` (convert the released FLACs once —
    see module docstring)."""

    def __init__(self, root: str, url: str = "train-clean-100",
                 folder_in_archive: str = "LibriSpeech",
                 ext: str = ".wav"):
        base = os.path.join(root, folder_in_archive, url)
        _require_dir(base, "LibriSpeech/<subset>/<spk>/<chap>/*" + ext)
        super().__init__(base, ext)
        self._trans = {}
        for dirpath, _, names in os.walk(base):
            for n in names:
                if n.endswith(".trans.txt"):
                    with open(os.path.join(dirpath, n)) as f:
                        for line in f:
                            key, _, text = line.strip().partition(" ")
                            self._trans[key] = text

    def __getitem__(self, n: int):
        path = self._files[n]
        wav, sr = self._load(path)
        utt = os.path.splitext(os.path.basename(path))[0]
        spk, chap, uid = utt.split("-")
        text = self._trans.get(utt)
        if text is None:
            raise KeyError(f"no transcript for {utt}")
        return wav, sr, text, int(spk), int(chap), int(uid)


class LJSPEECH:
    """LJSpeech layout: ``root/LJSpeech-1.1/wavs/*.wav`` +
    ``metadata.csv`` (``id|transcript|normalized``).

    ``__getitem__`` → ``(waveform, sample_rate, transcript,
    normalized_transcript)``."""

    def __init__(self, root: str,
                 folder_in_archive: str = "LJSpeech-1.1"):
        base = os.path.join(root, folder_in_archive)
        _require_dir(base, "LJSpeech-1.1/{wavs,metadata.csv}")
        self._wavs = os.path.join(base, "wavs")
        meta = os.path.join(base, "metadata.csv")
        self._rows: List[Tuple[str, str, str]] = []
        with open(meta, newline="", encoding="utf-8") as f:
            for row in csv.reader(f, delimiter="|",
                                  quoting=csv.QUOTE_NONE):
                self._rows.append((row[0], row[1], row[2]))

    def __len__(self):
        return len(self._rows)

    def path(self, n: int) -> str:
        return os.path.join(self._wavs, self._rows[n][0] + ".wav")

    def __getitem__(self, n: int):
        fid, text, norm = self._rows[n]
        wav, sr = read_wav(self.path(n))
        return np.asarray(wav, np.float32), sr, text, norm


class SPEECHCOMMANDS(AudioFolder):
    """Speech Commands layout: ``root/SpeechCommands/speech_commands_v0.02/
    <label>/<speaker>_nohash_<n>.wav``.

    ``__getitem__`` → ``(waveform, sample_rate, label, speaker_id,
    utterance_number)``."""

    def __init__(self, root: str,
                 folder_in_archive: str = "SpeechCommands",
                 url: str = "speech_commands_v0.02"):
        base = os.path.join(root, folder_in_archive, url)
        _require_dir(base, "SpeechCommands/<ver>/<label>/*.wav")
        super().__init__(base, ".wav")
        self._files = [p for p in self._files
                       if "_background_noise_" not in p]

    def __getitem__(self, n: int):
        path = self._files[n]
        wav, sr = self._load(path)
        label = os.path.basename(os.path.dirname(path))
        name = os.path.splitext(os.path.basename(path))[0]
        spk, _, num = name.partition("_nohash_")
        return wav, sr, label, spk, int(num or 0)


class YESNO(AudioFolder):
    """YesNo layout: ``root/waves_yesno/<0_1_...>.wav`` — eight
    binary digits in the filename are the labels.

    ``__getitem__`` → ``(waveform, sample_rate, labels list[int])``."""

    def __init__(self, root: str,
                 folder_in_archive: str = "waves_yesno"):
        base = os.path.join(root, folder_in_archive)
        _require_dir(base, "waves_yesno/*.wav")
        super().__init__(base, ".wav")

    def __getitem__(self, n: int):
        path = self._files[n]
        wav, sr = self._load(path)
        name = os.path.splitext(os.path.basename(path))[0]
        labels = [int(c) for c in name.split("_")]
        return wav, sr, labels


# -- batching -------------------------------------------------------
def pad_collate(waveforms: Sequence[np.ndarray]):
    """Right-zero-pad 1-D/2-D clips to the batch max:
    → ``(batch (B, [C,] Tmax) float32, lengths (B,) int32)``."""
    if not waveforms:
        raise ValueError("empty batch")
    arrs = [np.atleast_2d(np.asarray(w, np.float32))
            for w in waveforms]
    C = arrs[0].shape[0]
    if any(a.shape[0] != C for a in arrs):
        raise ValueError("inconsistent channel counts in batch")
    lengths = np.asarray([a.shape[-1] for a in arrs], np.int32)
    T = int(lengths.max())
    out = np.zeros((len(arrs), C, T), np.float32)
    for i, a in enumerate(arrs):
        out[i, :, :a.shape[-1]] = a
    squeeze = all(np.asarray(w).ndim == 1 for w in waveforms)
    return (out[:, 0] if squeeze else out), lengths


def bucket_indices(lengths: Sequence[int], batch_size: int,
                   shuffle_key=None) -> List[List[int]]:
    """Group indices into length-sorted batches (minimizes padding);
    optional deterministic batch-order shuffle via a
    ``jax.random.PRNGKey`` or int seed."""
    order = np.argsort(np.asarray(lengths), kind="stable")
    batches = [order[i:i + batch_size].tolist()
               for i in range(0, len(order), batch_size)]
    if shuffle_key is not None:
        seed = int(np.asarray(shuffle_key).reshape(-1)[-1])
        np.random.default_rng(seed).shuffle(batches)
    return batches


def batch_iterator(dataset, batch_size: int, shuffle_key=None,
                   bucket: bool = False, drop_last: bool = False,
                   collate: Optional[Callable] = pad_collate
                   ) -> Iterator:
    """Iterate a dataset in batches.  Yields ``(collated_waveforms,
    lengths, rest)`` where ``rest`` is the list of per-item metadata
    tuples (everything after ``(waveform, sample_rate)``), or the raw
    item list when ``collate=None``."""
    n = len(dataset)
    if bucket:
        lens = []
        for i in range(n):
            item = dataset[i]
            lens.append(np.asarray(item[0]).shape[-1])
        batches = bucket_indices(lens, batch_size, shuffle_key)
    else:
        order = np.arange(n)
        if shuffle_key is not None:
            seed = int(np.asarray(shuffle_key).reshape(-1)[-1])
            np.random.default_rng(seed).shuffle(order)
        batches = [order[i:i + batch_size].tolist()
                   for i in range(0, n, batch_size)]
    for idx in batches:
        if drop_last and len(idx) < batch_size:
            continue
        items = [dataset[i] for i in idx]
        if collate is None:
            yield items
            continue
        wavs, lengths = collate([it[0] for it in items])
        yield wavs, lengths, [it[2:] for it in items]
