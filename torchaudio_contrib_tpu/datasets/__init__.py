"""Dataset layout parsers + batching utilities (local files only).

Not in the reference (SURVEY §2 — torchaudio-contrib ships no
datasets); mirrors torchaudio's ``datasets`` capability for the
common corpora as *local-directory* parsers: this environment has no
network egress, so unlike torchaudio these classes never download —
they index an existing directory tree laid out the standard way and
raise with a clear message when it is missing.

Audio decoding rides the package's native WAV + FLAC codecs
(:mod:`..io`, content-sniffing dispatch) — LibriSpeech-family corpora
work directly on their released FLAC trees (``ext=".flac"``); the
``ext`` argument also indexes externally-converted WAV trees
identically.

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

from ..io import read_audio, audio_info

__all__ = [
    "AudioFolder", "LIBRISPEECH", "LJSPEECH", "SPEECHCOMMANDS",
    "YESNO", "CMUARCTIC", "LIBRITTS", "VCTK_092", "GTZAN",
    "COMMONVOICE", "MUSDB_HQ", "TEDLIUM", "FLUENTSPEECHCOMMANDS",
    "FluentSpeechCommands",
    "pad_collate", "bucket_indices", "batch_iterator",
]


def _require_dir(path: str, hint: str) -> None:
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"{path} does not exist. This environment cannot download "
            f"datasets; place the extracted corpus there ({hint}).")


def _header_frames(path: str) -> int:
    """``num_frames`` from the WAV/FLAC header alone — reads at most 64 KiB
    (falling back to the whole file for exotic chunk layouts) so
    length-bucketing never decodes the corpus up front."""
    with open(path, "rb") as f:
        head = f.read(65536)
    try:
        return int(audio_info(head)["num_frames"])
    except ValueError:
        return int(audio_info(path)["num_frames"])


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

    def num_frames(self, n: int) -> int:
        """Item length in samples from the header (no decode)."""
        return _header_frames(self.path(n))

    def _load(self, path):
        data, sr = read_audio(path)
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
    ``ext=None`` (default) auto-detects: the released ``.flac`` tree
    if any FLAC files are present (decoded natively since round 4),
    else a converted ``.wav`` tree."""

    def __init__(self, root: str, url: str = "train-clean-100",
                 folder_in_archive: str = "LibriSpeech",
                 ext: Optional[str] = None):
        base = os.path.join(root, folder_in_archive, url)
        if ext is None:
            ext = ".wav"
            for dirpath, _, names in os.walk(base):
                if any(n.endswith(".flac") for n in names):
                    ext = ".flac"
                    break
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

    def num_frames(self, n: int) -> int:
        return _header_frames(self.path(n))

    def __getitem__(self, n: int):
        fid, text, norm = self._rows[n]
        wav, sr = read_audio(self.path(n))
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


class CMUARCTIC(AudioFolder):
    """CMU ARCTIC layout: ``root/ARCTIC/cmu_us_<spk>_arctic/wav/
    arctic_?0000.wav`` + ``etc/txt.done.data`` lines of the form
    ``( arctic_a0001 "Text." )``.

    ``__getitem__`` → ``(waveform, sample_rate, transcript,
    utterance_id)`` (torchaudio's tuple)."""

    def __init__(self, root: str, url: str = "cmu_us_aew_arctic",
                 folder_in_archive: str = "ARCTIC"):
        base = os.path.join(root, folder_in_archive, url)
        _require_dir(base, "ARCTIC/cmu_us_<spk>_arctic/{wav,etc}")
        super().__init__(os.path.join(base, "wav"), ".wav")
        self._trans = {}
        with open(os.path.join(base, "etc", "txt.done.data"),
                  encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line.startswith("("):
                    continue
                body = line[1:line.rfind(")")].strip()
                utt, _, text = body.partition(" ")
                self._trans[utt] = text.strip().strip('"')

    def __getitem__(self, n: int):
        path = self._files[n]
        wav, sr = self._load(path)
        utt = os.path.splitext(os.path.basename(path))[0]
        text = self._trans.get(utt)
        if text is None:
            raise KeyError(f"no transcript for {utt}")
        return wav, sr, text, utt


class LIBRITTS(AudioFolder):
    """LibriTTS layout: ``root/LibriTTS/<url>/<spk>/<chap>/
    <spk>_<chap>_<seg>_<utt>.wav`` with sibling ``.original.txt`` and
    ``.normalized.txt`` transcript files per utterance.

    ``__getitem__`` → ``(waveform, sample_rate, original_text,
    normalized_text, speaker_id, chapter_id, utterance_id)``."""

    def __init__(self, root: str, url: str = "train-clean-100",
                 folder_in_archive: str = "LibriTTS",
                 ext: str = ".wav"):
        base = os.path.join(root, folder_in_archive, url)
        _require_dir(base, "LibriTTS/<subset>/<spk>/<chap>/*" + ext)
        super().__init__(base, ext)

    @staticmethod
    def _read_text(path):
        if not os.path.isfile(path):
            raise FileNotFoundError(f"missing transcript {path}")
        with open(path, encoding="utf-8") as f:
            return f.read().strip()

    def __getitem__(self, n: int):
        path = self._files[n]
        wav, sr = self._load(path)
        stem = os.path.splitext(path)[0]
        utt = os.path.basename(stem)
        spk, chap = utt.split("_")[:2]
        return (wav, sr, self._read_text(stem + ".original.txt"),
                self._read_text(stem + ".normalized.txt"),
                int(spk), int(chap), utt)


class VCTK_092:
    """VCTK 0.92 layout: ``root/VCTK-Corpus-0.92/wav48_silence_trimmed/
    <spk>/<spk>_<utt>_<mic>{ext}`` + ``txt/<spk>/<spk>_<utt>.txt``.

    ``__getitem__`` → ``(waveform, sample_rate, transcript,
    speaker_id, utterance_id)``.  The release ships FLAC; point
    ``ext`` at a converted tree (module docstring)."""

    def __init__(self, root: str, mic_id: str = "mic2",
                 folder_in_archive: str = "VCTK-Corpus-0.92",
                 ext: str = ".wav"):
        if mic_id not in ("mic1", "mic2"):
            raise ValueError("mic_id must be 'mic1' or 'mic2'")
        base = os.path.join(root, folder_in_archive)
        _require_dir(base, "VCTK-Corpus-0.92/{wav48_silence_trimmed,txt}")
        self._audio = os.path.join(base, "wav48_silence_trimmed")
        self._txt = os.path.join(base, "txt")
        self.mic_id = mic_id
        suffix = f"_{mic_id}{ext}"
        self._items: List[Tuple[str, str]] = []   # (speaker, utt)
        for spk in sorted(os.listdir(self._audio)):
            d = os.path.join(self._audio, spk)
            if not os.path.isdir(d):
                continue
            for nme in sorted(os.listdir(d)):
                if not nme.endswith(suffix):
                    continue
                utt = nme[:-len(suffix)].split("_", 1)[1]
                # torchaudio keeps only utterances with a transcript
                if os.path.isfile(os.path.join(
                        self._txt, spk, f"{spk}_{utt}.txt")):
                    self._items.append((spk, utt))
        self._suffix = suffix

    def __len__(self):
        return len(self._items)

    def path(self, n: int) -> str:
        spk, utt = self._items[n]
        return os.path.join(self._audio, spk,
                            f"{spk}_{utt}{self._suffix}")

    def num_frames(self, n: int) -> int:
        return _header_frames(self.path(n))

    def __getitem__(self, n: int):
        spk, utt = self._items[n]
        wav, sr = read_audio(self.path(n))
        with open(os.path.join(self._txt, spk,
                               f"{spk}_{utt}.txt"),
                  encoding="utf-8") as f:
            text = f.read().strip()
        return np.asarray(wav, np.float32), sr, text, spk, utt


class GTZAN(AudioFolder):
    """GTZAN layout: ``root/genres/<genre>/<genre>.000NN.wav``.

    ``__getitem__`` → ``(waveform, sample_rate, genre_label)``."""

    def __init__(self, root: str, folder_in_archive: str = "genres",
                 ext: str = ".wav"):
        base = os.path.join(root, folder_in_archive)
        _require_dir(base, "genres/<genre>/*.wav")
        super().__init__(base, ext)

    def __getitem__(self, n: int):
        path = self._files[n]
        wav, sr = self._load(path)
        return wav, sr, os.path.basename(os.path.dirname(path))


class COMMONVOICE:
    """Common Voice layout: ``root/{clips/,<tsv>}`` where the TSV has
    a header row and a ``path`` column naming the clip file.

    ``__getitem__`` → ``(waveform, sample_rate, metadata dict)``
    (torchaudio's tuple).  Clips ship as MP3; ``ext`` remaps entries
    onto a converted tree (e.g. ``.wav``)."""

    def __init__(self, root: str, tsv: str = "train.tsv",
                 ext: Optional[str] = ".wav"):
        _require_dir(root, "<lang>/{clips,*.tsv}")
        meta = os.path.join(root, tsv)
        if not os.path.isfile(meta):
            raise FileNotFoundError(
                f"{meta} does not exist. This environment cannot "
                "download datasets; place the corpus TSVs there.")
        self._clips = os.path.join(root, "clips")
        self.ext = ext
        with open(meta, newline="", encoding="utf-8") as f:
            reader = csv.DictReader(f, delimiter="\t",
                                    quoting=csv.QUOTE_NONE)
            self._rows = list(reader)

    def __len__(self):
        return len(self._rows)

    def path(self, n: int) -> str:
        name = self._rows[n]["path"]
        if self.ext is not None:
            name = os.path.splitext(name)[0] + self.ext
        return os.path.join(self._clips, name)

    def num_frames(self, n: int) -> int:
        return _header_frames(self.path(n))

    def __getitem__(self, n: int):
        wav, sr = read_audio(self.path(n))
        return np.asarray(wav, np.float32), sr, dict(self._rows[n])


class MUSDB_HQ:
    """MUSDB18-HQ layout: ``root/<subset>/<track>/<source>.wav`` with
    sources bass/drums/other/vocals (+ mixture).

    ``__getitem__`` → ``(waveforms (num_sources, channels, time),
    sample_rate, num_frames, track_name)`` (torchaudio's tuple,
    sources stacked in the order given)."""

    _ALL = ("bass", "drums", "other", "vocals")

    def __init__(self, root: str, subset: str = "train",
                 sources: Optional[Sequence[str]] = None):
        if subset not in ("train", "test"):
            raise ValueError("subset must be 'train' or 'test'")
        base = os.path.join(root, subset)
        _require_dir(base, "musdb18hq/{train,test}/<track>/*.wav")
        self.sources = tuple(sources) if sources is not None \
            else self._ALL
        self._tracks = [t for t in sorted(os.listdir(base))
                        if os.path.isdir(os.path.join(base, t))]
        self._base = base

    def __len__(self):
        return len(self._tracks)

    def path(self, n: int) -> str:
        return os.path.join(self._base, self._tracks[n])

    def num_frames(self, n: int) -> int:
        """min over stems (items are truncated to the shortest)."""
        track = self._tracks[n]
        return min(_header_frames(os.path.join(
            self._base, track, s + ".wav")) for s in self.sources)

    def __getitem__(self, n: int):
        track = self._tracks[n]
        stems, sr = [], None
        for src in self.sources:
            wav, s = read_audio(os.path.join(self._base, track,
                                           src + ".wav"))
            wav = np.atleast_2d(np.asarray(wav, np.float32))
            if sr is not None and s != sr:
                raise ValueError(f"mixed sample rates in {track}")
            sr = s
            stems.append(wav)
        T = min(w.shape[-1] for w in stems)
        out = np.stack([w[..., :T] for w in stems])
        return out, sr, T, track


class TEDLIUM:
    """TED-LIUM release-3 layout: ``root/TEDLIUM_release-3/data/
    {stm/<talk>.stm, sph/<talk>{ext}}``; each STM line is
    ``<talk> <chan> <speaker> <start> <end> [<label>] <transcript>``
    and indexes one segment of the talk's audio.

    ``__getitem__`` → ``(waveform segment, sample_rate, transcript,
    talk_id, speaker_id, identifier)``.  Audio ships as SPH; point
    ``ext`` at a converted tree (default ``.wav``)."""

    def __init__(self, root: str,
                 folder_in_archive: str = "TEDLIUM_release-3",
                 ext: str = ".wav"):
        data = os.path.join(root, folder_in_archive, "data")
        _require_dir(data, "TEDLIUM_release-3/data/{stm,sph}")
        self._sph = os.path.join(data, "sph")
        self.ext = ext
        self._segs: List[Tuple[str, str, float, float, str]] = []
        stm_dir = os.path.join(data, "stm")
        for nme in sorted(os.listdir(stm_dir)):
            if not nme.endswith(".stm"):
                continue
            with open(os.path.join(stm_dir, nme),
                      encoding="utf-8") as f:
                for line in f:
                    parts = line.strip().split(None, 5)
                    if len(parts) < 6:
                        continue
                    talk, _, spk, start, end, rest = parts
                    # optional leading <o,f0,male>-style label field
                    if rest.startswith("<"):
                        rest = rest.partition(">")[2].strip()
                    self._segs.append((talk, spk, float(start),
                                       float(end), rest))

    def __len__(self):
        return len(self._segs)

    def path(self, n: int) -> str:
        return os.path.join(self._sph, self._segs[n][0] + self.ext)

    def num_frames(self, n: int) -> int:
        """Segment length in samples — from the STM bounds and the
        header rate, never the (talk-long) file length."""
        talk, _, start, end, _ = self._segs[n]
        with open(self.path(n), "rb") as f:
            head = f.read(65536)
        try:
            info = audio_info(head)
        except ValueError:
            info = audio_info(self.path(n))
        sr = info["sample_rate"]
        s = int(round(start * sr))
        e = min(int(round(end * sr)), int(info["num_frames"]))
        return max(0, e - s)

    def __getitem__(self, n: int):
        talk, spk, start, end, text = self._segs[n]
        path = self.path(n)
        # a talk holds hundreds of STM segments (contiguous in
        # self._segs) — cache the one decoded talk so iteration is
        # O(talk) instead of O(segments x talk)
        if getattr(self, "_talk_path", None) != path:
            wav, sr = read_audio(path)
            self._talk_path = path
            self._talk = (np.asarray(wav, np.float32), sr)
        wav, sr = self._talk
        seg = wav[..., int(round(start * sr)):int(round(end * sr))]
        return seg.copy(), sr, text, talk, spk, f"{talk}_{n}"


class FLUENTSPEECHCOMMANDS:
    """Fluent Speech Commands layout:
    ``root/fluent_speech_commands_dataset/{data/<subset>_data.csv,
    wavs/...}`` with CSV columns ``(index, path, speakerId,
    transcription, action, object, location)``.

    ``__getitem__`` → ``(waveform, sample_rate, file_name,
    speaker_id, transcription, action, object, location)``."""

    def __init__(self, root: str, subset: str = "train"):
        if subset not in ("train", "valid", "test"):
            raise ValueError("subset must be train/valid/test")
        base = os.path.join(root, "fluent_speech_commands_dataset")
        _require_dir(base, "fluent_speech_commands_dataset/{data,wavs}")
        self._base = base
        meta = os.path.join(base, "data", f"{subset}_data.csv")
        with open(meta, newline="", encoding="utf-8") as f:
            self._rows = list(csv.DictReader(f))

    def __len__(self):
        return len(self._rows)

    def path(self, n: int) -> str:
        return os.path.join(self._base, self._rows[n]["path"])

    def num_frames(self, n: int) -> int:
        return _header_frames(self.path(n))

    def __getitem__(self, n: int):
        r = self._rows[n]
        wav, sr = read_audio(self.path(n))
        name = os.path.splitext(os.path.basename(r["path"]))[0]
        return (np.asarray(wav, np.float32), sr, name,
                r["speakerId"], r["transcription"], r["action"],
                r["object"], r["location"])


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
        nf = getattr(dataset, "num_frames", None)
        if callable(nf):
            # header-only lengths: bucketing must not decode the
            # whole corpus up front (and then again per batch)
            lens = [int(nf(i)) for i in range(n)]
        else:
            lens = [int(np.asarray(dataset[i][0]).shape[-1])
                    for i in range(n)]
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
        rates = {int(it[1]) for it in items}
        if len(rates) > 1:
            raise ValueError(
                f"mixed sample rates in one batch {sorted(rates)} — "
                "resample the corpus to a common rate first")
        wavs, lengths = collate([it[0] for it in items])
        yield wavs, lengths, [it[2:] for it in items]


# torchaudio's CamelCase name for the same parser
FluentSpeechCommands = FLUENTSPEECHCOMMANDS
