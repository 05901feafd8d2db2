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


def test_cmuarctic(tmp_path):
    base = tmp_path / "ARCTIC" / "cmu_us_aew_arctic"
    (base / "wav").mkdir(parents=True)
    (base / "etc").mkdir()
    lines = []
    for i in range(2):
        utt = f"arctic_a{i:04d}"
        write_wav(str(base / "wav" / f"{utt}.wav"),
                  _tone(900 + i * 50), 16000)
        lines.append(f'( {utt} "Sentence number {i}." )')
    (base / "etc" / "txt.done.data").write_text("\n".join(lines))
    ds = D.CMUARCTIC(str(tmp_path))
    assert len(ds) == 2
    wav, sr, text, utt = ds[1]
    assert wav.shape[-1] == 950 and sr == 16000
    assert text == "Sentence number 1." and utt == "arctic_a0001"


def test_libritts(tmp_path):
    base = tmp_path / "LibriTTS" / "dev-clean" / "19" / "198"
    base.mkdir(parents=True)
    utt = "19_198_000000_000001"
    write_wav(str(base / f"{utt}.wav"), _tone(1200, 24000), 24000)
    (base / f"{utt}.original.txt").write_text("Original, text!")
    (base / f"{utt}.normalized.txt").write_text("original text")
    ds = D.LIBRITTS(str(tmp_path), url="dev-clean")
    wav, sr, orig, norm, spk, chap, uid = ds[0]
    assert (sr, orig, norm, spk, chap, uid) == (
        24000, "Original, text!", "original text", 19, 198, utt)


def test_vctk(tmp_path):
    base = tmp_path / "VCTK-Corpus-0.92"
    (base / "wav48_silence_trimmed" / "p225").mkdir(parents=True)
    (base / "txt" / "p225").mkdir(parents=True)
    for utt, has_txt in (("001", True), ("002", False)):
        for mic in ("mic1", "mic2"):
            write_wav(str(base / "wav48_silence_trimmed" / "p225" /
                          f"p225_{utt}_{mic}.wav"), _tone(700), 16000)
        if has_txt:
            (base / "txt" / "p225" / f"p225_{utt}.txt").write_text(
                "Please call Stella.")
    ds = D.VCTK_092(str(tmp_path))
    assert len(ds) == 1              # transcript-less utt excluded
    wav, sr, text, spk, utt = ds[0]
    assert (text, spk, utt) == ("Please call Stella.", "p225", "001")
    assert "mic2" in ds.path(0)
    assert len(D.VCTK_092(str(tmp_path), mic_id="mic1")) == 1
    with pytest.raises(ValueError):
        D.VCTK_092(str(tmp_path), mic_id="mic3")


def test_gtzan(tmp_path):
    for genre in ("blues", "rock"):
        d = tmp_path / "genres" / genre
        d.mkdir(parents=True)
        write_wav(str(d / f"{genre}.00000.wav"), _tone(600, 22050),
                  22050)
    ds = D.GTZAN(str(tmp_path))
    assert len(ds) == 2
    assert sorted(ds[i][2] for i in range(2)) == ["blues", "rock"]


def test_commonvoice(tmp_path):
    (tmp_path / "clips").mkdir()
    rows = ["client_id\tpath\tsentence",
            "abc\tclip_0.mp3\thello there",
            "def\tclip_1.mp3\tgood bye"]
    (tmp_path / "train.tsv").write_text("\n".join(rows))
    for i in range(2):
        write_wav(str(tmp_path / "clips" / f"clip_{i}.wav"),
                  _tone(400 + i * 100), 16000)
    ds = D.COMMONVOICE(str(tmp_path))
    assert len(ds) == 2
    wav, sr, meta = ds[1]
    assert wav.shape[-1] == 500
    assert meta["sentence"] == "good bye" and meta["client_id"] == "def"
    with pytest.raises(FileNotFoundError, match="cannot download"):
        D.COMMONVOICE(str(tmp_path), tsv="dev.tsv")


def test_musdb_hq(tmp_path):
    track = tmp_path / "train" / "A Great Band - Song"
    track.mkdir(parents=True)
    for i, src in enumerate(("mixture", "bass", "drums", "other",
                             "vocals")):
        wav = np.stack([_tone(2000 + (i % 2)), _tone(2000 + (i % 2))])
        write_wav(str(track / f"{src}.wav"), wav, 44100)
    ds = D.MUSDB_HQ(str(tmp_path), subset="train")
    assert len(ds) == 1
    stems, sr, nf, name = ds[0]
    assert stems.shape == (4, 2, 2000)   # truncated to common length
    assert sr == 44100 and nf == 2000
    assert name == "A Great Band - Song"
    mix = D.MUSDB_HQ(str(tmp_path), subset="train",
                     sources=["mixture"])[0][0]
    assert mix.shape == (1, 2, 2000)
    with pytest.raises(ValueError):
        D.MUSDB_HQ(str(tmp_path), subset="dev")


def test_tedlium(tmp_path):
    data = tmp_path / "TEDLIUM_release-3" / "data"
    (data / "stm").mkdir(parents=True)
    (data / "sph").mkdir()
    sr = 16000
    write_wav(str(data / "sph" / "TalkA.wav"), _tone(3 * sr), sr)
    (data / "stm" / "TalkA.stm").write_text(
        "TalkA 1 speaker_a 0.50 1.25 <o,f0,male> hello world\n"
        "TalkA 1 speaker_a 1.25 2.00 second segment here\n")
    ds = D.TEDLIUM(str(tmp_path))
    assert len(ds) == 2
    seg, got_sr, text, talk, spk, ident = ds[0]
    assert got_sr == sr and seg.shape[-1] == int(0.75 * sr)
    assert text == "hello world"
    assert (talk, spk) == ("TalkA", "speaker_a")
    assert ds[1][2] == "second segment here"
    assert ds[0][5] != ds[1][5]          # identifiers distinct


def test_fluentspeechcommands(tmp_path):
    base = tmp_path / "fluent_speech_commands_dataset"
    (base / "data").mkdir(parents=True)
    (base / "wavs" / "speakers" / "s1").mkdir(parents=True)
    write_wav(str(base / "wavs" / "speakers" / "s1" / "u1.wav"),
              _tone(800), 16000)
    (base / "data" / "train_data.csv").write_text(
        ",path,speakerId,transcription,action,object,location\n"
        "0,wavs/speakers/s1/u1.wav,s1,turn on the lights,activate,"
        "lights,none\n")
    ds = D.FLUENTSPEECHCOMMANDS(str(tmp_path))
    wav, sr, name, spk, text, act, obj, loc = ds[0]
    assert (name, spk, act, obj, loc) == (
        "u1", "s1", "activate", "lights", "none")
    assert text == "turn on the lights"
    with pytest.raises(ValueError):
        D.FLUENTSPEECHCOMMANDS(str(tmp_path), subset="eval")


def test_cmudict(tmp_path):
    (tmp_path / "cmudict-0.7b").write_bytes(
        b";;; comment line\n"
        b"!EXCLAMATION-POINT  EH2 K S K L AH0\n"
        b"HELLO  HH AH0 L OW1\n"
        b"HELLO(1)  HH EH0 L OW1\n"
        b"WORLD  W ER1 L D\n")
    (tmp_path / "cmudict-0.7b.symbols").write_text("AH\nEH\nHH\n")
    ds = D.CMUDict(str(tmp_path))
    assert len(ds) == 3
    assert ds[0] == ("HELLO", ["HH", "AH0", "L", "OW1"])
    assert ds[1] == ("HELLO", ["HH", "EH0", "L", "OW1"])
    assert ds[2][0] == "WORLD"
    assert ds.symbols == ["AH", "EH", "HH"]
    full = D.CMUDict(str(tmp_path), exclude_punctuations=False)
    assert len(full) == 4
    assert full[0][0] == "!EXCLAMATION-POINT"


def test_cmudict_keeps_apostrophe_words(tmp_path):
    """'BOUT/'CAUSE/'TIS are vocabulary, not punctuation — only the
    quote-naming apostrophe entries are filtered."""
    (tmp_path / "cmudict-0.7b").write_bytes(
        b"'BOUT  B AW1 T\n"
        b"'END-QUOTE  EH1 N D K W OW1 T\n"
        b"\"CLOSE-QUOTE  K L OW1 Z K W OW1 T\n"
        b"HELLO  HH AH0 L OW1\n")
    ds = D.CMUDict(str(tmp_path))
    assert [w for w, _ in ds] == ["'BOUT", "HELLO"]


def test_librilight_limited(tmp_path):
    base = tmp_path / "librispeech_finetuning"
    for part, spk in (("1h/0", 19), ("1h/1", 26), ("9h", 39)):
        d = base / part / "clean" / str(spk) / "1000"
        d.mkdir(parents=True)
        utt = f"{spk}-1000-0000"
        write_wav(str(d / f"{utt}.wav"), _tone(1200), 16000)
        (d / f"{spk}-1000.trans.txt").write_text(
            f"{utt} TEXT {spk}")
    ds10 = D.LibriLightLimited(str(tmp_path), subset="10min")
    ds1h = D.LibriLightLimited(str(tmp_path), subset="1h")
    ds10h = D.LibriLightLimited(str(tmp_path), subset="10h")
    assert (len(ds10), len(ds1h), len(ds10h)) == (1, 2, 3)
    wav, sr, text, spk, chap, uid = ds10[0]
    assert sr == 16000 and wav.shape[-1] == 1200
    assert text == "TEXT 19" and (spk, chap, uid) == (19, 1000, 0)
    with pytest.raises(ValueError):
        D.LibriLightLimited(str(tmp_path), subset="5h")


def test_librimix(tmp_path):
    base = tmp_path / "Libri2Mix" / "wav8k" / "min" / "dev"
    for d in ("mix_clean", "mix_both", "s1", "s2"):
        (base / d).mkdir(parents=True)
        for i in range(2):
            write_wav(str(base / d / f"utt{i}.wav"),
                      _tone(640, 8000), 8000)
    ds = D.LibriMix(str(tmp_path), subset="dev")
    assert len(ds) == 2
    sr, mix, srcs = ds[0]
    assert sr == 8000 and mix.shape == (1, 640) and len(srcs) == 2
    ds1 = D.LibriMix(str(tmp_path), subset="dev", task="sep_noisy")
    assert len(ds1[1][2]) == 2
    with pytest.raises(ValueError):
        D.LibriMix(str(tmp_path), subset="dev", task="nope")


def test_dr_vctk(tmp_path):
    base = tmp_path / "DR-VCTK" / "DR-VCTK"
    (base / "clean_trainset_wav_16k").mkdir(parents=True)
    (base / "device-recorded_trainset_wav_16k").mkdir(parents=True)
    (base / "configurations").mkdir(parents=True)
    for i in range(2):
        for d in ("clean_trainset_wav_16k",
                  "device-recorded_trainset_wav_16k"):
            write_wav(str(base / d / f"p226_00{i}.wav"),
                      _tone(800 + i), 16000)
    (base / "configurations" / "train_ch_log.txt").write_text(
        "File Name\tMain Source\tChannel Idx\n"
        "p226_000.wav\toffice1\t1\n"
        "p226_001.wav\toffice2\t5\n")
    ds = D.DR_VCTK(str(tmp_path))
    assert len(ds) == 2
    clean, csr, noisy, nsr, name, source, chan = ds[1]
    assert csr == nsr == 16000
    assert clean.shape[-1] == noisy.shape[-1] == 801
    assert (name, source, chan) == ("p226_001.wav", "office2", 5)


def test_iemocap(tmp_path):
    sess = tmp_path / "IEMOCAP" / "Session1"
    wavd = sess / "sentences" / "wav" / "Ses01F_impro01"
    wavd.mkdir(parents=True)
    labd = sess / "dialog" / "EmoEvaluation"
    labd.mkdir(parents=True)
    for i, lab in enumerate(("neu", "hap", "xxx")):
        write_wav(str(wavd / f"Ses01F_impro01_F00{i}.wav"),
                  _tone(700 + i), 16000)
    (labd / "Ses01F_impro01.txt").write_text(
        "% header\n"
        "[0.1 - 0.5]\tSes01F_impro01_F000\tneu\t[2.5, 2.5, 2.5]\n"
        "[0.6 - 0.9]\tSes01F_impro01_F001\thap\t[3.5, 3.0, 3.0]\n"
        "[1.0 - 1.4]\tSes01F_impro01_F002\txxx\t[2.0, 2.0, 2.0]\n")
    ds = D.IEMOCAP(str(tmp_path))
    assert len(ds) == 2          # 'xxx' filtered out
    wav, sr, name, label, speaker = ds[1]
    assert sr == 16000 and wav.shape[-1] == 701
    assert (name, label, speaker) == (
        "Ses01F_impro01_F001", "hap", "Ses01F")
    assert len(D.IEMOCAP(str(tmp_path),
                         utterance_type="scripted")) == 0
    assert len(D.IEMOCAP(str(tmp_path),
                         utterance_type="improvised")) == 2


def test_quesst14(tmp_path):
    base = tmp_path / "quesst14Database"
    (base / "Audio").mkdir(parents=True)
    (base / "scoring").mkdir(parents=True)
    lines = []
    for i, lang in enumerate(("nnenglish", "czech")):
        name = f"quesst14_0000{i}.wav"
        write_wav(str(base / "Audio" / name), _tone(640, 8000), 8000)
        lines.append(f"quesst14Database/Audio/{name} {lang}")
    (base / "scoring" / "language_key_utterances.lst").write_text(
        "\n".join(lines))
    ds = D.QUESST14(str(tmp_path))
    assert len(ds) == 1
    wav, sr, name = ds[0]
    assert sr == 8000 and name == "quesst14_00000"
    assert len(D.QUESST14(str(tmp_path), language=None)) == 2
    with pytest.raises(ValueError):
        D.QUESST14(str(tmp_path), subset="queries")


def test_snips(tmp_path):
    base = tmp_path / "SNIPS"
    (base / "train").mkdir(parents=True)
    for i, spk in enumerate(("Aditi", "Brian")):
        write_wav(str(base / "train" / f"{spk}-snips-train-{i}.wav"),
                  _tone(900 + i), 16000)
    (base / "all.iob.snips.txt").write_text(
        "Aditi-snips-train-0 BOS turn on the light EOS\t"
        "O O O O B-device SwitchLightOn\n"
        "Brian-snips-train-1 BOS dim the light EOS\t"
        "O O O B-device SetLightBrightness\n")
    ds = D.Snips(str(tmp_path), subset="train")
    assert len(ds) == 2
    wav, sr, name, text, iob, intent = ds[0]
    assert name == "Aditi-snips-train-0"
    assert text == "turn on the light"
    assert iob == "O O O B-device" and intent == "SwitchLightOn"
    only = D.Snips(str(tmp_path), subset="train",
                   speakers=["Brian"])
    assert len(only) == 1 and only[0][5] == "SetLightBrightness"


def test_snips_positional_with_speaker_filter(tmp_path):
    """Positional (unkeyed) transcript lines map onto the UNFILTERED
    corpus order — a speaker filter must not shift the mapping."""
    base = tmp_path / "SNIPS"
    (base / "train").mkdir(parents=True)
    for i, spk in enumerate(("Aditi", "Brian", "Clara")):
        write_wav(str(base / "train" / f"{spk}-snips-train-{i}.wav"),
                  _tone(600 + i), 16000)
    (base / "all.iob.snips.txt").write_text(
        "BOS zero EOS\tO IntentA\n"
        "BOS one EOS\tO IntentB\n"
        "BOS two EOS\tO IntentC\n")
    only = D.Snips(str(tmp_path), subset="train", speakers=["Clara"])
    assert len(only) == 1
    # Clara is corpus item 2 -> transcript line 2, not line 0
    assert only[0][3] == "two" and only[0][5] == "IntentC"


def test_voxceleb1(tmp_path):
    wavroot = tmp_path / "wav"
    rels = []
    for spk, vid in ((10001, "abc"), (10002, "xyz")):
        d = wavroot / f"id{spk}" / vid
        d.mkdir(parents=True)
        write_wav(str(d / "00001.wav"), _tone(600), 16000)
        rels.append(f"id{spk}/{vid}/00001.wav")
    (tmp_path / "iden_split.txt").write_text(
        f"1 {rels[0]}\n3 {rels[1]}\n")
    (tmp_path / "veri_test.txt").write_text(
        f"1 {rels[0]} {rels[1]}\n0 {rels[1]} {rels[0]}\n")
    train = D.VoxCeleb1Identification(str(tmp_path), subset="train")
    test = D.VoxCeleb1Identification(str(tmp_path), subset="test")
    assert len(train) == 1 and len(test) == 1
    wav, sr, spk, fid = train[0]
    assert sr == 16000 and spk == 10001
    assert fid == "id10001-abc-00001"
    ver = D.VoxCeleb1Verification(str(tmp_path))
    assert len(ver) == 2
    w1, w2, sr, label, f1, f2 = ver[0]
    assert label == 1 and f1 == "id10001-abc-00001" \
        and f2 == "id10002-xyz-00001"
    assert ver[1][3] == 0


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


def test_num_frames_matches_decode(librispeech_root, tmp_path):
    """Header-only num_frames equals each decoded item length (the
    bucket path must not decode the corpus up front), including
    TEDLIUM's STM-segment lengths and MUSDB's shortest-stem rule."""
    ds = D.LIBRISPEECH(librispeech_root, url="dev-clean")
    for i in range(len(ds)):
        assert ds.num_frames(i) == ds[i][0].shape[-1]

    data = tmp_path / "TEDLIUM_release-3" / "data"
    (data / "stm").mkdir(parents=True)
    (data / "sph").mkdir()
    sr = 16000
    write_wav(str(data / "sph" / "T.wav"), _tone(2 * sr), sr)
    (data / "stm" / "T.stm").write_text(
        "T 1 s 0.25 1.00 seg one\nT 1 s 1.00 1.50 seg two\n")
    td = D.TEDLIUM(str(tmp_path))
    for i in range(len(td)):
        assert td.num_frames(i) == td[i][0].shape[-1]
    # segment slices stay correct through the one-talk decode cache
    assert td[0][0].shape[-1] == int(0.75 * sr)
    assert td[1][0].shape[-1] == int(0.5 * sr)


def test_batch_iterator_rejects_mixed_rates(tmp_path):
    for i, sr in enumerate((16000, 16000, 44100)):
        write_wav(str(tmp_path / f"f{i}.wav"), _tone(800), sr)
    ds = D.AudioFolder(str(tmp_path))
    with pytest.raises(ValueError, match="mixed sample rates"):
        list(D.batch_iterator(ds, batch_size=3))
