"""Pipeline bundles (`pipelines/__init__.py`): bundle → runnable
model, no-silent-random-weights contract, checkpoint loading, CTC
label decode, TTS text processor, RNNT bundle composition."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu import pipelines as P
from torchaudio_contrib_tpu.utils.checkpoint import save_params


def test_get_model_requires_key_or_checkpoint():
    with pytest.raises(ValueError, match="no pretrained weights"):
        P.SQUIM_OBJECTIVE.get_model()


def test_squim_bundle_runs():
    model, params = P.SQUIM_OBJECTIVE.get_model(jax.random.PRNGKey(0))
    wav = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((1, 2000)), jnp.float32)
    stoi, pesq, si_sdr = model.apply(params, wav)
    assert stoi.shape == (1,)
    assert P.SQUIM_OBJECTIVE.sample_rate == 16000


def test_checkpoint_round_trip(tmp_path):
    model, params = P.SQUIM_OBJECTIVE.get_model(jax.random.PRNGKey(1))
    path = str(tmp_path / "squim.npz")
    save_params(path, params)
    model2, params2 = P.SQUIM_OBJECTIVE.get_model(checkpoint=path)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(params2)
    assert all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))


def test_asr_bundle_labels_and_decode():
    b = P.WAV2VEC2_ASR_BASE_960H
    labels = b.get_labels()
    assert labels[0] == "-" and "|" in labels
    # CTC collapse: blank=0, repeats merge, | becomes space
    ids = [0, 8, 8, 0, 2, 1, 1, 3, 0, 3]
    assert b.decode(ids) == "HE TT"


def test_asr_bundle_model_runs():
    model, params = P.WAV2VEC2_ASR_BASE_960H.get_model(
        jax.random.PRNGKey(2))
    wav = jnp.asarray(np.random.default_rng(1)
                      .standard_normal((1, 4000)), jnp.float32)
    logits, lengths = model.apply(params, wav)
    assert logits.shape[-1] == len(P.WAV2VEC2_ASR_BASE_960H.labels)
    assert logits.shape[1] == int(lengths[0])


def test_tts_bundle_text_processor():
    tp = P.TACOTRON2_WAVERNN_CHAR_LJSPEECH.get_text_processor()
    ids, lengths = tp(["Hello!", "hi"])
    assert ids.shape == (2, 6) and lengths.tolist() == [6, 2]
    assert (ids[1, 2:] == 0).all()
    assert "".join(tp.symbols[i] for i in ids[0][:6]) == "hello!"


def test_text_processor_accepts_bare_string():
    tp = P.TACOTRON2_WAVERNN_CHAR_LJSPEECH.get_text_processor()
    ids, lengths = tp("Hello!")
    batch_ids, batch_lengths = tp(["Hello!"])
    np.testing.assert_array_equal(ids, batch_ids)
    np.testing.assert_array_equal(lengths, batch_lengths)


def test_rnnt_bundle_composes():
    b = P.EMFORMER_RNNT_BASE_LIBRISPEECH
    # torchaudio's emformer_rnnt_base scale is pinned
    assert b.num_symbols == 4097 and b.time_reduction_stride == 4
    model, params = b.get_model(jax.random.PRNGKey(3))
    # the weight-compatible build: 1024-dim encodings, layer-norm-LSTM
    # predictor, stride-4 time reduction inside the transcriber
    assert model.enc_dim == 1024
    assert type(model.predictor).__name__ == "LayerNormLSTMPredictor"
    fe = b.get_feature_extractor()
    wav = jnp.asarray(np.random.default_rng(2)
                      .standard_normal((1, 16000)), jnp.float32)
    x = fe(wav)                 # (1, T', n_mels) — model reduces
    assert x.shape[-1] == b.n_mels
    assert bool(jnp.all(jnp.isfinite(x)))
    R = b.right_context_length
    s = b.time_reduction_stride
    T = (x.shape[1] - R) // s * s     # utterance must be a stride mult
    x = x[:, :T + R]
    hyp = model.greedy_decode(
        params, x, lengths=jnp.asarray([T]), max_symbols=1)
    assert isinstance(hyp, list) and len(hyp) == 1
    dec = b.get_decoder(model, beam_width=2)
    out = dec(params, x[:, :b.segment_length + R])
    assert len(out) == 1 and len(out[0]) >= 1


def test_separation_bundles_expose_sources():
    assert P.HDEMUCS_HIGH_MUSDB.sources == ("drums", "bass", "other",
                                            "vocals")
    assert P.CONVTASNET_BASE_LIBRI2MIX.sample_rate == 8000
    model, params = P.CONVTASNET_BASE_LIBRI2MIX.get_model(
        jax.random.PRNGKey(4))
    y = model.apply(params, jnp.zeros((1, 1600), jnp.float32))
    assert y.shape[1] == 2


def test_hifigan_bundle_mel_to_waveform():
    b = P.HIFIGAN_VOCODER_V3_LJSPEECH
    assert b.sample_rate == 22050
    fe = b.get_mel_transform()
    T = 4 * b.hop_length
    wav = jnp.asarray(np.random.default_rng(5)
                      .standard_normal((1, T)) * 0.1, jnp.float32)
    mel = fe(wav)
    assert mel.shape == (1, b.n_mels, T // b.hop_length)
    assert float(jnp.max(mel)) <= 0.0 + 12.0   # log-domain sanity
    voc, params = b.get_vocoder(jax.random.PRNGKey(6))
    out = voc.apply(params, mel)
    # vocoder restores exactly hop_length samples per frame
    assert out.shape == (1, 1, T)


def test_asr_bundle_lexicon_decoder():
    b = P.WAV2VEC2_ASR_BASE_960H
    dec = b.get_decoder({"THE": ["T", "H", "E"], "CAT": ["C", "A", "T"]},
                        beam_size=8)
    labels = b.get_labels()
    idx = {s: i for i, s in enumerate(labels)}
    seq = ["T", "H", "E", "|", "C", "A", "T", "|"]
    lp = np.full((len(seq), len(labels)), -10.0)
    for t, s in enumerate(seq):
        lp[t, idx[s]] = 0.0
    lp = lp - np.log(np.exp(lp).sum(1, keepdims=True))
    out = dec(lp)[0][0]
    assert out.words == ["THE", "CAT"]


def test_named_model_factories():
    from torchaudio_contrib_tpu import models as M
    assert M.conv_tasnet_base(3).ns == 3
    assert M.hdemucs_low().nfft == 1024
    assert M.hdemucs_medium().nfft == 2048
    assert M.hdemucs_high().nfft == 4096
    assert M.squim_objective_base().d == 64
    assert M.squim_subjective_base() is not None
    w = M.wav2vec2_model(d_model=32, num_layers=1, num_heads=4,
                         ff_dim=64)
    assert w.d_model == 32
    v = M.hifigan_vocoder(in_channels=8, upsample_rates=(4,),
                          upsample_kernel_sizes=(8,),
                          upsample_initial_channel=16,
                          resblock_kernel_sizes=(3,),
                          resblock_dilation_sizes=((1,),))
    assert v.upsample_factor == 4
    pre = M.hubert_pretrain_base(num_classes=7)
    assert pre.num_classes == 7
    with pytest.raises(ValueError, match="encoding_dim"):
        M.emformer_rnnt_model(input_dim=16, encoding_dim=32,
                              num_symbols=10, segment_length=4,
                              right_context_length=2)
    # a tiny emformer-rnnt actually runs greedy decode
    m = M.emformer_rnnt_model(
        input_dim=16, num_symbols=11, segment_length=4,
        right_context_length=2, num_heads=2, ffn_dim=32,
        num_layers=1, predictor_embed_dim=8,
        predictor_hidden_dim=16, predictor_layers=1, joiner_dim=16)
    params = m.init(jax.random.PRNGKey(9))
    x = jnp.asarray(np.random.default_rng(9)
                    .standard_normal((1, 8 + 2, 16)), jnp.float32)
    hyp = m.greedy_decode(params, x, lengths=jnp.asarray([8]),
                          max_symbols=1)
    assert len(hyp) == 1
    base = M.emformer_rnnt_base()
    assert base.v == 4097


def test_new_bundle_names_and_geometries():
    import jax
    from torchaudio_contrib_tpu import pipelines as P
    # provenance variants pin the same architecture
    assert P.WAV2VEC2_ASR_BASE_10M._factory \
        is P.WAV2VEC2_ASR_BASE_960H._factory
    assert P.WAVLM_BASE_PLUS._factory is P.WAVLM_BASE._factory
    assert P.HDEMUCS_HIGH_MUSDB_PLUS._factory \
        is P.HDEMUCS_HIGH_MUSDB._factory
    # torchaudio's LARGE keeps group_norm/post-LN; LV60K is pre-LN
    large = P.WAV2VEC2_ASR_LARGE_960H._factory()
    lv60k = P.WAV2VEC2_ASR_LARGE_LV60K_960H._factory()
    assert large.extractor_mode == "group_norm"
    assert not large.layer_norm_first
    assert lv60k.extractor_mode == "layer_norm"
    assert lv60k.layer_norm_first
    xl = P.HUBERT_ASR_XLARGE._factory(aux_out=29)
    assert xl.d_model == 1280 and xl.num_layers == 48


def test_griffinlim_tts_bundle(tmp_path):
    import numpy as np
    from torchaudio_contrib_tpu import pipelines as P
    b = P.TACOTRON2_GRIFFINLIM_CHAR_LJSPEECH
    voc = b.get_vocoder()
    rng = np.random.default_rng(0)
    mel = np.log(np.abs(rng.normal(size=(2, 80, 16))) * 0.01
                 + 1e-5).astype(np.float32)
    wave, lengths = voc(mel, lengths=np.asarray([16, 12]))
    assert wave.shape[0] == 2 and wave.shape[1] >= 15 * 256
    # frames*hop, clamped to the buffer (center ISTFT → (frames-1)*hop)
    assert lengths.tolist() == [min(16 * 256, wave.shape[-1]), 12 * 256]
    with pytest.raises(ValueError, match="no weights"):
        b.get_vocoder(key=0)


def test_phone_bundle_text_processor(tmp_path):
    import jax
    from torchaudio_contrib_tpu import pipelines as P
    (tmp_path / "cmudict-0.7b").write_bytes(
        b"HELLO  HH AH0 L OW1\nWORLD  W ER1 L D\n")
    b = P.TACOTRON2_WAVERNN_PHONE_LJSPEECH
    with pytest.raises(ValueError, match="cmudict"):
        b.get_text_processor()
    proc = b.get_text_processor(root=str(tmp_path))
    ids, lengths = proc(["hello world!", "world"])
    assert ids.shape[0] == 2 and lengths[0] > lengths[1]
    syms = proc.symbols
    assert len(syms) == 96
    # "hello" -> HH AH0 L OW1
    assert [syms[i] for i in ids[0, :4]] == ["HH", "AH0", "L", "OW1"]
    with pytest.raises(KeyError, match="not in CMUDict"):
        proc("zyzzyva")
    skip = b.get_text_processor(root=str(tmp_path), oov="skip")
    ids2, _ = skip("zyzzyva hello")
    assert syms[ids2[0, -1]] == "OW1"
    # the tacotron2 built for phones is sized for the 96-symbol table
    t2 = b.get_tacotron2(key=jax.random.PRNGKey(0))
    assert t2[1]["embedding"].shape[0] == 96


def test_phone_processor_apostrophes_separators_empty(tmp_path):
    from torchaudio_contrib_tpu import pipelines as P
    (tmp_path / "cmudict-0.7b").write_bytes(
        b"'TIS  T IH1 Z\nHELLO  HH AH0 L OW1\nWORLD  W ER1 L D\n")
    b = P.TACOTRON2_WAVERNN_PHONE_LJSPEECH
    proc = b.get_text_processor(root=str(tmp_path))
    syms = proc.symbols
    # apostrophe-initial CMUDict vocabulary is looked up as-is
    ids, lengths = proc("'tis hello")
    got = [syms[i] for i in ids[0, :int(lengths[0])]]
    assert got[:3] == ["T", "IH1", "Z"]
    # quoted word falls back to the apostrophe-stripped form
    ids, lengths = proc("'hello'")
    got = [syms[i] for i in ids[0, :int(lengths[0])]]
    assert got[:4] == ["HH", "AH0", "L", "OW1"]
    # oov='skip' drops the word WITHOUT a stray separator
    skip = b.get_text_processor(root=str(tmp_path), oov="skip")
    ids, lengths = skip("hello zyzzyva world")
    got = [syms[i] for i in ids[0, :int(lengths[0])]]
    assert got.count(" ") == 1
    # empty batch is a shape-(0, 1) no-op, not a crash
    out, lens = proc([])
    assert out.shape == (0, 1) and lens.shape == (0,)


def test_mms_fa_model_emits_log_probs_with_star(monkeypatch):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from torchaudio_contrib_tpu import pipelines as P

    def tiny(aux_out=None):
        return P.M.Wav2Vec2(
            extractor_conv_layers=((8, 10, 5), (8, 3, 2)),
            d_model=16, num_layers=1, num_heads=2, ff_dim=32,
            pos_conv_kernel=8, pos_conv_groups=2, aux_out=aux_out)

    monkeypatch.setattr(P.M, "wav2vec2_large_lv60k", tiny)
    model, params = P.MMS_FA.get_model(key=jax.random.PRNGKey(0))
    wav = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((2, 400)), jnp.float32)
    em, _ = model.apply(params, wav)
    # star = appended log-prob-0 wildcard, NOT a trained 29th class
    assert em.shape[-1] == 29
    np.testing.assert_allclose(np.asarray(em[..., -1]), 0.0)
    # the trained columns are normalized log-probabilities
    np.testing.assert_allclose(
        np.asarray(jax.nn.logsumexp(em[..., :28], axis=-1)),
        0.0, atol=1e-5)
    m2, p2 = P.MMS_FA.get_model(with_star=False,
                                key=jax.random.PRNGKey(0))
    em2, _ = m2.apply(p2, wav)
    assert em2.shape[-1] == 28


def test_griffinlim_vocoder_lengths_within_buffer():
    import numpy as np
    from torchaudio_contrib_tpu.pipelines import _GriffinLimVocoder
    voc = _GriffinLimVocoder(n_iter=2)
    wave, lengths = voc(np.zeros((1, 80, 16), np.float32),
                        lengths=[16])
    assert wave.shape[-1] == 15 * 256      # (frames-1)*hop, center
    assert int(lengths[0]) <= wave.shape[-1]


def test_mms_fa_bundle_aligns():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from torchaudio_contrib_tpu import pipelines as P
    b = P.MMS_FA
    labels = b.get_labels()
    assert labels[0] == "-" and labels[-1] == "*" and len(labels) == 29
    assert b.get_dict()["a"] == 1
    aligner = b.get_aligner()
    # synthetic peaked emission: tokens [1, 3] over 6 frames
    T, V = 6, len(labels)
    em = np.full((T, V), -10.0, np.float32)
    for t, tok in enumerate([1, 1, 0, 3, 3, 0]):
        em[t, tok] = 0.0
    spans = aligner(jnp.asarray(em), [1, 3])
    assert [s.token for s in spans] == [1, 3]
    assert spans[0].start == 0 and spans[0].end == 2
    assert spans[1].start == 3 and spans[1].end == 5


def test_prototype_rnnt_bundle_variants():
    """MuST-C / TED-LIUM3 prototype bundle names: same streaming
    architecture family, 501-symbol target vocabulary reaching the
    model."""
    import jax
    from torchaudio_contrib_tpu import pipelines as P
    for b in (P.EMFORMER_RNNT_BASE_MUSTC,
              P.EMFORMER_RNNT_BASE_TEDLIUM3):
        assert b.num_symbols == 501
        model, params = b.get_model(key=jax.random.PRNGKey(0))
        assert model.v == 501
        # vocabulary size reaches the joiner head
        assert params["joiner"]["b"].shape == (501,)
