"""Torch checkpoint import + model-zoo cross-verification
(`utils/import_torch.py`).

These are the external-oracle tests the zoo previously lacked: tiny
randomly-initialized torch models (HF ``transformers``
Wav2Vec2Model/HubertModel/WavLMModel/SpeechT5HifiGan, ``torch.nn``
LSTM/Linear/Conv1d replicas) are converted through the importer and
forward parity is asserted ≤1e-4 (measured ~1e-6) — pinning GELU
variant (erf, not tanh), pre/post-LN placement, grouped pos-conv
padding (k//2 left, (k-1)//2 right), group-norm extractor stats,
WavLM bucket table + per-layer gates, LSTM gate order ``i,f,g,o``,
and every weight-layout transpose.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu.models.wav2vec2 import Wav2Vec2, WavLM
from torchaudio_contrib_tpu.models.hifigan import HiFiGANVocoder
from torchaudio_contrib_tpu.models.rnnt import RNNTPredictor
from torchaudio_contrib_tpu.utils import import_torch as it

_W2V_TINY = dict(extractor_conv_layers=((8, 10, 5), (8, 3, 2)),
                 d_model=16, num_layers=2, num_heads=2, ff_dim=32,
                 pos_conv_kernel=8, pos_conv_groups=4)


def _hf_w2v_cfg(**kw):
    from transformers import Wav2Vec2Config
    base = dict(conv_dim=(8, 8), conv_kernel=(10, 3),
                conv_stride=(5, 2), hidden_size=16,
                num_hidden_layers=2, num_attention_heads=2,
                intermediate_size=32, num_conv_pos_embeddings=8,
                num_conv_pos_embedding_groups=4)
    base.update(kw)
    return base


def _rng_wave(n=2, t=2000, seed=0):
    return np.random.default_rng(seed).standard_normal(
        (n, t)).astype(np.float32)


# ------------------------------------------------------------------ #
# wav2vec2 family                                                    #
# ------------------------------------------------------------------ #

def test_wav2vec2_base_parity():
    """Published BASE architecture: group-norm extractor (stats over
    time), post-LN encoder, even-kernel positional conv."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model
    tm = Wav2Vec2Model(Wav2Vec2Config(**_hf_w2v_cfg(
        feat_extract_norm="group", do_stable_layer_norm=False,
        conv_bias=False))).eval()
    ours = Wav2Vec2(**_W2V_TINY, extractor_mode="group_norm",
                    layer_norm_first=False)
    p = it.import_wav2vec2(tm.state_dict(), ours)
    x = _rng_wave()
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).last_hidden_state.numpy()
    got = np.asarray(ours.apply(p, x)[0])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)
    assert float(np.abs(got - ref).max()) < 1e-4


def test_wav2vec2_stable_ln_parity():
    """Published LARGE architecture: layer-norm extractor with conv
    bias, pre-LN ("stable") encoder with the final layer norm."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model
    tm = Wav2Vec2Model(Wav2Vec2Config(**_hf_w2v_cfg(
        feat_extract_norm="layer", do_stable_layer_norm=True,
        conv_bias=True))).eval()
    ours = Wav2Vec2(**_W2V_TINY, extractor_mode="layer_norm",
                    layer_norm_first=True)
    p = it.import_wav2vec2(tm.state_dict(), ours)
    x = _rng_wave(seed=1)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).last_hidden_state.numpy()
    got = np.asarray(ours.apply(p, x)[0])
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_hubert_parity():
    """HubertModel shares the wav2vec2 encoder; the importer accepts
    its state_dict unchanged."""
    from transformers import HubertConfig, HubertModel
    tm = HubertModel(HubertConfig(**_hf_w2v_cfg(
        feat_extract_norm="group", do_stable_layer_norm=False,
        conv_bias=False))).eval()
    ours = Wav2Vec2(**_W2V_TINY, extractor_mode="group_norm",
                    layer_norm_first=False)
    p = it.import_wav2vec2(tm.state_dict(), ours)
    x = _rng_wave(seed=2)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(ours.apply(p, x)[0]), ref,
                               atol=1e-4)


def test_wavlm_parity():
    """WavLM: T5 bucket table (layer-0, shared), per-layer
    pre-projection gates, gru_rel_pos_const — the exact semantics the
    round-3 advisor flagged as unverified."""
    from transformers import WavLMConfig, WavLMModel
    tm = WavLMModel(WavLMConfig(**_hf_w2v_cfg(
        feat_extract_norm="group", do_stable_layer_norm=False,
        conv_bias=False, num_buckets=16,
        max_bucket_distance=30))).eval()
    # make the gates + table matter: HF inits rel_attn_embed to zeros
    # and gru_rel_pos_const to ones — perturb so parity is not
    # trivially gate-independent
    with torch.no_grad():
        sd = tm.state_dict()
        g = torch.Generator().manual_seed(0)
        for k, v in sd.items():
            if "rel_attn_embed" in k or "gru_rel_pos_const" in k:
                v.add_(torch.randn(v.shape, generator=g) * 0.5)
    ours = WavLM(**_W2V_TINY, extractor_mode="group_norm",
                 layer_norm_first=False, num_buckets=16,
                 max_distance=30)
    p = it.import_wav2vec2(tm.state_dict(), ours)
    x = _rng_wave(seed=3)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).last_hidden_state.numpy()
    got = np.asarray(ours.apply(p, x)[0])
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_wav2vec2_ctc_head_and_prefix_strip():
    """Wav2Vec2ForCTC: the encoder keys gain a ``wav2vec2.`` prefix
    and an ``lm_head`` appears — the importer strips/routes both."""
    from transformers import Wav2Vec2Config, Wav2Vec2ForCTC
    tm = Wav2Vec2ForCTC(Wav2Vec2Config(**_hf_w2v_cfg(
        feat_extract_norm="group", do_stable_layer_norm=False,
        conv_bias=False, vocab_size=7))).eval()
    ours = Wav2Vec2(**_W2V_TINY, extractor_mode="group_norm",
                    layer_norm_first=False, aux_out=7)
    p = it.import_wav2vec2(tm.state_dict(), ours)
    x = _rng_wave(seed=4)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).logits.numpy()
    got = np.asarray(ours.apply(p, x)[0])
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_bundle_torch_checkpoint_wiring():
    """``pipelines.get_model(torch_checkpoint=)`` runs the importer;
    unsupported bundles raise loudly."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model
    from torchaudio_contrib_tpu import pipelines as pl
    tm = Wav2Vec2Model(Wav2Vec2Config(**_hf_w2v_cfg(
        feat_extract_norm="group", do_stable_layer_norm=False,
        conv_bias=False))).eval()
    bundle = pl.Wav2Vec2Bundle(
        _factory=lambda: Wav2Vec2(**_W2V_TINY,
                                  extractor_mode="group_norm",
                                  layer_norm_first=False))
    model, params = bundle.get_model(torch_checkpoint=tm.state_dict())
    x = _rng_wave(seed=5)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(model.apply(params, x)[0]),
                               ref, atol=1e-4)
    # SUBJECTIVE has no verified converter (documented negative);
    # OBJECTIVE now has one, so an empty dict fails loudly instead
    with pytest.raises(NotImplementedError):
        pl.SQUIM_SUBJECTIVE.get_model(torch_checkpoint={})
    with pytest.raises(KeyError):
        pl.SQUIM_OBJECTIVE.get_model(torch_checkpoint={})


def test_import_mismatch_is_loud():
    from transformers import Wav2Vec2Config, Wav2Vec2Model
    tm = Wav2Vec2Model(Wav2Vec2Config(**_hf_w2v_cfg(
        feat_extract_norm="group", do_stable_layer_norm=False,
        conv_bias=False))).eval()
    wrong = Wav2Vec2(**{**_W2V_TINY, "num_layers": 3},
                     extractor_mode="group_norm",
                     layer_norm_first=False)
    with pytest.raises(KeyError):
        it.import_wav2vec2(tm.state_dict(), wrong)


# ------------------------------------------------------------------ #
# HiFi-GAN                                                           #
# ------------------------------------------------------------------ #

def _tiny_hifigan_pair():
    from transformers import SpeechT5HifiGanConfig
    from transformers.models.speecht5.modeling_speecht5 import \
        SpeechT5HifiGan
    hm = SpeechT5HifiGan(SpeechT5HifiGanConfig(
        model_in_dim=8, upsample_initial_channel=16,
        upsample_rates=[4, 4], upsample_kernel_sizes=[8, 8],
        resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
        normalize_before=False, leaky_relu_slope=0.1)).eval()
    ours = HiFiGANVocoder(
        in_channels=8, upsample_rates=(4, 4),
        upsample_initial_channel=16, upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)), resblock_type=1)
    return hm, ours


def test_hifigan_parity():
    """Generator parity vs HF SpeechT5HifiGan (the published v1
    resblock topology): transposed-conv padding arithmetic, MRF
    averaging, the bare final leaky_relu (slope 0.01), tanh."""
    hm, ours = _tiny_hifigan_pair()
    p = it.import_hifigan(hm.state_dict(), ours)
    mel = np.random.default_rng(1).standard_normal(
        (2, 12, 8)).astype(np.float32)        # HF layout (B, T, C)
    with torch.no_grad():
        ref = hm(torch.from_numpy(mel)).numpy()
    got = np.asarray(ours.apply(p, np.transpose(mel, (0, 2, 1))))
    assert got.shape == (2, 1, ref.shape[-1])
    np.testing.assert_allclose(got[:, 0, :], ref, atol=1e-4)


def test_hifigan_weight_normed_checkpoint():
    """Published HiFi-GAN checkpoints ship weight-normed
    (``weight_g``/``weight_v`` or new-style parametrizations) — the
    importer folds them to the same forward."""
    hm, ours = _tiny_hifigan_pair()
    plain = it.import_hifigan(hm.state_dict(), ours)
    hm.apply_weight_norm()
    sd = hm.state_dict()
    assert any("weight_g" in k or "original0" in k for k in sd)
    folded = it.import_hifigan(sd, ours)
    for a, b in zip(jax.tree_util.tree_leaves(plain),
                    jax.tree_util.tree_leaves(folded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_hifigan_bundle_torch_checkpoint():
    from torchaudio_contrib_tpu import pipelines as pl
    hm, ours = _tiny_hifigan_pair()
    bundle = pl.HiFiGANVocoderBundle(
        _factory=lambda in_channels: HiFiGANVocoder(
            in_channels=in_channels, upsample_rates=(4, 4),
            upsample_initial_channel=16,
            upsample_kernel_sizes=(8, 8),
            resblock_kernel_sizes=(3, 5),
            resblock_dilation_sizes=((1, 3), (1, 3)),
            resblock_type=1),
        n_mels=8)
    model, params = bundle.get_vocoder(
        torch_checkpoint=hm.state_dict())
    mel = np.random.default_rng(2).standard_normal(
        (1, 8, 6)).astype(np.float32)
    with torch.no_grad():
        ref = hm(torch.from_numpy(np.transpose(mel, (0, 2, 1)))).numpy()
    np.testing.assert_allclose(
        np.asarray(model.apply(params, mel))[:, 0, :], ref, atol=1e-4)


# ------------------------------------------------------------------ #
# RNNT LSTM predictor                                                #
# ------------------------------------------------------------------ #

def test_rnnt_predictor_lstm_parity():
    """The predictor's LSTM recurrence vs a torch replica
    (nn.Embedding → nn.LSTM → nn.LayerNorm → nn.Linear): pins gate
    order (i,f,g,o), the summed double bias, and the SOS convention's
    independence from layout."""
    V, E, H, O, L = 11, 6, 10, 5, 2
    emb = torch.nn.Embedding(V, E)
    lstm = torch.nn.LSTM(E, H, num_layers=L, batch_first=True)
    ln = torch.nn.LayerNorm(H)
    out = torch.nn.Linear(H, O)
    for m in (emb, lstm, ln, out):
        m.eval()
    with torch.no_grad():
        # make LN affine non-trivial
        ln.weight.add_(torch.randn(H) * 0.3)
        ln.bias.add_(torch.randn(H) * 0.3)

    pred = RNNTPredictor(num_symbols=V, embed_dim=E, hidden_dim=H,
                         output_dim=O, num_layers=L, blank=0)
    params = {
        "emb": jnp.asarray(emb.weight.detach().numpy()),
        "layers": it.import_lstm(lstm.state_dict(), "", L),
        "ln": {"g": jnp.asarray(ln.weight.detach().numpy()),
               "b": jnp.asarray(ln.bias.detach().numpy())},
        "out": {"w": jnp.asarray(out.weight.detach().numpy().T),
                "b": jnp.asarray(out.bias.detach().numpy())},
    }
    targets = np.random.default_rng(0).integers(0, V, (3, 7))
    # torch oracle: prepend SOS (= blank 0) exactly as apply does
    seq = np.concatenate([np.zeros((3, 1), np.int64), targets], 1)
    with torch.no_grad():
        y, _ = lstm(emb(torch.from_numpy(seq)))
        ref = out(ln(y)).numpy()
    got = np.asarray(pred.apply(params, jnp.asarray(targets)))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


# ------------------------------------------------------------------ #
# Tacotron2 location-sensitive attention                             #
# ------------------------------------------------------------------ #

def test_tacotron2_attention_step_parity():
    """One location-attention energy/weight/context computation vs a
    torch replica of the published attention block (query/memory/v
    projections bias-free, 2-channel location conv + dense, tanh
    energy) — and the attention-LSTM step vs nn.LSTMCell."""
    from torchaudio_contrib_tpu.models.tacotron2 import (
        Tacotron2, _lstm_step)
    B, S, ENC, DEC, ATT, F, K = 3, 12, 8, 10, 6, 4, 5
    g = torch.Generator().manual_seed(0)

    q_lin = torch.nn.Linear(DEC, ATT, bias=False)
    m_lin = torch.nn.Linear(ENC, ATT, bias=False)
    v_lin = torch.nn.Linear(ATT, 1, bias=False)
    loc_conv = torch.nn.Conv1d(2, F, K, padding=(K - 1) // 2,
                               bias=False)
    loc_dense = torch.nn.Linear(F, ATT, bias=False)
    for m in (q_lin, m_lin, v_lin, loc_conv, loc_dense):
        m.eval()

    rng = np.random.default_rng(1)
    h_a = rng.standard_normal((B, DEC)).astype(np.float32)
    memory = rng.standard_normal((B, S, ENC)).astype(np.float32)
    att_w = np.abs(rng.standard_normal((B, S))).astype(np.float32)
    att_w /= att_w.sum(-1, keepdims=True)
    att_cum = np.abs(rng.standard_normal((B, S))).astype(np.float32)

    with torch.no_grad():
        t_mem = torch.from_numpy(memory)
        loc_in = torch.stack([torch.from_numpy(att_w),
                              torch.from_numpy(att_cum)], dim=1)
        processed = (q_lin(torch.from_numpy(h_a)).unsqueeze(1)
                     + m_lin(t_mem)
                     + loc_dense(loc_conv(loc_in).transpose(1, 2)))
        e = v_lin(torch.tanh(processed)).squeeze(-1)
        w_ref = torch.softmax(e, -1)
        ctx_ref = torch.bmm(w_ref.unsqueeze(1), t_mem).squeeze(1)

    # ours: replicate _step's attention slice with imported weights
    p = {
        "att_query": jnp.asarray(q_lin.weight.detach().numpy().T),
        "att_memory": jnp.asarray(m_lin.weight.detach().numpy().T),
        "att_v": jnp.asarray(v_lin.weight.detach().numpy().T),
        # torch conv (F, 2, K) → TIO (K, 2, F)
        "att_loc_conv": jnp.asarray(np.transpose(
            loc_conv.weight.detach().numpy(), (2, 1, 0))),
        "att_loc_fc": jnp.asarray(loc_dense.weight.detach().numpy().T),
    }
    from torchaudio_contrib_tpu.models.tacotron2 import _conv1d
    loc = jnp.stack([jnp.asarray(att_w), jnp.asarray(att_cum)], -1)
    loc = _conv1d(loc, p["att_loc_conv"], "SAME") @ p["att_loc_fc"]
    q = (jnp.asarray(h_a) @ p["att_query"])[:, None, :]
    mem_proj = jnp.asarray(memory) @ p["att_memory"]
    e_ours = (jnp.tanh(q + mem_proj + loc) @ p["att_v"])[..., 0]
    w_ours = jax.nn.softmax(e_ours, -1)
    ctx_ours = jnp.einsum("bs,bse->be", w_ours, jnp.asarray(memory))
    np.testing.assert_allclose(np.asarray(w_ours), w_ref.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ctx_ours), ctx_ref.numpy(),
                               atol=1e-5)

    # attention-LSTM step ≡ nn.LSTMCell on imported weights
    cell = torch.nn.LSTMCell(ENC, DEC).eval()
    lp = {"wx": jnp.asarray(cell.weight_ih.detach().numpy().T),
          "wh": jnp.asarray(cell.weight_hh.detach().numpy().T),
          "b": jnp.asarray((cell.bias_ih + cell.bias_hh)
                           .detach().numpy())}
    x = rng.standard_normal((B, ENC)).astype(np.float32)
    h0 = rng.standard_normal((B, DEC)).astype(np.float32)
    c0 = rng.standard_normal((B, DEC)).astype(np.float32)
    with torch.no_grad():
        h_ref, c_ref = cell(torch.from_numpy(x),
                            (torch.from_numpy(h0),
                             torch.from_numpy(c0)))
    h_got, c_got = _lstm_step(lp, jnp.asarray(h0), jnp.asarray(c0),
                              jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(h_got), h_ref.numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_got), c_ref.numpy(),
                               atol=1e-5)


# ------------------------------------------------------------------ #
# plumbing                                                           #
# ------------------------------------------------------------------ #

def test_load_torch_state_dict_roundtrip(tmp_path):
    lin = torch.nn.Linear(3, 4)
    path = tmp_path / "ckpt.pt"
    torch.save({"state_dict": lin.state_dict()}, path)
    sd = it.load_torch_state_dict(path)
    assert set(sd) == {"weight", "bias"}
    np.testing.assert_allclose(np.asarray(sd["weight"]),
                               lin.weight.detach().numpy())
