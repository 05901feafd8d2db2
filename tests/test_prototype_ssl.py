"""Prototype SSL variants (`models/emformer_hubert.py`,
`models/conformer_w2v2.py::ConformerWav2Vec2PretrainModel`):
streaming ≡ full for the Emformer-HuBERT encoder, SSL masking
semantics, HuBERTPretrainModel composition, pretrain-wrapper mask
statistics / padding safety / gradient flow, and the factories."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.models import (
    EmformerHuBERT, emformer_hubert_model, emformer_hubert_base,
    ConformerWav2Vec2, ConformerWav2Vec2PretrainModel,
    conformer_wav2vec2_pretrain_model,
    conformer_wav2vec2_pretrain_base,
    conformer_wav2vec2_pretrain_large,
    HuBERTPretrainModel,
)


@pytest.fixture(scope="module")
def eh():
    enc = EmformerHuBERT(feature_dim=8, stride=2, d_model=16,
                         num_heads=2, ffn_dim=32, num_layers=2,
                         segment_length=4, left_context_length=3,
                         right_context_length=2, max_memory_size=2)
    params = enc.init(jax.random.PRNGKey(0))
    return enc, params


def _feat(b, t, f, seed=0):
    return jnp.asarray(np.random.default_rng(seed)
                       .standard_normal((b, t, f)), jnp.float32)


def test_emformer_hubert_shapes_and_lengths(eh):
    enc, params = eh
    # 3 segments of 4 encoder frames + 2 lookahead, stride 2
    t_feat = (12 + 2) * 2
    x = _feat(2, t_feat, 8)
    out, out_len = enc.apply(params, x)
    assert out.shape == (2, 12, 16)
    assert enc.output_length(t_feat) == 12
    np.testing.assert_array_equal(np.asarray(out_len), [12, 12])
    # int and traced-array output_length agree
    arr = enc.output_length(jnp.asarray([t_feat, 10]))
    assert int(arr[0]) == 12
    assert int(arr[1]) == max(10 // 2 - 2, 0)


def test_emformer_hubert_streaming_equals_full(eh):
    """Chaining `infer` over (S+R)*stride-frame feature chunks
    reproduces the full-utterance `apply` (Emformer contract lifted
    through the stack/project front end)."""
    enc, params = eh
    S, R, stride = enc.encoder.S, enc.encoder.R, enc.stride
    nseg = 3
    t_utt = nseg * S
    x = _feat(2, (t_utt + R) * stride, 8, seed=3)
    full, _ = enc.apply(params, x)
    state = enc.init_state(2)
    outs = []
    for i in range(nseg):
        chunk = x[:, i * S * stride:(i * S + S + R) * stride]
        o, _, state = enc.infer(params, chunk, state)
        outs.append(o)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, 1)),
                               np.asarray(full), atol=1e-5)


def test_emformer_hubert_mask_semantics(eh):
    enc, params = eh
    x = _feat(2, 28, 8, seed=4)
    t_out = enc.output_length(28)
    emb = jnp.full((16,), 0.5)
    none_mask = jnp.zeros((2, t_out), bool)
    base, _ = enc.apply(params, x)
    same, _ = enc.apply(params, x, frame_mask=none_mask,
                        mask_embedding=emb)
    np.testing.assert_allclose(np.asarray(same), np.asarray(base),
                               atol=1e-6)
    some = none_mask.at[:, 1].set(True)
    diff, _ = enc.apply(params, x, frame_mask=some, mask_embedding=emb)
    assert float(jnp.abs(diff - base).max()) > 1e-4
    with pytest.raises(ValueError, match="mask_embedding"):
        enc.apply(params, x, frame_mask=some)
    with pytest.raises(ValueError, match="utterance frames"):
        enc.apply(params, x, frame_mask=none_mask[:, :-1],
                  mask_embedding=emb)


def test_emformer_hubert_pretrain_composes(eh):
    """HuBERTPretrainModel over the Emformer encoder: finite loss,
    gradients reach the projection, the encoder, and the mask token."""
    enc, _ = eh
    model = HuBERTPretrainModel(enc, num_classes=4, final_dim=8)
    params = model.init(jax.random.PRNGKey(1))
    x = _feat(2, 36, 8, seed=5)
    t_out = enc.output_length(36)
    labels = jnp.asarray(np.random.default_rng(6)
                         .integers(0, 4, (2, t_out)), jnp.int32)
    loss, g = jax.value_and_grad(model.loss)(
        params, jax.random.PRNGKey(2), x, labels)
    assert np.isfinite(float(loss))
    assert float(jnp.abs(g["mask_emb"]).max()) > 0
    assert float(jnp.abs(g["encoder"]["proj"]["w"]).max()) > 0
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)


def test_emformer_hubert_validation_and_factories():
    with pytest.raises(ValueError, match="stride"):
        EmformerHuBERT(stride=0)
    enc = emformer_hubert_base()
    assert (enc.feature_dim, enc.stride, enc.d_model) == (80, 4, 768)
    assert enc.encoder.n_layers == 12
    small = emformer_hubert_model(feature_dim=4, stride=1, d_model=8,
                                  num_heads=2, ffn_dim=16,
                                  num_layers=1, segment_length=2,
                                  right_context_length=1, aux_out=5)
    p = small.init(jax.random.PRNGKey(0))
    out, _ = small.apply(p, _feat(1, 9, 4))
    assert out.shape == (1, 8, 5)
    with pytest.raises(ValueError, match="feature"):
        small.apply(p, _feat(1, 9, 3))
    with pytest.raises(ValueError, match="chunk"):
        small.infer(p, _feat(1, 2, 4), small.init_state(1))


@pytest.fixture(scope="module")
def cpt():
    model = conformer_wav2vec2_pretrain_model(
        feature_dim=8, stride=2, d_model=16, num_layers=2,
        num_heads=2, ff_ratio=2, conv_kernel=7,
        mask_prob=0.2, mask_span=3)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_conformer_pretrain_masked_forward(cpt):
    model, params = cpt
    x = _feat(2, 24, 8, seed=7)
    t_out = model.encoder.output_length(24)
    enc, out_len, fm, feats = model.apply(
        params, jax.random.PRNGKey(1), x)
    assert enc.shape == (2, t_out, 16)
    assert fm.shape == (2, t_out) and fm.dtype == bool
    assert feats.shape == (2, t_out, 16)  # 8 features × stride 2
    # explicit frame_mask overrides sampling and needs no key
    enc2, _, fm2, _ = model.apply(params, None, x, frame_mask=fm)
    np.testing.assert_allclose(np.asarray(enc2), np.asarray(enc),
                               atol=1e-6)
    assert fm2 is fm
    with pytest.raises(ValueError, match="key"):
        model.apply(params, None, x)


def test_conformer_pretrain_mask_respects_padding(cpt):
    model, params = cpt
    x = _feat(3, 24, 8, seed=8)
    lengths = jnp.asarray([24, 12, 8])
    out_len_exp = np.asarray(lengths) // 2
    _, out_len, fm, _ = model.apply(params, jax.random.PRNGKey(2), x,
                                    lengths=lengths)
    np.testing.assert_array_equal(np.asarray(out_len), out_len_exp)
    fm = np.asarray(fm)
    for i, l in enumerate(out_len_exp):
        assert not fm[i, l:].any()


def test_conformer_pretrain_grads_reach_mask_emb(cpt):
    model, params = cpt
    x = _feat(2, 24, 8, seed=9)
    t_out = model.encoder.output_length(24)
    fm = jnp.asarray(np.arange(t_out)[None] % 2 == 0).repeat(2, 0)

    def loss(p):
        enc, _, _, _ = model.apply(p, None, x, frame_mask=fm)
        return jnp.sum(enc ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["mask_emb"]).max()) > 0
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)


def test_conformer_pretrain_validation_and_factories():
    with pytest.raises(ValueError, match="aux_out"):
        ConformerWav2Vec2PretrainModel(
            ConformerWav2Vec2(feature_dim=4, d_model=8, num_layers=1,
                              num_heads=2, aux_out=3))
    with pytest.raises(ValueError, match="mask_prob"):
        conformer_wav2vec2_pretrain_model(mask_prob=0.0)
    with pytest.raises(ValueError, match="mask_span"):
        conformer_wav2vec2_pretrain_model(mask_span=0)
    base = conformer_wav2vec2_pretrain_base()
    assert base.encoder.d_model == 256
    large = conformer_wav2vec2_pretrain_large()
    assert large.encoder.d_model == 768
