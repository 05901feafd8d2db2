"""HuBERT pretraining (`models/hubert.py`): span-mask statistics and
padding safety, logit shapes, gradient flow into the mask token and
label embeddings, pretraining overfit on synthetic clusterable audio,
and the factory configurations."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.models import (
    Wav2Vec2, HuBERTPretrainModel, span_mask,
    wav2vec2_base, wav2vec2_large,
    hubert_base, hubert_large, hubert_xlarge,
)

TINY_EXT = ((8, 10, 5), (8, 3, 2))      # total stride 10


def tiny_encoder(aux_out=None):
    return Wav2Vec2(extractor_conv_layers=TINY_EXT, d_model=16,
                    num_layers=2, num_heads=2, ff_dim=32,
                    pos_conv_kernel=8, pos_conv_groups=2,
                    aux_out=aux_out)


@pytest.fixture(scope="module")
def pretrain():
    model = HuBERTPretrainModel(tiny_encoder(), num_classes=4,
                                final_dim=8)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_span_mask_statistics():
    """Coverage ≈ 1 - (1-p)^span; spans are contiguous runs of the
    configured length."""
    m = np.asarray(span_mask(jax.random.PRNGKey(0), 64, 500,
                             mask_prob=0.065, mask_span=10))
    cov = m.mean()
    expect = 1 - (1 - 0.065) ** 10
    assert abs(cov - expect) < 0.05, (cov, expect)
    # single isolated start -> exactly span frames
    m1 = np.asarray(span_mask(jax.random.PRNGKey(1), 2000, 40,
                              mask_prob=0.002, mask_span=7))
    runs = []
    for row in m1:
        on = np.flatnonzero(row)
        if len(on):
            splits = np.split(on, np.flatnonzero(np.diff(on) > 1) + 1)
            runs += [len(s) for s in splits]
    # every contiguous run covers at least one whole span
    assert runs and min(runs) >= 7


def test_span_mask_respects_lengths():
    lengths = jnp.asarray([30, 12, 0])
    m = np.asarray(span_mask(jax.random.PRNGKey(2), 3, 30,
                             lengths=lengths, mask_prob=0.5,
                             mask_span=5))
    assert not m[1, 12:].any()
    assert not m[2].any()
    assert m[0].any()


def test_apply_shapes_and_mask_effect(pretrain):
    model, params = pretrain
    wav = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((2, 200)), jnp.float32)
    logits, fm, out_lengths, feats = model.apply(
        params, jax.random.PRNGKey(3), wav)
    T = model.encoder.output_length(200)
    assert logits.shape == (2, T, 4)
    assert fm.shape == (2, T)
    assert feats.shape[1] == T
    # forcing an all-False vs all-True mask changes the logits
    z = jnp.zeros((2, T), bool)
    l0, *_ = model.apply(params, None, wav, frame_mask=z)
    l1, *_ = model.apply(params, None, wav, frame_mask=~z)
    assert float(jnp.abs(l0 - l1).max()) > 1e-4


def test_gradients_reach_mask_emb_and_label_emb(pretrain):
    model, params = pretrain
    wav = jnp.asarray(np.random.default_rng(1)
                      .standard_normal((2, 200)), jnp.float32)
    T = model.encoder.output_length(200)
    labels = jnp.asarray(np.random.default_rng(2)
                         .integers(0, 4, (2, T)), jnp.int32)
    fm = jnp.asarray(np.arange(T)[None, :] % 3 == 0).repeat(2, 0)
    g = jax.grad(model.loss)(params, None, wav, labels,
                             frame_mask=fm)
    assert float(jnp.abs(g["mask_emb"]).max()) > 0
    assert float(jnp.abs(g["label_emb"]).max()) > 0
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)


def test_pretraining_overfits_synthetic_clusters(pretrain):
    """Four band-limited tones → four cluster ids; masked prediction
    should drive the CE far below chance (ln 4)."""
    model, _ = pretrain
    model = HuBERTPretrainModel(tiny_encoder(), num_classes=4,
                                final_dim=8, feature_penalty=0.0,
                                mask_prob=0.12, mask_span=3)
    params = model.init(jax.random.PRNGKey(5))
    rng = np.random.default_rng(6)
    B, Tw = 8, 200
    cls = rng.integers(0, 4, B)
    t = np.arange(Tw)
    wav = jnp.asarray(np.stack(
        [np.sin(2 * np.pi * (0.05 + 0.1 * c) * t)
         + 0.05 * rng.standard_normal(Tw) for c in cls]), jnp.float32)
    T = model.encoder.output_length(Tw)
    labels = jnp.asarray(np.repeat(cls[:, None], T, 1), jnp.int32)

    loss_g = jax.jit(jax.value_and_grad(
        lambda p, k: model.loss(p, k, wav, labels)))
    key = jax.random.PRNGKey(7)
    first = None
    for i in range(120):
        key, sub = jax.random.split(key)
        l, g = loss_g(params, sub)
        if first is None:
            first = float(l)
        params = jax.tree_util.tree_map(
            lambda p, gr: p - 0.05 * gr, params, g)
    assert float(l) < 0.35, (first, float(l))


def test_padded_batch_loss_matches_unpadded(pretrain):
    """Padding frames (labels masked out, lengths passed) must not
    change the loss when the frame mask is fixed."""
    model, params = pretrain
    rng = np.random.default_rng(8)
    wav = jnp.asarray(rng.standard_normal((1, 150)), jnp.float32)
    T = model.encoder.output_length(150)
    labels = jnp.asarray(rng.integers(0, 4, (1, T)), jnp.int32)
    fm = np.asarray(span_mask(jax.random.PRNGKey(9), 1, T,
                              mask_prob=0.3, mask_span=2))
    l_ref = model.loss(params, None, wav, labels,
                       frame_mask=jnp.asarray(fm))
    wav_p = jnp.pad(wav, ((0, 0), (0, 60)))
    Tp = model.encoder.output_length(210)
    labels_p = jnp.pad(labels, ((0, 0), (0, Tp - T)),
                       constant_values=-1)
    fm_p = jnp.asarray(np.pad(fm, ((0, 0), (0, Tp - T))))
    l_pad = model.loss(params, None, wav_p, labels_p,
                       lengths=jnp.asarray([150]), frame_mask=fm_p)
    np.testing.assert_allclose(float(l_pad), float(l_ref), atol=2e-5)


def test_pretrain_rejects_aux_encoder():
    with pytest.raises(ValueError, match="aux_out"):
        HuBERTPretrainModel(tiny_encoder(aux_out=5), num_classes=4)


def test_factory_configs():
    for f, d, n in ((wav2vec2_base, 768, 12), (wav2vec2_large, 1024, 24),
                    (hubert_base, 768, 12), (hubert_large, 1024, 24),
                    (hubert_xlarge, 1280, 48)):
        m = f()
        assert (m.d_model, m.num_layers) == (d, n)
        assert m.aux_out is None
    assert wav2vec2_base(aux_out=29).aux_out == 29
