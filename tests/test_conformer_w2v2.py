"""ConformerWav2Vec2 (`models/conformer_w2v2.py`): time-reduction
shape contract, padding invariance, every-leaf gradients, CTC aux
head, and HuBERT-pretrain composition via the duck-typed SSL surface."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.models.conformer_w2v2 import (
    ConformerWav2Vec2, conformer_wav2vec2_base,
    conformer_wav2vec2_model,
)
from torchaudio_contrib_tpu.models.hubert import HuBERTPretrainModel


@pytest.fixture(scope="module")
def tiny():
    net = ConformerWav2Vec2(feature_dim=8, stride=4, d_model=16,
                            num_layers=2, num_heads=2, ff_ratio=2,
                            conv_kernel=7)
    return net, net.init(jax.random.PRNGKey(0))


def test_shapes_and_time_reduction(tiny):
    net, params = tiny
    feats = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((3, 22, 8)), jnp.float32)
    out, lens = jax.jit(net.apply)(params, feats)
    assert out.shape == (3, 5, 16)          # 22 // 4 reduced frames
    assert lens.tolist() == [5, 5, 5]
    assert net.output_length(22) == 5
    with pytest.raises(ValueError, match="features must be"):
        net.apply(params, jnp.ones((2, 10)))
    with pytest.raises(ValueError, match="stride"):
        ConformerWav2Vec2(stride=0)


def test_padding_invariance_and_grads(tiny):
    net, params = tiny
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 16, 8)).astype(np.float32)
    full, _ = net.apply(params, jnp.asarray(x),
                        lengths=jnp.asarray([16]))
    xpad = np.concatenate([x, rng.standard_normal((1, 8, 8))
                           .astype(np.float32)], 1)
    padded, lens = net.apply(params, jnp.asarray(xpad),
                             lengths=jnp.asarray([16]))
    assert int(lens[0]) == 4
    np.testing.assert_allclose(np.asarray(padded[0, :4]),
                               np.asarray(full[0, :4]), atol=1e-5)
    assert float(jnp.max(jnp.abs(padded[0, 4:]))) == 0.0
    g = jax.grad(lambda p: jnp.sum(
        net.apply(p, jnp.asarray(x))[0] ** 2))(params)
    dead = [jax.tree_util.keystr(k)
            for k, v in jax.tree_util.tree_leaves_with_path(g)
            if float(jnp.max(jnp.abs(v))) == 0.0]
    assert not dead, dead


def test_aux_head_and_factories():
    net = conformer_wav2vec2_model(feature_dim=8, stride=2,
                                   d_model=16, num_layers=1,
                                   num_heads=2, aux_out=11)
    params = net.init(jax.random.PRNGKey(3))
    out, _ = net.apply(params, jnp.zeros((2, 10, 8)))
    assert out.shape == (2, 5, 11)
    base = conformer_wav2vec2_base()
    assert (base.feature_dim, base.stride, base.d_model) == (64, 4, 256)


def test_hubert_pretrain_composition(tiny):
    """The duck-typed SSL surface slots into HuBERTPretrainModel:
    features in, masked-prediction loss out, grads reach the mask
    token, label embeddings, and the Conformer."""
    net, _ = tiny
    pre = HuBERTPretrainModel(net, num_classes=5, mask_prob=0.5,
                              mask_span=2)
    params = pre.init(jax.random.PRNGKey(4))
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.standard_normal((2, 24, 8)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, (2, 6)), jnp.int32)
    loss = pre.loss(params, jax.random.PRNGKey(6), feats, labels,
                    lengths=jnp.asarray([24, 16]))
    assert np.isfinite(float(loss))
    g = jax.grad(lambda p: pre.loss(p, jax.random.PRNGKey(6), feats,
                                    labels))(params)
    for name in ("mask_emb", "label_emb"):
        assert float(jnp.max(jnp.abs(g[name]))) > 0.0, name
    enc_gmax = max(float(jnp.max(jnp.abs(v))) for v in
                   jax.tree_util.tree_leaves(g["encoder"]))
    assert enc_gmax > 0.0
