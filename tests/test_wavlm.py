"""WavLM (`models/wav2vec2.py::WavLM`): bucket formula vs a literal
float oracle, zero-bias exact equivalence to Wav2Vec2, padding
invariance with trained-like params, every-leaf gradients (incl. the
rel-pos table and gates), jit, HuBERT-pretrain composition."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu.models.wav2vec2 import Wav2Vec2, WavLM

_TINY = dict(extractor_conv_layers=((8, 10, 5), (8, 3, 2), (8, 2, 2)),
             d_model=16, num_layers=2, num_heads=2, ff_dim=32,
             pos_conv_kernel=9, pos_conv_groups=4)


@pytest.fixture(scope="module")
def tiny():
    m = WavLM(num_buckets=16, max_distance=30, **_TINY)
    return m, m.init(jax.random.PRNGKey(0))


def _oracle_bucket(rel, num_buckets, max_distance):
    """Literal per-element transcription of the WavLM/T5 bidirectional
    bucket rule (torchaudio components.py::_compute_bucket)."""
    nb = num_buckets // 2
    out = nb if rel > 0 else 0
    arel = abs(rel)
    max_exact = nb // 2
    if arel < max_exact:
        return out + arel
    large = max_exact + int(math.log(arel / max_exact)
                            / math.log(max_distance / max_exact)
                            * (nb - max_exact))
    return out + min(large, nb - 1)


def test_bucket_grid_matches_oracle(tiny):
    m, _ = tiny
    t = 37
    got = m._buckets(t)
    for q in range(t):
        for k in range(t):
            assert got[q, k] == _oracle_bucket(k - q, m.num_buckets,
                                               m.max_distance), (q, k)
    # every bucket except nb is reachable within max_distance
    # (bucket nb = "positive offset, distance 0" cannot occur: a
    # positive offset always contributes >= 1 — T5 rule property)
    big = WavLM(num_buckets=16, max_distance=30, **_TINY)._buckets(64)
    assert set(np.unique(np.asarray(big))) == set(range(16)) - {8}


def test_zero_bias_equals_wav2vec2(tiny):
    """With the bias table zeroed the gate multiplies zero, so WavLM
    must equal a plain Wav2Vec2 sharing the same base params EXACTLY
    (pins that the rebased attention path changes nothing else)."""
    m, p = tiny
    base = Wav2Vec2(**_TINY)
    p0 = jax.tree_util.tree_map(lambda x: x, p)   # shallow-ish copy
    p0["rel_embed"] = jnp.zeros_like(p0["rel_embed"])
    pb = {k: v for k, v in p0.items() if k != "rel_embed"}
    pb["layers"] = [{k: v for k, v in lp.items()
                     if k not in ("gru_w", "gru_b", "gru_const")}
                    for lp in p0["layers"]]
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2, 400)), jnp.float32)
    lengths = jnp.asarray([400, 250])
    ya, la = m.apply(p0, x, lengths)
    yb, lb = base.apply(pb, x, lengths)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))


def test_padding_invariance_trained_params(tiny):
    """Same valid sequence under different padded lengths with
    nonzero-bias params: the rel-pos bias depends only on offsets and
    key-side masking precedes the softmax, so valid frames must not
    move (atol covers fp reassociation only)."""
    m, p0 = tiny
    leaves, treedef = jax.tree_util.tree_flatten(p0)
    rng = np.random.default_rng(7)
    p = jax.tree_util.tree_unflatten(
        treedef, [l + jnp.asarray(rng.standard_normal(l.shape) * 0.05,
                                  l.dtype) for l in leaves])
    x = rng.standard_normal((1, 250)).astype(np.float32)
    lengths = jnp.asarray([250])
    ya, la = m.apply(p, jnp.asarray(np.pad(x, ((0, 0), (0, 150)))),
                     lengths)
    yb, lb = m.apply(p, jnp.asarray(np.pad(x, ((0, 0), (0, 350)))),
                     lengths)
    n = int(la[0])
    assert int(lb[0]) == n
    np.testing.assert_allclose(np.asarray(ya[0, :n]),
                               np.asarray(yb[0, :n]),
                               atol=2e-5, rtol=1e-5)


def test_grads_every_leaf_and_jit(tiny):
    m, p = tiny
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((2, 300)), jnp.float32)
    y, _ = jax.jit(lambda pp, v: m.apply(pp, v))(p, x)
    assert y.shape[:2] == (2, m.output_length(300))
    g = jax.grad(lambda pp: jnp.sum(m.apply(pp, x)[0] ** 2))(p)
    dead = [jax.tree_util.keystr(k)
            for k, v in jax.tree_util.tree_leaves_with_path(g)
            if float(jnp.max(jnp.abs(v))) == 0.0]
    assert not dead, dead
    assert float(jnp.max(jnp.abs(g["rel_embed"]))) > 0.0


def test_hubert_pretrain_composes():
    """WavLM slots into HuBERTPretrainModel unchanged (SSL duck
    typing: frame_mask/mask_embedding/return_features hooks)."""
    enc = WavLM(num_buckets=8, max_distance=20,
                extractor_conv_layers=((8, 10, 5), (8, 2, 2)),
                d_model=16, num_layers=1, num_heads=2, ff_dim=24,
                pos_conv_kernel=5, pos_conv_groups=2)
    model = tac.HuBERTPretrainModel(enc, num_classes=4)
    p = model.init(jax.random.PRNGKey(1))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 400)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, (2, enc.output_length(400))),
                         jnp.int32)
    loss = model.loss(p, jax.random.PRNGKey(2), x, labels)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda pp: model.loss(pp, jax.random.PRNGKey(2),
                                       x, labels))(p)
    assert float(jnp.max(jnp.abs(g["encoder"]["rel_embed"]))) > 0.0


def test_factories_and_validation():
    assert tac.wavlm_base().num_buckets == 320
    assert tac.wavlm_base().max_distance == 800
    assert tac.wavlm_large().d_model == 1024
    assert tac.wav2vec2_xlsr_300m().num_layers == 24
    assert tac.wav2vec2_xlsr_1b().d_model == 1280
    assert tac.wav2vec2_xlsr_2b().ff_dim == 7680
    with pytest.raises(ValueError):
        WavLM(num_buckets=7, **_TINY)
    with pytest.raises(ValueError):
        WavLM(num_buckets=16, max_distance=2, **_TINY)
