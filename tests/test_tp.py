"""Tensor-parallel layouts (`parallel/tp.py`): rule correctness,
divisibility fallback, sharded-vs-replicated numerical equality for
Wav2Vec2 and RNNT on the 8-virtual-device mesh, and a DP+TP train
step."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu.parallel import (
    make_mesh, tensor_parallel_specs, shard_params)


def tiny_w2v(aux=None):
    return tac.Wav2Vec2(extractor_conv_layers=((8, 10, 5), (8, 3, 2)),
                        d_model=16, num_layers=2, num_heads=2,
                        ff_dim=32, pos_conv_kernel=8,
                        pos_conv_groups=2, aux_out=aux)


def test_specs_follow_rules():
    mesh = make_mesh(n_data=4, n_model=2)
    model = tiny_w2v()
    params = model.init(jax.random.PRNGKey(0))
    specs = tensor_parallel_specs(params, mesh)
    l0 = params["layers"][0]
    s0 = specs["layers"][0]
    assert s0["wqkv"].spec == P(None, "model")       # expand: out dim
    assert s0["w1"].spec == P(None, "model")
    assert s0["wo"].spec == P("model", None)         # contract: in dim
    assert s0["w2"].spec == P("model", None)
    assert s0["bqkv"].spec == P()                    # biases replicate
    assert specs["proj_ln"]["g"].spec == P()


def test_indivisible_dims_replicate():
    mesh = make_mesh(n_data=1, n_model=8)
    model = tac.Wav2Vec2(extractor_conv_layers=((8, 10, 5),),
                         d_model=20, num_layers=1, num_heads=2,
                         ff_dim=40, pos_conv_kernel=8,
                         pos_conv_groups=2)
    params = model.init(jax.random.PRNGKey(0))
    specs = tensor_parallel_specs(params, mesh)
    # ff_dim=40 divides 8 but d_model=20 does not -> wo replicates
    assert specs["layers"][0]["w1"].spec == P(None, "model")
    assert specs["layers"][0]["wo"].spec == P()


def test_override_wins():
    mesh = make_mesh(n_data=4, n_model=2)
    model = tiny_w2v()
    params = model.init(jax.random.PRNGKey(0))

    def override(path, leaf):
        if leaf.ndim == 2 and leaf.shape == (16, 48):
            return P()
        return None

    specs = tensor_parallel_specs(params, mesh, override=override)
    assert specs["layers"][0]["wqkv"].spec == P()
    assert specs["layers"][0]["w1"].spec == P(None, "model")


def test_wav2vec2_sharded_equals_replicated():
    mesh = make_mesh(n_data=4, n_model=2)
    model = tiny_w2v()
    params = model.init(jax.random.PRNGKey(1))
    wav = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((4, 400)), jnp.float32)
    ref, _ = model.apply(params, wav)
    sp = shard_params(params, mesh)
    wav_s = jax.device_put(wav, NamedSharding(mesh, P("data", None)))
    out, _ = jax.jit(model.apply)(sp, wav_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_wavlm_sharded_equals_replicated():
    """WavLM's extra leaves (rel_embed table, per-layer gate params)
    replicate under the name rules; the gated-bias attention must be
    numerically identical sharded vs replicated."""
    mesh = make_mesh(n_data=4, n_model=2)
    model = tac.WavLM(extractor_conv_layers=((8, 10, 5), (8, 3, 2)),
                      d_model=16, num_layers=2, num_heads=2,
                      ff_dim=32, pos_conv_kernel=8,
                      pos_conv_groups=2, num_buckets=16,
                      max_distance=30)
    params = model.init(jax.random.PRNGKey(1))
    specs = tensor_parallel_specs(params, mesh)
    assert specs["rel_embed"].spec == P()
    assert specs["layers"][0]["gru_w"].spec == P()
    assert specs["layers"][0]["gru_const"].spec == P()
    wav = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((4, 400)), jnp.float32)
    ref, _ = model.apply(params, wav)
    sp = shard_params(params, mesh)
    wav_s = jax.device_put(wav, NamedSharding(mesh, P("data", None)))
    out, _ = jax.jit(model.apply)(sp, wav_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_rnnt_sharded_train_step():
    """DP batch + TP params: loss and grads match the replicated
    run."""
    mesh = make_mesh(n_data=4, n_model=2)
    enc = tac.Conformer(input_dim=8, d_model=16, num_layers=1,
                        num_heads=2, conv_kernel=3)
    model = tac.RNNT(enc, num_symbols=6, encoding_dim=16,
                     joiner_dim=16, predictor_embed_dim=8,
                     predictor_hidden_dim=16)
    params = model.init(jax.random.PRNGKey(2))
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((4, 6, 8)), jnp.float32)
    tgt = jnp.asarray(np.random.default_rng(2)
                      .integers(1, 6, (4, 2)), jnp.int32)

    def loss_fn(p, xx):
        logits, L = model.joint_logits(p, xx, tgt)
        return tac.rnnt_loss(logits, tgt, L, blank=0)

    ref_l, ref_g = jax.value_and_grad(loss_fn)(params, x)
    sp = shard_params(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    l, g = jax.jit(jax.value_and_grad(loss_fn))(sp, xs)
    np.testing.assert_allclose(float(l), float(ref_l), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_g),
                    jax.tree_util.tree_leaves(g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-5)


def test_depthwise_conv_grad_under_batch_sharding():
    """Regression: the grouped-conv (feature_group_count=D) VJP
    mis-partitions when the batch is mesh-sharded and the mesh has a
    second axis (grad doubled by that axis's size).  Conformer's
    depthwise conv is therefore written as kernel-tap shifted
    multiply-adds; this pins that its dw grad stays exact under DP
    sharding with params fully replicated."""
    mesh = make_mesh(n_data=4, n_model=2)
    enc = tac.Conformer(input_dim=8, d_model=16, num_layers=1,
                        num_heads=2, conv_kernel=3)
    params = enc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((4, 6, 8)), jnp.float32)

    def loss(p, xx):
        return jnp.sum(enc.apply(p, xx) ** 2)

    ref = jax.grad(loss)(params, x)
    rp = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())),
        params)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
    g = jax.jit(jax.grad(loss))(rp, xs)
    a = np.asarray(ref["layers"][0]["conv"]["dw"])
    b = np.asarray(g["layers"][0]["conv"]["dw"])
    np.testing.assert_allclose(b, a, atol=3e-5)


def test_hifigan_sharded_equals_replicated():
    """The vocoder's conv pytree (w1/w2 resblock pairs, transposed-
    conv 'w' kernels) flows through the name rules: sharded forward
    matches replicated."""
    mesh = make_mesh(n_data=4, n_model=2)
    net = tac.HiFiGANVocoder(in_channels=8, upsample_rates=(4, 2),
                             upsample_kernel_sizes=(8, 4),
                             upsample_initial_channel=16,
                             resblock_kernel_sizes=(3,),
                             resblock_dilation_sizes=((1, 2),))
    params = net.init(jax.random.PRNGKey(3))
    mel = jnp.asarray(np.random.default_rng(4)
                      .standard_normal((4, 8, 12)), jnp.float32)
    ref = net.apply(params, mel)
    sp = shard_params(params, mesh)
    mel_s = jax.device_put(mel,
                           NamedSharding(mesh, P("data", None, None)))
    out = jax.jit(net.apply)(sp, mel_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_contract_rule_picks_channel_dims_not_spatial():
    """4-D conv kernels named 'w' shard their input-CHANNEL dim (2),
    never a spatial dim; recurrent 'wh' weights replicate (a sharded
    contraction inside a scan step would put a collective on every
    timestep)."""
    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "w": jnp.zeros((4, 4, 6, 8)),      # 2-D conv (kh, kw, cin, cout)
        "w2": jnp.zeros((3, 6, 8)),        # 1-D conv (k, cin, cout)
        "wh": jnp.zeros((16, 64)),         # recurrent hidden weight
    }
    specs = tensor_parallel_specs(params, mesh)
    assert specs["w"].spec == P(None, None, "model", None)
    assert specs["w2"].spec == P(None, "model", None)
    assert specs["wh"].spec == P()
