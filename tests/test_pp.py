"""Pipeline parallelism (`parallel/pp.py`): GPipe schedule over a
stage-sharded mesh axis equals the sequential layer stack — forward
AND gradients (the backward pipeline is pure autodiff) — including
pytree activations, PP×DP 2-D meshes, a real Wav2Vec2 encoder stack,
and the stack/microbatch helper round-trips and validation."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu.parallel import (
    stack_pipeline, unstack_pipeline, pipeline_shard,
    microbatch, unmicrobatch, build_pipeline, pipeline_apply,
)


def _mesh(n_pipe, n_data=None):
    devs = np.asarray(jax.devices())
    if n_data is None:
        return Mesh(devs[:n_pipe], axis_names=("pipe",))
    return Mesh(devs[:n_pipe * n_data].reshape(n_pipe, n_data),
                axis_names=("pipe", "data"))


def _dense_layers(n, d, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), n)
    return [{"w": 0.5 * jax.random.normal(k, (d, d)),
             "b": 0.01 * jnp.ones((d,))} for k in ks]


def _dense_fn(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _sequential(layers, fn, x):
    for p in layers:
        x = fn(p, x)
    return x


def test_stack_microbatch_round_trips():
    layers = _dense_layers(8, 4)
    stacked = stack_pipeline(layers, 4)
    assert stacked["w"].shape == (4, 2, 4, 4)
    back = unstack_pipeline(stacked)
    assert len(back) == 8
    for a, b in zip(layers, back):
        np.testing.assert_array_equal(np.asarray(a["w"]),
                                      np.asarray(b["w"]))
    x = jnp.arange(24.0).reshape(12, 2)
    np.testing.assert_array_equal(
        np.asarray(unmicrobatch(microbatch(x, 4))), np.asarray(x))
    with pytest.raises(ValueError, match="stages"):
        stack_pipeline(layers, 3)
    with pytest.raises(ValueError, match="microbatches"):
        microbatch(x, 5)


def test_pipeline_matches_sequential():
    layers = _dense_layers(8, 16)
    mesh = _mesh(4)
    stacked = pipeline_shard(stack_pipeline(layers, 4), mesh)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((8, 16)), jnp.float32)
    out = pipeline_apply(_dense_fn, stacked, x, mesh=mesh,
                         n_microbatches=4)
    ref = _sequential(layers, _dense_fn, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6)
    # bubble-heavy shape (n_micro < n_stages) still drains correctly
    out2 = pipeline_apply(_dense_fn, stacked, x, mesh=mesh,
                          n_microbatches=2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=1e-6)


def test_pipeline_single_stage_degenerates():
    layers = _dense_layers(4, 8)
    mesh = _mesh(1)
    stacked = stack_pipeline(layers, 1)
    x = jnp.asarray(np.random.default_rng(1)
                    .standard_normal((4, 8)), jnp.float32)
    out = pipeline_apply(_dense_fn, stacked, x, mesh=mesh,
                         n_microbatches=2)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_sequential(layers, _dense_fn, x)),
        atol=1e-6)


def test_pipeline_gradients_match_sequential():
    """The backward pipeline comes from autodiff through the scanned
    ppermute schedule — parameter AND input grads must equal the
    sequential stack's."""
    layers = _dense_layers(4, 8, key=2)
    mesh = _mesh(2)
    stacked = stack_pipeline(layers, 2)
    x = jnp.asarray(np.random.default_rng(2)
                    .standard_normal((4, 8)), jnp.float32)

    def loss_pp(sp, v):
        y = pipeline_apply(_dense_fn, sp, v, mesh=mesh,
                           n_microbatches=2)
        return jnp.sum(y ** 2)

    def loss_seq(ls, v):
        return jnp.sum(_sequential(ls, _dense_fn, v) ** 2)

    g_sp, g_x = jax.grad(loss_pp, argnums=(0, 1))(stacked, x)
    g_ls, g_x_ref = jax.grad(loss_seq, argnums=(0, 1))(layers, x)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(g_x_ref),
                               atol=1e-5)
    for got, want in zip(unstack_pipeline(g_sp), g_ls):
        np.testing.assert_allclose(np.asarray(got["w"]),
                                   np.asarray(want["w"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(got["b"]),
                                   np.asarray(want["b"]), atol=1e-5)


def test_pipeline_pytree_activation():
    """Per-microbatch state (here a mask) travels with the activation
    through the ring."""
    layers = _dense_layers(4, 8, key=3)
    mesh = _mesh(4)
    stacked = stack_pipeline(layers, 4)

    def fn(p, act):
        x, m = act
        return (jnp.tanh(x @ p["w"] + p["b"]) * m, m)

    x = jnp.asarray(np.random.default_rng(3)
                    .standard_normal((8, 8)), jnp.float32)
    m = (jnp.arange(8.0)[None, :] < 5).astype(jnp.float32).repeat(8, 0)
    out, m_out = pipeline_apply(fn, stacked, (x, m), mesh=mesh,
                                n_microbatches=4)
    ref, _ = _sequential(layers, fn, (x, m))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_out), np.asarray(m))


def test_pipeline_2d_mesh_with_data_parallel():
    layers = _dense_layers(4, 8, key=4)
    mesh = _mesh(2, 4)
    stacked = stack_pipeline(layers, 2)
    x = jnp.asarray(np.random.default_rng(4)
                    .standard_normal((16, 8)), jnp.float32)
    out = pipeline_apply(_dense_fn, stacked, x, mesh=mesh,
                         data_axis="data", n_microbatches=4)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_sequential(layers, _dense_fn, x)),
        atol=1e-6)
    with pytest.raises(ValueError, match="axis"):
        pipeline_apply(_dense_fn, stacked, x, mesh=mesh,
                       data_axis="nope", n_microbatches=4)


def test_pipeline_validates_stage_count():
    layers = _dense_layers(4, 8)
    mesh = _mesh(4)
    stacked = stack_pipeline(layers, 2)     # 2 stages vs 4-way mesh
    x = jnp.zeros((4, 8))
    with pytest.raises(ValueError, match="stages"):
        pipeline_apply(_dense_fn, stacked, x, mesh=mesh)


def test_pipeline_wav2vec2_encoder_stack():
    """A REAL zoo layer: Wav2Vec2's transformer encoder layers
    pipelined over 4 stages equal the model's own `_encode` loop."""
    model = tac.Wav2Vec2(extractor_conv_layers=((8, 10, 5), (8, 3, 2)),
                         d_model=16, num_layers=8, num_heads=2,
                         ff_dim=32, pos_conv_kernel=8,
                         pos_conv_groups=2, layer_norm_first=False)
    params = model.init(jax.random.PRNGKey(5))
    mesh = _mesh(4)
    stacked = pipeline_shard(stack_pipeline(params["layers"], 4), mesh)
    x = jnp.asarray(np.random.default_rng(5)
                    .standard_normal((8, 12, 16)), jnp.float32)
    out = pipeline_apply(model.encoder_layer, stacked, x, mesh=mesh,
                         n_microbatches=4)
    ref = model._encode(params, x, pad_mask=None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_build_pipeline_reuses_compiled():
    layers = _dense_layers(4, 8, key=6)
    mesh = _mesh(2)
    run1 = build_pipeline(_dense_fn, mesh, n_microbatches=2)
    run2 = build_pipeline(_dense_fn, mesh, n_microbatches=2)
    assert run1 is run2
