"""FSDP layouts (`parallel/fsdp.py`): largest-divisible-dim rule,
min-size replication, sharded-vs-replicated train-step equality on the
8-virtual-device mesh, FSDP+TP composition, and ZeRO optimizer-state
inheritance."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu.parallel import (
    make_mesh, fsdp_specs, fsdp_shard, tensor_parallel_specs)


def tiny_w2v():
    return tac.Wav2Vec2(extractor_conv_layers=((8, 10, 5), (8, 3, 2)),
                        d_model=16, num_layers=2, num_heads=2,
                        ff_dim=32, pos_conv_kernel=8,
                        pos_conv_groups=2)


def test_specs_shard_largest_divisible_dim():
    mesh = make_mesh(n_data=8, n_model=1)
    params = tiny_w2v().init(jax.random.PRNGKey(0))
    specs = fsdp_specs(params, mesh, min_size=0)
    s0 = specs["layers"][0]
    # wqkv (16, 48): 48 is the largest dim and divides 8
    assert s0["wqkv"].spec == P(None, "data")
    # wo (16, 16): tie -> last dim
    assert s0["wo"].spec == P(None, "data")
    # bias (48,) divides -> sharded too (ZeRO shards everything)
    assert s0["bqkv"].spec == P("data")
    # LayerNorm scale (16,): 16 % 8 == 0 -> sharded at min_size=0
    assert s0["ln1"]["g"].spec == P("data")


def test_min_size_replicates_small_leaves():
    mesh = make_mesh(n_data=8, n_model=1)
    params = tiny_w2v().init(jax.random.PRNGKey(0))
    specs = fsdp_specs(params, mesh)  # default fsdp_min_size=1024
    pl = jax.tree_util.tree_leaves(params)
    sl = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, NamedSharding))
    checked = 0
    for leaf, s in zip(pl, sl):
        if leaf.size < 1024:
            assert s.spec == P(), (leaf.shape, s.spec)
            checked += 1
    assert checked > 0


def test_fsdp_train_step_equals_replicated():
    mesh = make_mesh(n_data=8, n_model=1)
    model = tiny_w2v()
    params = model.init(jax.random.PRNGKey(1))
    wav = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((8, 400)), jnp.float32)

    def loss_fn(p, x):
        out, _ = model.apply(p, x)
        return jnp.mean(out * out)

    ref_l, ref_g = jax.value_and_grad(loss_fn)(params, wav)
    specs = fsdp_specs(params, mesh, min_size=0)
    sp = fsdp_shard(params, mesh, min_size=0)
    # the weights are REALLY sharded (1/8 of the leaf per device)
    wqkv = sp["layers"][0]["wqkv"]
    assert wqkv.addressable_shards[0].data.shape == (16, 48 // 8)
    wav_s = jax.device_put(wav, NamedSharding(mesh, P("data", None)))
    # pin the grads to the ZeRO layout (reduce-scatter, not gather)
    rep = NamedSharding(mesh, P())
    l, g = jax.jit(jax.value_and_grad(loss_fn),
                   out_shardings=(rep, specs))(sp, wav_s)
    np.testing.assert_allclose(float(l), float(ref_l), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ref_g),
                    jax.tree_util.tree_leaves(g)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-5)
    assert g["layers"][0]["wqkv"].sharding.spec == P(None, "data")


def test_fsdp_composes_with_tp():
    mesh = make_mesh(n_data=4, n_model=2)
    model = tiny_w2v()
    params = model.init(jax.random.PRNGKey(2))
    tp = tensor_parallel_specs(params, mesh)
    specs = fsdp_specs(params, mesh, base_specs=tp, min_size=0)
    s0 = specs["layers"][0]
    # TP put 'model' on wqkv's out dim; FSDP adds 'data' on dim 0
    assert s0["wqkv"].spec == P("data", "model")
    assert s0["wo"].spec == P("model", "data")
    sp = jax.tree_util.tree_map(jax.device_put, params, specs)
    wav = jnp.asarray(np.random.default_rng(3)
                      .standard_normal((4, 400)), jnp.float32)
    ref, _ = model.apply(params, wav)
    wav_s = jax.device_put(wav, NamedSharding(mesh, P("data", None)))
    out, _ = jax.jit(model.apply)(sp, wav_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_indivisible_leaves_replicate_and_override_forces():
    mesh = make_mesh(n_data=8, n_model=1)
    params = {"odd": jnp.zeros((7, 9)), "big": jnp.zeros((8, 24))}
    specs = fsdp_specs(params, mesh, min_size=0)
    assert specs["odd"].spec == P()          # nothing divides 8
    assert specs["big"].spec == P(None, "data")

    def force(path, leaf):
        if any(getattr(e, "key", None) == "big" for e in path):
            return P("data", None)
        return None

    specs = fsdp_specs(params, mesh, min_size=0, override=force)
    assert specs["big"].spec == P("data", None)


def test_base_specs_treedef_mismatch_raises():
    mesh = make_mesh(n_data=8, n_model=1)
    params = {"a": jnp.zeros((8, 8)), "b": jnp.zeros((8, 8))}
    with pytest.raises(ValueError, match="base_specs"):
        fsdp_specs(params, mesh, base_specs={"a": P(None, "model")})
    # same leaf COUNT but different keys must raise too (a silent
    # mis-association would apply specs to the wrong params)
    with pytest.raises(ValueError, match="base_specs"):
        fsdp_specs(params, mesh,
                   base_specs={"a": P(None, "model"), "x": P()})


def test_base_already_using_axis_is_left_alone():
    mesh = make_mesh(n_data=8, n_model=1)
    params = {"w": jnp.zeros((8, 16))}
    base = {"w": P("data", None)}
    specs = fsdp_specs(params, mesh, base_specs=base, min_size=0)
    assert specs["w"].spec == P("data")      # untouched (idempotent)
    once = fsdp_specs(params, mesh, min_size=0)
    twice = fsdp_specs(params, mesh, base_specs=once, min_size=0)
    assert twice["w"].spec == once["w"].spec


def test_state_specs_inherit_tp_axes():
    import optax
    from torchaudio_contrib_tpu.parallel import fsdp_state_specs
    mesh = make_mesh(n_data=4, n_model=2)
    params = tiny_w2v().init(jax.random.PRNGKey(5))
    tp = tensor_parallel_specs(params, mesh)
    ss = fsdp_state_specs(optax.adam(1e-3).init, params, mesh,
                          base_specs=tp, min_size=0)
    pspec = fsdp_specs(params, mesh, base_specs=tp,
                       min_size=0)["layers"][0]["wqkv"].spec
    assert pspec == P("data", "model")
    assert ss[0].mu["layers"][0]["wqkv"].spec == pspec
    assert ss[0].nu["layers"][0]["wqkv"].spec == pspec
    assert ss[0].count.spec == P()


def test_optimizer_state_gets_zero_layout():
    import optax
    from torchaudio_contrib_tpu.parallel import fsdp_init
    mesh = make_mesh(n_data=8, n_model=1)
    params = tiny_w2v().init(jax.random.PRNGKey(3))
    sp = fsdp_shard(params, mesh, min_size=0)
    opt = optax.adam(1e-3)
    state = fsdp_init(opt.init, sp, mesh, min_size=0)
    mu = state[0].mu["layers"][0]["wqkv"]
    assert mu.sharding.spec == P(None, "data")
    assert mu.addressable_shards[0].data.shape == (16, 48 // 8)
    # scalar step count replicates
    assert state[0].count.sharding.spec == P()
