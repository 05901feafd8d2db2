"""Mixed-precision helpers (`utils/precision.py`): dtype routing of
`cast_floats`, and the `mixed_precision` wrapper's contract — bf16
compute inside, float32 params/grads/outputs outside, loss close to
the f32 loss, jit-stable."""
import numpy as np
import jax
import jax.numpy as jnp

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu.utils import cast_floats, mixed_precision


def tiny_w2v():
    return tac.Wav2Vec2(extractor_conv_layers=((8, 10, 5), (8, 3, 2)),
                        d_model=16, num_layers=2, num_heads=2,
                        ff_dim=32, pos_conv_kernel=8,
                        pos_conv_groups=2)


def test_cast_floats_routes_dtypes():
    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "idx": jnp.arange(3, dtype=jnp.int32),
            "flag": jnp.array(True),
            "z": jax.lax.complex(jnp.ones(2), jnp.zeros(2)),
            "py": 3.5, "none": None}
    out = cast_floats(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["idx"].dtype == jnp.int32
    assert out["flag"].dtype == jnp.bool_
    assert out["z"].dtype == jnp.complex64
    assert out["py"] == 3.5 and out["none"] is None


def test_mixed_precision_grads_stay_f32():
    model = tiny_w2v()
    p = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 400)) * 0.1, jnp.float32)

    def loss(pp, v):
        out, _ = model.apply(pp, v)
        assert out.dtype == jnp.bfloat16   # compute really is bf16
        return jnp.mean(jnp.square(out))

    g = jax.jit(jax.grad(mixed_precision(loss)))(p, x)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_mixed_precision_loss_close_to_f32():
    model = tiny_w2v()
    p = model.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 400)) * 0.1, jnp.float32)

    def loss(pp, v):
        return jnp.mean(jnp.square(model.apply(pp, v)[0]))

    l32 = float(jax.jit(loss)(p, x))
    l16 = float(jax.jit(mixed_precision(loss))(p, x))
    assert abs(l16 - l32) / max(abs(l32), 1e-9) < 2e-2
    # output cast honored
    assert jax.jit(mixed_precision(loss))(p, x).dtype == jnp.float32
    raw = jax.jit(mixed_precision(loss, output_dtype=None))(p, x)
    assert raw.dtype == jnp.bfloat16


def test_mixed_precision_skips_integer_args():
    def loss(pp, labels, scale=None):
        assert labels.dtype == jnp.int32
        assert scale.dtype == jnp.bfloat16
        return jnp.sum(pp["w"] * scale) + 0.0 * jnp.sum(labels)

    p = {"w": jnp.ones((2,), jnp.float32)}
    out = mixed_precision(loss)(p, jnp.arange(3, dtype=jnp.int32),
                                scale=jnp.ones((2,), jnp.float32))
    assert out.dtype == jnp.float32


def test_mixed_precision_cast_args_off():
    def loss(pp, v):
        assert v.dtype == jnp.float32      # args untouched
        return jnp.sum(pp["w"]) + jnp.sum(v)

    p = {"w": jnp.ones((2,), jnp.float32)}
    mixed_precision(loss, cast_args=False)(p, jnp.ones(3, jnp.float32))
