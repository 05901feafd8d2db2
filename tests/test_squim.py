"""Squim (`models/squim.py`): output ranges/shapes, scale
invariance of the encoder normalization, gradient flow, regression
training on synthetic targets, jit."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from torchaudio_contrib_tpu.models import SquimObjective, SquimSubjective


def tiny_obj():
    return SquimObjective(d_model=8, enc_kernel=16, enc_stride=8,
                          hidden=8, num_blocks=1, chunk=4)


@pytest.fixture(scope="module")
def obj():
    model = tiny_obj()
    params = model.init(jax.random.PRNGKey(0))
    return model, params


@pytest.fixture(scope="module")
def subj():
    model = SquimSubjective(d_model=8, enc_kernel=16, enc_stride=8,
                            hidden=8, num_blocks=1, chunk=4)
    params = model.init(jax.random.PRNGKey(1))
    return model, params


def test_objective_shapes_and_ranges(obj):
    model, params = obj
    wav = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((3, 400)), jnp.float32)
    stoi, pesq, si_sdr = model.apply(params, wav)
    for v in (stoi, pesq, si_sdr):
        assert v.shape == (3,)
        assert np.isfinite(np.asarray(v)).all()
    assert (np.asarray(stoi) > 0).all() and (np.asarray(stoi) < 1).all()
    assert (np.asarray(pesq) > 1).all() and (np.asarray(pesq) < 4.5).all()


def test_objective_scale_invariance(obj):
    """The RMS input normalization makes predictions gain-invariant."""
    model, params = obj
    wav = jnp.asarray(np.random.default_rng(1)
                      .standard_normal((2, 400)), jnp.float32)
    a = model.apply(params, wav)
    b = model.apply(params, 10.0 * wav)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-5)


def test_objective_input_validation(obj):
    model, params = obj
    with pytest.raises(ValueError, match="batch, time"):
        model.apply(params, jnp.zeros((400,)))
    with pytest.raises(ValueError, match="at least"):
        model.apply(params, jnp.zeros((1, 8)))


def test_objective_gradients(obj):
    model, params = obj
    wav = jnp.asarray(np.random.default_rng(2)
                      .standard_normal((2, 400)), jnp.float32)

    def loss(p):
        s, q, d = model.apply(p, wav)
        return jnp.sum(s) + jnp.sum(q) + jnp.sum(d)

    g = jax.grad(loss)(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    dead = sum(bool(np.allclose(np.asarray(l), 0.0)) for l in flat)
    assert dead == 0, f"{dead} dead leaves"


def test_objective_trains_to_targets(obj):
    """Regress the three heads to distinct per-sample targets; the
    (clipped-range) predictions must approach them."""
    model = tiny_obj()
    params = model.init(jax.random.PRNGKey(3))
    rng = np.random.default_rng(4)
    wav = jnp.asarray(rng.standard_normal((4, 400)), jnp.float32)
    t_stoi = jnp.asarray([0.3, 0.9, 0.5, 0.7])
    t_pesq = jnp.asarray([1.5, 4.0, 2.5, 3.0])
    t_sdr = jnp.asarray([-5.0, 20.0, 5.0, 10.0])

    def loss(p):
        s, q, d = model.apply(p, wav)
        return (jnp.mean((s - t_stoi) ** 2)
                + jnp.mean((q - t_pesq) ** 2)
                + jnp.mean((d - t_sdr) ** 2))

    import optax
    opt = optax.adam(1e-2)
    ost = opt.init(params)

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(loss)(p)
        up, o = opt.update(g, o)
        return optax.apply_updates(p, up), o, l

    for _ in range(300):
        params, ost, l = step(params, ost)
    s, q, d = model.apply(params, wav)
    assert float(jnp.max(jnp.abs(s - t_stoi))) < 0.05
    assert float(jnp.max(jnp.abs(q - t_pesq))) < 0.1
    assert float(jnp.max(jnp.abs(d - t_sdr))) < 0.5


def test_subjective_shapes_range_and_grads(subj):
    model, params = subj
    rng = np.random.default_rng(5)
    test = jnp.asarray(rng.standard_normal((2, 400)), jnp.float32)
    ref = jnp.asarray(rng.standard_normal((2, 320)), jnp.float32)
    mos = model.apply(params, test, ref)
    assert mos.shape == (2,)
    assert (np.asarray(mos) > 1).all() and (np.asarray(mos) < 5).all()

    g = jax.grad(lambda p: jnp.sum(model.apply(p, test, ref)))(params)
    flat, _ = jax.tree_util.tree_flatten(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)


def test_subjective_uses_reference(subj):
    """A different reference must change the MOS prediction."""
    model, params = subj
    rng = np.random.default_rng(6)
    test = jnp.asarray(rng.standard_normal((1, 400)), jnp.float32)
    r1 = jnp.asarray(rng.standard_normal((1, 400)), jnp.float32)
    r2 = jnp.asarray(rng.standard_normal((1, 400)), jnp.float32)
    m1 = float(model.apply(params, test, r1)[0])
    m2 = float(model.apply(params, test, r2)[0])
    assert abs(m1 - m2) > 1e-6


def test_jit_matches_eager(obj):
    model, params = obj
    wav = jnp.asarray(np.random.default_rng(7)
                      .standard_normal((2, 400)), jnp.float32)
    a = model.apply(params, wav)
    b = jax.jit(model.apply)(params, wav)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=1e-6)
