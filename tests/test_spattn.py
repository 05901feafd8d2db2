"""Sequence-parallel (time-sharded) attention (`parallel/spattn.py`):
ring attention ≡ full masked attention (values AND grads), the
SP Conformer and SP Wav2Vec2 forwards ≡ the unsharded models on the
8-virtual-device CPU mesh, and composition with the time-sharded mel
frontend."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from torchaudio_contrib_tpu.models import Conformer, Wav2Vec2
from torchaudio_contrib_tpu.parallel import (
    ring_attention, sp_conformer_apply, sp_wav2vec2_apply,
    time_sharded_melspectrogram)


def _mesh(n=8, name="sp"):
    return Mesh(np.asarray(jax.devices()[:n]).reshape(n), (name,))


# ------------------------------------------------------------------ #
# ring attention core                                                #
# ------------------------------------------------------------------ #

def _full_attention(q, k, v, lengths=None, bias=None):
    """Reference masked MHA on unsharded (B, T, H, dh)."""
    dh = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(dh)
    if bias is not None:
        s = s + bias[None]
    if lengths is not None:
        valid = jnp.arange(q.shape[1])[None] < lengths[:, None]
        s = jnp.where(valid[:, None, None, :], s, -1e30)
    a = jax.nn.softmax(s, -1)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v)


def _ring_on_mesh(q, k, v, mesh, lengths=None, bias_fn=None):
    spec = P(None, "sp", None, None)
    args = (q, k, v) if lengths is None else (q, k, v, lengths)
    if lengths is None:
        fn = jax.shard_map(
            lambda a, b, c: ring_attention(a, b, c, "sp",
                                           bias_fn=bias_fn),
            mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    else:
        fn = jax.shard_map(
            lambda a, b, c, ll: ring_attention(a, b, c, "sp",
                                               lengths=ll,
                                               bias_fn=bias_fn),
            mesh=mesh, in_specs=(spec, spec, spec, P()),
            out_specs=spec)
    return fn(*args)


def test_ring_attention_matches_full(rng):
    mesh = _mesh()
    B, T, H, dh = 2, 32, 2, 8
    q, k, v = (jnp.asarray(rng.standard_normal((B, T, H, dh)),
                           jnp.float32) for _ in range(3))
    lengths = jnp.asarray([29, 17])
    want = _full_attention(q, k, v, lengths)
    got = _ring_on_mesh(q, k, v, mesh, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_ring_attention_bias_from_global_indices(rng):
    mesh = _mesh()
    B, T, H, dh = 1, 24, 2, 4
    q, k, v = (jnp.asarray(rng.standard_normal((B, T, H, dh)),
                           jnp.float32) for _ in range(3))
    table = jnp.asarray(rng.standard_normal((2 * 5 + 1, H)),
                        jnp.float32)

    def bias_fn(qi, ki):
        dist = jnp.clip(ki[None, :] - qi[:, None], -5, 5)
        return jnp.transpose(table[dist + 5], (2, 0, 1))

    full_bias = bias_fn(jnp.arange(T), jnp.arange(T))
    want = _full_attention(q, k, v, bias=full_bias)
    got = _ring_on_mesh(q, k, v, mesh, bias_fn=bias_fn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_ring_attention_grads_match(rng):
    mesh = _mesh()
    B, T, H, dh = 1, 16, 2, 4
    q, k, v = (jnp.asarray(rng.standard_normal((B, T, H, dh)),
                           jnp.float32) for _ in range(3))
    lengths = jnp.asarray([13])

    def loss_ring(q, k, v):
        return jnp.sum(jnp.tanh(_ring_on_mesh(q, k, v, mesh, lengths)))

    def loss_full(q, k, v):
        return jnp.sum(jnp.tanh(_full_attention(q, k, v, lengths)))

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=1e-5)


def test_ring_attention_fully_masked_rows_finite(rng):
    """A sample with length 0 must produce finite output (uniform
    attention — the unsharded -1e30 fill semantics), not NaN."""
    mesh = _mesh()
    q, k, v = (jnp.asarray(rng.standard_normal((2, 16, 2, 4)),
                           jnp.float32) for _ in range(3))
    got = _ring_on_mesh(q, k, v, mesh, jnp.asarray([0, 16]))
    assert bool(jnp.all(jnp.isfinite(got)))


# ------------------------------------------------------------------ #
# SP Conformer                                                       #
# ------------------------------------------------------------------ #

@pytest.fixture(scope="module")
def conformer():
    model = Conformer(input_dim=16, d_model=32, num_layers=2,
                      num_heads=2, conv_kernel=7, max_distance=6)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_sp_conformer_matches_unsharded(conformer, rng):
    model, params = conformer
    mesh = _mesh()
    B, T = 2, 64
    x = jnp.asarray(rng.standard_normal((B, T, 16)), jnp.float32)
    lengths = jnp.asarray([64, 41])
    want = model.apply(params, x, lengths)
    got = sp_conformer_apply(model, params, x, lengths, mesh=mesh,
                             axis="sp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_sp_conformer_grads_match(conformer, rng):
    model, params = conformer
    mesh = _mesh()
    x = jnp.asarray(rng.standard_normal((1, 32, 16)), jnp.float32)
    lengths = jnp.asarray([27])

    g_sp = jax.grad(lambda pp: jnp.sum(jnp.tanh(sp_conformer_apply(
        model, pp, x, lengths, mesh=mesh, axis="sp"))))(params)
    g_ref = jax.grad(lambda pp: jnp.sum(jnp.tanh(
        model.apply(pp, x, lengths))))(params)
    flat_sp = jax.tree_util.tree_leaves_with_path(g_sp)
    flat_ref = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(g_ref)}
    for k, v in flat_sp:
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_ref[jax.tree_util.keystr(k)]),
            atol=3e-5, err_msg=jax.tree_util.keystr(k))


def test_sp_conformer_convolution_first(rng):
    model = Conformer(input_dim=8, d_model=16, num_layers=1,
                      num_heads=2, conv_kernel=7,
                      convolution_first=True)
    params = model.init(jax.random.PRNGKey(1))
    mesh = _mesh()
    x = jnp.asarray(rng.standard_normal((1, 32, 8)), jnp.float32)
    want = model.apply(params, x)
    got = sp_conformer_apply(model, params, x, mesh=mesh, axis="sp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_sp_conformer_validates_geometry(conformer):
    model, params = conformer
    mesh = _mesh()
    with pytest.raises(ValueError, match="divide"):
        sp_conformer_apply(model, params,
                           jnp.zeros((1, 30, 16)), mesh=mesh,
                           axis="sp")


def test_sp_conformer_composes_with_timeshard_mel(rng):
    """The long-audio pipeline: time-sharded mel frontend feeding the
    time-sharded Conformer — one waveform, never gathered."""
    mesh = _mesh()
    sr, hop, fft, n_mels = 16000, 128, 256, 16
    T_wav = 8 * hop * 16                          # 8 shards x 16 hops
    wav = jnp.asarray(rng.standard_normal((T_wav,)) * 0.1, jnp.float32)
    mel = time_sharded_melspectrogram(
        wav, mesh, axis="sp", num_mels=n_mels, sample_rate=sr,
        fft_length=fft, hop_length=hop)           # (mels, frames)
    frames = mel.shape[-1] - mel.shape[-1] % 8
    feats = jnp.swapaxes(mel[:, :frames], 0, 1)[None]   # (1, T, mels)
    model = Conformer(input_dim=n_mels, d_model=32, num_layers=1,
                      num_heads=2, conv_kernel=7)
    params = model.init(jax.random.PRNGKey(2))
    got = sp_conformer_apply(model, params, feats, mesh=mesh,
                             axis="sp")
    want = model.apply(params, feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


# ------------------------------------------------------------------ #
# SP Wav2Vec2                                                        #
# ------------------------------------------------------------------ #

_W2V_TINY = dict(extractor_conv_layers=((24, 10, 5), (24, 4, 2),
                                        (24, 4, 2)),
                 d_model=32, num_layers=2, num_heads=2, ff_dim=64,
                 pos_conv_kernel=16, pos_conv_groups=4)


@pytest.mark.parametrize("mode,lnf", [("group_norm", False),
                                      ("layer_norm", True)])
def test_sp_wav2vec2_matches_unsharded(rng, mode, lnf):
    model = Wav2Vec2(**_W2V_TINY, extractor_mode=mode,
                     layer_norm_first=lnf)
    params = model.init(jax.random.PRNGKey(3))
    mesh = _mesh()
    B = 2
    T = 8 * 20 * 4                      # 8 shards x stride 20 x 4
    wav = jnp.asarray(rng.standard_normal((B, T)) * 0.1, jnp.float32)
    lengths = jnp.asarray([T, T - 135])
    want, want_len = model.apply(params, wav, lengths)
    got, got_len = sp_wav2vec2_apply(model, params, wav, lengths,
                                     mesh=mesh, axis="sp")
    np.testing.assert_array_equal(np.asarray(got_len),
                                  np.asarray(want_len))
    got = np.asarray(got)
    want_np = np.asarray(want)
    for b in range(B):
        n = int(np.asarray(want_len)[b])
        np.testing.assert_allclose(got[b, :n], want_np[b, :n],
                                   atol=2e-5, err_msg=f"{mode} b={b}")


def test_sp_wav2vec2_grads_match(rng):
    model = Wav2Vec2(**_W2V_TINY, extractor_mode="group_norm",
                     layer_norm_first=False)
    params = model.init(jax.random.PRNGKey(4))
    mesh = _mesh()
    T = 8 * 20 * 2
    wav = jnp.asarray(rng.standard_normal((1, T)) * 0.1, jnp.float32)
    lengths = jnp.asarray([T - 60])

    def mask_valid(out, n):
        return jnp.where(jnp.arange(out.shape[1])[None, :, None] < n,
                         out, 0.0)

    g_sp = jax.grad(lambda pp: jnp.sum(jnp.tanh(mask_valid(
        sp_wav2vec2_apply(model, pp, wav, lengths, mesh=mesh,
                          axis="sp")[0],
        model.output_length(lengths)[0]))))(params)
    g_ref = jax.grad(lambda pp: jnp.sum(jnp.tanh(mask_valid(
        model.apply(pp, wav, lengths)[0],
        model.output_length(lengths)[0]))))(params)
    ref = {jax.tree_util.keystr(k): v for k, v in
           jax.tree_util.tree_leaves_with_path(g_ref)}
    for k, v in jax.tree_util.tree_leaves_with_path(g_sp):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref[jax.tree_util.keystr(k)]),
            atol=3e-5, err_msg=jax.tree_util.keystr(k))


def test_sp_wavlm_matches_unsharded(rng):
    """WavLM's gated rel-pos bias under the ring: local query gates ×
    global-offset bucket bias must equal the unsharded forward."""
    from torchaudio_contrib_tpu.models import WavLM
    mesh = _mesh()
    wl = WavLM(**_W2V_TINY, extractor_mode="layer_norm",
               layer_norm_first=True, num_buckets=8, max_distance=20)
    params = wl.init(jax.random.PRNGKey(5))
    B, T = 2, 8 * 20 * 4
    wav = jnp.asarray(rng.standard_normal((B, T)) * 0.1, jnp.float32)
    lengths = jnp.asarray([T, T - 200])
    want, want_len = wl.apply(params, wav, lengths)
    got, got_len = sp_wav2vec2_apply(wl, params, wav, lengths,
                                     mesh=mesh, axis="sp")
    np.testing.assert_array_equal(np.asarray(got_len),
                                  np.asarray(want_len))
    got, want_np = np.asarray(got), np.asarray(want)
    for b in range(B):
        nv = int(np.asarray(want_len)[b])
        np.testing.assert_allclose(got[b, :nv], want_np[b, :nv],
                                   atol=2e-5, err_msg=f"b={b}")


def test_sp_wav2vec2_rejects_bad_length():
    mesh = _mesh()
    w2 = Wav2Vec2(**_W2V_TINY)
    p2 = w2.init(jax.random.PRNGKey(6))
    with pytest.raises(ValueError, match="multiple"):
        sp_wav2vec2_apply(w2, p2, jnp.zeros((1, 1601)), mesh=mesh,
                          axis="sp")
