"""Checkpoint round-trip for trainable params; config-mismatch guards."""
import numpy as np
import pytest
import jax

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu.models import MelFrontendClassifier
from torchaudio_contrib_tpu.utils import save_params, load_params


def test_roundtrip_pipeline_params(tmp_path, rng):
    mel = tac.Melspectrogram(num_mels=16, fft_length=128, trainable=True)
    params = mel.init_params()
    p = str(tmp_path / "fb.npz")
    save_params(p, params)
    restored = load_params(p, mel.init_params())
    got = jax.tree_util.tree_leaves(restored)
    want = jax.tree_util.tree_leaves(params)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_roundtrip_model_params(tmp_path):
    model = MelFrontendClassifier(num_classes=3, num_mels=8,
                                  fft_length=64, hop_length=16,
                                  channels=(4,))
    params = model.init(jax.random.PRNGKey(0))
    p = str(tmp_path / "model.npz")
    save_params(p, params)
    restored = load_params(p, model.init(jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(
        np.asarray(restored["head"]["w"]), np.asarray(params["head"]["w"]))


def test_mismatch_raises(tmp_path):
    mel = tac.Melspectrogram(num_mels=16, fft_length=128, trainable=True)
    p = str(tmp_path / "fb.npz")
    save_params(p, mel.init_params())
    other = tac.Melspectrogram(num_mels=32, fft_length=128, trainable=True)
    with pytest.raises(ValueError):
        load_params(p, other.init_params())


def test_treedef_mismatch_raises(tmp_path, rng):
    """Same leaf count AND shapes but different tree structure must be
    rejected — leaf-count checking alone would silently mis-restore."""
    a = rng.standard_normal((4, 4)).astype(np.float32)
    b = rng.standard_normal((4, 4)).astype(np.float32)
    p = str(tmp_path / "tree.npz")
    save_params(p, {"conv": a, "head": b})
    with pytest.raises(ValueError, match="tree structure"):
        load_params(p, [a, b])  # list vs dict: same leaves, other treedef
    with pytest.raises(ValueError, match="tree structure"):
        load_params(p, {"conv": a, "OTHER": b})  # different dict keys
    # matching structure still loads
    restored = load_params(p, {"conv": b, "head": a})
    np.testing.assert_array_equal(np.asarray(restored["conv"]), a)


def test_orbax_checkpoint_roundtrip(tmp_path):
    """Orbax-backed path for large/sharded pytrees: round-trips values
    and restores directly onto a sharded target layout."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from torchaudio_contrib_tpu.parallel import make_mesh
    from torchaudio_contrib_tpu.utils import save_checkpoint, \
        load_checkpoint

    model = MelFrontendClassifier(num_classes=3, num_mels=8,
                                  fft_length=64, hop_length=16,
                                  channels=(4,))
    params = model.init(jax.random.PRNGKey(0))
    p = str(tmp_path / "orbax_ck")
    save_checkpoint(p, params)
    restored = load_checkpoint(p, model.init(jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(
        np.asarray(restored["head"]["w"]), np.asarray(params["head"]["w"]))

    # restore directly onto a mesh-sharded target
    mesh = make_mesh()
    import jax.numpy as jnp
    sharded_like = jax.tree_util.tree_map(
        lambda a: jax.device_put(
            jnp.zeros_like(a),
            NamedSharding(mesh, P())), params)
    restored2 = load_checkpoint(p, sharded_like)
    leaf = jax.tree_util.tree_leaves(restored2)[0]
    assert len(leaf.devices()) == 8
    np.testing.assert_array_equal(
        np.asarray(restored2["head"]["b"]), np.asarray(params["head"]["b"]))
