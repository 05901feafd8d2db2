"""Device-mesh helpers and batch-sharded transform execution.

The reference has **no** distributed code [SURVEY.md §2 #18, §5]: its
parallelism story is the ``(batch, channel, …)`` convention.  The
TPU-native equivalent is GSPMD: put the batch axis on a ``Mesh`` axis and
let XLA partition every op and insert any collectives (over ICI).  These
helpers wrap the three-line idiom so library users get corpus-scale
data parallelism without touching ``jax.sharding`` directly.

Mesh axes
---------
``data``  — batch data-parallelism (the primary axis; embarrassingly
            parallel feature extraction).
``model`` — optional intra-op axis: the mel GEMM's output (mel) axis and
            CNN channels shard here for the trainable-frontend train step
            (a small tensor-parallel dimension; collectives ride ICI).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "sharded_apply",
    "data_parallel",
]


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ``(data, model)`` mesh over the available devices.

    Defaults to all devices on the data axis — the right layout for
    feature extraction, which is embarrassingly parallel over the batch.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(x: jnp.ndarray, mesh: Mesh) -> jnp.ndarray:
    """Place ``x (batch, ...)`` with its batch dim split over ``data``."""
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    """Replicate a pytree across the mesh (params, small constants)."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, s), x)


def sharded_apply(fn, mesh: Mesh, donate: bool = False):
    """Jit ``fn(batch, ...)`` with the batch arg sharded over ``data``.

    The output inherits shardings from XLA's propagation; feature
    extraction stays fully local to each shard (no collectives).
    """
    in_sharding = NamedSharding(mesh, P("data"))

    jfn = jax.jit(fn, in_shardings=(in_sharding,),
                  donate_argnums=(0,) if donate else ())
    return jfn


def data_parallel(transform, mesh: Optional[Mesh] = None):
    """Wrap a :class:`~torchaudio_contrib_tpu.models.Transform` (or any
    pure per-sample fn) so calls shard the leading batch axis over the
    mesh.

    Uses ``shard_map`` rather than sharding propagation: feature
    transforms are embarrassingly parallel over the batch, and shard_map
    also keeps Pallas kernels (``FusedMelspectrogram``) partitioned —
    custom calls are opaque to GSPMD.  The batch size must divide the
    mesh's ``data`` axis.

    >>> mel = Melspectrogram(num_mels=128, fft_length=2048)
    >>> mel_dp = data_parallel(mel)         # all devices on 'data'
    >>> out = mel_dp(waveforms)             # (B, C, mels, T), B sharded
    """
    if mesh is None:
        mesh = make_mesh()
    sharding = NamedSharding(mesh, P("data"))

    fn = transform
    if mesh.size > 1:
        fn = jax.shard_map(lambda x: transform(x), mesh=mesh,
                           in_specs=P("data"), out_specs=P("data"),
                           check_vma=False)  # transform may wrap a
                                             # pallas_call (no vma)

    @functools.partial(jax.jit, in_shardings=(sharding,))
    def run(x):
        return fn(x)

    return run
