"""Tensor-parallel parameter layouts for the model zoo.

The reference has no distributed code [SURVEY.md §2 #18]; TPU-native
scaling is GSPMD — sharding is a *layout annotation*, XLA partitions
every op and inserts the collectives, and any placement is
semantically correct.  These helpers pick the *performant* placement
for this package's transformer-style parameter pytrees by name rule
(Megatron-style): expanding GEMMs (``wqkv``/``w1``/``wi``/embeddings)
shard their output dim over the ``model`` axis, contracting
projections (``wo``/``w2``/``proj``) shard their input dim — so each
attention/FFN block computes shard-locally and XLA inserts ONE
``psum`` (reduce-scatter under data-parallel grads) at the block
output, riding ICI.

Dims that do not divide the mesh axis replicate (a warning-free
fallback — correctness is unaffected).  Compose with the ``data``
batch axis from :func:`.sharding.make_mesh` for standard DP+TP.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["tensor_parallel_specs", "shard_params", "EXPAND_KEYS",
           "CONTRACT_KEYS"]

# package-wide naming convention (models/*.py): expanding vs
# contracting GEMM weights
EXPAND_KEYS = frozenset({
    "wqkv", "wq", "wk", "wv", "wi", "w1", "emb", "label_emb",
    "pos_conv", "wg"})
# NOTE: recurrent hidden-state weights ("wh") deliberately replicate —
# sharding a contraction inside a lax.scan step would put one
# collective on every timestep of the decode/training critical path,
# the opposite of the Megatron one-psum-per-block rationale.
CONTRACT_KEYS = frozenset({"wo", "w2", "proj", "w"})


def _leaf_key(path) -> str:
    """Last dict key on the path (the parameter's local name)."""
    for entry in reversed(path):
        if hasattr(entry, "key"):
            return str(entry.key)
    return ""


def tensor_parallel_specs(params, mesh: Mesh, axis: str = "model",
                          override: Optional[Callable] = None):
    """Pytree of ``NamedSharding`` for ``params``.

    ``override(path, leaf)`` may return a ``PartitionSpec`` to force a
    leaf's layout (return ``None`` to defer to the rules).  Leaves
    whose target dim does not divide the mesh axis size replicate.
    """
    size = mesh.shape[axis]

    def spec_for(path, leaf):
        if leaf is None or not hasattr(leaf, "ndim"):
            return P()
        if override is not None:
            forced = override(path, leaf)
            if forced is not None:
                return forced
        key = _leaf_key(path)
        nd = leaf.ndim
        if nd >= 2 and key in EXPAND_KEYS and \
                leaf.shape[-1] % size == 0:
            return P(*([None] * (nd - 1)), axis)
        if nd >= 2 and key in CONTRACT_KEYS:
            # the contraction (input-channel) dim: dense (cin, cout)
            # → 0; 1-D conv (k, cin, cout) → 1; 2-D conv
            # (kh, kw, cin, cout) → 2 — never a spatial dim (that
            # would force halo exchanges instead of one psum)
            dim = {2: 0, 3: 1}.get(nd, nd - 2)
            if leaf.shape[dim] % size == 0:
                spec = [None] * nd
                spec[dim] = axis
                return P(*spec)
        return P()

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(
        treedef, [NamedSharding(mesh, spec_for(p, l))
                  for p, l in flat])


def shard_params(params, mesh: Mesh, axis: str = "model",
                 override: Optional[Callable] = None):
    """``device_put`` the pytree with :func:`tensor_parallel_specs`."""
    specs = tensor_parallel_specs(params, mesh, axis, override)
    return jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, s), params, specs)
