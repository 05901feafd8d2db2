"""Checkpointing for trainable transform params.

The reference's checkpoint story is *exclusion*: derived buffers never
enter ``state_dict`` (``_ModuleNoStateBuffers`` [SURVEY.md §5]).  Our
transforms recompute derived arrays from config, so the only state worth
persisting is explicit trainable param pytrees.  These helpers serialize
any pytree of arrays to a single ``.npz`` (no orbax dependency needed for
arrays this small; swap in orbax for sharded checkpoints).
"""
from __future__ import annotations

import json
from typing import Any

import numpy as np
import jax

__all__ = ["save_params", "load_params",
           "save_checkpoint", "load_checkpoint"]

_NONE = "__none__"


def _flatten(params: Any):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    return leaves, treedef


_FORMAT_VERSION = 1


def _meta_blob(obj: Any) -> np.ndarray:
    return np.frombuffer(json.dumps(obj).encode(), dtype=np.uint8)


def save_params(path: str, params: Any) -> None:
    """Serialize a pytree of arrays (Nones allowed) to ``path`` (.npz)."""
    leaves, treedef = _flatten(params)
    arrays = {f"leaf_{i}": np.asarray(jax.device_get(x))
              for i, x in enumerate(leaves)}
    arrays["__treedef__"] = _meta_blob(str(treedef))
    arrays["__meta__"] = _meta_blob({"format_version": _FORMAT_VERSION,
                                     "n_leaves": len(leaves)})
    np.savez(path, **arrays)


def load_params(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_params`.

    ``like`` provides the tree structure (e.g. ``model.init(key)`` or
    ``pipeline.init_params()``); leaf values are replaced by the stored
    arrays.  Raises if the tree structure, leaf count, or any leaf shape
    differs (config mismatch).
    """
    data = np.load(path)
    leaves, treedef = _flatten(like)
    n = sum(1 for k in data.files if k.startswith("leaf_"))
    if n != len(leaves):
        raise ValueError(
            f"checkpoint has {n} leaves; expected {len(leaves)} — "
            "was it saved from a different config?")
    if "__treedef__" in data.files:
        stored = json.loads(bytes(data["__treedef__"]).decode())
        if stored != str(treedef):
            raise ValueError(
                "checkpoint tree structure mismatch — saved from a "
                f"different config?\n  checkpoint: {stored}\n"
                f"  expected:   {treedef}")
    new_leaves = [data[f"leaf_{i}"] for i in range(n)]
    for old, new in zip(leaves, new_leaves):
        if tuple(np.shape(old)) != tuple(new.shape):
            raise ValueError(
                f"leaf shape mismatch: checkpoint {new.shape} vs model "
                f"{np.shape(old)}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


# -- orbax-backed sharded checkpoints ---------------------------------------

def save_checkpoint(path: str, params: Any) -> None:
    """Orbax-backed checkpoint of a param pytree (directory format).

    Use for LARGE or mesh-sharded pytrees: each leaf is written with its
    sharding (multi-host safe, async-capable under the hood).  For the
    small single-host pytrees this library typically produces,
    :func:`save_params` (.npz single file) is lighter.
    """
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()   # StandardCheckpointer saves async


def load_checkpoint(path: str, like: Any) -> Any:
    """Restore an orbax checkpoint saved by :func:`save_checkpoint`.

    ``like`` provides the target tree (shapes/dtypes — and shardings:
    pass a pytree of sharded arrays or ShapeDtypeStructs with
    ``sharding`` set to restore each leaf directly onto a mesh).
    """
    import os

    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(os.path.abspath(path), like)
