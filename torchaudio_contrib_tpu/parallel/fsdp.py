"""Fully-sharded data parallelism (ZeRO-3 layout) for the model zoo.

The reference has no distributed code [SURVEY.md §2 #18]; this is the
TPU-native recipe for models whose parameters + optimizer state do not
fit one chip (``wav2vec2_xlsr_1b/2b``, ``hubert_xlarge``): store every
weight *sharded along the `data` mesh axis*, keep the batch sharded on
the same axis, and let GSPMD insert the per-layer ``all_gather`` of
the weight shards right before use (and the matching
``reduce_scatter`` of the gradients).  Peak parameter memory per chip
drops from ``P`` to ``P/n + one layer``, while the collectives ride
ICI and overlap with compute under XLA's latency-hiding scheduler.

Unlike :mod:`.tp` (Megatron name rules — which dim shards decides the
collective pattern), FSDP layout is pattern-free: ANY dim that divides
the axis works (1-D biases and LayerNorm vectors included), because
the weight is gathered whole before use.  We shard the largest
divisible dim (ties → last) so shards stay contiguous-ish; leaves with
no divisible dim — and leaves under ``min_size`` elements — replicate.

Compose with TP by passing a ``(data, model)`` mesh: weights shard
over ``data`` *in addition to* any ``model``-axis TP spec via
``base_specs=`` (standard 2-D "FSDP + TP" layout).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["fsdp_specs", "fsdp_shard", "fsdp_init",
           "fsdp_state_specs", "fsdp_min_size"]

# leaves smaller than this replicate: sharding a 128-float LayerNorm
# scale saves nothing and costs a gather
fsdp_min_size = 1024


def _is_spec(x):
    return isinstance(x, (NamedSharding, P))


def fsdp_specs(params, mesh: Mesh, axis: str = "data",
               base_specs=None,
               override: Optional[Callable] = None,
               min_size: Optional[int] = None):
    """Pytree of ``NamedSharding`` giving every large leaf a dim
    sharded over ``axis``.

    ``base_specs`` (optional, same treedef — e.g. from
    :func:`.tp.tensor_parallel_specs`) contributes each leaf's
    starting ``PartitionSpec``; the FSDP dim is added on a dim that
    base left unsharded (a base that already uses ``axis`` leaves the
    leaf untouched, so the call is idempotent).  ``override(path,
    leaf)`` may return a full ``PartitionSpec`` to force a leaf
    (``None`` defers).  ``min_size`` (default :data:`fsdp_min_size`)
    replicates leaves below that element count.
    """
    if min_size is None:
        min_size = fsdp_min_size
    size = mesh.shape[axis]
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    if base_specs is None:
        base_flat = [None] * len(flat)
    else:
        base_flat, base_treedef = jax.tree_util.tree_flatten(
            base_specs, is_leaf=_is_spec)
        if base_treedef != treedef:
            raise ValueError(
                "base_specs treedef mismatch: "
                f"params {treedef} vs base {base_treedef}")

    def trimmed(spec):
        while spec and spec[-1] is None:
            spec = spec[:-1]
        return P(*spec)

    def uses_axis(entry):
        return entry == axis or (isinstance(entry, tuple)
                                 and axis in entry)

    def spec_for(path, leaf, base):
        if leaf is None or not hasattr(leaf, "ndim"):
            return P()
        if override is not None:
            forced = override(path, leaf)
            if forced is not None:
                return forced
        spec = list(base.spec if isinstance(base, NamedSharding)
                    else (base or ()))
        spec += [None] * (leaf.ndim - len(spec))
        if (leaf.size < min_size or size == 1
                or any(uses_axis(e) for e in spec)):
            return trimmed(spec)
        # largest unsharded dim divisible by the axis; ties → last
        best = None
        for d in range(leaf.ndim):
            if spec[d] is None and leaf.shape[d] % size == 0:
                if best is None or leaf.shape[d] >= leaf.shape[best]:
                    best = d
        if best is not None:
            spec[best] = axis
        return trimmed(spec)

    return jax.tree_util.tree_unflatten(
        treedef, [NamedSharding(mesh, spec_for(p, l, b))
                  for (p, l), b in zip(flat, base_flat)])


def fsdp_shard(params, mesh: Mesh, axis: str = "data",
               base_specs=None, override: Optional[Callable] = None,
               min_size: Optional[int] = None):
    """``device_put`` the pytree with :func:`fsdp_specs`.

    For the optimizer state use :func:`fsdp_init` — a bare
    ``jit(opt.init)`` constant-folds the zero moments onto one device.
    """
    specs = fsdp_specs(params, mesh, axis, base_specs, override,
                       min_size)
    return jax.tree_util.tree_map(
        lambda leaf, s: jax.device_put(leaf, s), params, specs)


def fsdp_state_specs(init_fn, params, mesh: Mesh, axis: str = "data",
                     base_specs=None,
                     override: Optional[Callable] = None,
                     min_size: Optional[int] = None):
    """Sharding specs for ``init_fn(params)``'s state pytree (use as
    the train step's ``out_shardings`` for the optimizer state).

    Param-shaped state leaves (optax moments — their key path ends
    with the param's own path) inherit the param's EXACT spec,
    including any TP axes from ``base_specs``/``override``; everything
    else (scalars, schedule counters, odd-shaped accumulators) gets
    the plain largest-divisible-dim rule.
    """
    pspecs = fsdp_specs(params, mesh, axis, base_specs, override,
                        min_size)
    pflat, _ = jax.tree_util.tree_flatten_with_path(params)
    sflat = jax.tree_util.tree_leaves(pspecs, is_leaf=_is_spec)
    by_path = {tuple(path): (getattr(leaf, "shape", None), spec)
               for (path, leaf), spec in zip(pflat, sflat)}

    abstract = jax.eval_shape(init_fn, params)
    fallback = fsdp_specs(abstract, mesh, axis=axis,
                          min_size=min_size)
    aflat, atreedef = jax.tree_util.tree_flatten_with_path(abstract)
    fflat = jax.tree_util.tree_leaves(fallback, is_leaf=_is_spec)

    def spec_for(path, leaf, fb):
        t = tuple(path)
        for i in range(len(t)):
            hit = by_path.get(t[i:])
            if hit is not None and hit[0] is not None \
                    and tuple(getattr(leaf, "shape", ())) == \
                    tuple(hit[0]):
                return hit[1]
        return fb

    return jax.tree_util.tree_unflatten(
        atreedef, [spec_for(p, l, f)
                   for (p, l), f in zip(aflat, fflat)])


def fsdp_init(init_fn, params, mesh: Mesh, axis: str = "data",
              base_specs=None, override: Optional[Callable] = None,
              min_size: Optional[int] = None):
    """Initialize optimizer (or any derived) state with the ZeRO
    layout: ``fsdp_init(optax.adam(1e-3).init, sharded_params, mesh)``.

    Output layout = :func:`fsdp_state_specs` — param-shaped moments
    land on exactly the param's shards (pass the SAME
    ``base_specs``/``override`` as the param layout so TP axes carry
    over), scalars replicate.  (Explicit ``out_shardings`` are
    required because the zero moments do not data-depend on the
    params, so XLA would otherwise emit them as single-device
    constants.)
    """
    specs = fsdp_state_specs(init_fn, params, mesh, axis, base_specs,
                             override, min_size)
    return jax.jit(init_fn, out_shardings=specs)(params)
