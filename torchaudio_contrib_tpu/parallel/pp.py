"""Pipeline parallelism (GPipe schedule) over a mesh axis.

The zoo's deepest encoders (``wav2vec2_xlsr_1b/2b`` — 48 layers × 1280
wide) exceed a single chip's HBM for training at useful batch sizes;
after FSDP (``parallel/fsdp.py``, memory) and tensor parallelism
(``parallel/tp.py``, per-layer compute) the remaining classic axis is
DEPTH: place contiguous blocks of layers on different chips and stream
microbatches through them.  [rebuild-only: the reference (SURVEY §2)
is single-process; this covers the pp axis of the driver's
tp/pp/dp/sp contract.]

TPU-first design — the whole schedule is ONE ``lax.scan`` inside ONE
``shard_map``, compiled once:

- the layer stack is stacked into a pytree with a leading
  ``(n_stages, layers_per_stage)`` axis pair and sharded over the mesh
  axis (``P(axis)``), so each chip holds only its own stage's weights;
- each scan step, every stage applies its local layers to its current
  microbatch and the activation hops one stage down the ring via a
  single ``lax.ppermute`` (ICI neighbour traffic, no all-to-all);
- stage 0 feeds microbatch ``t`` at step ``t``; the last stage writes
  its result at step ``t`` into output slot ``t − (n_stages − 1)``;
  the pipeline drains after ``n_microbatches + n_stages − 1`` steps
  (the usual GPipe bubble — keep ``n_microbatches ≫ n_stages``);
- everything (``scan``, ``ppermute``, masked writes) is differentiable,
  so the BACKWARD pipeline falls out of ``jax.grad`` — the reverse
  schedule ppermutes cotangents up the ring; no hand-written backward
  pass (pinned by a grads-match-sequential test);
- activations are arbitrary pytrees: per-microbatch state that every
  layer needs (padding masks, position biases) travels WITH the
  activation through the ring.

Composition: give the mesh a second axis (e.g. ``("pipe", "data")``)
and pass ``data_axis=`` — microbatches are then additionally sharded
over the data axis and each (pipe, data) chip processes its own batch
slice of its own stage (pinned by a 2-D-mesh test).  The feed tensor
is replicated along the pipe axis (every stage holds the microbatch
buffer; only stage 0 reads it) — simple and correct; for models whose
INPUT dominates memory, shard the feed upstream and all_gather into
stage 0 instead.

Equivalence contract: ``pipeline_apply(layer_fn, …)`` equals applying
``layer_fn`` over all layers in order on the unsplit batch (pinned by
test, forward AND gradients).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["stack_pipeline", "unstack_pipeline", "pipeline_shard",
           "microbatch", "unmicrobatch", "build_pipeline",
           "pipeline_apply"]


def stack_pipeline(layer_params, n_stages: int):
    """List of per-layer pytrees (identical treedef/shapes) → one
    pytree whose leaves carry a leading ``(n_stages,
    layers_per_stage)`` axis pair."""
    n = len(layer_params)
    if n_stages < 1 or n % n_stages:
        raise ValueError(
            f"{n} layers do not split into {n_stages} equal stages")
    per = n // n_stages
    stacked = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *layer_params)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(n_stages, per, *a.shape[1:]), stacked)


def unstack_pipeline(stacked):
    """Inverse of :func:`stack_pipeline`: back to the per-layer list
    (e.g. to hand updated weights back to a model's ``params``)."""
    leaves = jax.tree_util.tree_leaves(stacked)
    if not leaves:
        return []
    s, per = leaves[0].shape[:2]
    flat = jax.tree_util.tree_map(
        lambda a: a.reshape(s * per, *a.shape[2:]), stacked)
    return [jax.tree_util.tree_map(lambda a: a[i], flat)
            for i in range(s * per)]


def pipeline_shard(stacked, mesh: Mesh, axis: str = "pipe"):
    """Place a stacked layer pytree so each chip holds its stage."""
    sh = NamedSharding(mesh, P(axis))
    return jax.device_put(stacked, sh)


def microbatch(tree, n_microbatches: int):
    """Split every leaf's batch axis into ``(n_microbatches, mb,
    ...)``."""
    def _split(a):
        if a.shape[0] % n_microbatches:
            raise ValueError(
                f"batch {a.shape[0]} not divisible into "
                f"{n_microbatches} microbatches")
        return a.reshape(n_microbatches, a.shape[0] // n_microbatches,
                         *a.shape[1:])
    return jax.tree_util.tree_map(_split, tree)


def unmicrobatch(tree):
    """Inverse of :func:`microbatch` (merge the leading two axes)."""
    return jax.tree_util.tree_map(
        lambda a: a.reshape(a.shape[0] * a.shape[1], *a.shape[2:]),
        tree)


def _per_device(layer_fn, axis, n_stages, n_micro, sp, xs):
    """Shard-local GPipe schedule.  ``sp`` leaves are
    ``(1, layers_per_stage, ...)`` (this stage's block), ``xs`` leaves
    ``(n_micro, mb_local, ...)``."""
    sp = jax.tree_util.tree_map(lambda a: a[0], sp)
    per = jax.tree_util.tree_leaves(sp)[0].shape[0]
    idx = jax.lax.axis_index(axis)
    last = n_stages - 1
    perm = [(i, i + 1) for i in range(n_stages - 1)]
    zero = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape[1:], a.dtype), xs)
    out0 = jax.tree_util.tree_map(jnp.zeros_like, xs)

    def step(carry, t):
        act, out = carry
        if n_stages > 1:  # previous stage's output hops down the ring
            recv = jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(a, axis, perm), act)
        else:
            recv = act
        tf = jnp.clip(t, 0, n_micro - 1)
        feed = jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_index_in_dim(a, tf, 0, False), xs)
        y = jax.tree_util.tree_map(
            lambda f, r: jnp.where(idx == 0, f, r), feed, recv)
        for j in range(per):
            y = layer_fn(
                jax.tree_util.tree_map(lambda a: a[j], sp), y)
        w = jnp.clip(t - last, 0, n_micro - 1)
        write = (idx == last) & (t >= last)

        def _upd(o, v):
            keep = jax.lax.dynamic_index_in_dim(o, w, 0, False)
            return jax.lax.dynamic_update_index_in_dim(
                o, jnp.where(write, v, keep), w, 0)

        out = jax.tree_util.tree_map(_upd, out, y)
        return (y, out), None

    (_, out), _ = jax.lax.scan(step, (zero, out0),
                               jnp.arange(n_micro + n_stages - 1))
    # only the last stage's buffer holds results — mask + psum
    # replicates it along the pipe axis
    return jax.tree_util.tree_map(
        lambda o: jax.lax.psum(
            jnp.where(idx == last, o, jnp.zeros_like(o)), axis), out)


@functools.lru_cache(maxsize=32)
def _build(layer_fn, mesh, axis, data_axis, n_micro, n_stages):
    x_spec = P(None) if data_axis is None else P(None, data_axis)

    def run(stacked, micro):
        specs_p = jax.tree_util.tree_map(lambda _: P(axis), stacked)
        specs_x = jax.tree_util.tree_map(lambda _: x_spec, micro)
        fn = jax.shard_map(
            functools.partial(_per_device, layer_fn, axis, n_stages,
                              n_micro),
            mesh=mesh, in_specs=(specs_p, specs_x),
            out_specs=specs_x, check_vma=False)
        return fn(stacked, micro)

    return jax.jit(run)


def build_pipeline(layer_fn, mesh: Mesh, axis: str = "pipe",
                   data_axis: str | None = None,
                   n_microbatches: int = 8):
    """Build (once) the jitted pipelined stack application.

    ``layer_fn(layer_params, act) -> act`` applies ONE layer to an
    activation pytree (same structure in and out; close over static
    config).  The returned callable takes ``(stacked_params,
    microbatches)`` — see :func:`stack_pipeline` /
    :func:`microbatch` — and returns the microbatched outputs.
    Differentiable; repeated calls reuse the compiled executable
    (lru-cached per (layer_fn, mesh, axes, n_microbatches))."""
    n_stages = mesh.shape[axis]
    if data_axis is not None and data_axis not in mesh.shape:
        raise ValueError(f"mesh has no axis {data_axis!r}")
    return _build(layer_fn, mesh, axis, data_axis, n_microbatches,
                  n_stages)


def pipeline_apply(layer_fn, stacked_params, x, *, mesh: Mesh,
                   axis: str = "pipe", data_axis: str | None = None,
                   n_microbatches: int = 8):
    """One-call convenience: microbatch ``x`` (a pytree of
    batch-leading arrays), stream it through the stage-sharded
    ``stacked_params``, and merge the result back to batch-leading.
    Equals applying ``layer_fn`` over all layers in order (pinned by
    test)."""
    leaves = jax.tree_util.tree_leaves(stacked_params)
    if not leaves or leaves[0].shape[0] != mesh.shape[axis]:
        raise ValueError(
            f"stacked params carry {leaves[0].shape[0] if leaves else 0}"
            f" stages but mesh axis {axis!r} has {mesh.shape[axis]}")
    run = build_pipeline(layer_fn, mesh, axis, data_axis,
                         n_microbatches)
    return unmicrobatch(run(stacked_params, microbatch(x, n_microbatches)))
