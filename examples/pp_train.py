"""Pipeline-parallel (GPipe) training demo: a deep transformer stack
streamed across a ``pipe`` mesh axis, composed with data parallelism.

Shows the depth-sharding recipe for models whose LAYER STACK exceeds
one chip (``wav2vec2_xlsr_1b/2b`` — 48 layers × 1280 wide), at toy
scale so it runs anywhere:

1. a 2-D ``(pipe, data)`` mesh;
2. ``stack_pipeline`` + ``pipeline_shard`` — the per-layer param list
   becomes one pytree with a leading ``(n_stages, layers_per_stage)``
   axis, sharded over ``pipe`` so each chip holds only its stage;
3. ``pipeline_apply`` — the GPipe microbatch schedule as ONE
   ``lax.scan`` (one ``ppermute`` hop per step); ``data_axis="data"``
   additionally splits every microbatch over the data axis;
4. the BACKWARD pipeline is pure autodiff — the train step is an
   ordinary ``jax.value_and_grad`` + Adam; stage-sharded moments fall
   out of ``zeros_like`` sharding propagation, no manual layout.

The embed/head (tiny, replicated) run outside the pipeline; only the
deep homogeneous stack — where the parameters actually live — is
staged.  The synthetic task (which quadrant pattern a feature
sequence carries) is learnable in ~60 steps.

Run: python examples/pp_train.py [--steps N]
CPU: runs on an 8-virtual-device mesh (the test harness does this).
"""
import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import optax  # noqa: E402

import torchaudio_contrib_tpu as tac  # noqa: E402
from torchaudio_contrib_tpu.parallel import (  # noqa: E402
    stack_pipeline, pipeline_shard, pipeline_apply)

NUM_CLASSES = 4
D_MODEL = 32
T_FRAMES = 12
N_LAYERS = 4


def make_batch(rng, n):
    """Class = which quarter of the time axis carries the bump."""
    y = rng.integers(0, NUM_CLASSES, (n,))
    x = 0.05 * rng.standard_normal((n, T_FRAMES, 8))
    for i, c in enumerate(y):
        x[i, c * (T_FRAMES // 4):(c + 1) * (T_FRAMES // 4), :] += 1.0
    return jnp.asarray(x.astype(np.float32)), jnp.asarray(y)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    args = ap.parse_args()

    devs = np.asarray(jax.devices())
    n_pipe = 2 if devs.size % 2 == 0 else 1
    n_data = devs.size // n_pipe
    mesh = Mesh(devs[:n_pipe * n_data].reshape(n_pipe, n_data),
                axis_names=("pipe", "data"))
    print(f"mesh: pipe={n_pipe} x data={n_data}")

    # the deep homogeneous stack: Wav2Vec2 transformer encoder layers
    model = tac.Wav2Vec2(
        extractor_conv_layers=((8, 10, 5), (8, 3, 2)),
        d_model=D_MODEL, num_layers=N_LAYERS, num_heads=4, ff_dim=64,
        pos_conv_kernel=8, pos_conv_groups=4, layer_norm_first=False)
    k_emb, k_enc, k_head, k_pos = jax.random.split(
        jax.random.PRNGKey(0), 4)
    stacked = pipeline_shard(
        stack_pipeline(model.init(k_enc)["layers"], n_pipe), mesh)
    rep = NamedSharding(mesh, P())
    # the transformer stack is permutation-equivariant over time and
    # the head mean-pools — the position-dependent task NEEDS a
    # positional embedding at the input or no depth can solve it
    params = {
        "embed": jax.device_put(
            0.3 * jax.random.normal(k_emb, (8, D_MODEL)), rep),
        "pos": jax.device_put(
            0.3 * jax.random.normal(k_pos, (T_FRAMES, D_MODEL)), rep),
        "stack": stacked,
        "head": jax.device_put(
            0.1 * jax.random.normal(k_head, (D_MODEL, NUM_CLASSES)),
            rep),
    }
    stage = jax.tree_util.tree_leaves(stacked)[0]
    print(f"stage-local stack shard: "
          f"{stage.addressable_shards[0].data.shape} of {stage.shape} "
          f"({N_LAYERS} layers -> {n_pipe} stages)")

    opt = optax.adam(3e-3)
    # zeros_like inherits the stage sharding — moments live with their
    # stage, nothing replicates
    opt_state = opt.init(params)

    n_micro = 4

    def loss_fn(p, x, y):
        h = x @ p["embed"] + p["pos"][None]
        h = pipeline_apply(model.encoder_layer, p["stack"], h,
                           mesh=mesh, data_axis="data",
                           n_microbatches=n_micro)
        logits = jnp.mean(h, axis=1) @ p["head"]
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, y)), logits

    def train_step(p, s, x, y):
        (l, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(p, x, y)
        upd, s = opt.update(g, s, p)
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return optax.apply_updates(p, upd), s, l, acc

    step = jax.jit(train_step)
    rng = np.random.default_rng(0)
    batch = n_micro * 2 * n_data          # microbatches split over data
    data_sh = NamedSharding(mesh, P(None, None, None))
    t0 = time.time()
    for i in range(args.steps):
        x, y = make_batch(rng, batch)
        x = jax.device_put(x, data_sh)
        params, opt_state, loss, acc = step(params, opt_state, x, y)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.4f}  "
                  f"acc {float(acc):.2f}")
    print(f"{args.steps} steps in {time.time() - t0:.1f}s; "
          f"final acc {float(acc):.2f}")
    w = params["stack"]["wqkv"]
    sh = w.addressable_shards[0].data.shape
    assert sh[0] * n_pipe == w.shape[0], \
        f"stack un-sharded after training: {sh} of {w.shape}"
    print("stack stayed stage-sharded through training:", sh,
          "of", tuple(w.shape))
    bubble = (n_pipe - 1) / (n_micro + n_pipe - 1)
    print(f"GPipe bubble at n_micro={n_micro}: {100 * bubble:.0f}% "
          f"(shrinks as 1/n_micro)")
    assert float(acc) >= 0.9, f"did not learn: acc {float(acc)}"
    print("PP(GPipe)+DP OK")


if __name__ == "__main__":
    main()
