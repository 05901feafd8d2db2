"""FSDP(ZeRO-3)+TP training demo: wav2vec2 CTC fine-tune on a 2-D mesh.

Shows the production sharding recipe for models whose parameters +
optimizer state exceed one chip (``wav2vec2_xlsr_1b/2b``,
``hubert_xlarge``), at toy scale so it runs anywhere:

1. ``make_mesh(n_data, n_model)`` — 2-D ``(data, model)`` device mesh.
2. ``tensor_parallel_specs`` — Megatron name-rule TP over ``model``.
3. ``fsdp_specs(base_specs=tp)`` — every remaining large dim sharded
   over ``data`` (ZeRO-3); GSPMD inserts the per-layer ``all_gather``
   of weight shards before use and ``reduce_scatter`` of gradients.
4. ``fsdp_init`` — Adam moments land on exactly the param shards.
5. One jitted train step with ``out_shardings`` pinning the ZeRO
   layout, so updated params/state never materialize unsharded.

The per-device parameter bytes are printed against the replicated
cost — at real scale that gap (×n_devices) is what makes the model
fit.  The synthetic task (classify which band a tone sits in) is
learnable in ~40 steps.

Run: python examples/fsdp_tp_train.py [--steps N]
CPU: runs on an 8-virtual-device mesh (the test harness does this).
"""
import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import optax  # noqa: E402

import torchaudio_contrib_tpu as tac  # noqa: E402
from torchaudio_contrib_tpu.parallel import (  # noqa: E402
    make_mesh, tensor_parallel_specs, fsdp_specs, fsdp_shard,
    fsdp_init, fsdp_state_specs)

NUM_CLASSES = 4


def make_batch(rng, n, t_samples=1000):
    """One tone per clip at a class-specific frequency (toy 1 kHz rate)."""
    y = rng.integers(0, NUM_CLASSES, (n,))
    tt = np.arange(t_samples) / 1000.0
    x = 0.5 * np.sin(2 * np.pi * 60.0 * (2.0 ** y)[:, None] * tt)
    x += 0.02 * rng.standard_normal((n, t_samples))
    return jnp.asarray(x.astype(np.float32)), jnp.asarray(y)


def shard_bytes(tree):
    return sum(l.addressable_shards[0].data.nbytes
               for l in jax.tree_util.tree_leaves(tree)
               if hasattr(l, "addressable_shards"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()

    n_dev = len(jax.devices())
    n_model = 2 if n_dev % 2 == 0 and n_dev >= 4 else 1
    mesh = make_mesh(n_data=n_dev // n_model, n_model=n_model)
    print(f"mesh: data={n_dev // n_model} x model={n_model}")

    model = tac.Wav2Vec2(
        extractor_conv_layers=((16, 10, 5), (16, 4, 2), (16, 2, 2)),
        d_model=32, num_layers=2, num_heads=4, ff_dim=64,
        pos_conv_kernel=8, pos_conv_groups=4)
    head_key, init_key = jax.random.split(jax.random.PRNGKey(0))
    params = {"enc": model.init(init_key),
              "head": 0.1 * jax.random.normal(head_key,
                                              (32, NUM_CLASSES))}

    # TP over 'model' by name rule, then ZeRO-3 over 'data' on top
    tp = tensor_parallel_specs(params, mesh)
    params = fsdp_shard(params, mesh, base_specs=tp, min_size=64)
    specs = fsdp_specs(params, mesh, base_specs=tp, min_size=64)

    opt = optax.adam(3e-3)
    # same base_specs as the params: the Adam moments inherit the TP
    # axes too, so optimizer memory really is P/(n_data*n_model)
    opt_state = fsdp_init(opt.init, params, mesh, base_specs=tp,
                          min_size=64)

    total = sum(l.nbytes for l in jax.tree_util.tree_leaves(params))
    per_dev = shard_bytes(params) + shard_bytes(opt_state)
    print(f"params+opt replicated: {3 * total / 1e3:.1f} kB/device; "
          f"ZeRO-3: {per_dev / 1e3:.1f} kB/device")

    def loss_fn(p, x, y):
        h, _ = model.apply(p["enc"], x)          # (B, T', d)
        logits = jnp.mean(h, axis=1) @ p["head"]
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, y)), logits

    def train_step(p, s, x, y):
        (l, logits), g = jax.value_and_grad(loss_fn, has_aux=True)(p, x, y)
        upd, s = opt.update(g, s, p)
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return optax.apply_updates(p, upd), s, l, acc

    ospecs = fsdp_state_specs(opt.init, params, mesh, base_specs=tp,
                              min_size=64)
    rep = NamedSharding(mesh, P())
    step = jax.jit(train_step,
                   out_shardings=(specs, ospecs, rep, rep))

    rng = np.random.default_rng(0)
    data_sh = NamedSharding(mesh, P("data", None))
    t0 = time.time()
    for i in range(args.steps):
        x, y = make_batch(rng, 4 * (n_dev // n_model))
        x = jax.device_put(x, data_sh)
        y = jax.device_put(y, NamedSharding(mesh, P("data")))
        params, opt_state, loss, acc = step(params, opt_state, x, y)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.4f}  "
                  f"acc {float(acc):.2f}")
    print(f"{args.steps} steps in {time.time() - t0:.1f}s; "
          f"final loss {float(loss):.4f}")
    w = params["enc"]["layers"][0]["wqkv"]
    print("wqkv device-local shard:",
          w.addressable_shards[0].data.shape, "of", w.shape,
          "| FSDP+TP OK" if float(loss) < 1.0 else "| loss too high")


if __name__ == "__main__":
    main()
