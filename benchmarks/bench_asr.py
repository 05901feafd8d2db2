"""Device timing for the ASR additions: Kaldi fbank, RNN-T loss
(fwd / fwd+bwd), Conformer encoder step, CTC greedy decode.

One process, one chip, pinned methodology (utils/timing.py device
loop).  Prints one JSON line per measurement; numbers land in
docs/PERFORMANCE.md.
"""
import json

import numpy as np
import jax
import jax.numpy as jnp

from torchaudio_contrib_tpu.compliance import kaldi
from torchaudio_contrib_tpu.ops import rnnt_loss, ctc_greedy_decode
from torchaudio_contrib_tpu.models.conformer import Conformer
from torchaudio_contrib_tpu.utils.timing import time_device_loop


def emit(name, seconds, unit_count, unit):
    print(json.dumps({"bench": name, "ms": round(seconds * 1e3, 3),
                      "throughput": round(unit_count / seconds),
                      "unit": unit}), flush=True)


def main():
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    # --- kaldi fbank: 64 clips x 10 s @16 kHz, 23 mels ----------------
    x = jnp.asarray(rng.standard_normal((64, 160000)), jnp.float32)
    t = time_device_loop(lambda v: kaldi.fbank(v), x, k=8)
    frames = 64 * (1 + (160000 - 400) // 160)
    emit("kaldi_fbank_b64x10s", t, frames, "frames/s")

    # --- rnnt loss: B=8, T=200, U=32, C=512 ---------------------------
    b, tt, u, c = 8, 200, 32, 512
    logits = jnp.asarray(rng.standard_normal((b, tt, u + 1, c)) * 0.1,
                         jnp.float32)
    tgts = jnp.asarray(rng.integers(1, c, (b, u)), jnp.int32)
    t = time_device_loop(
        lambda z: rnnt_loss(z, tgts, blank=0, reduction="sum"),
        logits, k=8)
    emit("rnnt_fwd_b8_t200_u32_c512", t, b, "seq/s")
    t = time_device_loop(
        jax.grad(lambda z: rnnt_loss(z, tgts, blank=0, reduction="sum")),
        logits, k=8)
    emit("rnnt_fwdbwd_b8_t200_u32_c512", t, b, "seq/s")

    # --- conformer: B=16, T=400 frames, 80-dim, 16L/256d (~Librispeech
    # "small") — fwd and fwd+bwd -----------------------------------------
    enc = Conformer(input_dim=80, d_model=256, num_layers=16,
                    num_heads=4, ff_ratio=4, conv_kernel=31)
    params = enc.init(jax.random.PRNGKey(0))
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.float32), params)
    feats = jnp.asarray(rng.standard_normal((16, 400, 80)), jnp.float32)
    t = time_device_loop(lambda v: enc.apply(params, v), feats, k=8)
    emit("conformer16x256_fwd_b16_t400", t, 16 * 400, "frames/s")
    t = time_device_loop(
        lambda v: jax.grad(
            lambda p: jnp.sum(enc.apply(p, v) ** 2))(params)["proj"],
        feats, k=4)
    emit("conformer16x256_fwdbwd_b16_t400", t, 16 * 400, "frames/s")

    # --- ctc greedy decode: B=64, T=1000, C=1024 ----------------------
    lp = jnp.asarray(rng.standard_normal((64, 1000, 1024)), jnp.float32)
    t = time_device_loop(lambda v: ctc_greedy_decode(v)[0], lp, k=8)
    emit("ctc_greedy_b64_t1000_c1024", t, 64 * 1000, "frames/s")


if __name__ == "__main__":
    main()
