"""Same-session sweep of backward tile configs at BASELINE config 2
(cross-session variance is ~8%, so only same-session comparisons are
trustworthy).  Forces (TB, n_nt) via _bwd_tiles monkeypatch."""
import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from torchaudio_contrib_tpu import ops
    from torchaudio_contrib_tpu.ops import fused
    from torchaudio_contrib_tpu.utils.timing import time_device_loop

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((32, 1, 661500)).astype(np.float32))
    fb = ops.create_mel_filter(128, 22050, 0.0, None, 1025)
    f3 = lambda v: fused.fused_melspectrogram(v, fb, 2048, 512,
                                              precision="split3")
    g = jax.grad(lambda v: jnp.sum(f3(v)))

    for tb, n_nt in ((256, 1), (384, 2), (512, 2), (512, 4)):
        fused._bwd_tiles = lambda *a, _tb=tb, _nn=n_nt: (_tb, _nn)
        try:
            dt = time_device_loop(g, x, k=8)
            print(json.dumps({"tb": tb, "n_nt": n_nt,
                              "fwd_bwd_ms": round(dt * 1e3, 2)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"tb": tb, "n_nt": n_nt,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
