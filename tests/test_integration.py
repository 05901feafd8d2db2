"""End-to-end story test: WAV files → sharded corpus features →
trainable-frontend training → checkpoint → reload → identical inference.

One test walking the whole framework the way a user would (BASELINE
configs 2+3+5 glued together on the CPU mesh)."""
import numpy as np
import jax
import jax.numpy as jnp

import torchaudio_contrib_tpu as tac
from torchaudio_contrib_tpu import io as wavio
from torchaudio_contrib_tpu import parallel as par
from torchaudio_contrib_tpu.models import MelFrontendClassifier
from torchaudio_contrib_tpu.utils import save_params, load_params


def test_full_pipeline(tmp_path, rng):
    sr = 8000

    # 1) write a tiny WAV corpus with the native codec
    paths = []
    for i in range(16):
        w = (0.3 * np.sin(2 * np.pi * (200 + 40 * i)
                          * np.arange(sr) / sr)).astype(np.float32)
        p = str(tmp_path / f"clip{i}.wav")
        wavio.write_wav(p, w[None, :], sr)
        paths.append(p)

    # 2) sharded feature extraction over the 8-device mesh
    feats = {}
    pre = par.CorpusPreprocessor(
        wavio.make_wav_loader(paths), clip_samples=sr, batch_size=8,
        num_workers=2,
        sink=lambda i, m: feats.__setitem__(i, m),
        fft_length=256, hop_length=128, num_mels=32, sample_rate=sr,
        frames_per_chunk=8)
    stats = pre.run(range(16))
    assert stats.files_done == 16 and len(feats) == 16
    assert all(f.shape[1] == 32 for f in feats.values())

    # 3) train the flagship frontend a few steps on the raw audio
    model = MelFrontendClassifier(num_classes=4, num_mels=16,
                                  sample_rate=sr, fft_length=256,
                                  hop_length=128, channels=(8,))
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.stack([wavio.read_wav(p)[0][0] for p in paths])
                    [:, None, :])
    y = jnp.asarray(np.arange(16) % 4)
    first = None
    for _ in range(10):
        params, loss = model.train_step(params, x, y, 1e-3)
        if first is None:
            first = float(loss)
    assert np.isfinite(float(loss)) and float(loss) < first

    # 4) checkpoint → reload → identical logits
    ckpt = str(tmp_path / "model.npz")
    save_params(ckpt, params)
    restored = load_params(ckpt, model.init(jax.random.PRNGKey(9)))
    np.testing.assert_allclose(
        np.asarray(model.apply(params, x)),
        np.asarray(model.apply(restored, x)), rtol=1e-6)

    # 5) feature inversion sanity: log-mel → waveform (finite, right shape)
    mel_db = jnp.asarray(feats[0][None])               # (1, 1, 32, T)
    inv = tac.create_inverse_mel_filter(32, sr, 0.0, None, 129)
    lin = tac.mel_to_linear(tac.db_to_amplitude(mel_db, power=2.0), inv)
    wav = tac.griffin_lim(jnp.sqrt(lin), 256, 128, n_iter=4)
    assert wav.shape[-1] > 0 and bool(jnp.all(jnp.isfinite(wav)))
