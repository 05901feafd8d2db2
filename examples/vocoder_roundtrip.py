"""Mel → audio inversion demo: log-mel features back to a waveform.

Chain: waveform → FusedMelspectrogram (log-mel) → undo dB →
mel_to_linear (ridge pseudo-inverse) → sqrt (power→magnitude) →
GriffinLim → waveform.  Prints the mel-domain spectral convergence of
the reconstruction.

Run: python examples/vocoder_roundtrip.py
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import torchaudio_contrib_tpu as tac  # noqa: E402


def main():
    sr, fft_length, hop, mels = 16000, 512, 128, 80
    ts = np.arange(sr * 2) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * ts)
         + 0.25 * np.sin(2 * np.pi * 660 * ts)
         + 0.1 * np.sin(2 * np.pi * 1320 * ts)).astype(np.float32)
    xj = jnp.asarray(x)

    fb = tac.create_mel_filter(mels, sr, 0.0, None, fft_length // 2 + 1)
    inv = tac.create_inverse_mel_filter(mels, sr, 0.0, None,
                                        fft_length // 2 + 1)

    # analysis (fused kernel on TPU, XLA chain elsewhere)
    logmel = tac.fused_melspectrogram(xj, fb, fft_length, hop)
    print(f"log-mel: {xj.shape} -> {logmel.shape}")

    # synthesis
    mel_pow = tac.db_to_amplitude(logmel, power=2.0)
    lin_pow = tac.mel_to_linear(mel_pow, inv)
    mag = jnp.sqrt(lin_pow)
    # center=True inside the GL loop: hann+center=False violates NOLA at
    # the clip edges (window sum → 0); the small frame-offset vs the
    # center=False analysis is immaterial to reconstruction quality
    y = tac.griffin_lim(mag, fft_length, hop, n_iter=48,
                        key=jax.random.PRNGKey(0), method="matmul")
    print(f"reconstructed: {y.shape}")

    # quality: mel-domain spectral convergence
    mel_y = tac.fused_melspectrogram(
        jnp.asarray(y), fb, fft_length, hop, to_db=False)
    mel_x = tac.db_to_amplitude(logmel, power=2.0)
    n = min(mel_y.shape[-1], mel_x.shape[-1])
    sc = float(jnp.linalg.norm(mel_y[..., :n] - mel_x[..., :n])
               / jnp.linalg.norm(mel_x[..., :n]))
    print(f"mel spectral convergence: {sc:.4f} (lower is better)")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "reconstructed.wav")
    tac.io.write_wav(out, np.asarray(y, np.float32), sr)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
