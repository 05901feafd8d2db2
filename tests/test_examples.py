"""Smoke-run the example scripts (tiny settings, CPU) so they can't rot."""
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    code = (
        "import jax;"
        "jax.config.update('jax_platforms','cpu');"
        "jax.config.update('jax_num_cpu_devices', 8);"
        "import runpy, sys;"
        f"sys.path.insert(0, {ROOT!r});"
        f"sys.argv = {args!r};"
        f"runpy.run_path({os.path.join(ROOT, 'examples', args[0])!r},"
        "run_name='__main__')"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300, cwd=ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_melspectrogram_pipeline_example():
    stdout = _run(["melspectrogram_pipeline.py", "--tiny"])
    assert "istft round-trip max err" in stdout
    assert "corpus:" in stdout


def test_train_frontend_example():
    stdout = _run(["train_frontend.py", "--steps", "25", "--batch", "16"])
    assert "eval accuracy" in stdout


def test_streaming_asr_example():
    stdout = _run(["streaming_asr.py", "--tiny"])
    assert "greedy==full OK" in stdout


def test_fsdp_tp_train_example():
    stdout = _run(["fsdp_tp_train.py", "--steps", "40"])
    assert "FSDP+TP OK" in stdout
    assert "ZeRO-3:" in stdout


def test_pp_train_example():
    stdout = _run(["pp_train.py", "--steps", "60"])
    assert "PP(GPipe)+DP OK" in stdout
    assert "stack stayed stage-sharded" in stdout


@pytest.mark.parametrize("extra", [[], ["--bf16"]])
def test_ssl_pretrain_example(extra):
    stdout = _run(["ssl_pretrain.py", "--steps", "30",
                   "--batch", "8"] + extra)
    assert "masked-CE+pen" in stdout
    assert "done in" in stdout


def test_vocoder_example(tmp_path):
    stdout = _run(["vocoder_roundtrip.py"])
    assert "mel spectral convergence" in stdout
    wav = os.path.join(ROOT, "examples", "reconstructed.wav")
    if os.path.exists(wav):
        os.remove(wav)
