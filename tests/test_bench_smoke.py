"""bench.py smoke test on the CPU backend (tiny shapes, no baseline)."""
import json
import os
import subprocess
import sys


def test_bench_runs_and_emits_json():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "bench.py", "--batch", "2", "--seconds", "2",
         "--iters", "2", "--skip-baseline", "--skip-decode",
         "--force-cpu"],
        capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "melspec_db_fwd_frames_per_sec_per_chip"
    assert rec["value"] > 0
    assert rec["unit"] == "frames/s/chip"
