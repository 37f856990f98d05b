"""f32 numeric mode — the TPU execution path (SURVEY.md §7.4 hard part 1).

The engine runs in float32 with window re-centering (positions kept near the
origin, offset accumulated in f64 on the host) plus diagonally-normalized
linear algebra (``sqrt_information``, ``schur_solve``). On CPU with x64
disabled this exercises exactly the arithmetic the chip executes; accuracy
must match the f64 validation path.

Runs in a subprocess: x64 is a process-global JAX config, and a fresh
process also bounds XLA:CPU compile accumulation.
"""

import json
import os
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_f32_engine_accuracy_matches_f64():
    with tempfile.TemporaryDirectory() as d:
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(ROOT, "tools", "run_sim.py"),
                "--duration", "15", "--f32", "--out", d,
            ],
            capture_output=True,
            text=True,
            timeout=1200,
            cwd=ROOT,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        result = json.loads(out.stdout.strip().splitlines()[-1])
        # f64 reference on the same sequence lands at ~0.11 m (GNSS noise
        # floor, BENCH_NOTES.md); f32 + re-centering must stay at that level
        assert result["ate_rmse_m"] < 0.3, result
        assert result["state"] == 1, result
        # outputs written
        assert os.path.exists(os.path.join(d, "gvins.nav"))
