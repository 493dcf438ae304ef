"""Smoke-execute every user-facing example script with tiny settings.

The examples are the user-facing driver surface (reference analog:
``/root/reference/notebooks/*_script.py``), but no other test imports
them — without this lane a library-contract change can silently break
them (they are exactly what a new user runs first).  Each runs in a
subprocess on CPU with the smallest argparse settings that still
exercise its full path (solve / optimize / train loop + final report).
Marked ``slow``: the default CI lane skips these; nightly/full runs them.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EXAMPLES = [
    ["run_cahn_hilliard.py", "--grid", "32", "--saves", "4",
     "--t-final", "0.0004", "--dt", "1e-6"],
    ["run_advection_diffusion.py", "--grid", "32"],
    ["run_gpe_ground_state.py", "--grid", "32"],
    ["butler_volmer_constant_current.py", "--grid", "32", "--steps", "20"],
    ["optimize_nn.py", "--grid", "32", "--steps", "3"],
    ["optimize_legendre.py", "--grid", "32", "--steps", "3"],
    ["optimize_charging.py", "--grid", "16", "--segments", "2",
     "--substeps", "4", "--steps", "3"],
    ["optimize_3d.py"],
    ["rl_train_ppo.py", "--num-envs", "8", "--grid", "32", "--substeps",
     "2", "--updates", "2", "--rollout", "4", "--policy", "mlp"],
    ["rl_train_reinforce.py", "--num-envs", "8", "--grid", "32",
     "--substeps", "2", "--rollout", "4", "--iters", "2"],
]


@pytest.mark.slow
@pytest.mark.parametrize("argv", EXAMPLES, ids=[e[0] for e in EXAMPLES])
def test_example_runs(argv):
    env = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": ""}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", argv[0]), *argv[1:]],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{argv[0]} failed (rc={proc.returncode}):\n"
        + "\n".join(proc.stderr.strip().splitlines()[-8:])
    )
