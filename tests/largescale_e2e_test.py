"""The LargeScale.md playbook as ONE green integration test (VERDICT r2
item 5): streaming input -> sparse engine + bf16 SR + mesh +
steps_per_execution -> orbax checkpoint restore -> StableHLO parity.
Runs tools/run_largescale_e2e.py in a subprocess on the 8-CPU mesh."""
from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.parametrize("mesh", [None, "4x2"], ids=["single", "mesh4x2"])
def test_largescale_playbook_end_to_end(mesh, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "/root/repo/tools/run_largescale_e2e.py",
           "--vocab", "400", "--tables", "3", "--batch", "64",
           "--steps", "4", "--spe", "2", "--records", "2000",
           "--workdir", str(tmp_path / "work")]
    if mesh:
        cmd += ["--mesh", mesh]
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=900)
    assert p.returncode == 0, p.stdout + p.stderr
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert out["streaming"] and out["orbax_restore"]
    assert out["stablehlo_parity"]
    assert out["value"] > 0
