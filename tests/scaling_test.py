"""Weak-scaling gate (BASELINE.md north star: >=80% efficiency).

Real multi-chip hardware is not available in this image, so the gate runs
the faithful CPU simulation: an n-device virtual mesh pinned to exactly
one physical core per device (bench_scaling.pinned_rate). SPMD
partitioning + collective overhead would show up as sub-linear rates;
>=0.8 asserts the sharded train step costs <=20% over N independent
single-device steps.
"""
from __future__ import annotations

import os
import shutil

import pytest


@pytest.mark.skipif(shutil.which("taskset") is None, reason="needs taskset")
@pytest.mark.skipif((os.cpu_count() or 1) < 2, reason="needs >=2 cores")
def test_weak_scaling_efficiency_pinned():
    import bench_scaling as bs

    n = min(4, os.cpu_count())
    r1 = bs.pinned_rate(1, per_device_batch=1024, steps=10)
    rn = bs.pinned_rate(n, per_device_batch=1024, steps=10)
    eff = rn / (r1 * n)
    assert eff >= 0.8, "weak-scaling efficiency %.3f < 0.8 (r1=%.0f r%d=%.0f)" % (
        eff, r1, n, rn)
