"""Smoke tests for the benchmark entry points (tiny shapes on CPU) — the
driver runs bench.py unattended at round end, so breakage must surface in
the suite, not on bench day."""
from __future__ import annotations

import json
import sys


def test_bench_main_smoke(monkeypatch, capsys):
    import bench

    monkeypatch.setattr(bench, "CANDIDATES", (32, 64))
    monkeypatch.setattr(bench, "SCAN", 2)
    monkeypatch.setattr(bench, "CALLS", 1)
    monkeypatch.setenv("BENCH_NO_RETRY", "1")
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["metric"] == "deepfm_criteo_train_examples_per_s_per_chip"
    assert payload["value"] > 0
    assert payload["unit"] == "examples/s"
    assert "vs_baseline" in payload
    assert payload["batch"] in (32, 64)
    assert payload["window"] in ("healthy", "degraded")
    assert set(payload["probe_examples_per_s"]) == {"32", "64"}


def test_bench_pinned_batch(monkeypatch, capsys):
    """BENCH_BATCH pins a single candidate (no probe sweep)."""
    import bench

    monkeypatch.setattr(bench, "SCAN", 2)
    monkeypatch.setattr(bench, "CALLS", 1)
    monkeypatch.setenv("BENCH_BATCH", "48")
    monkeypatch.setenv("BENCH_NO_RETRY", "1")
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["batch"] == 48
    assert list(payload["probe_examples_per_s"]) == ["48"]


def test_bench_models_smoke(monkeypatch, capsys):
    import bench_models

    # shrink the workloads: patch the generators' batch sizes via main()'s
    # selected-models path with just one cheap model
    orig_tab = bench_models._tabular_batch

    def small_tab(batch, rng):
        return orig_tab(64, rng)

    monkeypatch.setattr(bench_models, "_tabular_batch", small_tab)
    monkeypatch.setattr(bench_models, "_measure",
                        lambda model, cols, x, batch, **kw: 123.0)
    bench_models.main({"WDL"})
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["model"] == "WDL" and payload["value"] == 123.0


def test_bench_lookup_smoke(capsys):
    import bench_lookup

    # actually run main() on a tiny configuration
    bench_lookup.main(configs=[(2, 1024, 128, 512)], steps=2)
    lines = capsys.readouterr().out.strip().splitlines()
    payload = json.loads(lines[-1])
    assert payload["metric"] == "embedding_lookup_bandwidth"
    assert payload["unit"].startswith("GB/s") and payload["value"] > 0
