"""enable_compilation_cache persists compiled executables to disk."""
from __future__ import annotations

import os

import numpy as np


def test_enable_compilation_cache_writes_entries(tmp_path):
    import jax

    import deepctr_tpu
    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.models import WDL

    cache_dir = str(tmp_path / "xla")
    try:
        got = deepctr_tpu.enable_compilation_cache(
            cache_dir, min_compile_time_secs=0.0)
        assert got == cache_dir and os.path.isdir(cache_dir)

        cols = [SparseFeat("c", 16, 4), DenseFeat("d", 1)]
        rng = np.random.RandomState(0)
        x = {"c": rng.randint(0, 16, (32,)).astype(np.int32),
             "d": rng.rand(32, 1).astype(np.float32)}
        y = rng.randint(0, 2, 32).astype(np.float32)
        model = WDL(cols, cols, dnn_hidden_units=(8,))
        model.compile("adam", "binary_crossentropy")
        model.fit(x, y, batch_size=32, epochs=1, verbose=0)

        entries = [f for _, _, fs in os.walk(cache_dir) for f in fs]
        assert entries, "no compilation cache entries written"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
