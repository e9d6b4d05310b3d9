"""Fused-attention kernel under a REAL-TPU mesh (1x1 data x model).

CPU interpret-mode mesh parity exists (tests/parallel_test.py); this
probe closes the remaining gap — the kernel lowering through shard_map
on actual TPU hardware. A 1-device mesh exercises the same partitioned
lowering path (SPMD partitioner + pallas_call inside the mesh context)
without needing multiple chips.

Run: env PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python tools/probe_fused_attention_mesh.py
"""
from __future__ import annotations

import json

import numpy as np


def main():
    import jax

    from deepctr_tpu import DenseFeat, SparseFeat, VarLenSparseFeat
    from deepctr_tpu.models import BST
    from deepctr_tpu.ops import attention as fused_ops
    from deepctr_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(0)
    B, T = 256, 16
    cols = [
        SparseFeat("user", 16, embedding_dim=8),
        SparseFeat("item", 64, embedding_dim=8),
        DenseFeat("score", 1),
        VarLenSparseFeat(
            SparseFeat("hist_item", vocabulary_size=64, embedding_dim=8,
                       embedding_name="item"),
            maxlen=T, length_name="seq_length",
        ),
    ]
    x = {
        "user": rng.randint(0, 16, (B,)).astype(np.int32),
        "item": rng.randint(1, 64, (B,)).astype(np.int32),
        "score": rng.rand(B, 1).astype(np.float32),
        "hist_item": rng.randint(1, 64, (B, T)).astype(np.int32),
        "seq_length": rng.randint(1, T + 1, (B,)).astype(np.int32),
    }
    y = rng.randint(0, 2, B).astype(np.float32)

    mesh = make_mesh((1, 1), ("data", "model"), jax.devices()[:1])
    losses = {}
    for fused in (False, True):
        fused_ops.set_fused_attention(fused)
        model = BST(cols, ["item"], transformer_num=1, att_head_num=2,
                    dnn_hidden_units=(16, 8))
        model.compile("adam", "binary_crossentropy", mesh=mesh)
        hist = model.fit(x, y, batch_size=B, epochs=1, shuffle=False,
                         verbose=0)
        losses["fused" if fused else "base"] = float(hist.history["loss"][-1])
    fused_ops.set_fused_attention(False)

    diff = abs(losses["fused"] - losses["base"])
    print(json.dumps({"probe": "fused_attention_real_tpu_mesh",
                      "losses": losses, "abs_diff": diff,
                      "ok": bool(np.isfinite(list(losses.values())).all()
                                 and diff < 5e-2)}))


if __name__ == "__main__":
    main()
