"""Block-attention + CIN Pallas kernels under a REAL-TPU mesh (1x1).

CPU interpret-mode mesh parity exists (lane path verified bit-identical
under mesh(1,1) on CPU); this probe closes the remaining round-5 gap —
both kernels lowering through the SPMD partitioner on actual TPU
hardware. A 1-device mesh exercises the same partitioned lowering path
(pallas_call inside the mesh context) without needing multiple chips.

For each of xDeepFM (CIN kernel) and AutoInt (block attention kernel),
trains 1 epoch with the kernel ON vs OFF under the mesh and compares
final losses. bf16 autocast means cross-program deltas up to ~1e-3 are
expected (CLAUDE.md round-4); gate at 5e-2 like the fused-attention probe.

Run: env PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
     python tools/probe_block_cin_mesh.py
"""
from __future__ import annotations

import json

import numpy as np


def _criteo_batch(rng, B, n_sparse=8, n_dense=4, vocab=1000, dim=16):
    from deepctr_tpu import DenseFeat, SparseFeat

    cols = [SparseFeat(f"C{i}", vocab, embedding_dim=dim)
            for i in range(n_sparse)]
    cols += [DenseFeat(f"I{i}", 1) for i in range(n_dense)]
    x = {f"C{i}": rng.randint(0, vocab, (B,)).astype(np.int32)
         for i in range(n_sparse)}
    x.update({f"I{i}": rng.rand(B, 1).astype(np.float32)
              for i in range(n_dense)})
    y = rng.randint(0, 2, B).astype(np.float32)
    return cols, x, y


def _run(model_fn, cols, x, y, mesh, B):
    model = model_fn(cols)
    model.compile("adam", "binary_crossentropy", mesh=mesh)
    hist = model.fit(x, y, batch_size=B, epochs=1, shuffle=False, verbose=0)
    return float(hist.history["loss"][-1])


def main():
    import jax

    from deepctr_tpu.models import AutoInt, xDeepFM
    from deepctr_tpu.ops import attention_block, cin_kernel
    from deepctr_tpu.parallel.mesh import make_mesh

    rng = np.random.RandomState(0)
    B = 512
    cols, x, y = _criteo_batch(rng, B)
    mesh = make_mesh((1, 1), ("data", "model"), jax.devices()[:1])

    out = {}

    losses = {}
    for on in (False, True):
        cin_kernel.set_cin_kernel(on)
        losses["on" if on else "off"] = _run(
            lambda c: xDeepFM(c, c, cin_layer_size=(64, 64),
                              dnn_hidden_units=(64, 32)),
            cols, x, y, mesh, B)
    cin_kernel.set_cin_kernel(None)
    out["xdeepfm_cin"] = {"losses": losses,
                          "abs_diff": abs(losses["on"] - losses["off"])}

    # The block kernel gates 16 < T <= 64: AutoInt needs >16 fields for the
    # InteractingLayer to route through it (criteo has 26).
    assert attention_block.block_attention_supported(26, 26, 8, B)
    cols26, x26, y26 = _criteo_batch(rng, B, n_sparse=26, n_dense=0)
    losses = {}
    for on in (False, True):
        attention_block.set_block_attention(on)
        losses["on" if on else "off"] = _run(
            lambda c: AutoInt(c, c, att_layer_num=2, att_head_num=2,
                              dnn_hidden_units=(64, 32)),
            cols26, x26, y26, mesh, B)
    attention_block.set_block_attention(None)
    out["autoint_block"] = {"losses": losses,
                            "abs_diff": abs(losses["on"] - losses["off"])}

    ok = all(np.isfinite(list(v["losses"].values())).all()
             and v["abs_diff"] < 5e-2 for v in out.values())
    print(json.dumps({"probe": "block_cin_real_tpu_mesh", "results": out,
                      "ok": bool(ok)}))


if __name__ == "__main__":
    main()
