"""Training throughput across the model zoo on one chip.

Criteo-shaped inputs (26x100k-vocab x16 sparse + 13 dense) for the tabular
models; an amazon-style behavior fixture (50-step history) for DIN/DIEN/BST.
Prints one JSON line per model.
"""
from __future__ import annotations

import json
import time

import numpy as np


def _tabular_batch(batch, rng):
    from deepctr_tpu import DenseFeat, SparseFeat

    cols = [SparseFeat("C%d" % i, 100_000, 16) for i in range(26)]
    cols += [DenseFeat("I%d" % i, 1) for i in range(13)]
    x = {}
    for fc in cols:
        if isinstance(fc, SparseFeat):
            x[fc.name] = rng.randint(0, fc.vocabulary_size, (batch, 1)).astype(np.int32)
        else:
            x[fc.name] = rng.rand(batch, 1).astype(np.float32)
    return cols, x


def _sequence_batch(batch, rng, maxlen=50):
    from deepctr_tpu import DenseFeat, SparseFeat, VarLenSparseFeat

    cols = [
        SparseFeat("user", 100_000, 32),
        SparseFeat("item", 200_000, 32),
        SparseFeat("cate", 1_000, 32),
        DenseFeat("score", 1),
        VarLenSparseFeat(SparseFeat("hist_item", 200_000, 32,
                                    embedding_name="item"),
                         maxlen=maxlen, length_name="seq_length"),
        VarLenSparseFeat(SparseFeat("hist_cate", 1_000, 32,
                                    embedding_name="cate"),
                         maxlen=maxlen, length_name="seq_length"),
    ]
    x = {
        "user": rng.randint(0, 100_000, (batch, 1)).astype(np.int32),
        "item": rng.randint(1, 200_000, (batch, 1)).astype(np.int32),
        "cate": rng.randint(1, 1_000, (batch, 1)).astype(np.int32),
        "score": rng.rand(batch, 1).astype(np.float32),
        "hist_item": rng.randint(1, 200_000, (batch, maxlen)).astype(np.int32),
        "hist_cate": rng.randint(1, 1_000, (batch, maxlen)).astype(np.int32),
        "seq_length": rng.randint(1, maxlen + 1, (batch, 1)).astype(np.int32),
    }
    return cols, x


def _dsin_batch(batch, rng, sess_count=5, sess_len=10):
    """DSIN session fixture at production-ish shape: 5 sessions x 10 steps
    of (item, cate) behaviors (reference dsin.py defaults)."""
    from deepctr_tpu import DenseFeat, SparseFeat, VarLenSparseFeat

    cols = [
        SparseFeat("user", 100_000, 32),
        SparseFeat("item", 200_000, 32),
        SparseFeat("cate", 1_000, 32),
        DenseFeat("score", 1),
    ]
    x = {
        "user": rng.randint(0, 100_000, (batch, 1)).astype(np.int32),
        "item": rng.randint(1, 200_000, (batch, 1)).astype(np.int32),
        "cate": rng.randint(1, 1_000, (batch, 1)).astype(np.int32),
        "score": rng.rand(batch, 1).astype(np.float32),
    }
    for s in range(sess_count):
        cols += [
            VarLenSparseFeat(SparseFeat("sess_%d_item" % s, 200_000, 32,
                                        embedding_name="item"),
                             maxlen=sess_len),
            VarLenSparseFeat(SparseFeat("sess_%d_cate" % s, 1_000, 32,
                                        embedding_name="cate"),
                             maxlen=sess_len),
        ]
        x["sess_%d_item" % s] = rng.randint(
            1, 200_000, (batch, sess_len)).astype(np.int32)
        x["sess_%d_cate" % s] = rng.randint(
            1, 1_000, (batch, sess_len)).astype(np.int32)
    x["sess_length"] = rng.randint(1, sess_count + 1,
                                   (batch, 1)).astype(np.int32)
    return cols, x


def _measure(model, cols, x, batch, scan=10, calls=3):
    """fit(steps_per_execution)-style dispatch: SCAN unrolled optimizer
    steps per compiled call with fresh ids per step (bench.py pattern) —
    the recommended production configuration, and it amortizes the axon
    tunnel's ~1-2 ms per-execution dispatch."""
    import jax
    import jax.numpy as jnp

    from deepctr_tpu.features import canonicalize_batch

    rng = np.random.RandomState(1)
    n_out = getattr(model, "num_outputs", 1) or 1
    y = rng.randint(0, 2, (batch, n_out)).astype(np.float32)
    w = np.ones(batch, np.float32)
    xc = canonicalize_batch(x, model.feature_columns)
    model._ensure_built(xc)
    multi_step = model._build_multi_train_step(scan)
    # stacked (scan, ...) inputs, fresh ids per unrolled step
    xK = {}
    for name, v in xc.items():
        if np.issubdtype(v.dtype, np.integer):
            hi = max(int(v.max()), 1) + 1
            xK[name] = jnp.asarray(
                rng.randint(np.min(v), hi, (scan,) + v.shape).astype(v.dtype))
        else:
            xK[name] = jnp.asarray(rng.rand(scan, *v.shape).astype(v.dtype))
    yK = jnp.asarray(np.tile(y, (scan, 1, 1)))
    wK = jnp.asarray(np.tile(w, (scan, 1)))
    key = jax.random.PRNGKey(0)
    state = model.state
    state, losses, _ = multi_step(state, xK, yK, wK, key)
    jax.block_until_ready(losses)
    # force honest sync mode (axon: pre-first-D2H timings are fantasy)
    _ = float(jnp.asarray(losses).reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(calls):
        state, losses, _ = multi_step(state, xK, yK, wK, key)
    jax.block_until_ready(losses)
    _ = float(jnp.asarray(losses).reshape(-1)[-1])
    return batch * scan * calls / (time.perf_counter() - t0)


def main(selected=None, mp=False, fused=False, fused_gru=False, scan=25,
         f32=False):
    import os

    from deepctr_tpu import models as zoo
    from deepctr_tpu.training.optimizers import embedding_split_optimizer

    if os.environ.get("LANES") == "0":  # lane-attention A/B hook
        from deepctr_tpu.ops.attention_lanes import set_lane_attention

        set_lane_attention(False)
    if os.environ.get("BLOCK") == "0":  # blocked-attention A/B hook
        from deepctr_tpu.ops.attention_block import set_block_attention

        set_block_attention(False)
    if os.environ.get("CIN") == "0":  # CIN-kernel A/B hook
        from deepctr_tpu.ops.cin_kernel import set_cin_kernel

        set_cin_kernel(False)

    rng = np.random.RandomState(0)
    # B_SEQ=8192: measured knee of the sequence-model batch sweep
    # (BASELINE.md round 3 — DIN +111%, DIEN +133%, DSIN +23% over 4096;
    # BST flat). Bigger batches pipeline the history-row gathers better.
    B_TAB, B_SEQ = 32768, 8192
    tab_cols, tab_x = _tabular_batch(B_TAB, rng)
    seq_cols, seq_x = _sequence_batch(B_SEQ, rng)

    configs = {
        "WDL": lambda: (zoo.WDL(tab_cols, tab_cols), tab_cols, tab_x, B_TAB),
        "DeepFM": lambda: (zoo.DeepFM(tab_cols, tab_cols), tab_cols, tab_x, B_TAB),
        "xDeepFM": lambda: (zoo.xDeepFM(tab_cols, tab_cols), tab_cols, tab_x, B_TAB),
        "AutoInt": lambda: (zoo.AutoInt(tab_cols, tab_cols), tab_cols, tab_x, B_TAB),
        "DCN": lambda: (zoo.DCN(tab_cols, tab_cols), tab_cols, tab_x, B_TAB),
        "DIN": lambda: (zoo.DIN(seq_cols, ["item", "cate"]), seq_cols, seq_x, B_SEQ),
        "DIEN": lambda: (zoo.DIEN(seq_cols, ["item", "cate"], gru_type="AUGRU"),
                         seq_cols, seq_x, B_SEQ),
        "BST": lambda: (zoo.BST(seq_cols, ["item", "cate"], att_head_num=4),
                        seq_cols, seq_x, B_SEQ),
        "DSIN": lambda: (lambda c_x: (zoo.DSIN(c_x[0], ["item", "cate"],
                                               sess_max_count=5,
                                               att_embedding_size=8,
                                               att_head_num=8),
                                      c_x[0], c_x[1], B_SEQ))(
            _dsin_batch(B_SEQ, rng)),
        "MMOE": lambda: (zoo.MMOE(tab_cols,
                                  task_types=("binary", "binary"),
                                  task_names=("ctr", "cvr")),
                         tab_cols, tab_x, B_TAB),
    }
    # sequence models measure fastest at a longer compiled scan (round-4
    # sweep +10%, round-5 re-confirmation: DIN +11%, DIEN +12% at 50)
    SEQ_SCAN = {"DIN": 50, "DIEN": 50, "BST": 50, "DSIN": 50}
    for name, make in configs.items():
        if selected and name not in selected:
            continue
        model_scan = SEQ_SCAN.get(name, scan) if scan == 25 else scan
        model, cols, x, batch = make()
        # --mp: force bf16 activations; --f32: force f32 (defeats the
        # auto policy, which already compiles attention/CIN models bf16);
        # default: auto
        kw = (dict(compute_dtype="bfloat16") if mp
              else dict(compute_dtype="float32") if f32 else {})
        if fused:
            # --fused: VMEM-resident attention kernel (BST/AutoInt paths)
            kw["fused_attention"] = True
        if fused_gru:
            # --fused-gru: whole-sequence Pallas GRU kernel (DIEN path)
            kw["fused_gru"] = True
        loss = ("binary_crossentropy"
                if getattr(model, "num_outputs", 1) <= 1
                else ["binary_crossentropy"] * model.num_outputs)
        model.compile(embedding_split_optimizer(), loss,
                      embedding_dtype="bfloat16", **kw)
        rate = _measure(model, cols, x, batch, scan=model_scan)
        print(json.dumps({"metric": "train_examples_per_s_per_chip",
                          "model": name, "batch": batch, "mp": mp, "f32": f32,
                          "fused_attention": fused, "fused_gru": fused_gru,
                          "scan": model_scan,
                          "value": round(rate, 1), "unit": "examples/s"}),
              flush=True)


if __name__ == "__main__":
    import sys

    args = set(sys.argv[1:])
    mp = "--mp" in args
    f32 = "--f32" in args
    fused = "--fused" in args
    fused_gru = "--fused-gru" in args
    args.discard("--mp")
    args.discard("--f32")
    args.discard("--fused")
    args.discard("--fused-gru")
    scan = 25
    for a in list(args):
        if a.startswith("--scan="):
            scan = int(a.split("=", 1)[1])
            args.discard(a)
    main(args or None, mp=mp, fused=fused, fused_gru=fused_gru, scan=scan,
         f32=f32)
