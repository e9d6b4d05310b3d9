"""Sequence-tier physics decomposition: DIN / DIEN / BST / DSIN.

bench.py's roofline / row-bound / window analysis exists only for DeepFM
(VERDICT r4 weak #1); this gives the sequence models the same treatment.
Their gather bill is PER-ID (round-3 finding: history-row dedup is dead,
cost is flat ns/row regardless of distinct-row count), so the no-overlap
row bound follows from batch x ids-per-example:

    ids/example = scalars + sum_f(maxlen_f)   (fixtures: 103 for all four)
    row events  = 2 x ids/example             (forward gather + backward
                                               per-table scatter)
    t_rows      = row_events * B * row_ns     (row_ns self-measured at the
                                               model's own table shapes)
    t_stream    = full-table optimizer traffic / stream GB/s
    row_bound   = B / (t_rows + t_stream)

The residual (measured step time - row/stream bill) is the non-gather
component — GRU scan time, attention FLOPs, host dispatch — i.e. the
attack surface. One JSON line per model:

    python bench_sequence.py DIN          # one model, this process
    python bench_sequence.py             # all four, fresh subprocess each
                                          # (in-process A/Bs lie: CLAUDE.md)
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

SCAN = 50   # sequence-model default (round-4 sweep: DIN +10% vs scan 25)
CALLS = 3

# fixture id-accounting: (scalar sparse ids, history ids) per example and
# the embedding width. All four fixtures share E=32 and 103 ids/example:
# DIN/DIEN/BST: user+item+cate + 2 x 50-step histories;
# DSIN: user+item+cate + 5 sessions x 2 x 10-step behaviors.
IDS_PER_EXAMPLE = {"DIN": 103, "DIEN": 103, "BST": 103, "DSIN": 103}
# table sets of the fixtures (rows, E): user 100k, item 200k, cate 1k
TABLE_ELEMS = (100_000 + 200_000 + 1_000) * 32


def _probe_window(batch, seq_ids=100, scalar_ids=3):
    """Stream bandwidth + isolated per-row service at THIS fixture's
    access pattern: scalar takes of B ids + history takes of B*T ids from
    the (user, item, cate) bf16 tables."""
    import jax
    import jax.numpy as jnp

    buf = jnp.zeros((64 * 1024 * 1024,), jnp.float32)  # 256 MB
    n_pass = 20

    @jax.jit
    def stream(b):
        def body(x, _):
            return x * 1.0000001 + 1e-12, ()
        out, _ = jax.lax.scan(body, b, None, length=n_pass)
        return out

    buf = stream(buf)
    jax.block_until_ready(buf)
    _ = float(buf[0])
    t0 = time.perf_counter()
    buf = stream(buf)
    jax.block_until_ready(buf)
    _ = float(buf[0])
    hbm_gbps = n_pass * 2 * buf.nbytes / (time.perf_counter() - t0) / 1e9

    rng = np.random.RandomState(7)
    t_user = jnp.zeros((100_000, 32), jnp.bfloat16)
    t_item = jnp.zeros((200_000, 32), jnp.bfloat16)
    t_cate = jnp.zeros((1_000, 32), jnp.bfloat16)
    i_user = jnp.asarray(rng.randint(0, 100_000, batch).astype(np.int32))
    i_item = jnp.asarray(rng.randint(0, 200_000, batch).astype(np.int32))
    i_cate = jnp.asarray(rng.randint(0, 1_000, batch).astype(np.int32))
    T_hist = seq_ids // 2
    h_item = jnp.asarray(
        rng.randint(0, 200_000, (batch, T_hist)).astype(np.int32))
    h_cate = jnp.asarray(
        rng.randint(0, 1_000, (batch, T_hist)).astype(np.int32))

    @jax.jit
    def take(tu, ti, tc, iu, ii, ic, hi, hc):
        s = jnp.float32(0)
        for t, i in ((tu, iu), (ti, ii), (tc, ic), (ti, hi), (tc, hc)):
            s = s + jnp.take(t, i, axis=0).astype(jnp.float32).sum()
        return s

    args = (t_user, t_item, t_cate, i_user, i_item, i_cate, h_item, h_cate)
    s = take(*args)
    jax.block_until_ready(s)
    _ = float(s)
    n_rows = batch * (scalar_ids + seq_ids)
    t0 = time.perf_counter()
    for _ in range(5):
        s = take(*args)
    jax.block_until_ready(s)
    _ = float(s)
    row_ns = (time.perf_counter() - t0) / 5 / n_rows * 1e9
    return hbm_gbps, row_ns


def _bounds(batch, ids_per_example, hbm_gbps, row_ns):
    """No-overlap row bound + sequential-stream roofline for the fixture.

    Full-table optimizer traffic mirrors bench.py's accounting: the
    embedding_split rowwise-adagrad pass streams each table's params
    (bf16, read+write) and f32 accumulators (read+write) once per step;
    activations are second-order at E=32."""
    stream_bytes = (2 * TABLE_ELEMS * 2     # bf16 params r+w
                    + 2 * TABLE_ELEMS * 4   # f32 accumulator r+w
                    + batch * 2e4)          # activations/dnn (estimate)
    t_stream = stream_bytes / (hbm_gbps * 1e9)
    t_rows = 2 * ids_per_example * batch * row_ns * 1e-9
    row_bound = batch / (t_rows + t_stream)
    roofline = batch / t_stream
    return row_bound, roofline, t_rows, t_stream


def run_one(name, scan=SCAN):
    import bench_models as bm
    from deepctr_tpu import models as zoo
    from deepctr_tpu.training.optimizers import embedding_split_optimizer

    if os.environ.get("SMALL_VOCAB") == "0":  # A/B hook (fresh-process)
        from deepctr_tpu.ops.small_vocab import set_small_vocab

        set_small_vocab(False)
    if os.environ.get("LANES") == "0":  # lane-attention A/B hook
        from deepctr_tpu.ops.attention_lanes import set_lane_attention

        set_lane_attention(False)
    if os.environ.get("BLOCK") == "0":  # blocked-attention A/B hook
        from deepctr_tpu.ops.attention_block import set_block_attention

        set_block_attention(False)

    try:
        from deepctr_tpu import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass

    rng = np.random.RandomState(0)
    B = 8192
    if name == "DSIN":
        cols, x = bm._dsin_batch(B, rng)
        model = zoo.DSIN(cols, ["item", "cate"], sess_max_count=5,
                         att_embedding_size=8, att_head_num=8)
    else:
        cols, x = bm._sequence_batch(B, rng)
        model = {
            "DIN": lambda: zoo.DIN(cols, ["item", "cate"]),
            "DIEN": lambda: zoo.DIEN(cols, ["item", "cate"],
                                     gru_type="AUGRU"),
            "BST": lambda: zoo.BST(cols, ["item", "cate"], att_head_num=4),
        }[name]()
    model.compile(embedding_split_optimizer(), "binary_crossentropy",
                  embedding_dtype="bfloat16")
    rate = bm._measure(model, cols, x, B, scan=scan, calls=CALLS)

    hbm_gbps, row_ns = _probe_window(B)
    ids = IDS_PER_EXAMPLE[name]
    row_bound, roofline, t_rows, t_stream = _bounds(B, ids, hbm_gbps, row_ns)
    step_s = B / rate
    residual_s = step_s - t_rows - t_stream
    print(json.dumps({
        "metric": "sequence_train_examples_per_s_per_chip",
        "model": name, "batch": B, "scan": scan,
        "value": round(rate, 1), "unit": "examples/s",
        "ms_per_step": round(step_s * 1e3, 3),
        "hbm_stream_gbps": round(hbm_gbps, 1),
        "random_row_ns_isolated": round(row_ns, 2),
        "ids_per_example": ids,
        "row_no_overlap_examples_per_s": round(row_bound, 1),
        "row_bound_fraction": round(rate / row_bound, 3),
        "stream_roofline_examples_per_s": round(roofline, 1),
        # step-time split: the gather/stream bill vs everything else
        # (GRU scan, attention FLOPs, dispatch) — the attack surface
        "ms_rows": round(t_rows * 1e3, 3),
        "ms_stream": round(t_stream * 1e3, 3),
        "ms_residual_nongather": round(residual_s * 1e3, 3),
        "residual_fraction": round(max(residual_s, 0.0) / step_s, 3),
    }), flush=True)


def main_all(models=("DIN", "DIEN", "BST", "DSIN"), scan=SCAN):
    here = os.path.dirname(os.path.abspath(__file__))
    for name in models:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), name,
             "--scan=%d" % scan],
            cwd=here, capture_output=True, text=True, timeout=3600)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if out.returncode != 0:
            print(json.dumps({"model": name, "error":
                              out.stderr[-500:]}), flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:]]
    scan = SCAN
    names = []
    for a in args:
        if a.startswith("--scan="):
            scan = int(a.split("=", 1)[1])
        else:
            names.append(a)
    if names:
        run_one(names[0], scan=scan)
    else:
        main_all(scan=scan)
