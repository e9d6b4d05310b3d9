"""LargeScale.md playbook, end to end, in ONE process (VERDICT r2 item 5):

  synthetic TFRecords -> model-tier STREAMING fit (mmap + C++ parse +
  shuffle pool + prefetch) -> sparse embedding engine + bf16 tables +
  stochastic rounding + steps_per_execution (+ optional mesh /
  compute_dtype) -> orbax TrainState checkpoint save/restore -> StableHLO
  export -> load + prediction parity.

Every playbook row produces one artifact/assertion; prints one JSON line.

CPU correctness (8 virtual chips, small vocab):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  PYTHONPATH=/root/repo python tools/run_largescale_e2e.py \
      --vocab 1000 --tables 4 --batch 256 --steps 8 --mesh 4x2

Real-chip scale (1.28B embedding params, the bench_large_vocab shape):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
  python tools/run_largescale_e2e.py --vocab 10000000 --tables 8 \
      --batch 4096 --steps 30
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import struct
import sys
import tempfile
import time

import numpy as np


def write_tfrecords(path, n_records, n_tables, vocab, seed=0):
    """Minimal TFRecord writer (proto frames hand-rolled, same format the
    streaming parser reads; examples/gen_tfrecords.py is the full tool)."""

    def varint(v):
        out = b""
        while True:
            b = v & 0x7F
            v >>= 7
            out += bytes([b | (0x80 if v else 0)])
            if not v:
                return out

    def int_feature(vals):
        body = b"".join(b"\x08" + varint(v) for v in vals)
        return b"\x1a" + varint(len(body)) + body  # Int64List field 3

    def float_feature(vals):
        body = b"".join(struct.pack("<f", v) for v in vals)
        inner = b"\x0a" + varint(len(body)) + body  # packed repeated float
        return b"\x12" + varint(len(inner)) + inner  # FloatList = field 2

    def example(feats):
        entries = b""
        for name, payload in feats.items():
            key = name.encode()
            entry = (b"\x0a" + varint(len(key)) + key +
                     b"\x12" + varint(len(payload)) + payload)
            entries += b"\x0a" + varint(len(entry)) + entry
        return b"\x0a" + varint(len(entries)) + entries

    def frame(payload):
        return (struct.pack("<Q", len(payload)) + b"\x00" * 4 + payload +
                b"\x00" * 4)

    rng = np.random.RandomState(seed)
    with open(path, "wb") as f:
        for _ in range(n_records):
            feats = {}
            for t in range(n_tables):
                feats["C%d" % t] = int_feature(
                    [int(rng.randint(0, vocab))])
            feats["I0"] = float_feature([float(rng.rand())])
            feats["label"] = float_feature([float(rng.randint(0, 2))])
            f.write(frame(example(feats)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=1000)
    ap.add_argument("--tables", type=int, default=4)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--records", type=int, default=20000)
    ap.add_argument("--spe", type=int, default=4,
                    help="steps_per_execution")
    ap.add_argument("--mesh", default=None,
                    help="DxM mesh, e.g. 4x2 (default: no mesh)")
    ap.add_argument("--compute-dtype", default=None)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import deepctr_tpu
    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.estimator.inputs import (FixedLenFeature,
                                              input_fn_tfrecord)
    from deepctr_tpu.models import DeepFM
    from deepctr_tpu import serving
    from deepctr_tpu.training import checkpoint as ckpt

    # playbook row: persistent compilation cache
    cache_dir = deepctr_tpu.enable_compilation_cache()

    work = args.workdir or tempfile.mkdtemp(prefix="largescale_e2e_")
    os.makedirs(work, exist_ok=True)
    tfr = os.path.join(work, "train.tfrecords")
    write_tfrecords(tfr, args.records, args.tables, args.vocab)

    desc = {"C%d" % t: FixedLenFeature((1,), "int64", 0)
            for t in range(args.tables)}
    desc["I0"] = FixedLenFeature((1,), "float32", 0.0)
    desc["label"] = FixedLenFeature((1,), "float32")

    # playbook row: streaming TFRecords feeding the MODEL tier
    input_fn = input_fn_tfrecord(tfr, desc, label="label",
                                 batch_size=args.batch, num_epochs=None,
                                 shuffle_factor=4)

    cols = ([SparseFeat("C%d" % t, args.vocab, args.dim)
             for t in range(args.tables)] + [DenseFeat("I0", 1)])

    mesh = None
    if args.mesh:
        from deepctr_tpu.parallel.mesh import make_mesh

        d, m = (int(v) for v in args.mesh.split("x"))
        mesh = make_mesh((d, m), ("data", "model"), jax.devices()[:d * m])

    # playbook rows: sparse engine + bf16 tables + stochastic rounding
    # (+ mesh, + compute dtype)
    model = DeepFM(cols, cols, dnn_hidden_units=(256, 128, 64))
    model.compile("adam", "binary_crossentropy",
                  sparse_embedding_updates=True,
                  embedding_dtype="bfloat16",
                  bf16_stochastic_rounding=True,
                  compute_dtype=args.compute_dtype,
                  mesh=mesh)

    # warmup epoch (builds + compiles), then the timed epoch
    model.fit(input_fn, epochs=1, steps_per_epoch=args.spe, verbose=0,
              steps_per_execution=args.spe)
    losses0 = model.history.history["loss"]
    _ = float(np.asarray(jax.tree_util.tree_leaves(
        model.state.params)[0]).ravel()[0])  # honest mode (CLAUDE.md)

    t0 = time.time()
    model.fit(input_fn, epochs=1, steps_per_epoch=args.steps, verbose=0,
              steps_per_execution=args.spe)
    jax.block_until_ready(model.state.params)
    dt = time.time() - t0
    examples_per_s = args.steps * args.batch / dt

    n_emb = sum(int(np.prod(l.shape))
                for p, l in jax.tree_util.tree_flatten_with_path(
                    model.state.params)[0]
                if any(str(getattr(k, "key", k)).startswith("emb_")
                       for k in p))
    total = sum(int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(model.state.params))

    # playbook row: orbax TrainState checkpoint (optimizer + engine state)
    ckpt_dir = os.path.join(work, "orbax_ckpt")
    ckpt.save_train_state(model, ckpt_dir)
    step_before = int(model.state.step)
    model2 = DeepFM(cols, cols, dnn_hidden_units=(256, 128, 64))
    model2.compile("adam", "binary_crossentropy",
                   sparse_embedding_updates=True,
                   embedding_dtype="bfloat16",
                   bf16_stochastic_rounding=True,
                   compute_dtype=args.compute_dtype,
                   mesh=mesh)
    # build vars, then restore full state
    probe = next(iter(input_fn()))
    xb = {k: v[: args.batch] for k, v in probe[0].items()}
    model2.predict(xb, batch_size=args.batch)
    ckpt.restore_train_state(model2, ckpt_dir)
    assert int(model2.state.step) == step_before, "step not restored"

    # playbook row: StableHLO export -> load -> prediction parity
    art = os.path.join(work, "model.stablehlo")
    serving.export_stablehlo(model, art, xb)
    serve = serving.load_stablehlo(art)
    from deepctr_tpu.features import canonicalize_batch

    xc = canonicalize_batch(xb, cols)
    p_live = model.predict(xb, batch_size=args.batch).reshape(-1)
    p_art = np.asarray(serve(xc)).reshape(-1)
    np.testing.assert_allclose(p_art, p_live, rtol=2e-3, atol=2e-3)

    print(json.dumps({
        "metric": "largescale_e2e_examples_per_s",
        "value": round(examples_per_s, 1),
        "unit": "examples/s",
        "embedding_params": n_emb,
        "total_params": total,
        "emb_bf16_gb": round(n_emb * 2 / 2 ** 30, 3),
        "batch": args.batch, "steps": args.steps,
        "steps_per_execution": args.spe,
        "mesh": args.mesh, "losses_warmup": [round(float(l), 4)
                                             for l in losses0],
        "streaming": True, "orbax_restore": True,
        "stablehlo_parity": True,
        "compilation_cache": cache_dir is not None,
    }))
    if args.workdir is None:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
