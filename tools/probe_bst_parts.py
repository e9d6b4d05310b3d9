"""BST step-time ablation (companion to probe_dsin_parts.py).

bench_sequence.py decomposed BST to ~15-23 ms of non-gather residual.
This prices the components by replacing one at a time with a same-shape
stand-in:

  full            unmodified (control)
  no_transformer  the T=50 transformer block -> identity over (B,T,E)
  no_attpool      DIN attention pooling -> masked mean
  no_dnn          DNN tower -> single linear

Fresh subprocess per config:

    python tools/probe_bst_parts.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = ("full", "no_transformer", "no_attpool", "no_dnn")
SCAN = 50


def _patch(part):
    import flax.linen as nn
    import jax.numpy as jnp

    import deepctr_tpu.models.sequence.bst as bst_mod

    if part == "no_transformer":
        class IdT(nn.Module):
            att_embedding_size: int = 1
            head_num: int = 8
            dropout_rate: float = 0.0
            use_layer_norm: bool = True
            use_positional_encoding: bool = True
            seed: int = 1024
            blinding: bool = False
            output_type: object = None

            @nn.compact
            def __call__(self, q, k, qm=None, km=None, a=None, b=None,
                         training=False):
                return q

        def fake_for_trace(**kw):
            def make(att_embedding_size=1, head_num=8, **kws):
                kws.pop("name", None)
                return IdT(att_embedding_size, head_num)
            return make
        bst_mod.transformer_for_trace = fake_for_trace
    elif part == "no_attpool":
        class MeanAtt(nn.Module):
            att_hidden_units: tuple = (64, 16)
            weight_normalization: bool = False

            @nn.compact
            def __call__(self, query, keys, keys_length=None, mask=None,
                         training=False):
                B, S, E = keys.shape
                if keys_length is not None:
                    pos = jnp.arange(S)[None, :]
                    m = (pos < keys_length.reshape(B, 1)).astype(keys.dtype)
                else:
                    m = jnp.ones((B, S), keys.dtype)
                s = (keys * m[:, :, None]).sum(1, keepdims=True)
                return s / jnp.maximum(m.sum(1)[:, None, None], 1.0)

        bst_mod.AttentionSequencePoolingLayer = MeanAtt
    elif part == "no_dnn":
        class LinDNN(nn.Module):
            hidden_units: tuple = ()
            activation: str = "relu"
            l2_reg: float = 0.0
            dropout_rate: float = 0.0
            use_bn: bool = False
            seed: int = 1024

            @nn.compact
            def __call__(self, x, training=False):
                return nn.Dense(16)(x)

        bst_mod.DNN = LinDNN


def run_one(part):
    _patch(part)
    import bench_models as bm
    import bench_sequence as bs
    from deepctr_tpu import models as zoo
    from deepctr_tpu.training.optimizers import embedding_split_optimizer

    try:
        from deepctr_tpu import enable_compilation_cache

        enable_compilation_cache()
    except Exception:
        pass
    rng = np.random.RandomState(0)
    B = 8192
    cols, x = bm._sequence_batch(B, rng)
    model = zoo.BST(cols, ["item", "cate"], att_head_num=4)
    model.compile(embedding_split_optimizer(), "binary_crossentropy",
                  embedding_dtype="bfloat16")
    rate = bm._measure(model, cols, x, B, scan=SCAN, calls=bs.CALLS)
    print(json.dumps({"metric": "bst_part_probe", "part": part,
                      "batch": B, "scan": SCAN, "value": round(rate, 1),
                      "ms_per_step": round(B / rate * 1e3, 3),
                      "unit": "examples/s"}), flush=True)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    for part in CONFIGS:
        env = dict(os.environ, BST_PART=part)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "one"],
            env=env, cwd=os.path.join(here, ".."), capture_output=True,
            text=True, timeout=2400)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
        if out.returncode != 0:
            print(json.dumps({"part": part, "error": out.stderr[-400:]}),
                  flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "one":
        run_one(os.environ.get("BST_PART", "full"))
    else:
        main()
