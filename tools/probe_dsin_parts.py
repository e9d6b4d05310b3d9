"""DSIN step-time ablation: where do the 68 ms of non-gather time go?

bench_sequence.py decomposed DSIN to 72% non-gather residual (BASELINE.md
round-5 table). This probe rebuilds the bench DSIN with one component at
a time replaced by a cheap stand-in of the same shape:

  full            unmodified (control)
  no_transformer  5 session self-attentions -> masked mean pooling
  no_bilstm       BiLSTM -> identity over (B, S, E)
  no_attpool      both AttentionSequencePoolingLayers -> masked mean
  no_dnn          final DNN tower -> single linear

The per-config rate difference vs `full` prices each component
(fwd+bwd). Fresh subprocess per config (in-process A/Bs lie, CLAUDE.md).

    python tools/probe_dsin_parts.py          # driver
    DSIN_PART=no_bilstm python tools/probe_dsin_parts.py one
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = ("full", "no_transformer", "no_bilstm", "no_attpool", "no_dnn")
SCAN = 50


def _patch(part):
    import flax.linen as nn
    import jax.numpy as jnp

    import deepctr_tpu.models.sequence.dsin as dsin_mod

    if part == "no_transformer":
        class MeanPool(nn.Module):
            att_embedding_size: int = 1
            att_head_num: int = 8
            dropout_rate: float = 0.0
            use_layer_norm: bool = False
            use_positional_encoding: bool = True
            seed: int = 1024
            blinding: bool = True
            output_type: str = "mean"

            @nn.compact
            def __call__(self, q, k, qm=None, km=None, a=None, b=None,
                         training=False):
                m = (qm if qm is not None else
                     jnp.ones(q.shape[:2], bool)).astype(q.dtype)
                s = (q * m[:, :, None]).sum(1, keepdims=True)
                return s / jnp.maximum(m.sum(1)[:, None, None], 1.0)

        def fake_for_trace(**kw):
            def make(att_embedding_size, att_head_num, **kws):
                kws.pop("name", None)
                return MeanPool(att_embedding_size, att_head_num)
            return make
        dsin_mod.transformer_for_trace = fake_for_trace
    elif part == "no_bilstm":
        class IdLSTM(nn.Module):
            units: int = 0
            layers: int = 2
            res_layers: int = 0
            dropout_rate: float = 0.0

            @nn.compact
            def __call__(self, x, training=False):
                return x

        dsin_mod.BiLSTM = IdLSTM
    elif part == "no_attpool":
        class MeanAtt(nn.Module):
            att_hidden_units: tuple = (64, 16)
            weight_normalization: bool = False

            @nn.compact
            def __call__(self, query, keys, keys_length=None,
                         training=False):
                B, S, E = keys.shape
                if keys_length is not None:
                    pos = jnp.arange(S)[None, :]
                    m = (pos < keys_length.reshape(B, 1)).astype(keys.dtype)
                else:
                    m = jnp.ones((B, S), keys.dtype)
                s = (keys * m[:, :, None]).sum(1, keepdims=True)
                return s / jnp.maximum(m.sum(1)[:, None, None], 1.0)

        dsin_mod.AttentionSequencePoolingLayer = MeanAtt
    elif part == "no_dnn":
        import deepctr_tpu.layers.core as core_mod

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

        dsin_mod.DNN = LinDNN


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
    cols, x = bm._dsin_batch(B, rng)
    model = zoo.DSIN(cols, ["item", "cate"], sess_max_count=5,
                     att_embedding_size=8, att_head_num=8)
    model.compile(embedding_split_optimizer(), "binary_crossentropy",
                  embedding_dtype="bfloat16")
    rate = bm._measure(model, cols, x, B, scan=SCAN, calls=bs.CALLS)
    print(json.dumps({"metric": "dsin_part_probe", "part": part,
                      "batch": B, "scan": SCAN, "value": round(rate, 1),
                      "ms_per_step": round(B / rate * 1e3, 3),
                      "unit": "examples/s"}), flush=True)


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    for part in CONFIGS:
        env = dict(os.environ, DSIN_PART=part)
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
        run_one(os.environ.get("DSIN_PART", "full"))
    else:
        main()
