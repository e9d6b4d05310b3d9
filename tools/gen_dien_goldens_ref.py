"""Reference DIEN goldens (aux loss on AND off), 5 seeds each.

The reference's DIEN cannot run on modern TF as shipped: its forked
contrib/rnn_v2.py + contrib/utils.py use private TF APIs removed by
TF 2.x (array_ops.stack, control_flow_ops.Assert, nest.is_sequence, ...)
and its own examples/run_dien.py refuses to run on TF >= 1.14. To obtain
an authentic golden we restore exactly the removed private aliases (thin
shims to their public equivalents — no behavior change) and run in TF1
graph mode, which is the mode the fork was written for.

  TF_USE_LEGACY_KERAS=1 TF_CPP_MIN_LOG_LEVEL=3 \
  PYTHONPATH=/root/reference python tools/gen_dien_goldens_ref.py
"""
import json
import sys

import numpy as np
import tensorflow as tf
from sklearn.metrics import roc_auc_score

tf.compat.v1.disable_eager_execution()

from tensorflow.python.ops import (array_ops, control_flow_ops, math_ops,
                                   tensor_array_ops)
from tensorflow.python.util import nest as _nest

SHIMS = {
    array_ops: {"stack": tf.stack, "unstack": tf.unstack,
                "concat": tf.concat, "shape": tf.shape,
                "transpose": tf.transpose, "zeros": tf.zeros,
                "identity": tf.identity, "where": tf.where, "rank": tf.rank,
                "reverse": tf.reverse,
                "reverse_sequence": tf.reverse_sequence,
                "split": tf.split, "constant": tf.constant},
    control_flow_ops: {"Assert": tf.compat.v1.Assert,
                       "cond": tf.compat.v1.cond,
                       "while_loop": tf.compat.v1.while_loop},
    math_ops: {"equal": tf.equal, "matmul": tf.matmul, "range": tf.range,
               "reduce_all": tf.reduce_all, "reduce_max": tf.reduce_max,
               "reduce_min": tf.reduce_min, "sigmoid": tf.sigmoid,
               "tanh": tf.tanh, "to_int": lambda x: tf.cast(x, tf.int32)},
    tensor_array_ops: {"TensorArray": tf.TensorArray},
    _nest: {"is_sequence": tf.nest.is_nested},
}
for mod, names in SHIMS.items():
    for name, fn in names.items():
        if not hasattr(mod, name):
            setattr(mod, name, fn)

sys.path.insert(0, "/root/repo/tools")
from gen_missing_goldens_ref import (BATCH, EPOCHS, SEEDS, dien_columns,
                                     dien_fixture, payload_entry)


def main():
    from deepctr.models import DIEN

    out = {}
    for name, use_neg in [("DIEN_aux_off", False), ("DIEN_aux_on", True)]:
        try:
            x, y = dien_fixture(use_neg)
            cols = dien_columns(use_neg)
            aucs = []
            for seed in SEEDS:
                tf.keras.backend.clear_session()
                try:
                    tf.keras.utils.set_random_seed(seed)
                except Exception:
                    np.random.seed(seed)
                    tf.compat.v1.set_random_seed(seed)
                model = DIEN(cols, ["item_id", "cate_id"], gru_type="AUGRU",
                             use_negsampling=use_neg, alpha=1.0,
                             dnn_hidden_units=(32, 16), seed=seed)
                model.compile("adam", "binary_crossentropy")
                model.fit(x, y, batch_size=BATCH, epochs=EPOCHS, verbose=0)
                aucs.append(float(roc_auc_score(
                    y, model.predict(x, batch_size=64))))
                print("seed", seed, aucs[-1], file=sys.stderr)
            out[name] = payload_entry(
                aucs, {"batch_size": BATCH, "epochs": EPOCHS,
                       "graph_mode": True, "private_api_shims": True})
        except Exception as e:
            out[name] = {"error": "%s: %s" % (type(e).__name__,
                                              str(e)[:400])}
        print("done", name, file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
