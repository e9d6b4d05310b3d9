"""Regenerate the sequence-model reference goldens with >=5 seeds.

Runs the REFERENCE DeepCTR (TF) BST/DSIN/DIN on the exact fixtures of
tests/quality_test.py (identical rng draw order) across seeds, and prints
the JSON payload for tests/goldens.json 'sequence'. Run with:

  TF_USE_LEGACY_KERAS=1 TF_CPP_MIN_LOG_LEVEL=3 \
  PYTHONPATH=/root/reference python tools/gen_seq_goldens_ref.py
"""
import json

import numpy as np
from sklearn.metrics import roc_auc_score

SEEDS = [1024, 7, 2020, 42, 123]
N = 256
EPOCHS = 30
BATCH = 32


def fixtures():
    rng = np.random.RandomState(0)
    x = {
        "user": rng.randint(0, 10, N), "gender": rng.randint(0, 2, N),
        "item_id": rng.randint(1, 20, N), "cate_id": rng.randint(1, 10, N),
        "pay_score": rng.rand(N),
        "hist_item_id": rng.randint(1, 20, (N, 6)),
        "hist_cate_id": rng.randint(1, 10, (N, 6)),
        "seq_length": rng.randint(1, 7, N),
    }
    y = np.array([
        1 if x["item_id"][i] in x["hist_item_id"][i][: x["seq_length"][i]] else 0
        for i in range(N)
    ])
    x2 = {
        "user": rng.randint(0, 10, N), "gender": rng.randint(0, 2, N),
        "item": rng.randint(1, 20, N), "item_gender": rng.randint(1, 3, N),
        "score": rng.rand(N),
        "sess_0_item": rng.randint(1, 20, (N, 5)),
        "sess_0_item_gender": rng.randint(1, 3, (N, 5)),
        "sess_1_item": rng.randint(1, 20, (N, 5)),
        "sess_1_item_gender": rng.randint(1, 3, (N, 5)),
    }
    x2["sess_length"] = rng.randint(1, 3, N)
    y2 = np.array([
        1 if (x2["item"][i] in x2["sess_0_item"][i])
        or (x2["sess_length"][i] > 1 and x2["item"][i] in x2["sess_1_item"][i])
        else 0
        for i in range(N)
    ])
    return x, y, x2, y2


def main():
    import tensorflow as tf
    from deepctr.feature_column import DenseFeat, SparseFeat, VarLenSparseFeat
    from deepctr.models import BST, DIN, DSIN

    x, y, x2, y2 = fixtures()

    bst_cols = [
        SparseFeat("user", 10, embedding_dim=8),
        SparseFeat("gender", 2, embedding_dim=8),
        SparseFeat("item_id", 20, embedding_dim=8),
        SparseFeat("cate_id", 10, embedding_dim=8),
        DenseFeat("pay_score", 1),
        VarLenSparseFeat(SparseFeat("hist_item_id", 20, embedding_dim=8,
                                    embedding_name="item_id"),
                         maxlen=6, length_name="seq_length"),
        VarLenSparseFeat(SparseFeat("hist_cate_id", 10, embedding_dim=8,
                                    embedding_name="cate_id"),
                         maxlen=6, length_name="seq_length"),
    ]
    din_cols = [
        SparseFeat("user", 10, embedding_dim=8),
        SparseFeat("gender", 2, embedding_dim=4),
        SparseFeat("item_id", 20, embedding_dim=8),
        SparseFeat("cate_id", 10, embedding_dim=4),
        DenseFeat("pay_score", 1),
        VarLenSparseFeat(SparseFeat("hist_item_id", 20, embedding_dim=8,
                                    embedding_name="item_id"),
                         maxlen=6, length_name="seq_length"),
        VarLenSparseFeat(SparseFeat("hist_cate_id", 10, embedding_dim=4,
                                    embedding_name="cate_id"),
                         maxlen=6, length_name="seq_length"),
    ]
    dsin_cols = [
        SparseFeat("user", 10, embedding_dim=4),
        SparseFeat("gender", 2, embedding_dim=4),
        SparseFeat("item", 20, embedding_dim=4),
        SparseFeat("item_gender", 3, embedding_dim=4),
        DenseFeat("score", 1),
        VarLenSparseFeat(SparseFeat("sess_0_item", 20, embedding_dim=4,
                                    embedding_name="item"), maxlen=5),
        VarLenSparseFeat(SparseFeat("sess_0_item_gender", 3, embedding_dim=4,
                                    embedding_name="item_gender"), maxlen=5),
        VarLenSparseFeat(SparseFeat("sess_1_item", 20, embedding_dim=4,
                                    embedding_name="item"), maxlen=5),
        VarLenSparseFeat(SparseFeat("sess_1_item_gender", 3, embedding_dim=4,
                                    embedding_name="item_gender"), maxlen=5),
    ]

    out = {}
    for name, ctor, data, labels in (
        ("DIN", lambda seed: DIN(din_cols, ["item_id", "cate_id"],
                                 dnn_hidden_units=(32, 16),
                                 att_activation="sigmoid", seed=seed), x, y),
        ("BST", lambda seed: BST(bst_cols, ["item_id", "cate_id"],
                                 att_head_num=4, dnn_hidden_units=(32, 16),
                                 seed=seed), x, y),
        ("DSIN", lambda seed: DSIN(dsin_cols, ["item", "item_gender"],
                                   sess_max_count=2, dnn_hidden_units=(32, 16),
                                   att_embedding_size=1, att_head_num=8,
                                   seed=seed), x2, y2),
    ):
        runs = []
        for seed in SEEDS:
            tf.keras.backend.clear_session()
            tf.random.set_seed(seed)
            model = ctor(seed)
            model.compile("adam", "binary_crossentropy")
            model.fit(data, labels, batch_size=BATCH, epochs=EPOCHS, verbose=0)
            auc = roc_auc_score(labels, model.predict(data, batch_size=64))
            runs.append(round(float(auc), 4))
            print(name, "seed", seed, "auc", runs[-1], flush=True)
        mean = float(np.mean(runs))
        spread = float(np.max(runs) - np.min(runs))
        out[name] = {
            "train_auc": round(mean, 4),
            "seed_runs": runs,
            "tolerance": round(max(0.02, spread / 2 + 0.01), 4),
            "epochs": EPOCHS, "batch_size": BATCH,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
