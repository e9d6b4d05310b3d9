"""Reference goldens for the models VERDICT r2 flagged as ungated:
DIEN (aux on AND off), FLEN, SharedBottom, ESMM, PLE. >=5 seeds each,
mean + variance-derived tolerance (same shape as the 'sequence' goldens).

  TF_USE_LEGACY_KERAS=1 TF_CPP_MIN_LOG_LEVEL=3 \
  PYTHONPATH=/root/reference python tools/gen_missing_goldens_ref.py

Prints one JSON payload to stdout (merge into tests/goldens.json). The
reference's own run_dien.py refuses AUGRU+negsampling on TF>=1.14
(legacy private RNN APIs); this script records per-config success or the
failure reason so the gate reflects what the reference can actually run
on a current TF.
"""
import json
import sys

import numpy as np
from sklearn.metrics import roc_auc_score

SEEDS = [1024, 7, 2020, 42, 123]
N = 256
EPOCHS = 30
BATCH = 32


def dien_fixture(use_neg):
    rng = np.random.RandomState(0)
    x = {
        "user": rng.randint(0, 10, N), "gender": rng.randint(0, 2, N),
        "item_id": rng.randint(1, 20, N), "cate_id": rng.randint(1, 10, N),
        "pay_score": rng.rand(N),
        "hist_item_id": rng.randint(1, 20, (N, 6)),
        "hist_cate_id": rng.randint(1, 10, (N, 6)),
        "seq_length": rng.randint(1, 7, N),
    }
    if use_neg:
        x["neg_hist_item_id"] = rng.randint(1, 20, (N, 6))
        x["neg_hist_cate_id"] = rng.randint(1, 10, (N, 6))
    y = np.array([
        1 if x["item_id"][i] in x["hist_item_id"][i][: x["seq_length"][i]]
        else 0 for i in range(N)
    ])
    return x, y


def dien_columns(use_neg):
    from deepctr.feature_column import (DenseFeat, SparseFeat,
                                        VarLenSparseFeat)

    cols = [
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
    if use_neg:
        cols += [
            VarLenSparseFeat(SparseFeat("neg_hist_item_id", 20,
                                        embedding_dim=8,
                                        embedding_name="item_id"),
                             maxlen=6, length_name="seq_length"),
            VarLenSparseFeat(SparseFeat("neg_hist_cate_id", 10,
                                        embedding_dim=4,
                                        embedding_name="cate_id"),
                             maxlen=6, length_name="seq_length"),
        ]
    return cols


def run_dien(use_neg, gru_type):
    import tensorflow as tf
    from deepctr.models import DIEN

    x, y = dien_fixture(use_neg)
    cols = dien_columns(use_neg)
    aucs = []
    for seed in SEEDS:
        tf.keras.backend.clear_session()
        tf.keras.utils.set_random_seed(seed)
        model = DIEN(cols, ["item_id", "cate_id"], gru_type=gru_type,
                     use_negsampling=use_neg, alpha=1.0,
                     dnn_hidden_units=(32, 16), seed=seed)
        model.compile("adam", "binary_crossentropy")
        model.fit(x, y, batch_size=BATCH, epochs=EPOCHS, verbose=0)
        aucs.append(float(roc_auc_score(y, model.predict(x, batch_size=64))))
    return aucs


def avazu_flen():
    import pandas as pd

    data = pd.read_csv("/root/reference/examples/avazu_sample.txt")
    data["day"] = data["hour"].apply(lambda v: str(v)[4:6])
    data["hour"] = data["hour"].apply(lambda v: str(v)[6:])
    sparse = ["hour", "C1", "banner_pos", "site_id", "site_domain",
              "site_category", "app_id", "app_domain", "app_category",
              "device_id", "device_model", "device_type",
              "device_conn_type", "C14", "C15", "C16", "C17", "C18",
              "C19", "C20", "C21"]
    data[sparse] = data[sparse].fillna("-1")
    for f in sparse:
        data[f], _ = pd.factorize(data[f])
    field_info = dict(C14="user", C15="user", C16="user", C17="user",
                      C18="user", C19="user", C20="user", C21="user",
                      C1="user", banner_pos="context", site_id="context",
                      site_domain="context", site_category="context",
                      app_id="item", app_domain="item", app_category="item",
                      device_model="user", device_type="user",
                      device_conn_type="context", hour="context",
                      device_id="user")
    return data, sparse, field_info


def run_flen():
    import tensorflow as tf
    from deepctr.feature_column import SparseFeat, get_feature_names
    from deepctr.models import FLEN

    data, sparse, field_info = avazu_flen()
    aucs = []
    for seed in SEEDS:
        tf.keras.backend.clear_session()
        tf.keras.utils.set_random_seed(seed)
        cols = [SparseFeat(n, int(data[n].max() + 1), embedding_dim=4,
                           group_name=field_info[n]) for n in sparse]
        x = {n: data[n].values for n in get_feature_names(cols)}
        y = data["click"].values
        model = FLEN(cols, cols, dnn_hidden_units=(32, 16), seed=seed)
        model.compile("adam", "binary_crossentropy")
        model.fit(x, y, batch_size=64, epochs=10, verbose=0)
        aucs.append(float(roc_auc_score(y, model.predict(x, batch_size=256))))
    return aucs


def census():
    import pandas as pd

    column_names = [
        "age", "class_worker", "det_ind_code", "det_occ_code", "education",
        "wage_per_hour", "hs_college", "marital_stat", "major_ind_code",
        "major_occ_code", "race", "hisp_origin", "sex", "union_member",
        "unemp_reason", "full_or_part_emp", "capital_gains",
        "capital_losses", "stock_dividends", "tax_filer_stat",
        "region_prev_res", "state_prev_res", "det_hh_fam_stat",
        "det_hh_summ", "instance_weight", "mig_chg_msa", "mig_chg_reg",
        "mig_move_reg", "mig_same", "mig_prev_sunbelt", "num_emp",
        "fam_under_18", "country_father", "country_mother", "country_self",
        "citizenship", "own_or_self", "vet_question", "vet_benefits",
        "weeks_worked", "year", "income_50k"]
    data = pd.read_csv("/root/reference/examples/census-income.sample",
                       header=None, names=column_names)
    data["label_income"] = data["income_50k"].map(
        {" - 50000.": 0, " 50000+.": 1})
    data["label_marital"] = data["marital_stat"].apply(
        lambda v: 1 if v == " Never married" else 0)
    data.drop(labels=["income_50k", "marital_stat"], axis=1, inplace=True)
    sparse = [
        "class_worker", "det_ind_code", "det_occ_code", "education",
        "hs_college", "major_ind_code", "major_occ_code", "race",
        "hisp_origin", "sex", "union_member", "unemp_reason",
        "full_or_part_emp", "tax_filer_stat", "region_prev_res",
        "state_prev_res", "det_hh_fam_stat", "det_hh_summ", "mig_chg_msa",
        "mig_chg_reg", "mig_move_reg", "mig_same", "mig_prev_sunbelt",
        "fam_under_18", "country_father", "country_mother", "country_self",
        "citizenship", "vet_question"]
    dense = [c for c in data.columns
             if c not in sparse + ["label_income", "label_marital"]]
    from sklearn.preprocessing import MinMaxScaler

    data[sparse] = data[sparse].fillna("-1")
    data[dense] = data[dense].fillna(0)
    data[dense] = MinMaxScaler().fit_transform(data[dense])
    for f in sparse:
        data[f], _ = pd.factorize(data[f])
    return data, sparse, dense


def run_mtl(which):
    import tensorflow as tf
    from deepctr.feature_column import (DenseFeat, SparseFeat,
                                        get_feature_names)
    from deepctr.models import ESMM, PLE, SharedBottom

    data, sparse, dense = census()
    aucs1, aucs2 = [], []
    for seed in SEEDS:
        tf.keras.backend.clear_session()
        tf.keras.utils.set_random_seed(seed)
        cols = [SparseFeat(f, int(data[f].max() + 1), 4) for f in sparse]
        cols += [DenseFeat(f, 1) for f in dense]
        x = {n: data[n].values for n in get_feature_names(cols)}
        if which == "ESMM":
            # ctr/ctcvr containment: ctcvr = ctr AND income
            y1 = data["label_marital"].values
            y2 = (data["label_marital"].values
                  & data["label_income"].values)
            model = ESMM(cols, tower_dnn_hidden_units=(8,),
                         task_types=["binary", "binary"],
                         task_names=["ctr", "ctcvr"], seed=seed)
        else:
            y1 = data["label_income"].values
            y2 = data["label_marital"].values
            if which == "SharedBottom":
                model = SharedBottom(cols, bottom_dnn_hidden_units=(64,),
                                     tower_dnn_hidden_units=(8,),
                                     task_types=["binary", "binary"],
                                     task_names=["income", "marital"],
                                     seed=seed)
            else:
                model = PLE(cols, tower_dnn_hidden_units=(8,),
                            task_types=["binary", "binary"],
                            task_names=["income", "marital"], seed=seed)
        model.compile("adam", ["binary_crossentropy",
                               "binary_crossentropy"])
        model.fit(x, [y1, y2], batch_size=64, epochs=60, verbose=0)
        p = model.predict(x, batch_size=256)
        if isinstance(p, list):
            p1, p2 = p[0].reshape(-1), p[1].reshape(-1)
        else:
            p1, p2 = p[:, 0], p[:, 1]
        aucs1.append(float(roc_auc_score(y1, p1)))
        aucs2.append(float(roc_auc_score(y2, p2)))
    return aucs1, aucs2


def payload_entry(aucs, extra=None):
    arr = np.asarray(aucs)
    entry = {
        "seeds": SEEDS, "seed_runs": [round(v, 4) for v in aucs],
        "train_auc": round(float(arr.mean()), 4),
        "tolerance": round(float(max(3 * arr.std(), 0.02)), 4),
    }
    if extra:
        entry.update(extra)
    return entry


def main():
    out = {}
    for name, fn in [
        ("DIEN_aux_off", lambda: run_dien(False, "AUGRU")),
        ("DIEN_aux_on", lambda: run_dien(True, "AUGRU")),
        ("FLEN", run_flen),
    ]:
        try:
            aucs = fn()
            extra = {"batch_size": BATCH, "epochs": EPOCHS}
            if name == "FLEN":
                extra = {"batch_size": 64, "epochs": 10,
                         "dataset": "avazu_sample.txt"}
            out[name] = payload_entry(aucs, extra)
        except Exception as e:  # record failures honestly
            out[name] = {"error": "%s: %s" % (type(e).__name__, str(e)[:400])}
        print("done:", name, file=sys.stderr)
    for name in ("SharedBottom", "ESMM", "PLE"):
        try:
            a1, a2 = run_mtl(name)
            out[name] = {
                "task1": payload_entry(a1),
                "task2": payload_entry(a2),
                "batch_size": 64, "epochs": 60,
                "dataset": "census-income.sample",
            }
        except Exception as e:
            out[name] = {"error": "%s: %s" % (type(e).__name__, str(e)[:400])}
        print("done:", name, file=sys.stderr)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
