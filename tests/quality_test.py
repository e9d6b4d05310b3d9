"""Quality parity vs self-measured reference goldens (SURVEY §6).

tests/goldens.json was produced by running the reference DeepCTR (TF, via
TF_USE_LEGACY_KERAS=1) on its own criteo sample: each model trained
10 epochs, batch 64, embedding_dim 4, then train-set AUC recorded. Our
models must reach the same memorization quality within tolerance on the
identical setup.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest
from sklearn.metrics import roc_auc_score
from sklearn.preprocessing import MinMaxScaler

from deepctr_tpu import DenseFeat, SparseFeat, get_feature_names
from deepctr_tpu import models as zoo

GOLDENS_PATH = os.path.join(os.path.dirname(__file__), "goldens.json")
AUC_TOLERANCE = 0.03

with open(GOLDENS_PATH) as f:
    GOLDENS = json.load(f)


def _criteo():
    data = pd.read_csv("/root/reference/examples/criteo_sample.txt")
    sparse = ["C%d" % i for i in range(1, 27)]
    dense = ["I%d" % i for i in range(1, 14)]
    data[sparse] = data[sparse].fillna("-1")
    data[dense] = data[dense].fillna(0)
    for f in sparse:
        data[f], _ = pd.factorize(data[f])
    data[dense] = MinMaxScaler().fit_transform(data[dense])
    cols = [SparseFeat(f, int(data[f].max() + 1), GOLDENS["embedding_dim"])
            for f in sparse]
    cols8 = cols[:8]  # the heavy models' golden config (no dense)
    cols = cols + [DenseFeat(f, 1) for f in dense]
    x = {n: data[n].values for n in get_feature_names(cols)}
    return x, data["label"].values, cols, cols8


# factory(cols, cols8) -> (model, columns the golden run used)
_FACTORIES = {
    "DeepFM": lambda c, c8: (zoo.DeepFM(c, c), c),
    "WDL": lambda c, c8: (zoo.WDL(c, c), c),
    "xDeepFM": lambda c, c8: (zoo.xDeepFM(c, c, dnn_hidden_units=(64, 32),
                                          cin_layer_size=(16, 16)), c),
    "DCN": lambda c, c8: (zoo.DCN(c, c, dnn_hidden_units=(64, 32)), c),
    "AutoInt": lambda c, c8: (zoo.AutoInt(c, c, dnn_hidden_units=(64, 32)), c),
    "FiBiNET": lambda c, c8: (zoo.FiBiNET(c, c, dnn_hidden_units=(64, 32)), c),
    "NFM": lambda c, c8: (zoo.NFM(c, c, dnn_hidden_units=(64, 32)), c),
    "PNN": lambda c, c8: (zoo.PNN(c, dnn_hidden_units=(64, 32)), c),
    "DeepFEFM": lambda c, c8: (zoo.DeepFEFM(c, c, dnn_hidden_units=(64, 32)), c),
    "AFM": lambda c, c8: (zoo.AFM(c8, c8), c8),
    "FNN": lambda c, c8: (zoo.FNN(c, c, dnn_hidden_units=(64, 32)), c),
    "CCPM": lambda c, c8: (zoo.CCPM(c8, c8, conv_kernel_width=(3, 2),
                                    conv_filters=(4, 4),
                                    dnn_hidden_units=(32,)), c8),
    "FGCNN": lambda c, c8: (zoo.FGCNN(c8, c8, conv_kernel_width=(3, 3),
                                      conv_filters=(4, 4), new_maps=(2, 2),
                                      pooling_width=(2, 2),
                                      dnn_hidden_units=(32,)), c8),
    "IFM": lambda c, c8: (zoo.IFM(c8, c8, dnn_hidden_units=(32, 16)), c8),
    "DIFM": lambda c, c8: (zoo.DIFM(c8, c8, att_head_num=2,
                                    dnn_hidden_units=(32, 16)), c8),
    "FwFM": lambda c, c8: (zoo.FwFM(c, c, dnn_hidden_units=(64, 32)), c),
    "EDCN": lambda c, c8: (zoo.EDCN(c8, c8), c8),
    "DCNMix": lambda c, c8: (zoo.DCNMix(c, c, dnn_hidden_units=(64, 32),
                                        low_rank=8, num_experts=2), c),
    "ONN": lambda c, c8: (zoo.ONN(c8, c8, dnn_hidden_units=(32,)), c8),
    "MLR": lambda c, c8: (zoo.MLR(c), c),
}


@pytest.mark.parametrize("name", sorted(
    n for n, g in GOLDENS["metrics"].items() if "train_auc" in g
))
def test_auc_parity_with_reference(name):
    """Criteo battery: goldens are mean-of-5-seed reference runs with
    tolerances derived from measured seed variance (max(3*std, 0.02) —
    SURVEY §7 multi-seed requirement; tools/gen_criteo_goldens_ref.py)."""
    g = GOLDENS["metrics"][name]
    golden, tol = g["train_auc"], g.get("tolerance", AUC_TOLERANCE)
    x, y, cols, cols8 = _criteo()
    model, used_cols = _FACTORIES[name](cols, cols8)
    x_used = {n: x[n] for n in get_feature_names(used_cols)}
    model.compile("adam", "binary_crossentropy")
    model.fit(x_used, y, batch_size=GOLDENS["batch_size"],
              epochs=GOLDENS["epochs"], verbose=0)
    p = model.predict(x_used, batch_size=256)
    auc = roc_auc_score(y, p)
    assert auc >= golden - tol, (
        "%s: our AUC %.4f vs reference golden %.4f (tol %.3f, mean of %d "
        "seeds)" % (name, auc, golden, tol, len(g.get("seed_runs", [1])))
    )


def test_din_auc_parity_with_reference():
    """DIN on a learnable synthetic membership task (click iff candidate item
    appears in the behavior history) — golden from the reference DIN run with
    the identical generator (tests/goldens.json 'sequence')."""
    from deepctr_tpu import VarLenSparseFeat

    golden = GOLDENS["sequence"]["DIN"]
    rng = np.random.RandomState(0)
    N = 256
    feature_columns = [
        SparseFeat("user", 10, embedding_dim=8),
        SparseFeat("gender", 2, embedding_dim=4),
        SparseFeat("item_id", 20, embedding_dim=8),
        SparseFeat("cate_id", 10, embedding_dim=4),
        DenseFeat("pay_score", 1),
    ]
    feature_columns += [
        VarLenSparseFeat(SparseFeat("hist_item_id", 20, embedding_dim=8,
                                    embedding_name="item_id"),
                         maxlen=6, length_name="seq_length"),
        VarLenSparseFeat(SparseFeat("hist_cate_id", 10, embedding_dim=4,
                                    embedding_name="cate_id"),
                         maxlen=6, length_name="seq_length"),
    ]
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
    model = zoo.DIN(feature_columns, ["item_id", "cate_id"],
                    dnn_hidden_units=(32, 16), att_activation="sigmoid")
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=golden["batch_size"], epochs=golden["epochs"],
              verbose=0)
    p = model.predict(x, batch_size=64)
    auc = roc_auc_score(y, p)
    tol = golden.get("tolerance", AUC_TOLERANCE)
    assert auc >= golden["train_auc"] - tol, (
        "DIN: our AUC %.4f vs reference golden %.4f (tol %.3f, mean of %d "
        "seeds)" % (auc, golden["train_auc"], tol,
                    len(golden.get("seed_runs", [1])))
    )


def _dien_fixture_and_cols(use_neg):
    """Identical rng draw order to tools/gen_missing_goldens_ref.py
    dien_fixture/dien_columns (the reference golden runs)."""
    from deepctr_tpu import VarLenSparseFeat

    rng = np.random.RandomState(0)
    N = 256
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
    return x, y, cols


@pytest.mark.parametrize("use_neg", [False, True],
                         ids=["aux_off", "aux_on"])
def test_dien_auc_parity_with_reference(use_neg):
    """DIEN AUGRU, aux loss OFF and ON, vs 5-seed reference goldens
    (VERDICT r2 Missing #3: the one model with an auxiliary loss,
    reference dien.py:212-213, had no quality gate). The reference could
    only run via TF1 graph mode + private-API shims
    (tools/gen_dien_goldens_ref.py) — its RNN fork is dead on stock
    TF 2.x."""
    golden = GOLDENS["sequence"]["DIEN_aux_on" if use_neg
                                 else "DIEN_aux_off"]
    x, y, cols = _dien_fixture_and_cols(use_neg)
    model = zoo.DIEN(cols, ["item_id", "cate_id"], gru_type="AUGRU",
                     use_negsampling=use_neg, alpha=1.0,
                     dnn_hidden_units=(32, 16))
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=golden["batch_size"],
              epochs=golden["epochs"], verbose=0)
    auc = roc_auc_score(y, model.predict(x, batch_size=64))
    assert auc >= golden["train_auc"] - golden["tolerance"], (
        "DIEN(%s): %.4f vs golden %.4f (tol %.3f, mean of %d seeds)"
        % ("aux_on" if use_neg else "aux_off", auc, golden["train_auc"],
           golden["tolerance"], len(golden["seed_runs"])))


def test_bst_auc_parity_with_reference():
    """BST on the DIN membership task (goldens 'sequence')."""
    from deepctr_tpu import VarLenSparseFeat

    golden = GOLDENS["sequence"]["BST"]
    rng = np.random.RandomState(0)
    N = 256
    feature_columns = [
        SparseFeat("user", 10, embedding_dim=8),
        SparseFeat("gender", 2, embedding_dim=8),
        SparseFeat("item_id", 20, embedding_dim=8),
        SparseFeat("cate_id", 10, embedding_dim=8),
        DenseFeat("pay_score", 1),
    ]
    feature_columns += [
        VarLenSparseFeat(SparseFeat("hist_item_id", 20, embedding_dim=8,
                                    embedding_name="item_id"),
                         maxlen=6, length_name="seq_length"),
        VarLenSparseFeat(SparseFeat("hist_cate_id", 10, embedding_dim=8,
                                    embedding_name="cate_id"),
                         maxlen=6, length_name="seq_length"),
    ]
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
    model = zoo.BST(feature_columns, ["item_id", "cate_id"], att_head_num=4,
                    dnn_hidden_units=(32, 16))
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=golden["batch_size"], epochs=golden["epochs"],
              verbose=0)
    auc = roc_auc_score(y, model.predict(x, batch_size=64))
    # the sequence goldens are means over 5 reference seeds
    # (tools/gen_seq_goldens_ref.py) with variance-derived tolerances
    tol = golden.get("tolerance", AUC_TOLERANCE)
    assert auc >= golden["train_auc"] - tol, (
        "BST: our AUC %.4f vs golden %.4f (tol %.3f)"
        % (auc, golden["train_auc"], tol)
    )


def test_dsin_auc_parity_with_reference():
    """DSIN on a two-session membership task (goldens 'sequence')."""
    from deepctr_tpu import VarLenSparseFeat

    golden = GOLDENS["sequence"]["DSIN"]
    rng = np.random.RandomState(0)
    # consume the same rng stream positions as the golden generator (the
    # BST block above used a fresh rng; the reference script drew BST data
    # first, so replicate that draw order here)
    N = 256
    _ = (rng.randint(0, 10, N), rng.randint(0, 2, N), rng.randint(1, 20, N),
         rng.randint(1, 10, N), rng.rand(N), rng.randint(1, 20, (N, 6)),
         rng.randint(1, 10, (N, 6)), rng.randint(1, 7, N))
    fc2 = [
        SparseFeat("user", 10, embedding_dim=4),
        SparseFeat("gender", 2, embedding_dim=4),
        SparseFeat("item", 20, embedding_dim=4),
        SparseFeat("item_gender", 3, embedding_dim=4),
        DenseFeat("score", 1),
    ]
    fc2 += [
        VarLenSparseFeat(SparseFeat("sess_0_item", 20, embedding_dim=4,
                                    embedding_name="item"), maxlen=5),
        VarLenSparseFeat(SparseFeat("sess_0_item_gender", 3, embedding_dim=4,
                                    embedding_name="item_gender"), maxlen=5),
        VarLenSparseFeat(SparseFeat("sess_1_item", 20, embedding_dim=4,
                                    embedding_name="item"), maxlen=5),
        VarLenSparseFeat(SparseFeat("sess_1_item_gender", 3, embedding_dim=4,
                                    embedding_name="item_gender"), maxlen=5),
    ]
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
    model = zoo.DSIN(fc2, ["item", "item_gender"], sess_max_count=2,
                     dnn_hidden_units=(32, 16), att_embedding_size=1,
                     att_head_num=8)
    model.compile("adam", "binary_crossentropy")
    model.fit(x2, y2, batch_size=golden["batch_size"], epochs=golden["epochs"],
              verbose=0)
    auc = roc_auc_score(y2, model.predict(x2, batch_size=64))
    tol = golden.get("tolerance", AUC_TOLERANCE)
    assert auc >= golden["train_auc"] - tol, (
        "DSIN: our AUC %.4f vs golden %.4f (tol %.3f, mean of %d seeds)"
        % (auc, golden["train_auc"], tol, len(golden.get("seed_runs", [1])))
    )


def test_mmoe_auc_parity_with_reference():
    """MMOE on census-income; reference memorizes both tasks to AUC 1.0
    (tests/goldens.json 'multitask') — so must we."""
    golden = GOLDENS["multitask"]["MMOE"]
    column_names = [
        'age', 'class_worker', 'det_ind_code', 'det_occ_code', 'education',
        'wage_per_hour', 'hs_college', 'marital_stat', 'major_ind_code',
        'major_occ_code', 'race', 'hisp_origin', 'sex', 'union_member',
        'unemp_reason', 'full_or_part_emp', 'capital_gains', 'capital_losses',
        'stock_dividends', 'tax_filer_stat', 'region_prev_res',
        'state_prev_res', 'det_hh_fam_stat', 'det_hh_summ', 'instance_weight',
        'mig_chg_msa', 'mig_chg_reg', 'mig_move_reg', 'mig_same',
        'mig_prev_sunbelt', 'num_emp', 'fam_under_18', 'country_father',
        'country_mother', 'country_self', 'citizenship', 'own_or_self',
        'vet_question', 'vet_benefits', 'weeks_worked', 'year', 'income_50k']
    data = pd.read_csv('/root/reference/examples/census-income.sample',
                       header=None, names=column_names)
    data['label_income'] = data['income_50k'].map({' - 50000.': 0, ' 50000+.': 1})
    data['label_marital'] = data['marital_stat'].apply(
        lambda v: 1 if v == ' Never married' else 0)
    data.drop(labels=['income_50k', 'marital_stat'], axis=1, inplace=True)
    sparse_features = [
        'class_worker', 'det_ind_code', 'det_occ_code', 'education',
        'hs_college', 'major_ind_code', 'major_occ_code', 'race',
        'hisp_origin', 'sex', 'union_member', 'unemp_reason',
        'full_or_part_emp', 'tax_filer_stat', 'region_prev_res',
        'state_prev_res', 'det_hh_fam_stat', 'det_hh_summ', 'mig_chg_msa',
        'mig_chg_reg', 'mig_move_reg', 'mig_same', 'mig_prev_sunbelt',
        'fam_under_18', 'country_father', 'country_mother', 'country_self',
        'citizenship', 'vet_question']
    dense_features = [c for c in data.columns
                      if c not in sparse_features + ['label_income', 'label_marital']]
    data[sparse_features] = data[sparse_features].fillna('-1')
    data[dense_features] = data[dense_features].fillna(0)
    data[dense_features] = MinMaxScaler().fit_transform(data[dense_features])
    for f in sparse_features:
        data[f], _ = pd.factorize(data[f])
    cols = [SparseFeat(f, int(data[f].max() + 1), 4) for f in sparse_features]
    cols += [DenseFeat(f, 1) for f in dense_features]
    x = {n: data[n].values for n in get_feature_names(cols)}
    y = [data['label_income'].values, data['label_marital'].values]
    m = zoo.MMOE(cols, tower_dnn_hidden_units=[],
                 task_types=['binary', 'binary'],
                 task_names=['label_income', 'label_marital'])
    m.compile("adam", loss=["binary_crossentropy", "binary_crossentropy"])
    m.fit(x, y, batch_size=golden["batch_size"], epochs=golden["epochs"],
          verbose=0)
    p = m.predict(x, batch_size=256)
    auc_income = roc_auc_score(y[0], p[:, 0])
    auc_marital = roc_auc_score(y[1], p[:, 1])
    assert auc_income >= golden["income_train_auc"] - AUC_TOLERANCE
    assert auc_marital >= golden["marital_train_auc"] - AUC_TOLERANCE


def _census():
    """census-income fixture shared by the MTL parity gates (identical
    preprocessing to the reference golden runs,
    tools/gen_missing_goldens_ref.py)."""
    column_names = [
        'age', 'class_worker', 'det_ind_code', 'det_occ_code', 'education',
        'wage_per_hour', 'hs_college', 'marital_stat', 'major_ind_code',
        'major_occ_code', 'race', 'hisp_origin', 'sex', 'union_member',
        'unemp_reason', 'full_or_part_emp', 'capital_gains', 'capital_losses',
        'stock_dividends', 'tax_filer_stat', 'region_prev_res',
        'state_prev_res', 'det_hh_fam_stat', 'det_hh_summ', 'instance_weight',
        'mig_chg_msa', 'mig_chg_reg', 'mig_move_reg', 'mig_same',
        'mig_prev_sunbelt', 'num_emp', 'fam_under_18', 'country_father',
        'country_mother', 'country_self', 'citizenship', 'own_or_self',
        'vet_question', 'vet_benefits', 'weeks_worked', 'year', 'income_50k']
    data = pd.read_csv('/root/reference/examples/census-income.sample',
                       header=None, names=column_names)
    data['label_income'] = data['income_50k'].map({' - 50000.': 0, ' 50000+.': 1})
    data['label_marital'] = data['marital_stat'].apply(
        lambda v: 1 if v == ' Never married' else 0)
    data.drop(labels=['income_50k', 'marital_stat'], axis=1, inplace=True)
    sparse_features = [
        'class_worker', 'det_ind_code', 'det_occ_code', 'education',
        'hs_college', 'major_ind_code', 'major_occ_code', 'race',
        'hisp_origin', 'sex', 'union_member', 'unemp_reason',
        'full_or_part_emp', 'tax_filer_stat', 'region_prev_res',
        'state_prev_res', 'det_hh_fam_stat', 'det_hh_summ', 'mig_chg_msa',
        'mig_chg_reg', 'mig_move_reg', 'mig_same', 'mig_prev_sunbelt',
        'fam_under_18', 'country_father', 'country_mother', 'country_self',
        'citizenship', 'vet_question']
    dense_features = [c for c in data.columns
                      if c not in sparse_features + ['label_income', 'label_marital']]
    data[sparse_features] = data[sparse_features].fillna('-1')
    data[dense_features] = data[dense_features].fillna(0)
    data[dense_features] = MinMaxScaler().fit_transform(data[dense_features])
    for f in sparse_features:
        data[f], _ = pd.factorize(data[f])
    cols = [SparseFeat(f, int(data[f].max() + 1), 4) for f in sparse_features]
    cols += [DenseFeat(f, 1) for f in dense_features]
    x = {n: data[n].values for n in get_feature_names(cols)}
    return data, cols, x


def _mtl_gate(name, golden, model, x, y1, y2):
    model.compile("adam", ["binary_crossentropy", "binary_crossentropy"])
    model.fit(x, [y1, y2], batch_size=golden["batch_size"],
              epochs=golden["epochs"], verbose=0)
    p = model.predict(x, batch_size=256)
    a1 = roc_auc_score(y1, p[:, 0])
    a2 = roc_auc_score(y2, p[:, 1])
    g1, g2 = golden["task1"], golden["task2"]
    assert a1 >= g1["train_auc"] - g1["tolerance"], (
        "%s task1: %.4f vs golden %.4f (tol %.3f, mean of %d seeds)"
        % (name, a1, g1["train_auc"], g1["tolerance"], len(g1["seed_runs"])))
    assert a2 >= g2["train_auc"] - g2["tolerance"], (
        "%s task2: %.4f vs golden %.4f (tol %.3f)"
        % (name, a2, g2["train_auc"], g2["tolerance"]))


def test_sharedbottom_auc_parity_with_reference():
    """SharedBottom on census income/marital vs 5-seed reference golden
    (VERDICT r2 Missing #3)."""
    golden = GOLDENS["multitask"]["SharedBottom"]
    data, cols, x = _census()
    m = zoo.SharedBottom(cols, bottom_dnn_hidden_units=(64,),
                         tower_dnn_hidden_units=(8,),
                         task_types=["binary", "binary"],
                         task_names=["income", "marital"])
    _mtl_gate("SharedBottom", golden, m,
              x, data["label_income"].values, data["label_marital"].values)


def test_ple_auc_parity_with_reference():
    """PLE (CGC levels) on census vs 5-seed reference golden."""
    golden = GOLDENS["multitask"]["PLE"]
    data, cols, x = _census()
    m = zoo.PLE(cols, tower_dnn_hidden_units=(8,),
                task_types=["binary", "binary"],
                task_names=["income", "marital"])
    _mtl_gate("PLE", golden, m,
              x, data["label_income"].values, data["label_marital"].values)


def test_esmm_auc_parity_with_reference():
    """ESMM (ctr * cvr containment: ctcvr = marital AND income) vs 5-seed
    reference golden."""
    golden = GOLDENS["multitask"]["ESMM"]
    data, cols, x = _census()
    y1 = data["label_marital"].values
    y2 = (data["label_marital"].values & data["label_income"].values)
    m = zoo.ESMM(cols, tower_dnn_hidden_units=(8,),
                 task_types=["binary", "binary"],
                 task_names=["ctr", "ctcvr"])
    _mtl_gate("ESMM", golden, m, x, y1, y2)


def test_flen_auc_parity_with_reference():
    """FLEN on avazu with field groups (user/item/context) vs 5-seed
    reference golden — the group-semantics model VERDICT flagged as
    ungated."""
    golden = GOLDENS["flen"]
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
    cols = [SparseFeat(n, int(data[n].max() + 1), 4,
                       group_name=field_info[n]) for n in sparse]
    x = {n: data[n].values for n in get_feature_names(cols)}
    y = data["click"].values
    m = zoo.FLEN(cols, cols, dnn_hidden_units=(32, 16))
    m.compile("adam", "binary_crossentropy")
    m.fit(x, y, batch_size=golden["batch_size"], epochs=golden["epochs"],
          verbose=0)
    auc = roc_auc_score(y, m.predict(x, batch_size=256))
    assert auc >= golden["train_auc"] - golden["tolerance"], (
        "FLEN: %.4f vs golden %.4f (tol %.3f, mean of %d seeds)"
        % (auc, golden["train_auc"], golden["tolerance"],
           len(golden["seed_runs"])))
