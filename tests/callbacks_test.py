"""Callback tests: EarlyStopping halts training; ModelCheckpoint writes files."""
from __future__ import annotations

import os

from deepctr_tpu.models import WDL
from deepctr_tpu.training.callbacks import EarlyStopping, ModelCheckpoint

from tests.utils import SAMPLE_SIZE, get_test_data


def _model_and_data():
    x, y, cols = get_test_data(SAMPLE_SIZE, sparse_feature_num=2,
                               dense_feature_num=1)
    model = WDL(cols, cols, dnn_hidden_units=(4,))
    model.compile("adam", "binary_crossentropy")
    return model, x, y


def test_early_stopping_halts(tmp_path):
    model, x, y = _model_and_data()
    es = EarlyStopping(monitor="loss", patience=0, min_delta=10.0)  # never improves
    hist = model.fit(x, y, batch_size=8, epochs=20, verbose=0, callbacks=[es])
    assert len(hist.history["loss"]) < 20


def test_model_checkpoint_saves(tmp_path):
    model, x, y = _model_and_data()
    path = str(tmp_path / "ckpt_{epoch}.bin")
    model.fit(x, y, batch_size=8, epochs=3, verbose=0,
              callbacks=[ModelCheckpoint(path, monitor="loss")])
    assert os.path.exists(str(tmp_path / "ckpt_3.bin"))


def test_model_summary_counts_params():
    """Keras-surface parity: summary() prints per-param rows and returns
    the total parameter count."""
    import numpy as np

    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.models import WDL

    cols = [SparseFeat("c", 50, 4), DenseFeat("d", 1)]
    rng = np.random.RandomState(0)
    x = {"c": rng.randint(0, 50, 16).astype("int32"),
         "d": rng.rand(16, 1).astype("float32")}
    y = rng.randint(0, 2, 16).astype("float32")
    m = WDL(cols, cols, dnn_hidden_units=(4,))
    m.compile("adam", "binary_crossentropy")
    m.fit(x, y, batch_size=16, epochs=1, verbose=0)
    lines = []
    total = m.summary(print_fn=lines.append)
    assert total > 200 and any("Total params" in l for l in lines)
    assert any("emb_c" in l for l in lines)


def test_learning_rate_property_and_scale():
    """model.learning_rate speaks absolute values for named optimizers and
    mutates opt_state's traced scale, never the compiled step."""
    import numpy as np

    model, x, y = _model_and_data()
    model.fit(x, y, batch_size=8, epochs=1, verbose=0)
    assert np.isclose(model.learning_rate, 0.001)  # adam default
    model.learning_rate = 0.0005
    assert np.isclose(model.learning_rate, 0.0005)
    assert np.isclose(model.lr_scale, 0.5)
    # the train step still runs (no retrace error, same structure)
    hist = model.fit(x, y, batch_size=8, epochs=1, verbose=0)
    assert np.isfinite(hist.history["loss"][-1])


def test_learning_rate_scheduler_applies_schedule():
    import numpy as np

    from deepctr_tpu.training.callbacks import LearningRateScheduler

    model, x, y = _model_and_data()
    seen = []

    def schedule(epoch, lr):
        seen.append((epoch, lr))
        return 0.001 * (0.5 ** epoch)

    hist = model.fit(x, y, batch_size=8, epochs=3, verbose=0,
                     callbacks=[LearningRateScheduler(schedule)])
    assert [e for e, _ in seen] == [0, 1, 2]
    assert np.isclose(model.learning_rate, 0.001 * 0.25)
    assert np.isclose(hist.history["lr"][-1], 0.001 * 0.25)


def test_scheduler_actually_changes_updates():
    """LR 0 must freeze the params mid-training — proves the traced scale
    reaches the optimizer math, not just a Python attribute."""
    import jax
    import numpy as np

    model, x, y = _model_and_data()
    model.fit(x, y, batch_size=8, epochs=1, verbose=0)
    before = jax.device_get(model.state.params)
    model.learning_rate = 0.0
    model.fit(x, y, batch_size=8, epochs=1, verbose=0)
    after = jax.device_get(model.state.params)
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(before),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(after),
                   key=lambda t: str(t[0]))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(pa))


def test_reduce_lr_on_plateau_reduces():
    import numpy as np

    from deepctr_tpu.training.callbacks import ReduceLROnPlateau

    model, x, y = _model_and_data()
    # loss can never improve by 10.0/epoch -> plateau fires every epoch
    cb = ReduceLROnPlateau(monitor="loss", factor=0.5, patience=1,
                           min_delta=10.0, min_lr=1e-5)
    model.fit(x, y, batch_size=8, epochs=4, verbose=0, callbacks=[cb])
    # epoch 0 sets best; epochs 1-3 each halve: 0.001 -> 0.000125
    assert np.isclose(model.learning_rate, 0.001 * 0.5 ** 3)


def test_csv_logger_writes_rows(tmp_path):
    from deepctr_tpu.training.callbacks import CSVLogger

    model, x, y = _model_and_data()
    path = str(tmp_path / "log.csv")
    model.fit(x, y, batch_size=8, epochs=2, verbose=0,
              callbacks=[CSVLogger(path)])
    lines = open(path).read().strip().splitlines()
    assert lines[0].startswith("epoch")
    assert len(lines) == 3  # header + 2 epochs


def test_tensorboard_scalars(tmp_path):
    from deepctr_tpu.training.callbacks import TensorBoard

    model, x, y = _model_and_data()
    d = str(tmp_path / "tb")
    model.fit(x, y, batch_size=8, epochs=2, verbose=0,
              callbacks=[TensorBoard(d)])
    assert os.listdir(d)  # event file or scalars.jsonl


def test_embedding_split_lr_scaling():
    """The fused embedding-split optimizer honors the LR scale on BOTH the
    dense tower and the embedding tables (zero LR freezes everything)."""
    import jax
    import numpy as np

    from deepctr_tpu.training.optimizers import embedding_split_optimizer

    x, y, cols = get_test_data(SAMPLE_SIZE, sparse_feature_num=2,
                               dense_feature_num=1)
    from deepctr_tpu.models import WDL

    model = WDL(cols, cols, dnn_hidden_units=(4,))
    model.compile(embedding_split_optimizer(), "binary_crossentropy")
    model.fit(x, y, batch_size=8, epochs=1, verbose=0)
    assert np.isclose(model.learning_rate, 0.001)
    model.learning_rate = 0.0
    before = jax.device_get(model.state.params)
    model.fit(x, y, batch_size=8, epochs=1, verbose=0)
    after = jax.device_get(model.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(before),
                    jax.tree_util.tree_leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _model_and_data_n(n=40):
    from tests.utils import get_test_data as _gtd

    x, y, cols = _gtd(n, sparse_feature_num=2, dense_feature_num=1)
    model = WDL(cols, cols, dnn_hidden_units=(4,))
    model.compile("adam", "binary_crossentropy")
    return model, x, y


def test_batch_hooks_fire_per_execution():
    """Per-batch hooks (VERDICT r4 item 8): with steps_per_execution=K the
    hooks fire once per compiled execution (scan boundary) with the
    accumulated window logs; unscanned fit fires once per batch."""
    from deepctr_tpu.training.callbacks import Callback

    class Recorder(Callback):
        def __init__(self):
            self.begins, self.ends = [], []

        def on_train_batch_begin(self, model, batch):
            self.begins.append(batch)

        def on_train_batch_end(self, model, batch, logs):
            self.ends.append((batch, dict(logs)))
            return None

    # 40 samples / batch 8 -> 5 batches per epoch
    model, x, y = _model_and_data_n(40)
    rec = Recorder()
    model.fit(x, y, batch_size=8, epochs=1, verbose=0, callbacks=[rec])
    assert rec.begins == [0, 1, 2, 3, 4]
    assert [b for b, _ in rec.ends] == [0, 1, 2, 3, 4]
    assert all(lg["num_steps"] == 1 and lg["size"] == 8.0
               for _, lg in rec.ends)

    # scanned: K=2 -> boundaries after batches 1 and 3; trailing batch 4
    # runs singly. Hook indices are the LAST batch of each window.
    model2, x, y = _model_and_data_n(40)
    rec2 = Recorder()
    model2.fit(x, y, batch_size=8, epochs=1, verbose=0,
               steps_per_execution=2, callbacks=[rec2])
    assert [b for b, _ in rec2.ends] == [1, 3, 4]
    assert [lg["num_steps"] for _, lg in rec2.ends] == [2, 2, 1]
    assert [lg["size"] for _, lg in rec2.ends] == [16.0, 16.0, 8.0]
    assert all(lg["loss"] > 0 for _, lg in rec2.ends)


def test_batch_hook_stop_training():
    from deepctr_tpu.training.callbacks import Callback

    class StopAt3(Callback):
        def __init__(self):
            self.calls = 0

        def on_train_batch_end(self, model, batch, logs):
            self.calls += 1
            return self.calls >= 3

    model, x, y = _model_and_data_n(40)
    cb = StopAt3()
    hist = model.fit(x, y, batch_size=8, epochs=5, verbose=0, callbacks=[cb])
    assert cb.calls == 3               # stopped mid-epoch
    assert len(hist.history["loss"]) == 1


def test_csv_logger_batch_rows(tmp_path):
    from deepctr_tpu.training.callbacks import (CSVLogger,
                                                overrides_batch_hooks)

    path = str(tmp_path / "log.csv")
    assert not overrides_batch_hooks(CSVLogger(path))  # default: async-safe
    model, x, y = _model_and_data_n(40)
    cb = CSVLogger(path, log_batches=True)
    assert overrides_batch_hooks(cb)
    model.fit(x, y, batch_size=8, epochs=2, verbose=0,
              steps_per_execution=2, callbacks=[cb])
    rows = open(path + ".batches").read().strip().splitlines()
    assert rows[0] == "epoch,batch,loss,size,num_steps"
    assert len(rows) == 1 + 2 * 3      # 3 executions per epoch, 2 epochs
    assert rows[1].startswith("0,1,") and rows[3].startswith("0,4,")
    assert len(open(path).read().strip().splitlines()) == 3  # header+2 epochs


def test_tensorboard_batch_scalars(tmp_path):
    import json

    from deepctr_tpu.training.callbacks import TensorBoard

    class NoTB(TensorBoard):   # force the jsonl fallback for inspection
        def on_train_begin(self, model):
            import io
            import os

            os.makedirs(self.log_dir, exist_ok=True)
            self._jsonl = io.open(
                os.path.join(self.log_dir, "scalars.jsonl"), "a")

    model, x, y = _model_and_data_n(40)
    cb = NoTB(str(tmp_path), update_freq="batch")
    model.fit(x, y, batch_size=8, epochs=1, verbose=0,
              steps_per_execution=2, callbacks=[cb])
    lines = [json.loads(l) for l in
             open(tmp_path / "scalars.jsonl").read().splitlines()]
    batch_lines = [l for l in lines if "batch_loss" in l]
    # step axis counts optimizer steps: windows end at steps 2, 4, 5
    assert [l["step"] for l in batch_lines] == [2, 4, 5]
