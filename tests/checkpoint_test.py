"""Full train-state checkpoint/resume tests (orbax path)."""
from __future__ import annotations

import numpy as np

from deepctr_tpu.models import DeepFM
from deepctr_tpu.training.checkpoint import (
    restore_train_state,
    save_train_state,
)

from tests.utils import SAMPLE_SIZE, get_test_data


def _model_and_data(seed=2018):
    x, y, cols = get_test_data(SAMPLE_SIZE, sparse_feature_num=2,
                               dense_feature_num=1, seed=seed)
    model = DeepFM(cols, cols, dnn_hidden_units=(4,))
    model.compile("adam", "binary_crossentropy")
    return model, x, y


def test_train_state_resume_is_exact(tmp_path):
    """Train 2 epochs, checkpoint, train 2 more; a restored model trained
    for the same 2 extra epochs must land on identical weights (optimizer
    momentum state must survive the round-trip)."""
    model, x, y = _model_and_data()
    model.fit(x, y, batch_size=8, epochs=2, verbose=0, shuffle=False)
    ckpt = str(tmp_path / "state")
    save_train_state(model, ckpt)
    step_at_save = int(model.state.step)

    model.fit(x, y, batch_size=8, epochs=2, verbose=0, shuffle=False)
    pred_a = model.predict(x, batch_size=8)

    model2, x2, y2 = _model_and_data()
    # build variables with the same shapes, then restore the full state
    model2.fit(x, y, batch_size=8, epochs=0, verbose=0)
    restore_train_state(model2, ckpt)
    assert int(model2.state.step) == step_at_save
    # re-run the same 2 extra epochs from the restored state (shuffle=False
    # keeps the batch order identical; dropout is off in this model)
    model2.fit(x, y, batch_size=8, epochs=2, verbose=0, shuffle=False)
    pred_b = model2.predict(x, batch_size=8)
    np.testing.assert_allclose(pred_a, pred_b, rtol=1e-4, atol=1e-5)


def test_train_state_roundtrip_preserves_opt_state(tmp_path):
    import jax

    model, x, y = _model_and_data()
    model.fit(x, y, batch_size=8, epochs=1, verbose=0)
    ckpt = str(tmp_path / "state2")
    save_train_state(model, ckpt)

    model2, _, _ = _model_and_data()
    model2.fit(x, y, batch_size=8, epochs=0, verbose=0)
    restore_train_state(model2, ckpt)
    for a, b in zip(jax.tree.leaves(model.state.opt_state),
                    jax.tree.leaves(model2.state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
