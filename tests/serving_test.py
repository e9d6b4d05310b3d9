"""StableHLO serving artifacts: export -> load -> predict parity, batch
polymorphism, and independence from the live model object."""
from __future__ import annotations

import numpy as np

from deepctr_tpu import DenseFeat, SparseFeat, serving
from deepctr_tpu.features import canonicalize_batch
from deepctr_tpu.models import DeepFM


def _fixture(n=32, seed=0):
    rng = np.random.RandomState(seed)
    cols = [SparseFeat("s%d" % i, 20, 4) for i in range(3)]
    cols += [DenseFeat("d0", 1)]
    x = {**{"s%d" % i: rng.randint(0, 20, n) for i in range(3)},
         "d0": rng.rand(n).astype("float32")}
    y = rng.randint(0, 2, n).astype("float32")
    return cols, x, y


def test_export_load_predict_parity(tmp_path):
    cols, x, y = _fixture()
    model = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=16, epochs=1, verbose=0)
    want = model.predict(x)

    path = str(tmp_path / "deepfm.shlo")
    size = serving.export_stablehlo(model, path, example_batch=x)
    assert size > 0

    got = serving.predict_with_artifact(path, x, cols)
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-5, atol=1e-6)


def test_polymorphic_batch_size(tmp_path):
    cols, x, y = _fixture()
    model = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=16, epochs=1, verbose=0)

    path = str(tmp_path / "deepfm.shlo")
    serving.export_stablehlo(model, path, example_batch=x)
    serve = serving.load_stablehlo(path)

    # a different batch size through the same artifact
    cols2, x2, _ = _fixture(n=7, seed=3)
    out = np.asarray(serve(canonicalize_batch(x2, cols)))
    assert out.shape[0] == 7
    want = model.predict(x2)
    np.testing.assert_allclose(out.reshape(-1), want.reshape(-1),
                               rtol=1e-5, atol=1e-6)


def test_artifact_outlives_training(tmp_path):
    """Weights are baked in at export: training further does not change
    the artifact's predictions."""
    cols, x, y = _fixture()
    model = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=16, epochs=1, verbose=0)

    path = str(tmp_path / "deepfm.shlo")
    serving.export_stablehlo(model, path, example_batch=x)
    before = serving.predict_with_artifact(path, x, cols)

    model.fit(x, y, batch_size=16, epochs=3, verbose=0)  # keep training
    after = serving.predict_with_artifact(path, x, cols)
    np.testing.assert_allclose(after, before, rtol=1e-6)
    # while the live model HAS moved
    assert not np.allclose(model.predict(x).reshape(-1),
                           before.reshape(-1), rtol=1e-4)


def test_export_with_fused_flags_enabled(tmp_path):
    """compile(fused_attention=True, fused_gather_pool=True) must not leak
    Pallas custom calls (or their padding arithmetic, which cannot trace
    under a symbolic batch dim) into the exported artifact."""
    from deepctr_tpu import SparseFeat, VarLenSparseFeat
    from deepctr_tpu.models import BST
    from deepctr_tpu.ops.attention import (fused_attention_enabled,
                                           set_fused_attention)

    rng = np.random.RandomState(0)
    maxlen, n = 6, 24
    cols = [SparseFeat("item", 30, 16), SparseFeat("cate", 8, 16),
            VarLenSparseFeat(SparseFeat("hist_item", 30, 16,
                                        embedding_name="item"),
                             maxlen=maxlen, length_name="seq_length"),
            VarLenSparseFeat(SparseFeat("hist_cate", 8, 16,
                                        embedding_name="cate"),
                             maxlen=maxlen, length_name="seq_length")]
    x = {"item": rng.randint(1, 30, n), "cate": rng.randint(1, 8, n),
         "hist_item": rng.randint(1, 30, (n, maxlen)),
         "hist_cate": rng.randint(1, 8, (n, maxlen)),
         "seq_length": rng.randint(1, maxlen + 1, n)}
    y = rng.randint(0, 2, n).astype("float32")
    try:
        m = BST(cols, ["item", "cate"], att_head_num=2,
                dnn_hidden_units=(8,), seed=3)
        m.compile("adam", "binary_crossentropy", fused_attention=True,
                  fused_gather_pool=True)
        m.fit(x, y, batch_size=12, epochs=1, verbose=0)
        path = str(tmp_path / "bst.shlo")
        serving.export_stablehlo(m, path, example_batch=x)  # must not raise
        got = serving.predict_with_artifact(path, x, cols)
        assert got.shape[0] == n and not np.isnan(got).any()
        # flags restored after export
        assert fused_attention_enabled()
    finally:
        set_fused_attention(False)
        from deepctr_tpu.ops.embedding import set_fused_gather_pool
        set_fused_gather_pool(False)


def test_export_with_fused_gru_enabled(tmp_path):
    """compile(fused_gru=True) must not leak the whole-sequence GRU
    kernel's custom call / block padding into the exported artifact
    (review regression: the guard originally covered only attention and
    gather-pool)."""
    from tests.models.DIEN_test import get_xy_fd

    from deepctr_tpu.models import DIEN
    from deepctr_tpu.ops.gru import fused_gru_enabled, set_fused_gru

    x, y, cols, behaviors = get_xy_fd()
    try:
        m = DIEN(cols, behaviors, gru_type="AUGRU", dnn_hidden_units=(8,),
                 seed=3)
        m.compile("adam", "binary_crossentropy", fused_gru=True)
        m.fit(x, y, batch_size=3, epochs=1, verbose=0)
        path = str(tmp_path / "dien.shlo")
        serving.export_stablehlo(m, path, example_batch=x)  # must not raise
        got = serving.predict_with_artifact(path, x, cols)
        assert got.shape[0] == len(y) and not np.isnan(got).any()
        assert fused_gru_enabled()  # flag restored after export
    finally:
        set_fused_gru(False)


def test_sidecar_weights_export_parity(tmp_path):
    """bake_weights=False: graph-only artifact + msgpack weight sidecar —
    the path billion-parameter models MUST take (flatbuffers caps baked
    artifacts at 2 GB). Prediction parity with the baked artifact and the
    live model; polymorphic batch still works."""
    cols, x, y = _fixture()
    model = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=16, epochs=1, verbose=0)
    want = model.predict(x)

    path = str(tmp_path / "deepfm_sidecar.shlo")
    serving.export_stablehlo(model, path, example_batch=x,
                             bake_weights=False)
    import os

    assert os.path.exists(path + ".weights")
    serve = serving.load_stablehlo(path)
    xc = canonicalize_batch(x, cols)
    got = np.asarray(serve(xc))
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-5, atol=1e-6)
    # polymorphic batch: smaller slice through the same artifact
    xs = {k: v[:8] for k, v in xc.items()}
    got8 = np.asarray(serve(xs))
    np.testing.assert_allclose(got8.reshape(-1), want.reshape(-1)[:8],
                               rtol=1e-5, atol=1e-6)


def test_auto_bake_threshold(monkeypatch, tmp_path):
    """Default bake_weights=None sidesteps the flatbuffers cap
    automatically when weights exceed the limit."""
    cols, x, y = _fixture()
    model = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=16, epochs=1, verbose=0)
    monkeypatch.setattr(serving, "_BAKE_LIMIT_BYTES", 1)  # force sidecar
    path = str(tmp_path / "auto.shlo")
    serving.export_stablehlo(model, path, example_batch=x)
    import os

    assert os.path.exists(path + ".weights")
    got = np.asarray(serving.load_stablehlo(path)(
        canonicalize_batch(x, cols)))
    np.testing.assert_allclose(got.reshape(-1),
                               model.predict(x).reshape(-1),
                               rtol=1e-5, atol=1e-6)


def _hash_fixture(n=32, seed=0, string_keys=False, varlen=False):
    """use_hash model: raw keys hashed into buckets (reference Hash flow)."""
    from deepctr_tpu import VarLenSparseFeat

    rng = np.random.RandomState(seed)
    cols = [SparseFeat("h0", 50, 4, use_hash=True,
                       dtype="string" if string_keys else "int32"),
            SparseFeat("s1", 20, 4), DenseFeat("d0", 1)]
    keys = rng.randint(0, 10**9, n)
    x = {"h0": (np.array([("u%d" % k) for k in keys])
                if string_keys else keys.astype(np.int64)),
         "s1": rng.randint(0, 20, n), "d0": rng.rand(n).astype("float32")}
    if varlen:
        cols.append(VarLenSparseFeat(
            SparseFeat("hv", 30, 4, use_hash=True), maxlen=3))
        hv = rng.randint(0, 10**6, (n, 3))
        hv[rng.rand(n, 3) < 0.3] = 0  # mask_zero padding
        x["hv"] = hv
    y = rng.randint(0, 2, n).astype("float32")
    return cols, x, y


def test_in_graph_hash_round_trip(tmp_path):
    """VERDICT r3 #4: raw integer keys -> exported artifact == model.predict
    on the (host-)hashed batch. The artifact hashes in-graph (ops/hash.py),
    so serving needs no host hashing at all."""
    cols, x, y = _hash_fixture(varlen=True)
    model = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=16, epochs=1, verbose=0)
    want = model.predict(x)  # host-hashes via canonicalize_batch

    path = str(tmp_path / "hash.shlo")
    serving.export_stablehlo(model, path, example_batch=x)
    import json
    spec = json.load(open(path + ".hashspec.json"))["features"]
    assert spec["h0"]["in_graph"] and spec["hv"]["in_graph"]
    assert spec["hv"]["mask_zero"] and not spec["h0"]["mask_zero"]

    # raw keys straight through the artifact (skip_hash: device hashes)
    serve = serving.load_stablehlo(path)
    xc_raw = canonicalize_batch(x, cols, skip_hash={"h0", "hv"})
    got = np.asarray(serve(xc_raw))
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-5, atol=1e-6)

    # and the one-call convenience path
    got2 = serving.predict_with_artifact(path, x, cols)
    np.testing.assert_allclose(got2.reshape(-1), want.reshape(-1),
                               rtol=1e-5, atol=1e-6)


def test_string_key_hash_round_trip(tmp_path):
    """String keys cannot hash in-graph; the hash-spec sidecar +
    make_preprocessor reproduce training-time buckets on the host."""
    cols, x, y = _hash_fixture(string_keys=True)
    model = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=16, epochs=1, verbose=0)
    want = model.predict(x)

    path = str(tmp_path / "strhash.shlo")
    serving.export_stablehlo(model, path, example_batch=x)
    import json
    spec = json.load(open(path + ".hashspec.json"))["features"]
    assert not spec["h0"]["in_graph"]

    prep = serving.make_preprocessor(path + ".hashspec.json")
    xc = canonicalize_batch(prep(x), cols, skip_hash=prep.skip_hash)
    serve = serving.load_stablehlo(path)
    got = np.asarray(serve(xc))
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-5, atol=1e-6)

    got2 = serving.predict_with_artifact(path, x, cols)
    np.testing.assert_allclose(got2.reshape(-1), want.reshape(-1),
                               rtol=1e-5, atol=1e-6)


def test_hash_in_graph_disabled(tmp_path):
    """hash_in_graph=False keeps the pre-hashed-id contract but still
    emits the sidecar so predict_with_artifact serves raw keys via the
    host preprocessor."""
    cols, x, y = _hash_fixture()
    model = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=16, epochs=1, verbose=0)
    want = model.predict(x)

    path = str(tmp_path / "nohash.shlo")
    serving.export_stablehlo(model, path, example_batch=x,
                             hash_in_graph=False)
    import json
    spec = json.load(open(path + ".hashspec.json"))["features"]
    assert not spec["h0"]["in_graph"]
    got = serving.predict_with_artifact(path, x, cols)
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-5, atol=1e-6)


def test_wide_in_graph_hash_64bit_keys(tmp_path):
    """hash_in_graph="wide": the artifact device-hashes FULL 64-bit raw
    keys via (B, 2) int32 [lo, hi] planes — no host hashing, exact
    training-time buckets (ops/hash.py device_hash_bucket_u64)."""
    import json

    from deepctr_tpu import VarLenSparseFeat

    rng = np.random.RandomState(0)
    cols = [SparseFeat("h0", 50, 4, use_hash=True),
            SparseFeat("s1", 20, 4), DenseFeat("d0", 1)]
    keys = rng.randint(-(2**62), 2**62, 32, dtype=np.int64)
    x = {"h0": keys, "s1": rng.randint(0, 20, 32),
         "d0": rng.rand(32).astype("float32")}
    y = rng.randint(0, 2, 32).astype("float32")
    model = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=7)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=16, epochs=1, verbose=0)
    want = model.predict(x)  # host-hashes the int64 decimals

    path = str(tmp_path / "wide.shlo")
    serving.export_stablehlo(model, path, example_batch=x,
                             hash_in_graph="wide")
    spec = json.load(open(path + ".hashspec.json"))["features"]
    assert spec["h0"]["in_graph"] and spec["h0"]["wide"]

    got = serving.predict_with_artifact(path, x, cols)
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-5, atol=1e-6)

    # polymorphic batch still works through the wide planes
    prep = serving.make_preprocessor(path + ".hashspec.json")
    x7 = {k: v[:7] for k, v in x.items()}
    xc = canonicalize_batch(prep(x7), cols, skip_hash=prep.skip_hash)
    out = np.asarray(serving.load_stablehlo(path)(xc))
    np.testing.assert_allclose(out.reshape(-1), want.reshape(-1)[:7],
                               rtol=1e-5, atol=1e-6)


def test_wide_in_graph_hash_varlen_int64(tmp_path):
    """Int64-keyed DIN serves RAW keys end-to-end (VERDICT r4 item 7):
    hash_in_graph="wide" covers VARLEN history ids via (B, T, 2) [lo, hi]
    planes — device buckets bit-identical to host hashing, padding zeros
    keep the mask_zero contract (bucket 0)."""
    import json

    from deepctr_tpu import VarLenSparseFeat
    from deepctr_tpu.models import DIN

    rng = np.random.RandomState(3)
    B, T = 12, 4
    cols = [
        SparseFeat("user", 10, 4),
        SparseFeat("item_id", 50, 8, use_hash=True, dtype="int64"),
        DenseFeat("pay_score", 1),
        VarLenSparseFeat(
            SparseFeat("hist_item_id", 50, 8, use_hash=True,
                       embedding_name="item_id", dtype="int64"),
            maxlen=T, length_name="seq_length"),
    ]
    lens = rng.randint(1, T + 1, B)
    hist = rng.randint(-(2**62), 2**62, (B, T), dtype=np.int64)
    hist[np.arange(T)[None, :] >= lens[:, None]] = 0  # padded tail
    x = {
        "user": rng.randint(0, 10, B),
        "item_id": rng.randint(-(2**62), 2**62, B, dtype=np.int64),
        "pay_score": rng.rand(B).astype("float32"),
        "hist_item_id": hist,
        "seq_length": lens,
    }
    y = rng.randint(0, 2, B).astype("float32")
    model = DIN(cols, ["item_id"], dnn_hidden_units=(8,), seed=5)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=6, epochs=1, verbose=0)
    want = model.predict(x)  # host-hashes the int64 decimals

    path = str(tmp_path / "din_wide.shlo")
    serving.export_stablehlo(model, path, example_batch=x,
                             hash_in_graph="wide")
    spec = json.load(open(path + ".hashspec.json"))["features"]
    assert spec["item_id"]["wide"] and not spec["item_id"]["varlen"]
    assert spec["hist_item_id"]["wide"] and spec["hist_item_id"]["varlen"]

    got = serving.predict_with_artifact(path, x, cols)
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-5, atol=1e-6)

    # polymorphic batch through the (b, T, 2) varlen planes
    prep = serving.make_preprocessor(path + ".hashspec.json")
    x5 = {k: v[:5] for k, v in x.items()}
    assert prep(x5)["hist_item_id"].shape == (5, T, 2)
    xc = canonicalize_batch(prep(x5), cols, skip_hash=prep.skip_hash)
    out = np.asarray(serving.load_stablehlo(path)(xc))
    np.testing.assert_allclose(out.reshape(-1), want.reshape(-1)[:5],
                               rtol=1e-5, atol=1e-6)


def test_bytes_in_graph_hash_string_keys(tmp_path):
    """hash_in_graph="bytes": STRING-keyed artifacts are fully
    self-contained — the host only UTF-8-encodes keys into (B, L+1) byte
    planes; the artifact hashes them in-graph, bit-identical to the
    training-time host pipeline (ops/hash.py device_hash_bucket_bytes)."""
    import json

    rng = np.random.RandomState(5)
    B = 24
    users = np.array(["user_%04d" % u for u in rng.randint(0, 500, B)],
                     dtype=object)
    users[0] = ""          # edge: empty key
    users[1] = "0"         # edge: the literal-"0" mask key
    users[2] = "café" # edge: multi-byte UTF-8
    cols = [SparseFeat("uid", 60, 4, use_hash=True, dtype="string"),
            SparseFeat("s1", 20, 4), DenseFeat("d0", 1)]
    x = {"uid": users, "s1": rng.randint(0, 20, B),
         "d0": rng.rand(B).astype("float32")}
    y = rng.randint(0, 2, B).astype("float32")
    model = DeepFM(cols, cols, dnn_hidden_units=(8,), seed=11)
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=12, epochs=1, verbose=0)
    want = model.predict(x)  # host-hashes the strings

    path = str(tmp_path / "bytes.shlo")
    serving.export_stablehlo(model, path, example_batch=x,
                             hash_in_graph="bytes")
    spec = json.load(open(path + ".hashspec.json"))["features"]
    assert spec["uid"]["in_graph"] and spec["uid"]["bytes"]

    got = serving.predict_with_artifact(path, x, cols)
    np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                               rtol=1e-5, atol=1e-6)

    # polymorphic batch through the byte planes
    prep = serving.make_preprocessor(path + ".hashspec.json")
    x7 = {k: v[:7] for k, v in x.items()}
    assert prep(x7)["uid"].shape == (7, 33)
    xc = canonicalize_batch(prep(x7), cols, skip_hash=prep.skip_hash)
    out = np.asarray(serving.load_stablehlo(path)(xc))
    np.testing.assert_allclose(out.reshape(-1), want.reshape(-1)[:7],
                               rtol=1e-5, atol=1e-6)

    # >32-byte keys fail loudly at the preprocessor, never silently
    xbad = dict(x)
    xbad["uid"] = np.array(["y" * 40] * B, dtype=object)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bytes"):
        prep(xbad)
