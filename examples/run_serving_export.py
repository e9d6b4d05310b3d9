"""Train -> export a self-contained StableHLO serving artifact -> serve
RAW keys (no model-building Python, no hashing code on the server).

Covers the three in-graph hashing contracts (docs/Model-Methods.md):
  - default: int32 raw integer keys hashed in-graph
  - "wide":  full int64 keys as [lo, hi] planes (scalar AND varlen)
  - "bytes": STRING keys as UTF-8 byte planes — the artifact owns the
             hash, the host only encodes (reference-SavedModel parity)
"""
import os
import tempfile

import numpy as np

from deepctr_tpu import DenseFeat, SparseFeat, serving
from deepctr_tpu.models import DeepFM

if __name__ == "__main__":
    rng = np.random.RandomState(7)
    B = 256
    cols = [
        SparseFeat("ad_id", 100, 8, use_hash=True),                # int32
        SparseFeat("device_id", 100, 8, use_hash=True,
                   dtype="int64"),                                 # int64
        SparseFeat("user_id", 100, 8, use_hash=True,
                   dtype="string"),                                # string
        DenseFeat("price", 1),
    ]
    x = {
        "ad_id": rng.randint(0, 1_000_000, B).astype(np.int32),
        "device_id": rng.randint(-(2 ** 62), 2 ** 62, B,
                                 dtype=np.int64),
        "user_id": np.array(["user_%05d" % u
                             for u in rng.randint(0, 99999, B)],
                            dtype=object),
        "price": rng.rand(B).astype(np.float32),
    }
    y = rng.randint(0, 2, B).astype(np.float32)

    model = DeepFM(cols, cols, dnn_hidden_units=(16, 8))
    model.compile("adam", "binary_crossentropy")
    model.fit(x, y, batch_size=64, epochs=2, verbose=0)
    want = np.asarray(model.predict(x)).reshape(-1)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "deepfm.shlo")
        # "bytes" = supersets "wide": ints ride [lo,hi] planes, strings
        # ride UTF-8 byte planes — one artifact, all raw keys in-graph
        serving.export_stablehlo(model, path, example_batch=x,
                                 hash_in_graph="bytes")
        got = serving.predict_with_artifact(path, x, cols).reshape(-1)
        err = float(np.abs(got - want).max())
        assert err < 1e-4, err
        # any batch size: the artifact's batch dim is symbolic
        x16 = {k: v[:16] for k, v in x.items()}
        got16 = serving.predict_with_artifact(path, x16, cols).reshape(-1)
        assert float(np.abs(got16 - want[:16]).max()) < 1e-4
        print("artifact", os.path.getsize(path), "bytes; raw-key serve "
              "max|diff| vs model.predict = %.2e — OK" % err)
