"""Host input-pipeline throughput: can the streaming TFRecord reader keep
a ~2M examples/s device step fed?

Generates a synthetic criteo-schema TFRecord (26 int + 13 float + label),
then measures `estimator.streaming.iter_tfrecord_batches` end-to-end
(mmap -> C++ frame scan -> C++ Example parse -> shuffle pool -> prefetch
thread) in examples/s. Pure host work — no TPU needed.

Run: PYTHONPATH=/root/repo python tools/bench_pipeline.py
"""
from __future__ import annotations

import json
import os
import tempfile
import time

import numpy as np

N_RECORDS = 200_000
BATCH = 4096


def gen_file(path, n):
    from deepctr_tpu.estimator.tfrecord import write_tfrecord_examples

    rng = np.random.RandomState(0)

    def rows():
        for i in range(n):
            fd = {"label": float(rng.randint(0, 2))}
            for j in range(13):
                fd["I%d" % j] = float(rng.rand())
            for j in range(26):
                fd["C%d" % j] = int(rng.randint(0, 100_000))
            yield fd

    t0 = time.perf_counter()
    write_tfrecord_examples(path, rows())
    return time.perf_counter() - t0


def main():
    from deepctr_tpu.estimator import FixedLenFeature
    from deepctr_tpu.estimator.streaming import (iter_tfrecord_batches,
                                                 prefetched)

    d = tempfile.mkdtemp(prefix="dctpu_pipe_")
    path = os.path.join(d, "bench.tfrecords")
    gen_s = gen_file(path, N_RECORDS)
    size_mb = os.path.getsize(path) / 1e6

    desc = {"label": FixedLenFeature([1], np.float32)}
    for j in range(13):
        desc["I%d" % j] = FixedLenFeature([1], np.float32)
    for j in range(26):
        desc["C%d" % j] = FixedLenFeature([1], np.int64)

    for shuffle, prefetch in ((0, False), (50_000, True)):
        it = iter_tfrecord_batches([path], desc, label="label",
                                   batch_size=BATCH, num_epochs=2,
                                   shuffle_buffer=shuffle)
        if prefetch:
            it = prefetched(it, depth=4)
        n = 0
        t0 = time.perf_counter()
        for x, y in it:
            n += len(y)
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "tfrecord_pipeline_examples_per_s",
            "value": round(n / dt, 1),
            "unit": "examples/s",
            "shuffle_buffer": shuffle,
            "prefetch": prefetch,
            "records": n,
            "file_mb": round(size_mb, 1),
            "gen_s": round(gen_s, 1),
        }), flush=True)
    os.remove(path)


if __name__ == "__main__":
    main()
