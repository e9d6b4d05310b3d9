"""Streaming TFRecord input pipeline: constant host memory at any scale.

The reference's estimator tier streams ``TFRecordDataset -> parse ->
shuffle -> repeat/batch -> prefetch`` through tf.data
(/root/reference/deepctr/estimator/inputs.py:22-52) and is marketed for
"large scale data" (/root/reference/README.md:27). This module is the
TPU-native equivalent with no TF dependency:

- files are **mmap'd** (pages stay file-backed and evictable — RSS stays
  bounded no matter the dataset size) and frame-scanned by the native
  ``tfrecord_scan`` (C++, deepctr_tpu/native);
- Example payloads are batch-decoded by the native ``parse_examples``
  (C++, GIL-released ctypes call) straight into dense numpy columns, with
  a bit-identical pure-Python fallback;
- shuffling uses a bounded **record pool** (role of tf.data's
  ``shuffle(buffer_size)``): each emitted batch samples random pool slots,
  which are refilled from the stream;
- a background **prefetch thread** keeps a small queue of ready batches
  (role of ``prefetch``), overlapping parse with device steps.
"""
from __future__ import annotations

import mmap
import queue
import threading
from typing import Dict, Iterator, Optional, Tuple

import numpy as np


def _schema(feature_description):
    out = []
    for name, spec in feature_description.items():
        kind = "float" if "float" in str(spec.dtype) else "int64"
        width = int(np.prod(spec.shape)) if spec.shape else 1
        out.append((name, kind, width))
    return out


def _apply_defaults(cols, missing, schema, feature_description):
    """Fill rows flagged missing from each spec's default_value."""
    if not missing.any():
        return cols
    for j, (name, kind, width) in enumerate(schema):
        rows = np.nonzero(missing[:, j])[0]
        if len(rows) == 0:
            continue
        spec = feature_description[name]
        if spec.default_value is None:
            raise ValueError("Feature '%s' missing and has no default" % name)
        default = spec.default_value
        if not isinstance(default, (list, tuple)):
            default = [default] * width
        cols[name][rows] = np.asarray(
            default, cols[name].dtype).reshape(1, width)
    return cols


def _parse_chunk_python(data, offsets, lengths, schema, feature_description):
    """Pure-Python chunk parse (fallback when the native lib is absent)."""
    from .tfrecord import parse_example

    n = len(offsets)
    cols = {}
    for name, kind, width in schema:
        dtype = np.float32 if kind == "float" else np.int64
        cols[name] = np.zeros((n, width), dtype)
    missing = np.zeros((n, len(schema)), np.uint8)
    for i in range(n):
        payload = bytes(data[offsets[i]:offsets[i] + lengths[i]])
        parsed = parse_example(payload)
        for j, (name, kind, width) in enumerate(schema):
            if name in parsed:
                _, values = parsed[name]
                cols[name][i] = np.asarray(values, cols[name].dtype)
            else:
                missing[i, j] = 1
    return cols, missing


def _scan_python(data):
    """Frame offsets/lengths from raw bytes (fallback scanner)."""
    import struct

    offsets, lengths = [], []
    pos, size = 0, len(data)
    while pos + 12 <= size:
        (length,) = struct.unpack("<Q", data[pos:pos + 8])
        pos += 12
        if pos + length + 4 > size:
            raise ValueError("Truncated TFRecord payload")
        offsets.append(pos)
        lengths.append(length)
        pos += length + 4
    if pos != size:
        raise ValueError("Truncated TFRecord header")
    return np.asarray(offsets, np.int64), np.asarray(lengths, np.int64)


def iter_tfrecord_frames(filenames, chunk_records: int = 16384):
    """Yield raw ``(data, offsets, lengths)`` frame slices of
    <= chunk_records records per yield, from mmap'd files (pages stay
    file-backed and evictable). The yielded ``data`` view is only valid
    until the generator advances (the map closes with the file)."""
    if isinstance(filenames, str):
        filenames = [filenames]
    for path in filenames:
        with open(path, "rb") as f:
            try:
                mapped = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
            except ValueError:  # empty file
                continue
            data = np.frombuffer(mapped, np.uint8)
            try:
                offsets = lengths = None
                try:
                    from .. import native

                    scanned = native.scan_tfrecord_data(data)
                    if scanned is not None:
                        offsets, lengths = scanned
                except ValueError:
                    raise ValueError("Malformed TFRecord file: %s" % path)
                except Exception:
                    pass
                if offsets is None:
                    offsets, lengths = _scan_python(bytes(mapped))
                n = len(offsets)
                for start in range(0, n, chunk_records):
                    yield (data, offsets[start:start + chunk_records],
                           lengths[start:start + chunk_records])
            finally:
                # drop the buffer export before closing the map (numpy views
                # of the mmap must not outlive it)
                del data
                try:
                    mapped.close()
                except BufferError:
                    # a propagating exception's traceback still references a
                    # view; the map closes when the GC drops it
                    pass


def _parse_frame(data, off, ln, schema, feature_description, parse_threads):
    """One frame slice -> defaults-applied column dict."""
    parsed = None
    try:
        from .. import native

        parsed = native.parse_examples_batch(
            data, off, ln, schema, nthreads=parse_threads)
    except ValueError:
        raise
    except Exception:
        parsed = None
    if parsed is None:
        parsed = _parse_chunk_python(data, off, ln, schema,
                                     feature_description)
    cols, missing = parsed
    return _apply_defaults(cols, missing, schema, feature_description)


def iter_tfrecord_chunks(filenames, feature_description,
                         chunk_records: int = 16384,
                         parse_threads: Optional[int] = None,
                         ) -> Iterator[Dict[str, np.ndarray]]:
    """Yield dense column chunks of <= chunk_records examples per yield.

    Memory is O(chunk_records), independent of file size: the file is
    mmap'd and only the current chunk's pages are touched.
    """
    schema = _schema(feature_description)
    for data, off, ln in iter_tfrecord_frames(filenames, chunk_records):
        yield _parse_frame(data, off, ln, schema, feature_description,
                           parse_threads)


class _Pool:
    """Bounded shuffle pool (tf.data shuffle-buffer role, vectorized).

    Columns are packed into ONE matrix per dtype so a pop is two fancy-
    index gathers instead of one per feature — with criteo's 40 features
    the per-column version spent as long gathering as the C++ record
    parse itself (profiled: 3.3 ms vs ~1 ms per 4096-row batch)."""

    def __init__(self, schema, capacity, rng):
        self.capacity = capacity
        # PCG Generator: its no-replacement choice uses Floyd's algorithm
        # (O(count)) where RandomState.choice permutes the WHOLE pool —
        # measured 0.89 -> 0.08 ms per 4096-row pop at a 45k pool
        self.rng = (np.random.default_rng(rng.randint(2 ** 31))
                    if isinstance(rng, np.random.RandomState) else rng)
        self.groups = []  # (names, col_offsets, matrix)
        for kind in ("float", "int64"):
            feats = [(n, w) for n, k, w in schema if k == kind]
            if not feats:
                continue
            offs = np.cumsum([0] + [w for _, w in feats])
            mat = np.zeros(
                (capacity, int(offs[-1])),
                np.float32 if kind == "float" else np.int64)
            self.groups.append(([n for n, _ in feats], offs, mat))
        self.size = 0
        # native one-call pop + parse-into-rows (C++ hostops): feature ->
        # (group index, column offset, width, kind)
        self._feat_dest = {}
        gi_by_kind = {}
        for gi, (names, offs, mat) in enumerate(self.groups):
            gi_by_kind[mat.dtype.kind] = gi
        for name, kind, width in schema:
            gi = gi_by_kind["f" if kind == "float" else "i"]
            names, offs, _ = self.groups[gi]
            self._feat_dest[name] = (gi, int(offs[names.index(name)]),
                                     width, kind)
        self._scratch = np.empty(capacity, np.int32)
        self._schema = schema

    def parse_into(self, data, off, ln, feature_description, nthreads):
        """Decode a frame slice DIRECTLY into this pool's matrix rows
        [size, size+n) — the push copy never happens (C++ strided parse).
        Returns False when the native entry point is unavailable (caller
        parses to a temp chunk and uses push)."""
        from .. import native

        n = len(off)
        dests, strides = [], []
        for name, kind, width in self._schema:
            gi, col, _, _ = self._feat_dest[name]
            mat = self.groups[gi][2]
            W = mat.shape[1]
            addr = mat.ctypes.data + (self.size * W + col) * mat.itemsize
            dests.append(addr)
            strides.append(W)
        missing = native.parse_examples_into(
            data, off, ln, self._schema, dests, strides, nthreads=nthreads)
        if missing is None:
            return False
        # pool rows are REUSED memory: every missing feature must be
        # overwritten (defaults), not assumed zero
        if missing.any():
            for j, (name, kind, width) in enumerate(self._schema):
                rows = np.nonzero(missing[:, j])[0]
                if len(rows) == 0:
                    continue
                spec = feature_description[name]
                if spec.default_value is None:
                    raise ValueError(
                        "Feature '%s' missing and has no default" % name)
                default = spec.default_value
                if not isinstance(default, (list, tuple)):
                    default = [default] * width
                gi, col, _, _ = self._feat_dest[name]
                mat = self.groups[gi][2]
                mat[self.size + rows, col:col + width] = np.asarray(
                    default, mat.dtype).reshape(1, width)
        self.size += n
        return True

    def push(self, chunk, start, count):
        end = self.size + count
        for names, offs, mat in self.groups:
            for i, name in enumerate(names):
                mat[self.size:end, offs[i]:offs[i + 1]] = \
                    chunk[name][start:start + count]
        self.size = end

    def pop_random(self, count):
        count = min(count, self.size)
        from .. import native

        outs = [np.empty((count, mat.shape[1]), mat.dtype)
                for _, _, mat in self.groups]
        if native.pool_pop_native(
                [mat for _, _, mat in self.groups],
                [mat.shape[1] * mat.itemsize for _, _, mat in self.groups],
                self.size, count, int(self.rng.integers(2 ** 63)),
                self._scratch, outs):
            # C++ did sample+gather+compact in one GIL-released call
            out = {}
            for (names, offs, _), g in zip(self.groups, outs):
                for i, name in enumerate(names):
                    out[name] = g[:, offs[i]:offs[i + 1]]
            self.size -= count
            return out
        pick = self.rng.choice(self.size, count, replace=False,
                               shuffle=False)
        # refill plan: move the tail's surviving rows into the holes below
        # the new size — copies only `count` rows (compacting the whole
        # pool with a boolean mask cost as much as the record parse)
        new_size = self.size - count
        picked = np.zeros(self.size, bool)
        picked[pick] = True
        holes = pick[pick < new_size]
        tail_keep = np.nonzero(~picked[new_size:self.size])[0] + new_size
        out = {}
        for names, offs, mat in self.groups:
            g = mat[pick]  # one gather per dtype group
            for i, name in enumerate(names):
                out[name] = g[:, offs[i]:offs[i + 1]]
            mat[holes] = mat[tail_keep]
        self.size = new_size
        return out


def iter_tfrecord_batches(filenames, feature_description, label=None,
                          batch_size: int = 256, num_epochs: Optional[int] = 1,
                          shuffle_buffer: int = 0, seed: int = 1024,
                          chunk_records: int = 16384,
                          drop_remainder: bool = False,
                          parse_threads: Optional[int] = None):
    """Stream ``(features_dict, labels_or_None)`` batches at constant memory.

    ``num_epochs=None`` repeats forever (the tf.data ``repeat()`` contract);
    ``shuffle_buffer`` > 0 enables pool shuffling with that many records.
    """
    rng = np.random.RandomState(seed)
    schema = _schema(feature_description)

    def split_label(cols):
        x = dict(cols)
        y = None
        if isinstance(label, (list, tuple)):
            # multi-task: (B, n_tasks) column-stacked in the given order
            y = np.stack([np.asarray(x.pop(l), np.float32).reshape(-1)
                          for l in label], axis=1)
        elif label is not None:
            y = np.asarray(x.pop(label), np.float32).reshape(-1)
        return x, y

    epoch = 0
    while num_epochs is None or epoch < num_epochs:
        if shuffle_buffer and shuffle_buffer > batch_size:
            pool = _Pool(schema, shuffle_buffer + batch_size, rng)
            for data, off, ln in iter_tfrecord_frames(filenames,
                                                      chunk_records):
                n = len(off)
                pos = 0
                chunk = None  # lazily parsed only on the fallback path
                while pos < n:
                    take = min(n - pos, pool.capacity - pool.size)
                    # fast path: C++ strided parse decodes records straight
                    # into the pool's matrix rows (no temp chunk, no push
                    # copy, GIL released)
                    ok = chunk is None and pool.parse_into(
                        data, off[pos:pos + take], ln[pos:pos + take],
                        feature_description, parse_threads)
                    if not ok:
                        if chunk is None:
                            chunk = _parse_frame(data, off, ln, schema,
                                                 feature_description,
                                                 parse_threads)
                        pool.push(chunk, pos, take)
                    pos += take
                    while pool.size >= shuffle_buffer:
                        yield split_label(pool.pop_random(batch_size))
            while pool.size >= (batch_size if drop_remainder else 1):
                yield split_label(pool.pop_random(batch_size))
        else:
            held: Dict[str, np.ndarray] = {}
            held_n = 0
            for chunk in iter_tfrecord_chunks(filenames, feature_description,
                                              chunk_records, parse_threads):
                if held_n:
                    chunk = {k: np.concatenate([held[k], v])
                             for k, v in chunk.items()}
                n = len(next(iter(chunk.values())))
                pos = 0
                while n - pos >= batch_size:
                    yield split_label(
                        {k: v[pos:pos + batch_size] for k, v in chunk.items()})
                    pos += batch_size
                held = {k: v[pos:] for k, v in chunk.items()}
                held_n = n - pos
            if held_n and not drop_remainder:
                yield split_label(held)
        epoch += 1


def prefetched(iterator, depth: int = 2):
    """Run ``iterator`` in a background thread with a bounded queue (the
    tf.data ``prefetch`` role). The native parse releases the GIL, so the
    producer genuinely overlaps device steps."""
    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    _END = object()

    def producer():
        try:
            for item in iterator:
                q.put(item)
            q.put(_END)
        except BaseException as e:  # surface errors on the consumer side
            q.put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
