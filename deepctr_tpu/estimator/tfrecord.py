"""Pure-Python TFRecord + tf.train.Example reader.

This image ships no TensorFlow, so the reference's
``tf.data.TFRecordDataset`` + ``tf.io.parse_single_example`` path
(estimator/inputs.py:22-52) is reimplemented from the wire formats:

- TFRecord framing: little-endian u64 length, u32 masked-crc32c(length),
  payload bytes, u32 masked-crc32c(payload).
- ``Example`` protobuf: Example{features=1} -> Features{feature=1 (map)} ->
  map entry {key=1: string, value=2: Feature} ->
  Feature{bytes_list=1|float_list=2|int64_list=3}, each a repeated field
  (floats may be packed).

CRCs are not verified (we only split frames); malformed files raise.
"""
from __future__ import annotations

import struct
from typing import Dict, Iterator, List

import numpy as np


def iter_tfrecord_payloads(path: str) -> Iterator[bytes]:
    """Yield raw record payloads from one TFRecord file.

    Uses the native frame scanner (deepctr_tpu/native) when available,
    falling back to the pure-Python reader.
    """
    try:
        from .. import native

        scanned = native.scan_tfrecord(path)
    except Exception:
        scanned = None
    if scanned is not None:
        raw, offsets, lengths = scanned
        for off, length in zip(offsets, lengths):
            yield raw[off:off + length]
        return
    with open(path, "rb") as f:
        while True:
            header = f.read(12)  # u64 length + u32 length-crc
            if not header:
                return
            if len(header) < 12:
                raise ValueError("Truncated TFRecord header in %s" % path)
            (length,) = struct.unpack("<Q", header[:8])
            payload = f.read(length)
            if len(payload) < length:
                raise ValueError("Truncated TFRecord payload in %s" % path)
            if len(f.read(4)) < 4:  # payload crc (not verified, but framed)
                raise ValueError("Truncated TFRecord payload CRC in %s" % path)
            yield payload


# --------------------- minimal protobuf wire decoding -----------------------


def _read_varint(buf: bytes, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's fields."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:  # varint
            value, pos = _read_varint(buf, pos)
        elif wire == 1:  # 64-bit
            value = buf[pos:pos + 8]
            pos += 8
        elif wire == 2:  # length-delimited
            length, pos = _read_varint(buf, pos)
            value = buf[pos:pos + length]
            pos += length
        elif wire == 5:  # 32-bit
            value = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError("Unsupported protobuf wire type %d" % wire)
        yield field, wire, value


def _zigzag_to_signed(v: int) -> int:
    # int64 fields are stored as plain (not zigzag) varints in Feature
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def _parse_feature(buf: bytes):
    """Feature message -> (kind, list of values).

    Protobuf merge semantics: a submessage field may occur multiple times
    and parsers must concatenate — so values accumulate across ALL
    occurrences of the list field instead of returning at the first.
    """
    kind = None
    out: List = []
    for field, wire, value in _iter_fields(buf):
        if field == 1:  # BytesList{value=1 repeated bytes}
            kind = "bytes"
            out.extend(v for f, w, v in _iter_fields(value) if f == 1)
        elif field == 2:  # FloatList{value=1 repeated float (packed or not)}
            kind = "float"
            for f, w, v in _iter_fields(value):
                if f != 1:
                    continue
                if w == 2:  # packed
                    out.extend(np.frombuffer(v, dtype="<f4").tolist())
                else:  # single 32-bit
                    out.append(struct.unpack("<f", v)[0])
        elif field == 3:  # Int64List{value=1 repeated int64 (packed or not)}
            kind = "int64"
            for f, w, v in _iter_fields(value):
                if f != 1:
                    continue
                if w == 2:  # packed varints
                    pos = 0
                    while pos < len(v):
                        x, pos = _read_varint(v, pos)
                        out.append(_zigzag_to_signed(x))
                else:
                    out.append(_zigzag_to_signed(v))
    return (kind or "bytes"), out


def parse_example(payload: bytes) -> Dict[str, tuple]:
    """tf.train.Example bytes -> {name: (kind, values)}."""
    out: Dict[str, tuple] = {}
    for field, wire, value in _iter_fields(payload):
        if field != 1:  # Example.features
            continue
        for f2, w2, entry in _iter_fields(value):
            if f2 != 1:  # Features.feature map entry
                continue
            key = None
            feat = ("bytes", [])
            for f3, w3, v3 in _iter_fields(entry):
                if f3 == 1:
                    key = v3.decode("utf-8")
                elif f3 == 2:
                    feat = _parse_feature(v3)
            if key is not None:
                out[key] = feat
    return out


def read_tfrecord_examples(filenames, feature_description) -> Dict[str, np.ndarray]:
    """Read whole TFRecord file(s) into dense column arrays.

    ``feature_description``: {name: FixedLenFeature(shape, dtype)} — the
    same role as tf.io.FixedLenFeature in the reference input_fn.
    """
    if isinstance(filenames, str):
        filenames = [filenames]
    columns = {name: [] for name in feature_description}
    for path in filenames:
        for payload in iter_tfrecord_payloads(path):
            parsed = parse_example(payload)
            for name, spec in feature_description.items():
                if name not in parsed:
                    if spec.default_value is None:
                        raise ValueError(
                            "Feature '%s' missing and has no default" % name
                        )
                    default = spec.default_value
                    if not isinstance(default, (list, tuple)):
                        size = int(np.prod(spec.shape)) if spec.shape else 1
                        default = [default] * size
                    columns[name].append(list(default))
                else:
                    _, values = parsed[name]
                    columns[name].append(values)
    out = {}
    for name, spec in feature_description.items():
        sdt = str(spec.dtype)
        if "float" in sdt:
            dtype = np.float32
        elif "string" in sdt or "bytes" in sdt:
            dtype = object  # BytesList features come back as bytes objects
        else:
            dtype = np.int64
        arr = np.asarray(columns[name], dtype=dtype)
        want = tuple(spec.shape)
        if want and arr.ndim == 2 and arr.shape[1] == int(np.prod(want)):
            arr = arr.reshape((-1,) + want)
        out[name] = arr
    return out


# ----------------------------- TFRecord WRITER ------------------------------
# The reference ships examples/gen_tfrecords.py (tf.python_io.TFRecordWriter)
# to produce the estimator tier's input files; this is the no-TensorFlow
# equivalent. Unlike the reader above, the writer DOES emit the masked
# crc32c checksums — TF's own TFRecordDataset verifies them on read.

_CRC32C_TABLE = None


def _crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli), table-driven pure Python."""
    global _CRC32C_TABLE
    if _CRC32C_TABLE is None:
        table = []
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ 0x82F63B78 if c & 1 else c >> 1
            table.append(c)
        _CRC32C_TABLE = table
    crc = 0xFFFFFFFF
    table = _CRC32C_TABLE
    for b in data:
        crc = table[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


_masked_crc_native = None  # resolved once: None = unknown, False = absent


def _masked_crc(data: bytes) -> int:
    # resolve the native implementation once, not per record (the writer
    # calls this twice per record)
    global _masked_crc_native
    if _masked_crc_native is None:
        try:
            from .. import native

            _masked_crc_native = (native.masked_crc32c
                                  if native.get_lib() is not None else False)
        except Exception:
            _masked_crc_native = False
    if _masked_crc_native:
        return _masked_crc_native(data)
    crc = _crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delimited(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _encode_feature(values, kind=None) -> bytes:
    """tf.train.Feature from a list of ints / floats / bytes.

    Unpacked repeated scalars — wire-compatible with every protobuf
    parser (packed and unpacked are both legal on the wire; TF itself
    emits packed, so files are value-identical but not byte-identical).
    Without ``kind``, the type is inferred from the Python values —
    integer-valued floats would infer int64, so pass kind explicitly
    when a feature's values can look integral."""
    if kind == "bytes" or (kind is None and len(values)
                           and isinstance(values[0], (bytes, str))):
        inner = b"".join(
            _len_delimited(1, v.encode() if isinstance(v, str) else v)
            for v in values
        )
        return _len_delimited(1, inner)  # bytes_list = field 1
    if kind == "int64" or (kind is None and all(
            isinstance(v, (int, np.integer)) for v in values)):
        inner = b"".join(
            _tag(1, 0) + _varint(int(v) & 0xFFFFFFFFFFFFFFFF) for v in values
        )
        return _len_delimited(3, inner)  # int64_list = field 3
    inner = b"".join(
        _tag(1, 5) + struct.pack("<f", float(v)) for v in values
    )
    return _len_delimited(2, inner)  # float_list = field 2


def encode_example(feature_dict, kinds=None) -> bytes:
    """Serialize {name: scalar | list | 1-D array} as tf.train.Example.

    ``kinds``: optional {name: 'int64' | 'float' | 'bytes'} forcing each
    feature's encoding — recommended whenever a float feature can hold
    integer-looking Python values (type inference is per record, so a
    mixed column would otherwise flip kinds between records and break
    TF's FixedLenFeature parsing)."""
    entries = []
    for name, values in feature_dict.items():
        if isinstance(values, (bytes, str, int, float, np.integer, np.floating)):
            values = [values]
        values = list(np.asarray(values).reshape(-1)) if not (
            len(values) and isinstance(values[0], (bytes, str))
        ) else list(values)
        entry = (_len_delimited(1, name.encode())
                 + _len_delimited(2, _encode_feature(
                     values, (kinds or {}).get(name))))
        entries.append(_len_delimited(1, entry))  # Features.feature map entry
    features = b"".join(entries)
    return _len_delimited(1, features)  # Example.features = field 1


def write_tfrecord_examples(path: str, feature_dicts, kinds=None) -> int:
    """Write an iterable of feature dicts as a TFRecord file of Examples.

    Reference equivalent: examples/gen_tfrecords.py write_tfrecord
    (tf.python_io.TFRecordWriter). ``kinds`` (see encode_example) pins
    each feature's encoding across records. Returns the record count.
    """
    n = 0
    with open(path, "wb") as f:
        for fd in feature_dicts:
            payload = encode_example(fd, kinds)
            header = struct.pack("<Q", len(payload))
            f.write(header)
            f.write(struct.pack("<I", _masked_crc(header)))
            f.write(payload)
            f.write(struct.pack("<I", _masked_crc(payload)))
            n += 1
    return n
