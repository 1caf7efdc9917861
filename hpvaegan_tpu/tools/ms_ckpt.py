"""Standalone MindSpore ``.ckpt`` reader/writer (no MindSpore dependency).

The reference's eval path can resume straight from MindSpore checkpoints
(reference eval_image.py:163-165: ``mindspore.load_checkpoint`` followed by
``pt2ms.m2m_HPVAEGAN_2d``). MindSpore itself is not available in the TPU
environment, but its checkpoint file is a plain proto2 message
(mindspore ``checkpoint.proto``):

    message Checkpoint {
      message Value {
        required string tag = 1;
        required TensorProto tensor = 2;
      }
      repeated Value value = 1;
    }
    message TensorProto {
      repeated int64 dims = 1;          // [0] encodes a scalar
      required string tensor_type = 2;  // "Float32", "Int64", ...
      required bytes tensor_content = 3;
    }

This module hand-rolls the protobuf wire format (varints + length-delimited
fields), so reference-trained ``.ckpt`` files can be ingested (see
``tools/convert.m2j_HPVAEGAN``) and written back out (tests; handing
checkpoints to MindSpore tooling).

File-type note: this framework's own checkpoints also use the ``.ckpt``
suffix (the reference's artifact naming) but are pickled pytrees, so loaders
must sniff content with :func:`is_ms_checkpoint` rather than dispatch on the
extension — pickle streams start with ``\\x80`` (protocol 2+), a Checkpoint
proto with the field-1 length-delimited header ``\\x0a``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_DTYPES = {
    "Float64": np.float64, "Float32": np.float32, "Float16": np.float16,
    "Int64": np.int64, "Int32": np.int32, "Int16": np.int16, "Int8": np.int8,
    "UInt64": np.uint64, "UInt32": np.uint32, "UInt16": np.uint16,
    "UInt8": np.uint8, "Bool": np.bool_,
}


def _np_dtype(tensor_type: str):
    if tensor_type == "BFloat16":
        import ml_dtypes  # ships with jax

        return np.dtype(ml_dtypes.bfloat16)
    try:
        return np.dtype(_DTYPES[tensor_type])
    except KeyError:
        raise ValueError(f"unsupported MindSpore tensor_type {tensor_type!r}")


def _type_name(dtype) -> str:
    dtype = np.dtype(dtype)
    if dtype.name == "bfloat16":
        return "BFloat16"
    for name, np_t in _DTYPES.items():
        if np.dtype(np_t) == dtype:
            return name
    raise ValueError(f"unsupported dtype {dtype} for MindSpore checkpoint")


# ---- protobuf wire helpers -------------------------------------------------

def _read_varint(buf: bytes, i: int):
    val, shift = 0, 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7
        if shift > 70:
            raise ValueError("malformed varint")


def _write_varint(out: bytearray, val: int) -> None:
    while True:
        b = val & 0x7F
        val >>= 7
        if val:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _fields(buf: bytes):
    """Yield (field_number, value) where value is an int (varint fields) or
    bytes (length-delimited fields)."""
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 0x7
        if wire == 0:  # varint
            val, i = _read_varint(buf, i)
        elif wire == 2:  # length-delimited
            n, i = _read_varint(buf, i)
            if i + n > len(buf):
                # a silent short slice would 'successfully' parse a
                # truncated checkpoint with trailing parameters dropped
                raise ValueError(
                    f"truncated length-delimited field {field}: needs "
                    f"{n} bytes, {len(buf) - i} remain")
            val, i = buf[i:i + n], i + n
        elif wire == 5:  # 32-bit (not used by checkpoint.proto; skip)
            if i + 4 > len(buf):
                raise ValueError("truncated 32-bit field")
            val, i = buf[i:i + 4], i + 4
        elif wire == 1:  # 64-bit
            if i + 8 > len(buf):
                raise ValueError("truncated 64-bit field")
            val, i = buf[i:i + 8], i + 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, val


def _ld(out: bytearray, field: int, payload: bytes) -> None:
    _write_varint(out, (field << 3) | 2)
    _write_varint(out, len(payload))
    out += payload


# ---- public API ------------------------------------------------------------

def is_ms_checkpoint(path: str) -> bool:
    """Content sniff: a Checkpoint proto begins with the field-1
    length-delimited header byte 0x0a (our own pickled-pytree .ckpt files
    begin with the pickle protocol marker 0x80)."""
    with open(path, "rb") as f:
        first = f.read(1)
    return first == b"\x0a"


def _parse_tensor(buf: bytes) -> np.ndarray:
    dims, tensor_type, content = [], None, b""
    for field, val in _fields(buf):
        if field == 1:
            if isinstance(val, int):
                dims.append(val)
            else:  # packed encoding (proto3-style writers)
                i = 0
                while i < len(val):
                    d, i = _read_varint(val, i)
                    dims.append(d)
        elif field == 2:
            tensor_type = val.decode("utf-8")
        elif field == 3:
            content = val
    if tensor_type is None:
        raise ValueError("TensorProto without tensor_type")
    arr = np.frombuffer(content, dtype=_np_dtype(tensor_type))
    if dims == [0]:  # MindSpore's scalar encoding
        return arr.reshape(())
    return arr.reshape(dims)


def load_ms_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Parse a MindSpore .ckpt into {parameter_name: np.ndarray} (the
    equivalent of ``mindspore.load_checkpoint``)."""
    with open(path, "rb") as f:
        buf = f.read()
    out: Dict[str, np.ndarray] = {}
    for field, val in _fields(buf):
        if field != 1:
            continue
        tag, tensor = None, None
        for f2, v2 in _fields(val):
            if f2 == 1:
                tag = v2.decode("utf-8")
            elif f2 == 2:
                tensor = _parse_tensor(v2)
        if tag is not None and tensor is not None:
            out[tag] = tensor
    return out


def save_ms_checkpoint(tensors: Dict[str, np.ndarray], path: str) -> None:
    """Write {name: array} as a MindSpore-compatible .ckpt (the equivalent of
    ``mindspore.save_checkpoint`` on a parameter list)."""
    out = bytearray()
    for tag, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        tp = bytearray()
        dims = list(arr.shape) if arr.shape else [0]
        for d in dims:  # proto2 unpacked repeated int64
            _write_varint(tp, (1 << 3) | 0)
            _write_varint(tp, int(d))
        _ld(tp, 2, _type_name(arr.dtype).encode("utf-8"))
        _ld(tp, 3, arr.tobytes())
        value = bytearray()
        _ld(value, 1, tag.encode("utf-8"))
        _ld(value, 2, bytes(tp))
        _ld(out, 1, bytes(value))
    with open(path, "wb") as f:
        f.write(bytes(out))
