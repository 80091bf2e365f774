"""Unit tests for the raw-protobuf ONNX reader (weights/onnx_io.py)."""

import struct

import numpy as np
import pytest

from skyrim_tpu.weights import onnx_io


def test_roundtrip_dtypes():
    tensors = {
        "w_f32": np.random.default_rng(0).normal(size=(3, 4)).astype(np.float32),
        "w_f16": np.arange(6, dtype=np.float16).reshape(2, 3),
        "w_i64": np.arange(5, dtype=np.int64) - 2,
        "scalar": np.float32(3.25).reshape(()),
    }
    data = onnx_io.build_onnx(tensors)
    out = onnx_io.read_onnx_initializers_from_bytes(data)
    assert set(out) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(out[k], tensors[k])
        assert out[k].dtype == tensors[k].dtype


def test_bfloat16_raw_data_upcasts():
    # bf16 = top 16 bits of f32
    f32 = np.asarray([1.5, -2.0, 0.15625], np.float32)
    bf16_bits = (f32.view(np.uint32) >> 16).astype(np.uint16)
    body = b"".join(onnx_io._tag(1, 0) + onnx_io._varint(d) for d in (3,))
    body += onnx_io._tag(2, 0) + onnx_io._varint(16)  # BFLOAT16
    body += onnx_io._len_field(8, b"w")
    body += onnx_io._len_field(9, bf16_bits.tobytes())
    graph = onnx_io._len_field(5, body)
    model = onnx_io._len_field(7, graph)
    out = onnx_io.read_onnx_initializers_from_bytes(model)
    np.testing.assert_array_equal(out["w"], f32)


def test_float_data_field():
    # exporters sometimes use float_data (packed field 4) instead of raw
    vals = [1.0, 2.5, -3.0, 4.0]
    packed = struct.pack(f"<{len(vals)}f", *vals)
    body = onnx_io._tag(1, 0) + onnx_io._varint(2)
    body += onnx_io._tag(1, 0) + onnx_io._varint(2)
    body += onnx_io._tag(2, 0) + onnx_io._varint(1)
    body += onnx_io._len_field(8, b"w")
    body += onnx_io._len_field(4, packed)
    model = onnx_io._len_field(7, onnx_io._len_field(5, body))
    out = onnx_io.read_onnx_initializers_from_bytes(model)
    np.testing.assert_array_equal(out["w"], np.asarray(vals, np.float32).reshape(2, 2))


def test_external_data(tmp_path):
    arr = np.random.default_rng(1).normal(size=(4, 5)).astype(np.float32)
    blob = tmp_path / "weights.bin"
    pad = b"\x00" * 16
    blob.write_bytes(pad + arr.tobytes())

    def entry(k, v):
        return onnx_io._len_field(
            13, onnx_io._len_field(1, k.encode()) + onnx_io._len_field(2, v.encode())
        )

    body = b"".join(onnx_io._tag(1, 0) + onnx_io._varint(d) for d in arr.shape)
    body += onnx_io._tag(2, 0) + onnx_io._varint(1)
    body += onnx_io._len_field(8, b"big")
    body += entry("location", "weights.bin")
    body += entry("offset", "16")
    body += entry("length", str(arr.nbytes))
    body += onnx_io._tag(14, 0) + onnx_io._varint(1)  # data_location EXTERNAL
    model = onnx_io._len_field(7, onnx_io._len_field(5, body))
    path = tmp_path / "model.onnx"
    path.write_bytes(model)
    out = onnx_io.read_onnx_initializers(path)
    np.testing.assert_array_equal(out["big"], arr)


def test_constant_node():
    arr = np.asarray([7.0, 8.0], np.float32)
    tensor = onnx_io._tensor_proto("", arr)
    attr = onnx_io._len_field(1, b"value") + onnx_io._len_field(5, tensor)
    node = (
        onnx_io._len_field(2, b"const_out")
        + onnx_io._len_field(4, b"Constant")
        + onnx_io._len_field(5, attr)
    )
    # graph with one node and one regular initializer
    init = onnx_io._tensor_proto("w", np.zeros((2,), np.float32))
    graph = onnx_io._len_field(1, node) + onnx_io._len_field(5, init)
    model = onnx_io._len_field(7, graph)
    out = onnx_io.read_onnx_initializers_from_bytes(model)
    np.testing.assert_array_equal(out["const_out"], arr)
    assert "w" in out


def test_not_onnx_raises(tmp_path):
    p = tmp_path / "junk.onnx"
    p.write_bytes(b"\x0a\x04none")
    with pytest.raises(ValueError):
        onnx_io.read_onnx_initializers(p)


def _tensor_model(body: bytes) -> bytes:
    graph = onnx_io._len_field(5, body)
    return onnx_io._len_field(7, graph)


def test_int32_data_field_fp16():
    # fp16 stored as packed int32_data (field 5) — the standard non-raw
    # layout for sub-32-bit initializers
    f16 = np.asarray([1.5, -2.0, 0.25, 8.0], np.float16)
    packed = b"".join(onnx_io._varint(int(b)) for b in f16.view(np.uint16))
    body = onnx_io._tag(1, 0) + onnx_io._varint(4)
    body += onnx_io._tag(2, 0) + onnx_io._varint(10)  # FLOAT16
    body += onnx_io._len_field(5, packed)  # int32_data, packed
    body += onnx_io._len_field(8, b"w")
    out = onnx_io.read_onnx_initializers_from_bytes(_tensor_model(body))
    np.testing.assert_array_equal(out["w"], f16.astype(np.float32))


def test_int32_data_field_int8():
    vals = np.asarray([-3, 0, 7, 127], np.int8)
    packed = b"".join(
        onnx_io._varint(int(np.uint32(v))) for v in vals.astype(np.int32)
    )
    body = onnx_io._tag(1, 0) + onnx_io._varint(4)
    body += onnx_io._tag(2, 0) + onnx_io._varint(3)  # INT8
    body += onnx_io._len_field(5, packed)
    body += onnx_io._len_field(8, b"q")
    out = onnx_io.read_onnx_initializers_from_bytes(_tensor_model(body))
    np.testing.assert_array_equal(out["q"], vals)


def test_int32_data_negative_sign_extended():
    # proto3 encodes negative int32 varints 64-bit sign-extended
    # (-1 -> 2^64-1); decode must not overflow int64 (advisor r3)
    vals = np.asarray([-1, -2147483648, 5], np.int32)
    packed = b"".join(
        onnx_io._varint(int(np.uint64(np.int64(v)))) for v in vals
    )
    body = onnx_io._tag(1, 0) + onnx_io._varint(3)
    body += onnx_io._tag(2, 0) + onnx_io._varint(6)  # INT32
    body += onnx_io._len_field(5, packed)
    body += onnx_io._len_field(8, b"n")
    out = onnx_io.read_onnx_initializers_from_bytes(_tensor_model(body))
    np.testing.assert_array_equal(out["n"], vals)


def test_double_data_field():
    vals = np.asarray([0.5, -1.25], np.float64)
    body = onnx_io._tag(1, 0) + onnx_io._varint(2)
    body += onnx_io._tag(2, 0) + onnx_io._varint(11)  # DOUBLE
    body += onnx_io._len_field(10, vals.tobytes())  # packed double_data
    body += onnx_io._len_field(8, b"d")
    out = onnx_io.read_onnx_initializers_from_bytes(_tensor_model(body))
    np.testing.assert_array_equal(out["d"], vals)


def test_missing_payload_raises():
    # non-empty dims but no data field must raise, not zero-fill
    body = onnx_io._tag(1, 0) + onnx_io._varint(3)
    body += onnx_io._tag(2, 0) + onnx_io._varint(1)  # FLOAT
    body += onnx_io._len_field(8, b"broken")
    with pytest.raises(ValueError, match="no recognized data field"):
        onnx_io.read_onnx_initializers_from_bytes(_tensor_model(body))


def test_varint_negative_raises():
    with pytest.raises(ValueError, match="non-negative"):
        onnx_io._varint(-1)
