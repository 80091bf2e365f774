"""ctypes binding for the native gribcore fast path (native/gribcore.cc).

Loads ``native/libgribcore.so`` when present (build: ``make -C native``);
otherwise the pure-numpy implementations in data/grib.py are used.  The
binding installs itself into grib.py's ``_unpack_bits_impl`` hook.
"""

from __future__ import annotations

import ctypes
from pathlib import Path

import numpy as np

_LIB_PATHS = [
    Path(__file__).resolve().parents[2] / "native" / "libgribcore.so",
    Path(__file__).resolve().parent / "libgribcore.so",
]

_lib = None
for p in _LIB_PATHS:
    if p.exists():
        try:
            _lib = ctypes.CDLL(str(p))
            break
        except OSError:
            continue

if _lib is not None:
    _lib.gribcore_unpack_bits.restype = ctypes.c_int
    _lib.gribcore_unpack_bits.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib.gribcore_decode_simple.restype = ctypes.c_int
    _lib.gribcore_decode_simple.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_size_t,
        ctypes.c_float, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib.gribcore_undo_second_diff.restype = None
    _lib.gribcore_undo_second_diff.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_size_t,
    ]


def available() -> bool:
    return _lib is not None


def unpack_bits(data: bytes, nbits: int, n: int) -> np.ndarray:
    out = np.empty(n, dtype=np.int64)
    rc = _lib.gribcore_unpack_bits(
        data, len(data), nbits, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    )
    if rc != 0:
        raise ValueError(f"gribcore_unpack_bits failed (rc={rc})")
    return out


def decode_simple(data: bytes, nbits: int, n: int, R: float, E: int, D: int) -> np.ndarray:
    out = np.empty(n, dtype=np.float32)
    rc = _lib.gribcore_decode_simple(
        data, len(data), nbits, n, R, E, D,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"gribcore_decode_simple failed (rc={rc})")
    return out


def install() -> bool:
    """Wire the native fast path into data/grib.py. Returns success."""
    if _lib is None:
        return False
    from skyrim_tpu.data import grib

    grib._unpack_bits_impl = unpack_bits
    grib._decode_simple_impl = decode_simple
    return True


install()
