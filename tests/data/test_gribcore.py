"""Native gribcore parity tests (skipped unless native/libgribcore.so is
built — ``make -C native``)."""

import numpy as np
import pytest

from skyrim_tpu.data import grib

gribcore = pytest.importorskip("skyrim_tpu.data.gribcore")
pytestmark = pytest.mark.skipif(
    not gribcore.available(), reason="native lib not built"
)


@pytest.mark.parametrize("nbits", [1, 7, 8, 12, 16, 24])
def test_unpack_bits_parity(nbits):
    rng = np.random.default_rng(nbits)
    n = 2053
    raw = rng.integers(0, 256, size=(n * nbits + 7) // 8 + 4, dtype=np.uint8).tobytes()
    np.testing.assert_array_equal(
        grib._unpack_bits_numpy(raw, nbits, n), gribcore.unpack_bits(raw, nbits, n)
    )


def test_fused_decode_matches_numpy_path():
    rng = np.random.default_rng(0)
    f = rng.normal(280, 10, (73, 144)).astype(np.float32)
    enc = grib.encode_simple(f, nbits=16)
    native = grib.decode_message(enc).values
    # force the numpy path
    saved_simple, saved_unpack = grib._decode_simple_impl, grib._unpack_bits_impl
    try:
        grib._decode_simple_impl = None
        grib._unpack_bits_impl = grib._unpack_bits_numpy
        pure = grib.decode_message(enc).values
    finally:
        grib._decode_simple_impl, grib._unpack_bits_impl = saved_simple, saved_unpack
    np.testing.assert_allclose(native, pure, rtol=1e-6)


def test_buffer_too_short_raises():
    with pytest.raises(ValueError):
        gribcore.unpack_bits(b"\x00", 16, 100)
