"""Complex-packing (templates 5.2/5.3) decoder coverage incl. the
missing-value management the round-2 decoder ignored (grib.py:94)."""

import numpy as np
import pytest

from skyrim_tpu.data.grib import decode_message, encode_complex


@pytest.fixture
def field():
    rng = np.random.default_rng(0)
    return rng.normal(size=(19, 36)) * 10 + 280


@pytest.mark.parametrize("order", [0, 1, 2])
def test_complex_roundtrip(field, order):
    m = decode_message(encode_complex(field, spatial_order=order, decimals=2))
    assert m.meta["data_template"] == (3 if order else 2)
    np.testing.assert_allclose(m.values, field, atol=0.0051)


def test_missing_value_management(field):
    g = field.copy()
    g[3, 4] = np.nan
    g[10, :] = np.nan  # a whole row → some all-missing groups
    m = decode_message(encode_complex(g, spatial_order=0, decimals=2))
    np.testing.assert_array_equal(np.isnan(m.values), np.isnan(g))
    np.testing.assert_allclose(
        m.values[~np.isnan(g)], g[~np.isnan(g)], atol=0.0051
    )


def test_mvm_with_differencing_refuses():
    g = np.ones((4, 8))
    g[0, 0] = np.nan
    with pytest.raises(ValueError, match="missing values require"):
        encode_complex(g, spatial_order=2)
    # and the decoder refuses rather than silently mis-decoding: craft a
    # 5.3 message then flip its mvm octet
    buf = bytearray(encode_complex(np.ones((4, 8)), spatial_order=2))
    # find section 5: walk sections
    pos = 16
    while True:
        ln = int.from_bytes(buf[pos : pos + 4], "big")
        if buf[pos + 4] == 5:
            buf[pos + 22] = 1  # missing value management on
            break
        pos += ln
    with pytest.raises(NotImplementedError, match="spatial differencing"):
        decode_message(bytes(buf))
