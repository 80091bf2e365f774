"""GRIB2 decoding (and a test encoder) — no eccodes dependency.

The reference decodes GRIB with cfgrib/eccodes (C library wheels,
reference skyrim/libs/nwp/gfs.py:493-497, ic/ifs.py:92-110); those
wheels are absent here, so this module implements the GRIB2 wire format
directly:

- grid template 3.0 (equiangular lat-lon)
- data templates 5.0 (simple packing), 5.2/5.3 (complex packing with
  optional spatial differencing — NOAA's favourite), 5.40 (JPEG2000 via
  PIL/openjpeg), 5.41 (PNG via PIL)
- section 6 bitmaps

Bit unpacking is vectorized numpy (``np.unpackbits`` + matmul); the
optional C++ fast path (native/gribcore) plugs in via
``_unpack_bits_impl`` when built.  ``encode_simple`` emits a valid
template-5.0 message for hermetic tests.
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass, field

import numpy as np


@dataclass
class GribMessage:
    discipline: int
    param_category: int | None
    param_number: int | None
    nlat: int
    nlon: int
    lat_first: float
    lon_first: float
    lat_last: float
    lon_last: float
    scan_mode: int
    values: np.ndarray  # (nlat, nlon) float32, NaN where bitmap-masked
    meta: dict = field(default_factory=dict)

    @property
    def lat(self) -> np.ndarray:
        return np.linspace(self.lat_first, self.lat_last, self.nlat)

    @property
    def lon(self) -> np.ndarray:
        return np.linspace(self.lon_first, self.lon_last, self.nlon)


def _u(b: bytes, signed: bool = False) -> int:
    v = int.from_bytes(b, "big")
    if signed and b and (b[0] & 0x80):
        # GRIB sign-magnitude negative numbers
        v = -(v & ~(0x80 << (8 * (len(b) - 1))))
    return v


def _unpack_bits_numpy(data: bytes, nbits: int, n: int) -> np.ndarray:
    """Unpack n big-endian nbits-wide unsigned ints from a byte string."""
    if nbits == 0:
        return np.zeros(n, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    need = n * nbits
    if len(bits) < need:
        raise ValueError(f"bitstream too short: {len(bits)} < {need}")
    bits = bits[:need].reshape(n, nbits).astype(np.int64)
    powers = (1 << np.arange(nbits - 1, -1, -1)).astype(np.int64)
    return bits @ powers


_unpack_bits_impl = _unpack_bits_numpy  # native fast path may override
_decode_simple_impl = None  # fused native decode, set by gribcore.install()


def _decode_simple(sec5: bytes, sec7_data: bytes, n: int) -> np.ndarray:
    R = struct.unpack(">f", sec5[11:15])[0]
    E = _u(sec5[15:17], signed=True)
    D = _u(sec5[17:19], signed=True)
    nbits = sec5[19]
    if _decode_simple_impl is not None:
        return _decode_simple_impl(sec7_data, nbits, n, R, E, D)
    X = _unpack_bits_impl(sec7_data, nbits, n)
    return ((R + X * (2.0**E)) / (10.0**D)).astype(np.float32)


def _decode_complex(sec5: bytes, sec7_data: bytes, n: int, template: int) -> np.ndarray:
    R = struct.unpack(">f", sec5[11:15])[0]
    E = _u(sec5[15:17], signed=True)
    D = _u(sec5[17:19], signed=True)
    nbits = sec5[19]
    # octet 22: group splitting method; 23-24: missing value mgmt (ignored)
    NG = _u(sec5[31:35])
    ref_group_width = sec5[35]
    nbits_group_width = sec5[36]
    ref_group_len = _u(sec5[37:41])
    len_increment = sec5[41]
    last_group_len = _u(sec5[42:46])
    nbits_group_len = sec5[46]

    pos_bits = 0
    buf = np.unpackbits(np.frombuffer(sec7_data, dtype=np.uint8)).astype(np.int64)

    def take(count, width):
        nonlocal pos_bits
        if width == 0:
            vals = np.zeros(count, dtype=np.int64)
        else:
            need = count * width
            chunk = buf[pos_bits : pos_bits + need].reshape(count, width)
            powers = (1 << np.arange(width - 1, -1, -1)).astype(np.int64)
            vals = chunk @ powers
            pos_bits += need
        return vals

    spatial_order = 0
    extra_bytes = 0
    if template == 3:
        spatial_order = sec5[47]
        extra_bytes = sec5[48]
        # initial values and overall minimum, each in extra_bytes octets
        vals_count = spatial_order + 1
        init = []
        for _ in range(spatial_order):
            init.append(take(1, 8 * extra_bytes)[0])
        gmin_raw = take(1, 8 * extra_bytes)[0]
        # signed (sign-magnitude, first bit)
        sign_bit = 1 << (8 * extra_bytes - 1)
        gmin = -(gmin_raw & ~sign_bit) if gmin_raw & sign_bit else gmin_raw
        init = [
            -(v & ~sign_bit) if v & sign_bit else v for v in init
        ]

    group_refs = take(NG, nbits)
    pos_bits = -(-pos_bits // 8) * 8
    group_widths = ref_group_width + take(NG, nbits_group_width)
    pos_bits = -(-pos_bits // 8) * 8
    group_lens = ref_group_len + len_increment * take(NG, nbits_group_len)
    group_lens[-1] = last_group_len
    pos_bits = -(-pos_bits // 8) * 8

    total = int(group_lens.sum())
    out = np.empty(total, dtype=np.int64)
    ofs = 0
    for g in range(NG):
        cnt = int(group_lens[g])
        w = int(group_widths[g])
        out[ofs : ofs + cnt] = group_refs[g] + take(cnt, w)
        ofs += cnt
    out = out[:n]

    if template == 3 and spatial_order:
        out = out + gmin
        if spatial_order == 1:
            out[0] = init[0]
            out = np.cumsum(out)
        elif spatial_order == 2:
            out = _undo_second_diff(out, init)
    return ((R + out * (2.0**E)) / (10.0**D)).astype(np.float32)


def _undo_second_diff(d: np.ndarray, init: list[int]) -> np.ndarray:
    """Invert second-order spatial differencing (vectorized).

    With first values x0, x1 given and d[i] (i≥2) the second differences,
    the first differences are cumsum(d[2:]) + (x1−x0) and the values are
    x1 + cumsum(first differences) — two cumsums, no Python loop.
    """
    d = d.astype(np.int64)
    out = np.empty_like(d)
    out[0], out[1] = init[0], init[1]
    if len(d) > 2:
        first_diffs = np.cumsum(d[2:]) + (init[1] - init[0])
        out[2:] = init[1] + np.cumsum(first_diffs)
    return out


def _decode_image(sec5: bytes, sec7_data: bytes, n: int) -> np.ndarray:
    from PIL import Image

    R = struct.unpack(">f", sec5[11:15])[0]
    E = _u(sec5[15:17], signed=True)
    D = _u(sec5[17:19], signed=True)
    img = Image.open(io.BytesIO(sec7_data))
    X = np.asarray(img, dtype=np.int64).reshape(-1)[:n]
    return ((R + X * (2.0**E)) / (10.0**D)).astype(np.float32)


def decode_message(buf: bytes) -> GribMessage:
    """Decode one GRIB2 message from bytes (must start with 'GRIB')."""
    if buf[:4] != b"GRIB":
        start = buf.find(b"GRIB")
        if start < 0:
            raise ValueError("no GRIB header found")
        buf = buf[start:]
    edition = buf[7]
    if edition != 2:
        raise NotImplementedError(f"GRIB edition {edition} unsupported")
    discipline = buf[6]
    total_len = _u(buf[8:16])
    buf = buf[:total_len]

    pos = 16
    sections: dict[int, bytes] = {}
    bitmap: np.ndarray | None = None
    while pos < total_len - 4:
        if buf[pos : pos + 4] == b"7777":
            break
        sec_len = _u(buf[pos : pos + 4])
        sec_num = buf[pos + 4]
        sections[sec_num] = buf[pos : pos + sec_len]
        pos += sec_len

    # --- grid (template 3.0) ---
    s3 = sections[3]
    grid_template = _u(s3[12:14])
    if grid_template != 0:
        raise NotImplementedError(f"grid template 3.{grid_template} unsupported")
    Ni = _u(s3[30:34])
    Nj = _u(s3[34:38])
    la1 = _u(s3[46:50], signed=True) / 1e6
    lo1 = _u(s3[50:54], signed=True) / 1e6
    la2 = _u(s3[55:59], signed=True) / 1e6
    lo2 = _u(s3[59:63], signed=True) / 1e6
    scan = s3[71]

    # --- product ---
    s4 = sections.get(4)
    pcat = s4[9] if s4 is not None and len(s4) > 10 else None
    pnum = s4[10] if s4 is not None and len(s4) > 10 else None

    # --- bitmap ---
    s6 = sections.get(6)
    n_points = Ni * Nj
    n_coded = n_points
    if s6 is not None and s6[5] == 0:
        bits = np.unpackbits(np.frombuffer(s6[6:], dtype=np.uint8))[:n_points]
        bitmap = bits.astype(bool)
        n_coded = int(bitmap.sum())

    # --- data ---
    s5 = sections[5]
    template = _u(s5[9:11])
    s7 = sections[7]
    payload = s7[5:]
    if template == 0:
        vals = _decode_simple(s5, payload, n_coded)
    elif template in (2, 3):
        vals = _decode_complex(s5, payload, n_coded, template)
    elif template in (40, 41):
        vals = _decode_image(s5, payload, n_coded)
    else:
        raise NotImplementedError(f"data template 5.{template} unsupported")

    if bitmap is not None:
        full = np.full(n_points, np.nan, dtype=np.float32)
        full[bitmap] = vals
        vals = full

    grid = vals.reshape(Nj, Ni)
    if scan & 0x40:  # +j scanning: south→north; flip to north-first
        grid = grid[::-1]
        la1, la2 = la2, la1
    return GribMessage(
        discipline, pcat, pnum, Nj, Ni, la1, lo1, la2, lo2, scan, grid,
        meta={"data_template": template},
    )


def decode_all(buf: bytes) -> list[GribMessage]:
    """Decode every message in a (possibly concatenated) GRIB2 buffer."""
    out = []
    pos = 0
    while True:
        start = buf.find(b"GRIB", pos)
        if start < 0:
            break
        total = _u(buf[start + 8 : start + 16])
        out.append(decode_message(buf[start : start + total]))
        pos = start + total
    return out


# ---------------------------------------------------------------------------
# Encoder (template 5.0) — for hermetic tests and cache fixtures.
# ---------------------------------------------------------------------------


def encode_simple(
    values: np.ndarray,
    lat_first: float = 90.0,
    lon_first: float = 0.0,
    lat_last: float = -90.0,
    lon_last: float = 359.75,
    nbits: int = 16,
    discipline: int = 0,
    param_category: int = 0,
    param_number: int = 0,
) -> bytes:
    """Encode a (nlat, nlon) array as one GRIB2 message (simple packing)."""
    values = np.asarray(values, dtype=np.float64)
    Nj, Ni = values.shape
    n = Ni * Nj
    vmin = float(values.min())
    vmax = float(values.max())
    R = vmin
    if vmax > vmin:
        E = int(np.ceil(np.log2((vmax - vmin) / (2**nbits - 1))))
    else:
        E = 0
    X = np.round((values.reshape(-1) - R) / (2.0**E)).astype(np.int64)
    X = np.clip(X, 0, 2**nbits - 1)

    bits = ((X[:, None] >> np.arange(nbits - 1, -1, -1)) & 1).astype(np.uint8)
    payload = np.packbits(bits.reshape(-1)).tobytes()

    def sm(v: int, width: int) -> int:
        """GRIB sign-magnitude encoding."""
        return v if v >= 0 else (1 << (8 * width - 1)) | (-v)

    def sec(num: int, body: bytes) -> bytes:
        return struct.pack(">IB", 5 + len(body), num) + body

    s1 = sec(1, struct.pack(">HHBBBHBBBBBBB", 0, 0, 2, 1, 1, 2024, 1, 1, 0, 0, 0, 0, 1))
    s3_body = struct.pack(">BIBBH", 0, n, 0, 0, 0)
    s3_body += bytes([6]) + b"\x00" * 15  # earth shape + radii octets 15-30
    s3_body += struct.pack(">II", Ni, Nj)
    s3_body += struct.pack(">II", 0, 0)  # basic angle, subdivision
    s3_body += struct.pack(
        ">IIB", sm(int(lat_first * 1e6), 4), sm(int(lon_first * 1e6), 4), 0x30
    )
    s3_body += struct.pack(">II", sm(int(lat_last * 1e6), 4), sm(int(lon_last * 1e6), 4))
    di = abs(lon_last - lon_first) / max(Ni - 1, 1)
    dj = abs(lat_first - lat_last) / max(Nj - 1, 1)
    s3_body += struct.pack(">IIB", int(di * 1e6), int(dj * 1e6), 0x00)
    s3 = sec(3, s3_body)
    s4 = sec(4, struct.pack(">HHBB", 0, 0, param_category, param_number) + b"\x00" * 23)
    s5 = sec(5, struct.pack(">IHfHHBB", n, 0, R, sm(E, 2), sm(0, 2), nbits, 0))
    s6 = sec(6, bytes([255]))
    s7 = sec(7, payload)

    body = s1 + s3 + s4 + s5 + s6 + s7 + b"7777"
    total = 16 + len(body)
    s0 = b"GRIB" + b"\x00\x00" + bytes([discipline, 2]) + struct.pack(">Q", total)
    return s0 + body


# install the native fast path when native/libgribcore.so has been built
try:  # pragma: no cover - exercised when the native lib exists
    from skyrim_tpu.data import gribcore as _gribcore  # noqa: F401
except Exception:  # pragma: no cover
    pass
