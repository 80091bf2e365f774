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
    # octet 22 (sec5[21]): group splitting method
    # octet 23 (sec5[22]): missing value management — 0 none, 1 primary,
    # 2 primary+secondary (regulation 92.6.5: the all-ones pattern within
    # a group encodes primary missing, all-ones−1 secondary; a width-0
    # group whose reference is all-ones at ``nbits`` is entirely missing)
    mvm = sec5[22]
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
    if mvm and spatial_order:
        # combining missing-value management with spatial differencing
        # requires re-indexing the differencing over non-missing points
        # only (template 7.3 note 2) — refuse rather than decode garbage
        raise NotImplementedError(
            "complex packing: missing-value management combined with "
            "spatial differencing is not supported"
        )
    if template == 3:
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
    missing = np.zeros(total, dtype=bool) if mvm else None
    all_ones_ref = (1 << nbits) - 1
    ofs = 0
    for g in range(NG):
        cnt = int(group_lens[g])
        w = int(group_widths[g])
        X = take(cnt, w)
        out[ofs : ofs + cnt] = group_refs[g] + X
        if mvm:
            if w == 0:
                # constant group: entirely missing iff its reference is
                # the all-ones pattern at the field width
                if group_refs[g] == all_ones_ref or (
                    mvm == 2 and group_refs[g] == all_ones_ref - 1
                ):
                    missing[ofs : ofs + cnt] = True
            else:
                lim = (1 << w) - 1
                m = X == lim
                if mvm == 2:
                    m |= X == lim - 1
                missing[ofs : ofs + cnt] = m
        ofs += cnt
    out = out[:n]

    if template == 3 and spatial_order:
        out = out + gmin
        if spatial_order == 1:
            out[0] = init[0]
            out = np.cumsum(out)
        elif spatial_order == 2:
            out = _undo_second_diff(out, init)
    vals = ((R + out * (2.0**E)) / (10.0**D)).astype(np.float32)
    if mvm:
        vals[missing[:n]] = np.nan
    return vals


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
    product_meta = _parse_product_section(s4)

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
        meta={"data_template": template, **product_meta},
    )


# hours per GRIB2 time-range unit (code table 4.4)
_TIME_UNIT_HOURS = {0: 1 / 60, 1: 1.0, 2: 24.0, 3: 30 * 24.0, 10: 3.0,
                    11: 6.0, 12: 12.0, 13: 1 / 3600}


def _parse_product_section(s4: bytes | None) -> dict:
    """Section 4 templates 4.0/4.1/4.8-class: forecast time + fixed
    surfaces (level type/value) into ``GribMessage.meta`` — without these
    a multi-message GRIB (e.g. one file holding all 13 isobaric levels,
    reference ifs loader nwp/utils.py:6-115) cannot be disambiguated.

    Octets 10-34 are layout-identical across templates 4.0/4.1/4.2/4.8+
    (the analysis/forecast core), so parsing keys off section length,
    not the template number.
    """
    meta: dict = {}
    if s4 is None or len(s4) < 34:
        return meta
    meta["product_template"] = _u(s4[7:9])
    unit = s4[17]
    ft = _u(s4[18:22])
    meta["forecast_hours"] = ft * _TIME_UNIT_HOURS.get(unit, float("nan"))

    def surface(type_o: int, scale_o: int, val_o: int):
        stype = s4[type_o]
        if stype == 255:
            return None, None
        scale = s4[scale_o]
        if scale == 255:
            scale = 0
        elif scale & 0x80:  # sign-magnitude single octet
            scale = -(scale & 0x7F)
        sval = _u(s4[val_o : val_o + 4])
        if sval == 0xFFFFFFFF:
            return stype, None
        return stype, sval / (10.0**scale)

    t1, v1 = surface(22, 23, 24)
    t2, v2 = surface(28, 29, 30)
    meta["level_type"] = t1
    meta["level_value"] = v1  # Pa for isobaric (type 100), m for 103, …
    if t2 is not None:
        meta["level_type2"] = t2
        meta["level_value2"] = v2
    return meta


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


def _sm(v: int, width: int) -> int:
    """GRIB sign-magnitude encoding."""
    return v if v >= 0 else (1 << (8 * width - 1)) | (-v)


def _sec(num: int, body: bytes) -> bytes:
    return struct.pack(">IB", 5 + len(body), num) + body


def _product_section(
    param_category: int, param_number: int,
    forecast_hours: int = 0, level_type: int = 255, level_value: float = 0.0,
) -> bytes:
    """Template 4.0 body with forecast time (hours) + first fixed surface."""
    lt2 = 255
    lv = int(round(level_value))
    return _sec(4, struct.pack(
        ">HHBBBBBHBBIBBIBBI",
        0, 0, param_category, param_number,
        2, 0, 0,       # generating process type, background, analysis
        0, 0,          # hours + minutes after reference
        1, forecast_hours,  # time unit = hour, forecast time
        level_type, 0, lv,  # first surface: type, scale 0, value
        lt2, 0, 0,          # second surface: missing
    ))


def _grid_section(
    Ni: int, Nj: int,
    lat_first: float, lon_first: float, lat_last: float, lon_last: float,
) -> bytes:
    n = Ni * Nj
    s3_body = struct.pack(">BIBBH", 0, n, 0, 0, 0)
    s3_body += bytes([6]) + b"\x00" * 15  # earth shape + radii octets 15-30
    s3_body += struct.pack(">II", Ni, Nj)
    s3_body += struct.pack(">II", 0, 0)  # basic angle, subdivision
    s3_body += struct.pack(
        ">IIB", _sm(int(lat_first * 1e6), 4), _sm(int(lon_first * 1e6), 4), 0x30
    )
    s3_body += struct.pack(
        ">II", _sm(int(lat_last * 1e6), 4), _sm(int(lon_last * 1e6), 4)
    )
    di = abs(lon_last - lon_first) / max(Ni - 1, 1)
    dj = abs(lat_first - lat_last) / max(Nj - 1, 1)
    s3_body += struct.pack(">IIB", int(di * 1e6), int(dj * 1e6), 0x00)
    return _sec(3, s3_body)


_S1 = _sec(1, struct.pack(">HHBBBHBBBBBBB", 0, 0, 2, 1, 1, 2024, 1, 1, 0, 0, 0, 0, 1))


def _assemble(discipline: int, body: bytes) -> bytes:
    total = 16 + len(body)
    s0 = b"GRIB" + b"\x00\x00" + bytes([discipline, 2]) + struct.pack(">Q", total)
    return s0 + body


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
    forecast_hours: int = 0,
    level_type: int = 255,
    level_value: float = 0.0,
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

    s3 = _grid_section(Ni, Nj, lat_first, lon_first, lat_last, lon_last)
    s4 = _product_section(param_category, param_number, forecast_hours,
                          level_type, level_value)
    s5 = _sec(5, struct.pack(">IHfHHBB", n, 0, R, _sm(E, 2), _sm(0, 2), nbits, 0))
    s6 = _sec(6, bytes([255]))
    s7 = _sec(7, payload)
    return _assemble(discipline, _S1 + s3 + s4 + s5 + s6 + s7 + b"7777")


def encode_complex(
    values: np.ndarray,
    lat_first: float = 90.0,
    lon_first: float = 0.0,
    lat_last: float = -90.0,
    lon_last: float = 359.75,
    nbits: int = 16,
    decimals: int = 2,
    group_len: int = 32,
    spatial_order: int = 0,
    discipline: int = 0,
    param_category: int = 0,
    param_number: int = 0,
    forecast_hours: int = 0,
    level_type: int = 255,
    level_value: float = 0.0,
) -> bytes:
    """Encode with complex packing — template 5.2, or 5.3 with first/
    second-order spatial differencing (``spatial_order`` 1/2, NOAA's GFS
    house style) — for hermetic decoder tests.  NaNs in ``values`` are
    encoded via missing-value management (mvm=1, all-ones in-group
    patterns; only with ``spatial_order=0``, matching the decoder)."""
    values = np.asarray(values, dtype=np.float64)
    Nj, Ni = values.shape
    flat = values.reshape(-1)
    n = flat.size
    miss = np.isnan(flat)
    mvm = 1 if miss.any() else 0
    if mvm and spatial_order:
        raise ValueError("missing values require spatial_order=0")

    D = decimals
    Y = np.round(np.where(miss, 0.0, flat) * 10.0**D).astype(np.int64)
    template = 3 if spatial_order else 2

    # transmitted integer sequence (R=0, E=0: decoded = out / 10^D)
    if spatial_order == 1:
        t = np.zeros(n, np.int64)
        t[1:] = np.diff(Y)
        init = [int(Y[0])]
        gmin = int(t[1:].min()) if n > 1 else 0
        t[0] = gmin  # overwritten by init on decode; stores as zero
        t = t - gmin
    elif spatial_order == 2:
        t = np.zeros(n, np.int64)
        if n > 2:
            t[2:] = np.diff(Y, 2)
        init = [int(Y[0]), int(Y[1] if n > 1 else Y[0])]
        gmin = int(t[2:].min()) if n > 2 else 0
        t[:2] = gmin
        t = t - gmin
    else:
        t = Y - int(Y.min())
        R_off = int(Y.min())  # folded into R below
        init, gmin = [], 0

    # fixed-length grouping
    NG = -(-n // group_len)
    lens = np.full(NG, group_len, np.int64)
    lens[-1] = n - group_len * (NG - 1)
    refs = np.zeros(NG, np.int64)
    widths = np.zeros(NG, np.int64)
    chunks = []
    all_ones_ref = (1 << nbits) - 1
    ofs = 0
    for g in range(NG):
        cnt = int(lens[g])
        seg = t[ofs : ofs + cnt]
        mseg = miss[ofs : ofs + cnt] if mvm else np.zeros(cnt, bool)
        valid = seg[~mseg]
        if mvm and not valid.size:
            refs[g] = all_ones_ref  # width-0 all-missing group marker
            widths[g] = 0
            chunks.append(np.zeros(0, np.int64))
        else:
            ref = int(valid.min()) if valid.size else 0
            span = int(valid.max()) - ref if valid.size else 0
            if mvm:
                # the all-ones pattern is reserved for missing, so the
                # span must fit strictly below 2^w − 1
                w = 1
                while span >= (1 << w) - 1:
                    w += 1
                X = np.where(mseg, (1 << w) - 1, seg - ref)
            else:
                w = int(span).bit_length()
                X = seg - ref
            refs[g] = ref
            widths[g] = w
            chunks.append(X.astype(np.int64))
        ofs += cnt

    def pack_run(vals: np.ndarray, width: int) -> bytes:
        """Pack equal-width values, padding to a byte boundary."""
        if width == 0 or vals.size == 0:
            return b""
        bits = (vals[:, None] >> np.arange(width - 1, -1, -1)) & 1
        return np.packbits(bits.reshape(-1).astype(np.uint8)).tobytes()

    nbits_gw = 8
    nbits_gl = 16
    extra_bytes = 4
    payload = b""
    if template == 3:
        sb = 1 << (8 * extra_bytes - 1)
        ivals = np.asarray(
            [v if v >= 0 else (sb | -v) for v in init]
            + [gmin if gmin >= 0 else (sb | -gmin)],
            np.int64,
        )
        payload += pack_run(ivals, 8 * extra_bytes)
    payload += pack_run(refs, nbits)
    payload += pack_run(widths, nbits_gw)
    payload += pack_run(lens, nbits_gl)
    # group data is ONE continuous bitstream (no alignment between
    # groups) — concatenate at bit level, pack once
    bit_parts = [
        ((chunks[g][:, None] >> np.arange(int(widths[g]) - 1, -1, -1)) & 1)
        .reshape(-1)
        for g in range(NG)
        if int(widths[g]) > 0 and chunks[g].size
    ]
    if bit_parts:
        payload += np.packbits(
            np.concatenate(bit_parts).astype(np.uint8)
        ).tobytes()

    R = float(R_off) if template == 2 else 0.0

    s5_body = struct.pack(
        ">IHfHHBB", n, template, R, _sm(0, 2), _sm(D, 2), nbits, 0
    )
    s5_body += bytes([1, mvm])          # splitting method, missing mgmt
    s5_body += struct.pack(">II", 0, 0)  # missing substitutes
    s5_body += struct.pack(">I", NG)
    s5_body += bytes([0, nbits_gw])      # ref group width, bits
    s5_body += struct.pack(">I", 0)      # ref group length
    s5_body += bytes([1])                # length increment
    s5_body += struct.pack(">I", int(lens[-1]))
    s5_body += bytes([nbits_gl])
    if template == 3:
        s5_body += bytes([spatial_order, extra_bytes])
    s5 = _sec(5, s5_body)

    s3 = _grid_section(Ni, Nj, lat_first, lon_first, lat_last, lon_last)
    s4 = _product_section(param_category, param_number, forecast_hours,
                          level_type, level_value)
    s6 = _sec(6, bytes([255]))
    s7 = _sec(7, payload)
    return _assemble(discipline, _S1 + s3 + s4 + s5 + s6 + s7 + b"7777")


# install the native fast path when native/libgribcore.so has been built
try:  # pragma: no cover - exercised when the native lib exists
    from skyrim_tpu.data import gribcore as _gribcore  # noqa: F401
except Exception:  # pragma: no cover
    pass
