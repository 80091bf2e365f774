"""NWP fetcher tests with a fake transport serving synthetic GRIB —
the reference's mock-based pattern (tests/libs/nwp/test_ifs.py:77-104)."""

import datetime
import json

import numpy as np
import pytest

from skyrim_tpu.data import grib
from skyrim_tpu.data.cds import CDS, build_request
from skyrim_tpu.data.gfs import GFSModel, gfs_key
from skyrim_tpu.data.ifs import IFSModel, ifs_key, ifs_stream
from skyrim_tpu.data.vocab import GFS_VOCAB, IFS_VOCAB

T0 = datetime.datetime(2024, 5, 7, 0)
H, W = 721, 1440


def _make_field(value: float) -> np.ndarray:
    return np.full((H, W), value, np.float32)


class FakeGFSTransport:
    """Serves .idx and byte ranges for a synthetic 3-message GRIB file."""

    def __init__(self):
        self.files: dict[str, bytes] = {}
        self.calls = []

    def _build(self, key):
        msgs = {
            ("UGRD", "10 m above ground"): 5.0,
            ("TMP", "2 m above ground"): 288.0,
            ("HGT", "500 mb"): 5500.0,
        }
        blob = b""
        idx_lines = []
        for i, ((param, level), val) in enumerate(msgs.items()):
            idx_lines.append(f"{i + 1}:{len(blob)}:d=2024050700:{param}:{level}:anl:")
            blob += grib.encode_simple(_make_field(val))
        self.files[key] = blob
        self.files[key + ".idx"] = "\n".join(idx_lines).encode()

    def __call__(self, url, offset=None, length=None):
        self.calls.append((url, offset, length))
        key = url.split(".com/")[1]
        base = key[:-4] if key.endswith(".idx") else key
        if base not in self.files:
            self._build(base)
        data = self.files[key]
        if offset is not None:
            end = None if length is None else offset + length
            return data[offset:end]
        return data


def test_gfs_key_convention():
    assert (
        gfs_key(T0, 6)
        == "gfs.20240507/00/atmos/gfs.t00z.pgrb2.0p25.f006"
    )


def test_gfs_fetch_dataarray_byte_ranges():
    transport = FakeGFSTransport()
    model = GFSModel(["u10m", "t2m", "z500"], transport=transport, cache=False)
    out = model.fetch_dataarray(T0, [0, 6])
    assert out.sizes == {"time": 2, "channel": 3, "lat": H, "lon": W}
    np.testing.assert_allclose(out.sel(channel="u10m").data, 5.0, atol=1e-3)
    np.testing.assert_allclose(out.sel(channel="t2m").data, 288.0, atol=1e-2)
    # HGT modifier: ×9.81 → geopotential
    np.testing.assert_allclose(
        out.sel(channel="z500").data, 5500.0 * 9.81, rtol=1e-4
    )
    # fetches were byte-ranged, not whole-file
    ranged = [c for c in transport.calls if c[1] is not None]
    assert len(ranged) >= 6


def test_gfs_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(
        "skyrim_tpu.data.nwp_base.LOCAL_CACHE", str(tmp_path)
    )
    transport = FakeGFSTransport()
    model = GFSModel(["u10m"], transport=transport, cache=True, max_workers=1)
    model.fetch_dataarray(T0, [0])
    n_calls = len([c for c in transport.calls if c[1] is not None])
    model._index_cache.clear()
    model.fetch_dataarray(T0, [0])
    # data came from cache — no new ranged call
    assert len([c for c in transport.calls if c[1] is not None]) == n_calls


def test_gfs_unknown_channel_rejected():
    with pytest.raises(ValueError, match="not in GFS vocabulary"):
        GFSModel(["w500"])  # w (vertical velocity) not served by GFS vocab


class FakeECMWFTransport:
    """Serves .index (JSON lines) and byte ranges; fields are -180-based
    to exercise the longitude roll."""

    def __init__(self):
        self.files = {}

    def _build(self, base):
        entries = [
            ("10u", "sfc", None, 3.0),
            ("gh", "pl", "850", 1400.0),
        ]
        blob = b""
        index = []
        for param, levtype, level, val in entries:
            # field with a lon-dependent pattern, encoded from -180
            vals = np.tile(
                np.linspace(val, val + 10, W, endpoint=False), (H, 1)
            ).astype(np.float32)
            msg = grib.encode_simple(vals, lon_first=-180.0, lon_last=179.75)
            e = {
                "domain": "g", "param": param, "levtype": levtype,
                "_offset": len(blob), "_length": len(msg),
            }
            if level:
                e["levelist"] = level
            index.append(json.dumps(e))
            blob += msg
        self.files[base] = blob
        self.files[base.replace(".grib2", ".index")] = "\n".join(index).encode()

    def __call__(self, url, offset=None, length=None):
        key = url.split(".com/")[1]
        base = key.replace(".index", ".grib2")
        if base not in self.files:
            self._build(base)
        data = self.files[key]
        if offset is not None:
            return data[offset : offset + length]
        return data


def test_ifs_stream_selection():
    assert ifs_stream(0) == "oper" and ifs_stream(12) == "oper"
    assert ifs_stream(6) == "scda" and ifs_stream(18) == "scda"


def test_ifs_key_convention():
    key = ifs_key(T0, 24)
    assert key == "20240507/00z/ifs/0p25/oper/20240507000000-24h-oper-fc.grib2"


def test_ifs_fetch_rolls_longitude():
    transport = FakeECMWFTransport()
    model = IFSModel(["u10m", "z850"], transport=transport, cache=False)
    out = model.fetch_dataarray(T0, [0])
    # original encodes lon -180..180; after roll, lon 0 must hold the value
    # originally at position W//2
    u = out.sel(channel="u10m").data[0]
    assert u[0, 0] == pytest.approx(3.0 + 10 * 0.5, abs=1e-2)
    # gh→z modifier applied
    z = out.sel(channel="z850").data[0]
    assert z[0, 0] == pytest.approx((1400.0 + 5.0) * 9.81, rel=1e-3)


def test_ifs_min_date_guard():
    model = IFSModel(["u10m"], transport=lambda *a, **k: b"", cache=False, max_workers=1)
    with pytest.raises(Exception):
        model.fetch_channel("u10m", datetime.datetime(2024, 1, 1), 0)


def test_cds_build_request():
    times = [datetime.datetime(2024, 5, 1, 0), datetime.datetime(2024, 5, 2, 12)]
    dataset, body = build_request("z500", times)
    assert dataset == "reanalysis-era5-pressure-levels"
    assert body["variable"] == "geopotential"
    assert body["pressure_level"] == "500"
    assert body["day"] == ["01", "02"]
    assert body["time"] == ["00:00", "12:00"]
    dataset2, body2 = build_request("t2m", times)
    assert dataset2 == "reanalysis-era5-single-levels"
    assert "pressure_level" not in body2


def test_cds_fetch_with_fake_transport(tmp_path, monkeypatch):
    monkeypatch.setattr("skyrim_tpu.data.cds.LOCAL_CACHE", str(tmp_path))

    def fake_retrieve(dataset, body):
        n_times = len(body["year"]) and 2  # our test asks 2 timestamps
        blob = b""
        for _ in range(2):
            blob += grib.encode_simple(_make_field(280.0))
        return blob

    client = CDS(["t2m"], transport=fake_retrieve)
    times = [datetime.datetime(2024, 5, 1, 0), datetime.datetime(2024, 5, 1, 6)]
    out = client.fetch_dataarray(times)
    assert out.sizes["time"] == 2
    np.testing.assert_allclose(out.data, 280.0, atol=1e-2)


def test_cds_dataset_factory(tmp_path, monkeypatch):
    monkeypatch.setattr("skyrim_tpu.data.cds.LOCAL_CACHE", str(tmp_path / "cache"))

    def fake_retrieve(dataset, body):
        return grib.encode_simple(_make_field(1.0)) * 2

    client = CDS(["t2m"], transport=fake_retrieve)
    meta = client.create_dataset(
        datetime.datetime(2024, 5, 1, 0),
        datetime.datetime(2024, 5, 1, 18),
        str(tmp_path / "ds"),
        slice_size=2,
    )
    assert meta["n_slices"] == 2
    assert (tmp_path / "ds" / "metadata.json").exists()
    assert (tmp_path / "ds" / "slice_00000.nc").exists()


class Fake04DegTransport(FakeECMWFTransport):
    """Serves a 0.4°-beta-style field (451×900) so the fetcher must
    regrid onto the canonical 0.25° grid (reference ic/ifs.py:161-170)."""

    def _build(self, base):
        H4, W4 = 451, 900
        vals = np.tile(
            np.linspace(3.0, 13.0, W4, endpoint=False), (H4, 1)
        ).astype(np.float32)
        msg = grib.encode_simple(
            vals, lat_first=90.0, lon_first=-180.0, lat_last=-90.0,
            lon_last=179.6,
        )
        e = {"domain": "g", "param": "10u", "levtype": "sfc",
             "_offset": 0, "_length": len(msg)}
        self.files[base] = msg
        self.files[base.replace(".grib2", ".index")] = json.dumps(e).encode()


def test_ifs_regrids_04deg_to_canonical():
    transport = Fake04DegTransport()
    model = IFSModel(["u10m"], transport=transport, cache=False, max_workers=1)
    out = model.fetch_dataarray(T0, [0])
    u = out.sel(channel="u10m").data[0]
    assert u.shape == (721, 1440)  # canonical, not 451×900
    # the rolled source is linear in lon (3→13 across -180..180 → after
    # roll 8→13 then 3→8); canonical lon 0 carries the source midpoint
    assert u[0, 0] == pytest.approx(8.0, abs=0.02)
    assert np.isfinite(u).all()


class FakeMissingLevelTransport(FakeECMWFTransport):
    """Publishes gh at 850 and 1000 hPa only — z925 must interpolate
    (reference ic/ifs.py:38-51)."""

    def _build(self, base):
        blob = b""
        index = []
        for level, val in (("850", 1400.0), ("1000", 100.0)):
            vals = np.full((H, W), val, np.float32)
            msg = grib.encode_simple(vals, lon_first=-180.0, lon_last=179.75)
            index.append(json.dumps({
                "domain": "g", "param": "gh", "levtype": "pl",
                "levelist": level, "_offset": len(blob), "_length": len(msg),
            }))
            blob += msg
        self.files[base] = blob
        self.files[base.replace(".grib2", ".index")] = "\n".join(index).encode()


def test_ifs_interpolates_missing_pressure_level():
    transport = FakeMissingLevelTransport()
    model = IFSModel(["z925"], transport=transport, cache=False, max_workers=1)
    out = model.fetch_dataarray(T0, [0])
    z = out.sel(channel="z925").data[0]
    # gh(925) = midpoint of gh(850)=1400 and gh(1000)=100 → 750, ×9.81
    assert z[0, 0] == pytest.approx(750.0 * 9.81, rel=1e-3)
    assert np.isfinite(z).all()
