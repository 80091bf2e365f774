import numpy as np
import pytest

from skyrim_tpu.data import grib, idx, schedules, vocab


# ---------------- vocabularies ----------------


def test_gfs_vocab_keys():
    e = vocab.GFS_VOCAB["u10m"]
    assert (e.provider_id, e.levtype) == ("UGRD", "10 m above ground")
    e = vocab.GFS_VOCAB["z500"]
    assert (e.provider_id, e.levtype) == ("HGT", "500 mb")
    assert e.scale == vocab.GRAVITY
    assert e.modifier(2.0) == pytest.approx(2 * 9.81)
    assert vocab.GFS_VOCAB["tcwv"].provider_id == "PWAT"
    assert len(vocab.GFS_VOCAB) == 8 + 6 * 13  # 86 channels


def test_ifs_vocab_keys():
    e = vocab.IFS_VOCAB["u10m"]
    assert (e.provider_id, e.levtype) == ("10u", "sfc")
    e = vocab.IFS_VOCAB["z850"]
    assert (e.provider_id, e.levtype, e.level) == ("gh", "pl", "850")
    assert e.scale == vocab.GRAVITY
    assert len(vocab.IFS_VOCAB) == 9 + 6 * 13  # 87 (reference ifs.py:42)


def test_ens_vocab_reduced_levels():
    assert "z500" in vocab.ENS_VOCAB
    assert "z600" not in vocab.ENS_VOCAB  # 600 not in the 9-level set
    assert len(vocab.ENS_VOCAB) == 9 + 6 * 9


def test_cds_vocab_keys():
    e = vocab.CDS_VOCAB["t2m"]
    assert e.provider_id == "2m_temperature"
    assert e.levtype == vocab.CDS_SINGLE_DATASET
    e = vocab.CDS_VOCAB["q700"]
    assert (e.provider_id, e.level) == ("specific_humidity", "700")
    assert e.levtype == vocab.CDS_PRESSURE_DATASET


# ---------------- schedules ----------------


def test_gfs_schedule():
    steps = schedules.gfs_steps(0)
    assert steps[:3] == [0, 1, 2]
    assert 120 in steps and 121 not in steps and 123 in steps
    assert steps[-1] == 384


def test_ifs_schedule_cycles():
    s00 = schedules.ifs_steps(0)
    assert 144 in s00 and 147 not in s00 and 150 in s00 and s00[-1] == 240
    s06 = schedules.ifs_steps(6)
    assert s06[-1] == 90
    with pytest.raises(schedules.ScheduleError):
        schedules.ifs_steps(3)


def test_ens_schedule():
    assert schedules.ens_steps(0)[-1] == 360
    assert schedules.ens_steps(18)[-1] == 144


@pytest.mark.parametrize(
    "product,cycle,lead,ok",
    [
        ("ifs", 0, 240, True), ("ifs", 0, 145, False), ("ifs", 6, 93, False),
        ("gfs", 0, 384, True), ("gfs", 0, 122, False), ("ens", 12, 360, True),
    ],
)
def test_validate_lead_time(product, cycle, lead, ok):
    if ok:
        schedules.validate_lead_time(product, cycle, lead)
    else:
        with pytest.raises(schedules.ScheduleError):
            schedules.validate_lead_time(product, cycle, lead)


def test_forecast_steps_cadence():
    steps = schedules.forecast_steps("ifs", 0, 24, time_step=6)
    assert steps == [0, 6, 12, 18, 24]
    with pytest.raises(schedules.ScheduleError):
        schedules.forecast_steps("ifs", 0, 24, time_step=2)


def test_snipe_walk():
    import datetime

    target = datetime.datetime(2024, 5, 7, 9)
    hits = schedules.available_start_times("ifs", target, max_hours_back=24)
    # 9h valid time: init 06z+3h, 00z+9h, ...
    assert (datetime.datetime(2024, 5, 7, 6), 3) in hits
    assert (datetime.datetime(2024, 5, 7, 0), 9) in hits


# ---------------- idx parsing ----------------

IDX_SAMPLE = """1:0:d=2024050700:PRMSL:mean sea level:anl:
2:984417:d=2024050700:CLWMR:1 hybrid level:anl:
3:1204693:d=2024050700:UGRD:10 m above ground:anl:
4:1733859:d=2024050700:TMP:500 mb:anl:
5:2304136:d=2024050700:HGT:500 mb:anl:
"""


def test_parse_idx():
    index = idx.parse_idx(IDX_SAMPLE)
    e = idx.lookup(index, "UGRD", "10 m above ground")
    assert e.offset == 1204693
    assert e.length == 1733859 - 1204693
    last = idx.lookup(index, "HGT", "500 mb")
    assert last.length is None  # read to EOF
    with pytest.raises(KeyError):
        idx.lookup(index, "NOPE", "500 mb")


# ---------------- GRIB2 codec ----------------


def test_grib_simple_roundtrip():
    rng = np.random.default_rng(0)
    field = (rng.normal(280, 15, (73, 144))).astype(np.float32)
    msg_bytes = grib.encode_simple(field, nbits=16)
    msg = grib.decode_message(msg_bytes)
    assert msg.values.shape == (73, 144)
    assert msg.nlat == 73 and msg.nlon == 144
    np.testing.assert_allclose(msg.values, field, atol=2e-3 * 30)
    assert msg.lat_first == pytest.approx(90.0)
    assert msg.lat_last == pytest.approx(-90.0)


def test_grib_constant_field():
    field = np.full((10, 20), 101325.0, np.float32)
    msg = grib.decode_message(grib.encode_simple(field))
    np.testing.assert_allclose(msg.values, field, rtol=1e-6)


def test_grib_negative_lats_and_values():
    field = np.linspace(-40, 40, 15 * 30).reshape(15, 30).astype(np.float32)
    msg = grib.decode_message(grib.encode_simple(field, lat_first=85.0, lat_last=-85.0))
    np.testing.assert_allclose(msg.values, field, atol=0.01)
    assert msg.lat_last == pytest.approx(-85.0)


def test_grib_decode_all_concatenated():
    a = grib.encode_simple(np.ones((5, 8), np.float32))
    b = grib.encode_simple(np.full((5, 8), 2.0, np.float32))
    msgs = grib.decode_all(a + b)
    assert len(msgs) == 2
    np.testing.assert_allclose(msgs[1].values, 2.0)


def test_grib_garbage_raises():
    with pytest.raises(ValueError):
        grib.decode_message(b"not a grib message")
