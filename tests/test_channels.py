import pytest

from skyrim_tpu import channels as ch


def test_parse_surface():
    c = ch.parse_channel("u10m")
    assert c.var == "u10m" and c.level is None and c.is_surface
    assert c.name == "u10m"


def test_parse_level():
    c = ch.parse_channel("z500")
    assert (c.var, c.level) == ("z", 500)
    assert ch.parse_channel("q1000") == ch.Channel("q", 1000)
    assert ch.parse_channel("w50") == ch.Channel("w", 50)


def test_parse_unknown():
    with pytest.raises(ValueError):
        ch.parse_channel("banana42")


def test_model_channel_counts():
    # Counts match the reference adapters' documented channel lists.
    assert len(ch.PANGU) == 69  # pangu.py:6-13
    assert len(ch.FCN) == 26  # fourcastnet.py:8-10
    assert len(ch.FCNV2) == 73  # fourcastnet_v2.py:12-20
    assert len(ch.DLWP) == 7  # dlwp.py:17
    assert len(ch.GRAPHCAST) == 83  # graphcast.py:17-26
    assert len(ch.FUXI) == 70  # fuxi.py:14-21
    assert len(ch.FENGWU) == 69  # fengwu.py:14-22


def test_pangu_ordering():
    # z-major over descending-pressure levels, surface last (pangu.py:6-13).
    assert ch.PANGU[0] == "z1000"
    assert ch.PANGU[12] == "z50"
    assert ch.PANGU[13] == "q1000"
    assert ch.PANGU[-4:] == ("msl", "u10m", "v10m", "t2m")


def test_graphcast_ordering():
    assert ch.GRAPHCAST[0] == "z50"
    assert ch.GRAPHCAST[-5:] == ("u10m", "v10m", "t2m", "msl", "tp06")


def test_fcnv2_ordering():
    assert ch.FCNV2[:8] == ("u10m", "v10m", "u100m", "v100m", "t2m", "sp", "msl", "tcwv")
    assert ch.FCNV2[8] == "u50"
    assert ch.FCNV2[-1] == "r1000"


def test_all_channels_parse():
    for name, chans in ch.CHANNEL_SETS.items():
        parsed = ch.validate_channels(chans)
        assert len(parsed) == len(chans)
        assert len(set(chans)) == len(chans), f"duplicates in {name}"


def test_channel_index():
    idx = ch.channel_index(ch.PANGU, ["t2m", "z500"])
    assert ch.PANGU[idx[0]] == "t2m"
    assert ch.PANGU[idx[1]] == "z500"
    with pytest.raises(KeyError):
        ch.channel_index(ch.DLWP, ["u10m"])
