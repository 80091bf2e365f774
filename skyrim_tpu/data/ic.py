"""Initial-condition sources and dispatch.

Mirrors the reference's IC layer (skyrim/libs/ic/__init__.py:25-52):
``get_data_source(channel_names, ic_source)`` returns a source keyed by
name; every source produces the canonical (time, channel, lat, lon)
Field on the 0.25° grid.  Sources here:

- ``gfs`` / ``ifs`` / ``cds``: live operational fetchers (data.nwp /
  data.cds modules; network-gated)
- ``file``: restart from any saved forecast/IC (the reference's
  restart-from-.nc path, models/utils.py:24-31)
- ``synthetic``: climatology-shaped random ICs for offline runs/tests

The reference's ``get_ic`` bug (ignores its channels/source args,
ic/__init__.py:37-52) is fixed here: arguments are honored.
"""

from __future__ import annotations

import abc
import datetime
from typing import Sequence

import numpy as np

from skyrim_tpu.channels import parse_channel
from skyrim_tpu.field import Field
from skyrim_tpu.grid import GRID_721x1440, LatLonGrid
from skyrim_tpu.io.save import load_forecast
from skyrim_tpu.utils.logging import logger


class ICSource(abc.ABC):
    """A provider of initial conditions on the canonical grid."""

    name: str = "abstract"

    def __init__(self, channel_names: Sequence[str], grid: LatLonGrid = GRID_721x1440):
        self.channel_names = list(channel_names)
        self.grid = grid

    @abc.abstractmethod
    def fetch(
        self,
        time: datetime.datetime,
        n_history: int = 1,
        time_step: datetime.timedelta = datetime.timedelta(hours=6),
    ) -> Field:
        """Return (n_history, C, H, W) Field ending at ``time``."""

    def __getitem__(self, time: datetime.datetime) -> Field:
        return self.fetch(time)


class FileSource(ICSource):
    """IC from a saved forecast file/store (restart support)."""

    name = "file"

    def __init__(self, channel_names, path: str, grid: LatLonGrid = GRID_721x1440):
        super().__init__(channel_names, grid)
        self.path = path

    def fetch(self, time, n_history=1, time_step=datetime.timedelta(hours=6)) -> Field:
        f = load_forecast(self.path)
        f = f.sel(channel=self.channel_names)
        n = min(n_history, f.sizes["time"])
        return f.isel(time=list(range(f.sizes["time"] - n, f.sizes["time"])))


#: rough climatological (mean, std) per variable code for synthetic ICs
_CLIMATOLOGY = {
    "z": (1.0e5, 1.2e5), "q": (3e-3, 4e-3), "t": (250.0, 30.0),
    "u": (5.0, 12.0), "v": (0.0, 8.0), "w": (0.0, 0.3), "r": (50.0, 30.0),
    "t2m": (285.0, 15.0), "u10m": (0.0, 6.0), "v10m": (0.0, 5.0),
    "u100m": (0.0, 7.0), "v100m": (0.0, 6.0), "msl": (1.013e5, 1.3e3),
    "sp": (9.8e4, 7e3), "tcwv": (25.0, 17.0), "tp": (1e-4, 5e-4),
    "tp06": (5e-4, 2e-3), "d2m": (280.0, 15.0),
}  # fmt: skip


def climatology_stats(channel_name: str) -> tuple[float, float]:
    """Rough climatological (mean, std) for one channel, level-adjusted.

    Shared by SyntheticSource (IC generation) and the stability harness
    (utils/stability.py), which sets model normalization stats to the
    SAME climatology so a synthetic IC enters the net as ~N(0,1) — the
    offline analog of a trained artifact's bundled stats.
    """
    import re as _re

    if _re.fullmatch(r"c\d+", channel_name):
        # reduced test configs use placeholder channel names (cNN);
        # standard normal is the right synthetic climatology for them.
        # Anything ELSE unparseable still raises loudly — a malformed
        # real channel must not silently get N(0,1) stats.
        return 0.0, 1.0
    c = parse_channel(channel_name)
    mean, std = _CLIMATOLOGY.get(c.var, (0.0, 1.0))
    if c.level is not None:
        # scale aloft: geopotential grows, temperature falls
        frac = c.level / 1000.0
        if c.var == "z":
            mean = 1.0e5 * (1.05 - frac)
        elif c.var == "t":
            mean = 210.0 + 80.0 * frac
        elif c.var == "q":
            mean = 5e-3 * frac**2
    return mean, std


class SyntheticSource(ICSource):
    """Smooth random fields with per-variable climatological scales.

    Deterministic in (time, channel): the same request reproduces the
    same IC — useful for offline demos and hermetic tests.
    """

    name = "synthetic"

    def fetch(self, time, n_history=1, time_step=datetime.timedelta(hours=6)) -> Field:
        H, W = self.grid.shape
        times = [time - (n_history - 1 - i) * time_step for i in range(n_history)]
        data = np.empty((n_history, len(self.channel_names), H, W), np.float32)
        lat = np.deg2rad(self.grid.lat)[:, None]
        lon = np.deg2rad(self.grid.lon)[None, :]
        for ti, t in enumerate(times):
            for ci, name in enumerate(self.channel_names):
                mean, std = climatology_stats(name)
                rng = np.random.default_rng(
                    abs(hash((int(t.timestamp()), name))) % (2**32)
                )
                k1, k2 = rng.uniform(1, 4, 2)
                p1, p2 = rng.uniform(0, 2 * np.pi, 2)
                fld = (
                    np.sin(k1 * lon + p1) * np.cos(lat) ** 2
                    + 0.5 * np.cos(k2 * lon + p2) * np.sin(2 * lat)
                )
                noise = rng.normal(0, 0.15, (H, W))
                data[ti, ci] = mean + std * (fld + noise)
        return Field.from_canonical(
            data, times, self.channel_names, self.grid.lat, self.grid.lon,
            attrs={"source": self.name},
        )


def get_data_source(
    channel_names: Sequence[str],
    initial_condition_source: str = "gfs",
    **kwargs,
) -> ICSource:
    """Source dispatch (reference ic/__init__.py:25-34 + fuxi.py:56-62)."""
    src = initial_condition_source.lower()
    if src == "synthetic":
        return SyntheticSource(channel_names, **kwargs)
    if src == "file" or src.startswith("file:"):
        path = kwargs.pop("path", None) or initial_condition_source.partition(":")[2]
        if not path:
            raise ValueError("file source needs a path: ic_source='file:/path'")
        return FileSource(channel_names, path, **kwargs)
    if src == "gfs":
        from skyrim_tpu.data.gfs import GFSSource

        return GFSSource(channel_names, **kwargs)
    if src == "ifs":
        from skyrim_tpu.data.ifs import IFSSource

        return IFSSource(channel_names, **kwargs)
    if src == "ens":
        from skyrim_tpu.data.ens import ENSSource

        return ENSSource(channel_names, **kwargs)
    if src == "cds":
        from skyrim_tpu.data.cds import CDSSource

        return CDSSource(channel_names, **kwargs)
    raise ValueError(f"unknown IC source {initial_condition_source!r}")


def get_ic(
    channels: Sequence[str],
    start_time: datetime.datetime,
    ic_source: str = "ifs",
) -> Field:
    """Model-free IC fetch on the canonical grid (fixes the reference's
    argument-ignoring defect, ic/__init__.py:37-52)."""
    source = get_data_source(channels, ic_source)
    logger.info("fetching IC %s @ %s", ic_source, start_time)
    return source.fetch(start_time)
