"""Training dataset over the CDS dataset-factory layout.

The reference reserved ``FineTuneDataset`` as an unimplemented stub
(skyrim/libs/finetune/__init__.py:1-13); this makes it real.  Reads the
per-slice NetCDFs + ``metadata.json`` written by
``CDS.create_dataset`` (data/cds.py) and yields (x, y) training pairs:
x = ``n_history`` consecutive frames, y = the next ``frames_out``.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from skyrim_tpu.io.netcdf import read_netcdf


class FineTuneDataset:
    def __init__(
        self,
        root: str | Path,
        n_history: int = 1,
        frames_out: int = 1,
        channels: list[str] | None = None,
    ):
        self.root = Path(root)
        meta_path = self.root / "metadata.json"
        if not meta_path.exists():
            raise FileNotFoundError(f"no metadata.json under {self.root}")
        self.meta = json.loads(meta_path.read_text())
        self.n_history = n_history
        self.frames_out = frames_out
        self.channels = channels or self.meta["channels"]
        # memory-map style index: (file, start_frame) pairs
        self._index: list[tuple[str, int]] = []
        self._cache: dict[str, np.ndarray] = {}
        window = n_history + frames_out
        for fname in self.meta["files"]:
            n_frames = self._load(fname).shape[0]
            for s in range(0, n_frames - window + 1):
                self._index.append((fname, s))

    def _load(self, fname: str) -> np.ndarray:
        if fname not in self._cache:
            field = read_netcdf(self.root / fname)
            field = field.sel(channel=self.channels)
            self._cache[fname] = field.data.astype(np.float32)
        return self._cache[fname]

    def __len__(self) -> int:
        return len(self._index)

    def __getitem__(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        fname, s = self._index[i]
        data = self._load(fname)
        x = data[s : s + self.n_history]
        y = data[s + self.n_history : s + self.n_history + self.frames_out]
        return x, y

    def batches(self, batch_size: int, rng: np.random.Generator | None = None):
        """Shuffled minibatch iterator → (B, hist, C, H, W), (B, out, C, H, W)."""
        order = np.arange(len(self))
        if rng is not None:
            rng.shuffle(order)
        for ofs in range(0, len(order) - batch_size + 1, batch_size):
            idx = order[ofs : ofs + batch_size]
            xs, ys = zip(*(self[i] for i in idx))
            yield np.stack(xs), np.stack(ys)

    def normalization_stats(self) -> tuple[np.ndarray, np.ndarray]:
        """Per-channel (mean, std) across the whole dataset."""
        total, total2, count = 0.0, 0.0, 0
        for fname in self.meta["files"]:
            d = self._load(fname)
            total = total + d.sum(axis=(0, 2, 3))
            total2 = total2 + (d.astype(np.float64) ** 2).sum(axis=(0, 2, 3))
            count += d.shape[0] * d.shape[2] * d.shape[3]
        mean = total / count
        std = np.sqrt(np.maximum(total2 / count - mean**2, 1e-12))
        return mean.astype(np.float32), std.astype(np.float32)
