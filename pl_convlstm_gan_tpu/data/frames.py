"""On-disk frame-sequence dataset for the forecaster/GAN families.

The reference's only data path is the Fenhe downscaling loader; the sequence
families (nowcasting, BASELINE.json configs #1-#5) trained on synthetic data in
round 1. This adds the bring-your-own-data path: a single ``.npy``/``.npz``
stack of frame sequences (e.g. exported radar/video windows) — ``.npy``
memory-mapped on host, ``.npz`` decompressed eagerly — windowed into
(input, target) pairs: the production entry for real nowcasting datasets
(HKO-7/SEVIR-style exports).

Accepted layouts (auto-detected):
- ``[N, T, H, W]``    — N sequences of T single-channel frames
- ``[N, T, C, H, W]`` — explicit channel dim
- ``[T, H, W]``       — one long movie; windows are cut with a stride

Values are used as-is (normalize on export, or pass ``scale``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


class NpyFramesDataset:
    """item = (inputs [T_in, C, H, W] f32, targets [T_out, C, H, W] f32)."""

    def __init__(self, path: str, input_frames: int, output_frames: int,
                 stride: Optional[int] = None, scale: float = 1.0,
                 key: str = "frames", mmap: bool = True):
        self.t_in = input_frames
        self.t_out = output_frames
        self.scale = float(scale)
        total = input_frames + output_frames
        if path.endswith(".npz"):
            # npz entries are decompressed eagerly (no mmap possible for
            # zipped arrays); close the archive handle after extraction
            with np.load(path) as zf:
                arr = np.asarray(zf[key])
        else:
            arr = np.load(path, mmap_mode="r" if mmap else None)

        if arr.ndim == 3:            # one long movie [T, H, W]
            self._movie = arr
            self._stride = stride or total
            n_windows = (arr.shape[0] - total) // self._stride + 1
            if n_windows <= 0:
                raise ValueError(
                    f"movie of {arr.shape[0]} frames too short for "
                    f"{total}-frame windows")
            self._n = n_windows
        elif arr.ndim in (4, 5):     # [N, T(, C), H, W]
            if arr.shape[1] < total:
                raise ValueError(
                    f"sequences have {arr.shape[1]} frames, need >= {total}")
            self._movie = None
            self._seqs = arr
            self._n = arr.shape[0]
        else:
            raise ValueError(f"unsupported frame array rank {arr.ndim} "
                             f"(shape {arr.shape})")

    def __len__(self) -> int:
        return self._n

    def _window(self, idx: int) -> np.ndarray:
        total = self.t_in + self.t_out
        if self._movie is not None:
            start = idx * self._stride
            w = self._movie[start:start + total]          # [T, H, W]
            return np.asarray(w)[:, None]                 # [T, 1, H, W]
        w = np.asarray(self._seqs[idx, :total])
        if w.ndim == 3:                                   # [T, H, W]
            w = w[:, None]
        return w                                          # [T, C, H, W]

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        w = self._window(int(idx)).astype(np.float32)
        if self.scale != 1.0:
            w = w * self.scale
        return w[:self.t_in], w[self.t_in:]
