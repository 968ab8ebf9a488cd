"""Synthetic data sources for benchmarking and tests.

Two families, matching the driver's benchmark configs (BASELINE.json):
- ``SyntheticDownscalingDataset`` — Fenhe-shaped items (rain windows + DEM + LUCC +
  stations) so the full downscaling/loss path runs without the real (absent) data.
  Mirrors the shapes of ``FenheDataset.__getitem__``
  (/root/reference/src/datasets/fenhe_dataset.py:198-218).
- ``SyntheticSequenceDataset`` — moving-blob video sequences (Moving-MNIST-style,
  configs #1-#3) for the forecaster/GAN families: [T, 1, H, W] frames in [0, 1].

Everything is generated once in numpy at construction (deterministic under seed) and
indexed as a map-style dataset."""
from __future__ import annotations

from typing import Tuple

import numpy as np


def _smooth_field(rng: np.random.Generator, shape: Tuple[int, ...],
                  blur: int = 3) -> np.ndarray:
    """Cheap smooth random field: white noise box-blurred a few times."""
    x = rng.random(shape).astype(np.float32)
    for _ in range(blur):
        for axis in (-2, -1):
            x = (np.roll(x, 1, axis) + x + np.roll(x, -1, axis)) / 3.0
    return x


class SyntheticDownscalingDataset:
    """Fenhe-shaped synthetic data: item = (x_lr [T,1,H,W], dem [1,Hs,Ws],
    lu [C,Hs,Ws], s_coords [N,2], s_vals [T,N])."""

    def __init__(self, num_days: int = 128, T: int = 5, lr_size: int = 16,
                 scale_factor: int = 8, num_stations: int = 16,
                 num_lu_classes: int = 5, seed: int = 0,
                 start_year: int = 2012, end_year: int = 2012):
        rng = np.random.default_rng(seed)
        self.T = T
        self.start_year = start_year
        self.end_year = end_year
        h = w = lr_size
        hs = ws = lr_size * scale_factor
        self.scale_factor = scale_factor

        # daily LR rain: smooth nonnegative fields with occasional heavy cells
        base = _smooth_field(rng, (num_days, h, w)) * 8.0
        heavy = (rng.random((num_days, h, w)) > 0.97) * rng.gamma(
            2.0, 15.0, (num_days, h, w))
        self.rain_lr = np.maximum(base + heavy, 0.0).astype(np.float32)

        self.dem_norm = _smooth_field(rng, (hs, ws), blur=6).astype(np.float32)
        lucc = rng.integers(1, num_lu_classes + 1, (hs, ws))
        self.lucc_onehot = np.stack(
            [(lucc == k).astype(np.float32) for k in range(1, num_lu_classes + 1)])
        self.is_multiyear_lucc = False

        self.s_coords = np.stack([rng.integers(0, h, num_stations),
                                  rng.integers(0, w, num_stations)],
                                 axis=1).astype(np.int64)
        # station obs = LR rain at the station cell + noise (learnable signal)
        at = self.rain_lr[:, self.s_coords[:, 0], self.s_coords[:, 1]]
        self.s_values = (at * rng.uniform(0.8, 1.2, at.shape)
                         ).astype(np.float32)                     # [num_days, N]

    @property
    def num_lu_classes(self) -> int:
        return self.lucc_onehot.shape[0]

    def __len__(self) -> int:
        return self.rain_lr.shape[0] - self.T

    def __getitem__(self, idx: int):
        x_lr = self.rain_lr[idx:idx + self.T][:, None]
        return (x_lr, self.dem_norm[None], self.lucc_onehot,
                self.s_coords.copy(), self.s_values[idx:idx + self.T])


class SyntheticSequenceDataset:
    """Moving-blob sequences: item = (input_frames [T_in,1,H,W],
    target_frames [T_out,1,H,W]), values in [0,1]."""

    def __init__(self, num_sequences: int = 256, input_frames: int = 5,
                 output_frames: int = 10, image_size: int = 64,
                 num_blobs: int = 3, seed: int = 0):
        self.num_sequences = num_sequences
        self.t_in = input_frames
        self.t_out = output_frames
        self.size = image_size
        self.num_blobs = num_blobs
        self.seed = seed
        yy, xx = np.mgrid[0:image_size, 0:image_size]
        self._yy = yy.astype(np.float32)
        self._xx = xx.astype(np.float32)

    def __len__(self) -> int:
        return self.num_sequences

    def _render(self, pos: np.ndarray, radius: np.ndarray) -> np.ndarray:
        frame = np.zeros((self.size, self.size), np.float32)
        for (py, px), r in zip(pos, radius):
            d2 = (self._yy - py) ** 2 + (self._xx - px) ** 2
            frame += np.exp(-d2 / (2 * r * r)).astype(np.float32)
        return np.clip(frame, 0.0, 1.0)

    def __getitem__(self, idx: int):
        rng = np.random.default_rng(self.seed * 1_000_003 + idx)
        total = self.t_in + self.t_out
        margin = max(2.0, self.size / 8.0)
        speed = max(0.5, self.size / 64.0)  # <= +-3 px/frame at 64px
        pos = rng.uniform(margin, self.size - margin,
                          (self.num_blobs, 2)).astype(np.float32)
        vel = rng.uniform(-3 * speed, 3 * speed,
                          (self.num_blobs, 2)).astype(np.float32)
        radius = rng.uniform(self.size / 20.0 + 1.0, self.size / 10.0 + 1.5,
                             self.num_blobs).astype(np.float32)
        frames = np.empty((total, 1, self.size, self.size), np.float32)
        lo, hi = margin / 2.0, self.size - margin / 2.0
        for t in range(total):
            frames[t, 0] = self._render(pos, radius)
            pos = pos + vel
            # bounce off edges
            for d in range(2):
                over = (pos[:, d] < lo) | (pos[:, d] > hi)
                vel[over, d] *= -1
            pos = np.clip(pos, lo, hi)
        return frames[:self.t_in], frames[self.t_in:]
