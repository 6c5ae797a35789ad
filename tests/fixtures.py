"""Synthetic test data: band-limited frame pairs with known motion and
moving-square clips (SURVEY.md §4.3 pipeline integration fixtures)."""

from __future__ import annotations

from typing import List, Tuple

import cv2
import numpy as np


def smooth_image(rng: np.random.Generator, h: int, w: int,
                 blur: int = 15, pad: int = 16) -> np.ndarray:
    """Band-limited random gray image in [0, 255] float32, padded region
    included so shifted crops stay in-bounds."""
    img = rng.uniform(0, 255, (h + 2 * pad, w + 2 * pad)).astype(np.float32)
    img = cv2.GaussianBlur(img, (blur, blur), 0)
    # Re-stretch contrast after blurring.
    img = (img - img.min()) / max(np.ptp(img), 1e-6) * 255.0
    return img


def smooth_pair(rng: np.random.Generator, h: int, w: int,
                dx: float, dy: float) -> Tuple[np.ndarray, np.ndarray]:
    """Two crops of one smooth image displaced by (dx, dy): frame2 is
    frame1 translated by (+dx, +dy), so flow(frame1→frame2) ≈ (-dx, -dy)
    ... with OpenCV's convention flow maps I1 coords into I2:
    I1(p) ≈ I2(p + flow(p)), so expected flow = (-dx, -dy)."""
    pad = 16
    big = smooth_image(rng, h, w, pad=pad)
    m = np.float32([[1, 0, 0], [0, 1, 0]])
    f1 = cv2.warpAffine(big, m, (big.shape[1], big.shape[0]))
    m2 = np.float32([[1, 0, dx], [0, 1, dy]])
    f2 = cv2.warpAffine(big, m2, (big.shape[1], big.shape[0]),
                        flags=cv2.INTER_CUBIC)
    f1 = f1[pad:pad + h, pad:pad + w]
    f2 = f2[pad:pad + h, pad:pad + w]
    return np.ascontiguousarray(f1), np.ascontiguousarray(f2)


def moving_square_frames(num: int, h: int, w: int,
                         step: Tuple[int, int] = (2, 1),
                         size: int = 24,
                         start: Tuple[int, int] = (10, 10),
                         seed: int = 42) -> List[np.ndarray]:
    """RGB frames of a textured square translating at `step` px/frame
    over a static textured background — known ground-truth motion."""
    rng = np.random.default_rng(seed)
    bg = rng.integers(40, 90, (h, w, 3), dtype=np.uint8)
    bg = cv2.GaussianBlur(bg, (7, 7), 0)
    tex = rng.integers(120, 255, (size, size, 3), dtype=np.uint8)
    frames = []
    x0, y0 = start
    for t in range(num):
        f = bg.copy()
        x = int(np.clip(x0 + t * step[0], 0, w - size))
        y = int(np.clip(y0 + t * step[1], 0, h - size))
        f[y:y + size, x:x + size] = tex
        frames.append(f)
    return frames


def gray(frames: np.ndarray) -> np.ndarray:
    """(T,H,W,3) uint8 RGB → (T,H,W) float32 gray via cv2 weights."""
    return np.stack([
        cv2.cvtColor(f, cv2.COLOR_RGB2GRAY).astype(np.float32)
        for f in frames])
