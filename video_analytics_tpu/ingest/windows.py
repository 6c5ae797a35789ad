"""Sliding-window clip batching (BASELINE.json config #5).

Long/variable-length clips meet XLA's static shapes here: the frame
sequence is windowed on host into fixed (window, H, W, 3) chunks which
shard cleanly over the mesh 'data' axis.  Temporal pooling is an
associative mean, so per-window results reduce exactly to the clip
result via streamed partial sums (SURVEY.md §5 long-context analogue).
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np


def window_starts(num_frames: int, window: int, stride: int) -> List[int]:
    """Start indices covering the clip; always at least one window, and
    the tail is covered by a final (possibly overlapping) window."""
    if num_frames <= window:
        return [0]
    starts = list(range(0, num_frames - window + 1, stride))
    last = num_frames - window
    if starts[-1] != last:
        starts.append(last)
    return starts


def sliding_windows(frames: np.ndarray, window: int,
                    stride: int) -> Iterator[np.ndarray]:
    """(T, H, W, C) → fixed-shape (window, H, W, C) views; short clips
    are padded by repeating the last frame."""
    t = frames.shape[0]
    if t < window:
        pad = np.repeat(frames[-1:], window - t, axis=0)
        yield np.concatenate([frames, pad], axis=0)
        return
    for s in window_starts(t, window, stride):
        yield frames[s:s + window]
