"""Sliding-window clip batching (BASELINE.json config #5).

Long/variable-length clips meet XLA's static shapes here: the frame
sequence is windowed on host into fixed (window, H, W, 3) chunks which
shard cleanly over the mesh 'data' axis.  Temporal pooling is an
associative mean, so per-window results reduce exactly to the clip
result via streamed partial sums (SURVEY.md §5 long-context analogue).
"""

from __future__ import annotations

from typing import Iterator, List, Optional

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


def host_normalize_square(frames: np.ndarray, short: int,
                          crop: Optional[int] = None) -> np.ndarray:
    """(T, H, W, 3) uint8 → (T, short, short, 3): resize the short side
    to `short` (up OR down, cv2 INTER_LINEAR — device-resize parity)
    and centre-crop the long side to `short`.

    This is the serving-process shape normaliser: heterogeneous input
    resolutions all map to ONE static shape, so the long-running server
    compiles a single executable (runtime/serve.py).

    `crop` is the crop size the DEVICE pipeline will subsequently take
    (preprocess.resize_short_center_crop): with it, this function's
    offset is derived as (device offset on the raw resize) − (device
    offset on the short×short result), so the two centre crops compose
    EXACTLY for every geometry.  Both sides use banker's
    int(round(...)), under which the naive round((long−short)/2) can
    land 1px off the direct path for some parities of (long−short,
    short−crop) — e.g. long−short odd with (short−crop)/2 odd.
    Without `crop` the naive centred offset is used (≤1px shift).  The
    only numerics delta vs the raw path is the uint8 rounding at this
    intermediate, same as the host_resize_short lever evaluate_batched
    already uses."""
    import cv2
    h, w = frames.shape[1:3]
    if h <= w:
        nh, nw = short, max(short, int(round(w * short / h)))
    else:
        nh, nw = max(short, int(round(h * short / w))), short
    if (nh, nw) != (h, w):
        frames = np.stack([
            cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LINEAR)
            for f in frames])

    def offset(long_side: int) -> int:
        if crop is not None:
            o = (int(round((long_side - crop) / 2.0))
                 - int(round((short - crop) / 2.0)))
        else:
            o = int(round((long_side - short) / 2.0))
        return min(max(o, 0), long_side - short)

    top, left = offset(nh), offset(nw)
    return frames[:, top:top + short, left:left + short]


def slice_crop_source(frames: np.ndarray, short: int, crop: int):
    """Transport crop: slice (..., H, W, 3) frames to the EXACT source
    window the fused device resize+center-crop samples, before
    `device_put`.

    The device's resize_short_center_crop slices its input to the span
    the cropped output reads anyway (ops.preprocess.crop_source_geometry)
    — doing that same integer slice on the host moves the cut to the
    host→HBM boundary: only the consumed bytes cross the (bandwidth-
    bound) transport, and the result is BIT-IDENTICAL because the device
    is handed the same window and applies the same fractional offsets
    (pass the returned (H, W) as PreprocessConfig.src_hw).

    ~0.59x transport at 320×240→256-short→224², ~0.57x at 1080p;
    composes with host_resize_short (slice AFTER resizing, with the
    resized (H, W) as src_hw).

    Returns ``(sliced, (H, W))``.
    """
    from video_analytics_tpu.ops.preprocess import crop_source_geometry
    h, w = frames.shape[-3], frames.shape[-2]
    (r0, r1, c0, c1), _, _ = crop_source_geometry(h, w, short, crop)
    return np.ascontiguousarray(frames[..., r0:r1, c0:c1, :]), (h, w)


def apply_transport_crop(frames: np.ndarray, cfg):
    """Guard + apply the transport crop in one step: slice `frames`
    (..., H, W, 3) to the source window the fused device resize+crop
    samples (slice_crop_source) and return ``(frames, cfg')`` with
    ``cfg'.preprocess.src_hw`` recording the pre-slice geometry so the
    device path skips its own slice.  No-op — returns the inputs
    unchanged — when the pipeline random-crops (training needs the full
    frame) or a src_hw is already recorded (someone upstream already
    cropped).  One helper so every serving/eval/CLI call site shares
    the guard and the geometry plumbing."""
    pp = cfg.preprocess
    if pp.random_crop or pp.src_hw is not None:
        return frames, cfg
    import dataclasses
    frames, hw = slice_crop_source(frames, pp.resize_short, pp.crop)
    return frames, dataclasses.replace(
        cfg, preprocess=dataclasses.replace(pp, src_hw=hw))


def host_resize_short(frames: np.ndarray, short: int) -> np.ndarray:
    """(T, H, W, 3) uint8 → short side == `short` via cv2 on host.

    Bandwidth lever for high-resolution streams: the pipeline only ever
    consumes resize_short-resolution pixels, so resizing BEFORE the
    host→HBM transfer cuts the transfer ~ (H/short)² (e.g. 17x for
    1080p → 256) at the cost of host CPU the decode thread already
    owns.  Semantics match the on-device resize_short_side (cv2
    INTER_LINEAR, half-pixel centers), so downstream device-side
    resize is a no-op and crops are unchanged.
    """
    import cv2
    h, w = frames.shape[1:3]
    if min(h, w) <= short:
        return frames
    if h <= w:
        nh, nw = short, max(1, int(round(w * short / h)))
    else:
        nh, nw = max(1, int(round(h * short / w))), short
    return np.stack([
        cv2.resize(f, (nw, nh), interpolation=cv2.INTER_LINEAR)
        for f in frames])
