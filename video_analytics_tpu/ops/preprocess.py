"""Fused on-device preprocessing: resize → crop → normalize → stack.

The reference pipeline does these as separate host-side numpy/cv2/
torchvision transforms between filesystem stages; here they are jitted
into ONE XLA program (NHWC, channels-last — the TPU-native layout) that
runs where the data already lives (HBM) and fuses with the downstream
CNN (SURVEY.md §2b #1).

Numerics are matched to the oracles used by the tests:
- resize: bilinear with half-pixel centers and no antialiasing —
  cv2.resize(INTER_LINEAR) semantics;
- center crop: torchvision's rounding, top = round((H - c)/2);
- normalize: x/255 → (x - mean)/std with ImageNet statistics.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from video_analytics_tpu.config import PreprocessConfig


def resize_bilinear(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize of (..., H, W, C) to (..., h, w, C).

    cv2.INTER_LINEAR parity: half-pixel centers, no antialias.
    """
    *lead, h, w, c = x.shape
    out = jax.image.resize(
        x.astype(jnp.float32),
        (*lead, out_hw[0], out_hw[1], c),
        method="linear",
        antialias=False,
    )
    return out


def resize_short_side(x: jax.Array, short: int) -> jax.Array:
    """Resize (..., H, W, C) so the short side equals `short`, keeping
    aspect (torchvision Resize(int) semantics; shapes resolved at trace
    time so each distinct input size compiles once)."""
    h, w = x.shape[-3], x.shape[-2]
    if h <= w:
        out_hw = (short, max(1, int(round(w * short / h))))
    else:
        out_hw = (max(1, int(round(h * short / w))), short)
    return resize_bilinear(x, out_hw)


def crop_source_geometry(h: int, w: int, short: int, crop: int):
    """Geometry of the fused ``center_crop(resize_short(x), crop)``:
    the (row, col) source window the cropped output actually samples,
    plus the scale/translate that aligns the fractional offset on the
    sliced window.

    Returns ``((r0, r1, c0, c1), (sh, th), (sw, tw))`` — slice bounds
    into the ORIGINAL (h, w) image and the per-axis
    ``jax.image.scale_and_translate`` arguments valid for the slice.
    Shared by the device path (resize_short_center_crop) and the host
    transport-crop (ingest.slice_crop_source): slicing on either side
    of the host→HBM boundary is bit-identical because both use exactly
    this window and offset.
    """
    import math
    if h <= w:
        rh, rw = short, max(1, int(round(w * short / h)))
    else:
        rh, rw = max(1, int(round(h * short / w))), short
    if rh < crop or rw < crop:
        raise ValueError(f"cannot center-crop {crop} from {(rh, rw)}")
    top = int(round((rh - crop) / 2.0))
    left = int(round((rw - crop) / 2.0))

    def axis_window(n_in: int, n_out: int, off: int):
        k = n_in / n_out
        lo = (off + 0.5) * k - 0.5
        hi = (off + crop - 0.5) * k - 0.5
        s0 = max(0, math.floor(lo))
        s1 = min(n_in, math.ceil(hi) + 2)
        # translation per jax's convention: in = (o+0.5)/s - t/s - 0.5
        t = -(1.0 / k) * (off * k - s0)
        return s0, s1, 1.0 / k, t

    r0, r1, sh, th = axis_window(h, rh, top)
    c0, c1, sw, tw = axis_window(w, rw, left)
    return (r0, r1, c0, c1), (sh, th), (sw, tw)


def resize_short_center_crop(x: jax.Array, short: int, crop: int,
                             src_hw: Optional[Tuple[int, int]] = None
                             ) -> jax.Array:
    """Fused ``center_crop(resize_short_side(x, short), crop)``.

    Same sample positions (half-pixel-center bilinear, no antialias),
    but the resize only computes the region the crop keeps: the input
    is sliced to the span the cropped output actually samples and
    ``jax.image.scale_and_translate`` aligns the fractional offset.
    At 1080p → 256-short → 224² this removes ~57% of the resize work,
    which profiling showed was ~a third of the sustained-1080p device
    time.  Matches the two-op chain to ~1e-3 absolute on [0, 255]
    pixels (weight-computation fp noise only; equivalence test gated).

    ``src_hw=(H, W)``: `x` is ALREADY the host-sliced source window of
    an (H, W) image (ingest.slice_crop_source) — skip the device slice
    and use the same fractional offsets.  Bit-identical to passing the
    full frame: both paths hand scale_and_translate the same operand
    and arguments (transport crop, config.PreprocessConfig.src_hw).
    """
    if src_hw is not None:
        h, w = src_hw
    else:
        h, w = x.shape[-3], x.shape[-2]
    (r0, r1, c0, c1), (sh, th), (sw, tw) = crop_source_geometry(
        h, w, short, crop)
    if src_hw is not None:
        if x.shape[-3] != r1 - r0 or x.shape[-2] != c1 - c0:
            raise ValueError(
                f"src_hw={src_hw} expects a pre-sliced "
                f"{(r1 - r0, c1 - c0)} window, got {x.shape[-3:-1]}")
        sl = x.astype(jnp.float32)
    else:
        sl = x[..., r0:r1, c0:c1, :].astype(jnp.float32)
    out_shape = (*x.shape[:-3], crop, crop, x.shape[-1])
    return jax.image.scale_and_translate(
        sl, out_shape, (x.ndim - 3, x.ndim - 2),
        jnp.asarray([sh, sw]), jnp.asarray([th, tw]),
        "linear", antialias=False)


def center_crop(x: jax.Array, crop: int) -> jax.Array:
    h, w = x.shape[-3], x.shape[-2]
    if h < crop or w < crop:
        raise ValueError(f"cannot center-crop {crop} from {(h, w)}")
    top = int(round((h - crop) / 2.0))
    left = int(round((w - crop) / 2.0))
    return x[..., top:top + crop, left:left + crop, :]


def random_crop_flip(x: jax.Array, crop: int, key: jax.Array,
                     flip: bool = True) -> jax.Array:
    """Random spatial crop (one offset per call, shared across the clip
    so temporal coherence is preserved) + optional horizontal flip."""
    h, w = x.shape[-3], x.shape[-2]
    k1, k2, k3 = jax.random.split(key, 3)
    top = jax.random.randint(k1, (), 0, h - crop + 1)
    left = jax.random.randint(k2, (), 0, w - crop + 1)
    start = [0] * (x.ndim - 3) + [top, left, 0]
    sizes = list(x.shape[:-3]) + [crop, crop, x.shape[-1]]
    out = jax.lax.dynamic_slice(x, start, sizes)
    if flip:
        do_flip = jax.random.bernoulli(k3)
        out = jax.lax.cond(do_flip, lambda v: jnp.flip(v, axis=-2),
                           lambda v: v, out)
    return out


def normalize(x: jax.Array, mean, std) -> jax.Array:
    """uint8/float [0,255] (..., C) → ImageNet-normalized float32."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x.astype(jnp.float32) / 255.0 - mean) / std


def preprocess_clip(frames: jax.Array, cfg: PreprocessConfig,
                    key: Optional[jax.Array] = None) -> jax.Array:
    """(T, H, W, 3) uint8 RGB → (T, crop, crop, 3) normalized float32.

    The whole chain traces into one XLA program; under jit it fuses
    with whatever consumes it (the CNN stem).
    """
    if cfg.random_crop:
        if key is None:
            raise ValueError("random_crop requires a PRNG key")
        x = resize_short_side(frames, cfg.resize_short)
        x = random_crop_flip(x, cfg.crop, key, flip=cfg.random_flip)
    else:
        x = resize_short_center_crop(frames, cfg.resize_short, cfg.crop,
                                     src_hw=cfg.src_hw)
    return normalize(x, cfg.mean, cfg.std)


@functools.partial(jax.jit, static_argnames=("cfg",))
def preprocess_clip_jit(frames: jax.Array, cfg: PreprocessConfig) -> jax.Array:
    return preprocess_clip(frames, cfg)


def rgb_to_gray(frames: jax.Array) -> jax.Array:
    """(..., 3) RGB → (...,) gray float32 with cv2's BT.601 weights —
    flow oracles (cv2) consume exactly this."""
    w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
    return jnp.tensordot(frames.astype(jnp.float32), w, axes=[[-1], [0]])


def stack_flow_windows(flow: jax.Array, stack: int,
                       stride: int = 1) -> jax.Array:
    """(T-1, H, W, 2) flow fields → (N, H, W, 2*stack) stacked windows.

    The flow-stream CNN consumes `stack` consecutive (u, v) fields as
    2*stack input channels (classic two-stream input).  Windows start
    at multiples of `stride`.
    """
    t = flow.shape[0]
    if t < stack:
        raise ValueError(f"need >= {stack} flow fields, got {t}")
    starts = list(range(0, t - stack + 1, stride))
    wins = jnp.stack([
        jnp.concatenate(
            [flow[s + i] for i in range(stack)], axis=-1)
        for s in starts])
    return wins


def normalize_flow_stack(x: jax.Array, bound: float = 20.0) -> jax.Array:
    """Clip flow to ±bound and scale to [-1, 1] — the dequantized-uint8
    convention the flow stream is trained on."""
    return jnp.clip(x, -bound, bound) / bound


def stacked_flow_input(flow: jax.Array, stack: int,
                       bound: float = 20.0, dtype=None,
                       stride: int = 1) -> jax.Array:
    """``normalize_flow_stack(stack_flow_windows(flow, stack), bound)``
    with the elementwise clip/scale — and the CNN's dtype cast, when
    `dtype` is given — hoisted BEFORE the stacking.

    Stacking amplifies data ~stack/stride× (stride-1 windows share
    frames), so normalizing 63 (H, W, 2) fields and stacking bf16 moves
    a fraction of the bytes of stacking f32 then normalizing/casting
    54 (H, W, 2·stack) windows.  Bitwise-identical at the CNN input:
    clip/scale is per-element with constants (commutes with the copy),
    and the CNN's ``x.astype(self.dtype)`` is a no-op on an input
    already cast.  Measured r3: the headline 64-frame fused pipeline
    spent ~2.5ms/call in the stack+normalize+convert chain."""
    f = normalize_flow_stack(flow, bound)
    if dtype is not None:
        f = f.astype(dtype)
    return stack_flow_windows(f, stack, stride)
