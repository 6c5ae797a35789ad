"""Pallas TPU kernel: dense bilinear warp (the flow hot path).

TPUs have no hardware gather; XLA lowers the per-pixel bilinear gather
of a warp to scalarised loads that run ~100x off memory speed-of-light
(measured: 123ms for a (64,224,224,5) warp — the single dominant cost
of both Farneback's matrix update and TV-L1's warp step, SURVEY.md §7
hard-part #1).

Kernel strategy — *banded masked shift-accumulate*, one axis at a time:
displacements are clamped to a static band [-R, R]; the kernel sweeps
the band in 8-aligned chunks (Mosaic requires 8-aligned dynamic sublane
slices), merging the source shifted by d into two accumulators under
the per-pixel masks ``off == d`` / ``off == d-1``, then lerps them with
the fractional part — i.e. a full 1D linear resample per axis, entirely
in VMEM.  The 2D warp is two such passes with an XLA transpose between
(the lane-dim sweep is illegal in Mosaic, and keeping the kernel
single-axis compiles far faster than one fused two-pass kernel).

Semantics: exact per axis.  The horizontal pass samples the vertically
resampled plane at the target pixel's x0, so the composite equals the
true bilinear sample wherever the flow's vertical component is locally
smooth over the horizontal band — which TV-regularised / box-blurred
flow is; end-to-end cv2 parity with this kernel enabled is gated in
tests/test_farneback.py (relL2 identical to the exact gather).  Band
overflow clamps (|flow| > 20px is clipped by the two-stream storage
convention anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_analytics_tpu.utils.platform import pallas_interpret

DEFAULT_BAND = 32


def _axis_kernel(src_ref, off_ref, frac_ref, out_ref, pad_ref, *, r: int):
    """1D banded resample along the sublane axis of one (C, N, M) block:
    out[c, i, j] = src[c, i+off, j]*(1-frac) + src[c, i+off+1, j]*frac."""
    C, N, M = src_ref.shape
    pad_rows = pad_ref.shape[1]
    src = src_ref[:]
    pad_ref[:, r:r + N, :] = src
    pad_ref[:, :r, :] = jnp.broadcast_to(src[:, :1, :], (C, r, M))
    pad_ref[:, r + N:, :] = jnp.broadcast_to(
        src[:, N - 1:, :], (C, pad_rows - r - N, M))

    off = off_ref[:]
    frac = frac_ref[:][None]
    n_chunks = pl.cdiv(2 * r + 2, 8)

    def body(c, carry):
        acc0, acc1 = carry
        base = pl.multiple_of(c * 8, 8)
        block = pad_ref[:, pl.ds(base, N + 8), :]
        for j in range(8):
            d = base + j - r
            shifted = block[:, j:j + N, :]
            acc0 = jnp.where((off == d)[None], shifted, acc0)
            acc1 = jnp.where((off == d - 1)[None], shifted, acc1)
        return acc0, acc1

    zeros = jnp.zeros((C, N, M), jnp.float32)
    acc0, acc1 = jax.lax.fori_loop(0, n_chunks, body, (zeros, zeros))
    out_ref[:] = acc0 * (1.0 - frac) + acc1 * frac


def _axis_warp(src: jax.Array, off: jax.Array, frac: jax.Array,
               r: int) -> jax.Array:
    """(B, C, N, M) banded 1D resample along axis 2."""
    B, C, N, M = src.shape
    return pl.pallas_call(
        functools.partial(_axis_kernel, r=r),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, C, N, M), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, N, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, N, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, C, N, M), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, N, M), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, N + 2 * r + 16, M), jnp.float32),
        ],
        interpret=pallas_interpret(),
    )(src, off, frac)


@functools.partial(jax.jit, static_argnames=("r",))
def pallas_warp(img: jax.Array, flow: jax.Array,
                r: int = DEFAULT_BAND) -> jax.Array:
    """Bilinear warp of (B, H, W, C) by flow (B, H, W, 2):
    out(p) = img(p + flow(p)), clamped borders, |flow| clamped to ±r.

    Drop-in for ops.kernels.warp_by_flow on the flow hot path.  VMEM
    bounds the per-image block (see warp_fits_vmem); callers fall back
    to the exact XLA gather beyond that."""
    B, H, W, C = img.shape
    r = max(1, min(r, H - 2, W - 2))
    img_cf = img.astype(jnp.float32).transpose(0, 3, 1, 2)  # (B, C, H, W)

    yy = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 2)
    ys = jnp.clip(yy + flow[..., 1], 0.0, H - 1.0)
    xs = jnp.clip(xx + flow[..., 0], 0.0, W - 1.0)
    y0 = jnp.clip(jnp.floor(ys), 0.0, H - 2.0)
    x0 = jnp.clip(jnp.floor(xs), 0.0, W - 2.0)
    fy = ys - y0
    fx = xs - x0
    dy_off = jnp.clip(y0 - yy, -r, r).astype(jnp.int32)
    dx_off = jnp.clip(x0 - xx, -r, r).astype(jnp.int32)

    mid = _axis_warp(img_cf, dy_off, fy, r)              # rows resolved
    midT = mid.transpose(0, 1, 3, 2)                     # (B, C, W, H)
    outT = _axis_warp(midT, dx_off.transpose(0, 2, 1),
                      fx.transpose(0, 2, 1), r)
    return outT.transpose(0, 3, 2, 1)                    # (B, H, W, C)


def warp_fits_vmem(h: int, w: int, c: int, r: int = DEFAULT_BAND) -> bool:
    """Conservative check that the kernel's VMEM working set fits
    (per-axis pass working set: pad + in/out blocks + accumulators)."""
    r = max(1, min(r, h - 2, w - 2))
    n = max(h, w)
    m = max(h, w)
    floats = (c * (n + 2 * r + 16) * m     # pad scratch
              + 2 * c * n * m              # in/out blocks
              + 2 * c * n * m              # fori accumulators
              + 3 * n * m)                 # off/frac/masks
    return floats * 4 < 13 * 1024 * 1024
