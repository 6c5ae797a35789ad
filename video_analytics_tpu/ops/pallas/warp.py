"""Pallas TPU kernel: dense bilinear warp (the flow hot path).

TPUs have no hardware gather; XLA lowers the per-pixel bilinear gather
of a warp to scalarised loads that run ~100x off memory speed-of-light
(measured: 123ms for a (64,224,224,5) warp — the single dominant cost
of both Farneback's matrix update and TV-L1's warp step, SURVEY.md §7
hard-part #1).

Kernel strategy — *banded masked shift-accumulate*, fully VMEM-resident:
displacements are clamped to a static band [-R, R]; a fori_loop sweeps
the band, reading the source shifted by dy (a dynamic sublane slice of
a pre-padded VMEM scratch) and merging it into two accumulator refs
under the masks ``floor(y+v)-y == dy`` / ``== dy-1``.  Mosaic only
allows dynamic slicing on the sublane dim, so the horizontal pass runs
in transposed space (VMEM transpose, sweep, transpose back).  Total:
2·(2R+2) VPU passes instead of per-pixel HBM gathers.

Semantics: exact per axis.  The horizontal pass samples the vertically
resampled plane at the target pixel's x0, so the composite equals the
true bilinear sample wherever the flow's vertical component is locally
smooth over the horizontal band — which TV-regularised / box-blurred
flow is; end-to-end cv2 parity with this kernel enabled is gated in
tests/test_farneback.py.  Displacements beyond the band are clamped
(|flow| > 20px is clipped by the two-stream storage convention anyway).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_analytics_tpu.utils.platform import pallas_interpret

DEFAULT_BAND = 32


def _band_sweep(src, off, pad_ref, acc0_ref, acc1_ref, r: int):
    """Gather rows: returns (g0, g1) with g0[., i, j] = src[., i+off, j]
    and g1 the off+1 row, off clamped to [-r, r]; src (C, N, M).

    Mosaic only allows 8-aligned dynamic sublane slices, so the sweep
    loops over 8-aligned bases and unrolls 8 static sub-offsets per
    iteration."""
    C, N, M = src.shape
    pad_rows = pad_ref.shape[1]
    pad_ref[:, r:r + N, :] = src
    pad_ref[:, :r, :] = jnp.broadcast_to(src[:, :1, :], (C, r, M))
    pad_ref[:, r + N:, :] = jnp.broadcast_to(
        src[:, N - 1:, :], (C, pad_rows - r - N, M))
    acc0_ref[:] = jnp.zeros((C, N, M), jnp.float32)
    acc1_ref[:] = jnp.zeros((C, N, M), jnp.float32)

    n_offsets = 2 * r + 2
    n_chunks = pl.cdiv(n_offsets, 8)

    def body(c, _):
        base = pl.multiple_of(c * 8, 8)
        block = pad_ref[:, pl.ds(base, N + 8), :]
        for j in range(8):
            d = base + j - r
            shifted = block[:, j:j + N, :]
            acc0_ref[:] = jnp.where((off == d)[None], shifted,
                                    acc0_ref[:])
            acc1_ref[:] = jnp.where((off == d - 1)[None], shifted,
                                    acc1_ref[:])
        return 0
    jax.lax.fori_loop(0, n_chunks, body, 0)
    return acc0_ref[:], acc1_ref[:]


def _warp_kernel(img_ref, u_ref, v_ref, out_ref,
                 padv_ref, a0_ref, a1_ref, padh_ref, b0_ref, b1_ref,
                 *, r: int):
    """One batch item: img (C, H, W), u/v (H, W) → out (C, H, W)."""
    C, H, W = img_ref.shape
    f32 = jnp.float32

    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(f32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1).astype(f32)
    ys = jnp.clip(yy + v_ref[:], 0.0, H - 1.0)
    xs = jnp.clip(xx + u_ref[:], 0.0, W - 1.0)
    y0 = jnp.clip(jnp.floor(ys), 0.0, H - 2.0)
    x0 = jnp.clip(jnp.floor(xs), 0.0, W - 2.0)
    fy = (ys - y0)[None]
    fx = (xs - x0)[None]
    dy_off = jnp.clip(y0 - yy, -r, r).astype(jnp.int32)
    dx_off = jnp.clip(x0 - xx, -r, r).astype(jnp.int32)

    # Vertical: rows y0 / y0+1, target-aligned.
    g0, g1 = _band_sweep(img_ref[:], dy_off, padv_ref, a0_ref, a1_ref, r)
    mid = g0 * (1.0 - fy) + g1 * fy                      # (C, H, W)

    # Horizontal: sweep in transposed space (dynamic slices must be on
    # the sublane dim).
    midT = jnp.transpose(mid, (0, 2, 1))                 # (C, W, H)
    dx_offT = jnp.transpose(dx_off, (1, 0))              # (W, H)
    h0T, h1T = _band_sweep(midT, dx_offT, padh_ref, b0_ref, b1_ref, r)
    h0 = jnp.transpose(h0T, (0, 2, 1))
    h1 = jnp.transpose(h1T, (0, 2, 1))
    out_ref[:] = h0 * (1.0 - fx) + h1 * fx


@functools.partial(jax.jit, static_argnames=("r",))
def pallas_warp(img: jax.Array, flow: jax.Array,
                r: int = DEFAULT_BAND) -> jax.Array:
    """Bilinear warp of (B, H, W, C) by flow (B, H, W, 2):
    out(p) = img(p + flow(p)), clamped borders, |flow| clamped to ±r.

    Drop-in for ops.kernels.warp_by_flow on the flow hot path.  VMEM
    bounds the per-image block: roughly H*W*C ≲ 400k f32 (5 channels at
    224–320px, 3 channels at 480px); callers fall back to the exact XLA
    gather beyond that (see warp_fits_vmem)."""
    B, H, W, C = img.shape
    r = max(1, min(r, H - 2, W - 2))
    img_cf = img.astype(jnp.float32).transpose(0, 3, 1, 2)  # (B, C, H, W)
    u = flow[..., 0].astype(jnp.float32)
    v = flow[..., 1].astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_warp_kernel, r=r),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, C, H, W), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, C, H, W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, H + 2 * r + 16, W), jnp.float32),  # padv
            pltpu.VMEM((C, H, W), jnp.float32),              # a0
            pltpu.VMEM((C, H, W), jnp.float32),              # a1
            pltpu.VMEM((C, W + 2 * r + 16, H), jnp.float32),  # padh
            pltpu.VMEM((C, W, H), jnp.float32),              # b0
            pltpu.VMEM((C, W, H), jnp.float32),              # b1
        ],
        interpret=pallas_interpret(),
    )(img_cf, u, v)
    return out.transpose(0, 2, 3, 1)


def warp_fits_vmem(h: int, w: int, c: int, r: int = DEFAULT_BAND) -> bool:
    """Conservative check that the kernel's VMEM working set fits."""
    r = max(1, min(r, h - 2, w - 2))
    floats = (c * (h + 2 * r + 16) * w
              + c * (w + 2 * r + 16) * h
              + 4 * c * h * w               # accumulators
              + 6 * h * w                   # masks/coords
              + 4 * c * h * w)              # in/out + transposes
    return floats * 4 < 13 * 1024 * 1024
