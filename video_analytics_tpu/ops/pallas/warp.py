"""Pallas TPU kernel: dense bilinear warp (the flow hot path).

TPUs have no hardware gather; XLA lowers the per-pixel bilinear gather
of a warp to scalarised loads that run ~100x off memory speed-of-light
(measured: 98ms for a (64,224,224,5) warp — the single dominant cost
of both Farneback's matrix update and TV-L1's warp step, SURVEY.md §7
hard-part #1; this kernel does the same warp in ~10ms).

Kernel strategy — *banded masked select*, one axis at a time:
displacements are clamped to a static band [-R, R]; the kernel
resolves each pixel's source row with a two-stage hierarchical select
over the band's 8-aligned chunks (see _axis_kernel), then lerps the
two bracketing rows with the fractional part — i.e. a full 1D linear
resample per axis, entirely in VMEM.  The 2D warp is two such passes
with an XLA transpose between (the lane-dim sweep is illegal in
Mosaic, and keeping the kernel single-axis compiles far faster than
one fused two-pass kernel).

Blocking: the INPUT block carries an (r+8)-row halo on each side while
the OUTPUT block is the interior band only — the kernel reads
``src_ref[h + i + d]`` directly, so there is no replicate-pad scratch
and, critically, no compute on halo rows (an earlier same-size-blocks
version recomputed the halo and threw it away: 1.79x wasted sweeps at
224², 4.3x at 1080p-width one-channel bands).  Border replication is
host-side ``jnp.pad(mode="edge")`` on the halo slices.

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


def _halo(r: int) -> int:
    """Input-side halo rows per side: reachable offset r, rounded up so
    the kernel's first dynamic slice start (h - r) is 8-aligned."""
    return r + 8


def _select_lerp(read_block, off, frac, shape, r: int, h: int):
    """The shared two-stage hierarchical select + lerp body.

    ``read_block(base)`` returns the (C, Nout + 8, M) source slice
    starting at sublane row ``base`` (a static, 8-aligned python int —
    h == r + 8 so the first base (h - r) is 8).

    Two-stage hierarchical select (~15% over the flat sweep, measured):
    stage 1 sweeps the ceil((2r+2)/8) 8-aligned chunks once, building
    nine fine planes T_f = src[h+i+8·coarse+f] selected by the
    per-pixel coarse index (one compare per chunk, shared by all nine
    f); stage 2 selects the lerp operands from T by the fine index —
    8·(9+2) selects total instead of 2 per candidate offset.  The
    whole loop nest is statically unrolled (Mosaic schedules it well;
    the T planes are why the band model charges ~9C extra rows).
    """
    C, Nout, M = shape
    frac = frac[None]
    idx = off + r                        # [0, 2r]
    coarse = idx // 8
    fine = idx % 8
    n_chunks = (2 * r + 2 + 7) // 8

    T = [jnp.zeros((C, Nout, M), jnp.float32) for _ in range(9)]
    for c in range(n_chunks):
        base = c * 8 + (h - r)
        block = read_block(base)
        mc = (coarse == c)[None]
        for f in range(9):
            T[f] = jnp.where(mc, block[:, f:f + Nout, :], T[f])
    acc0 = jnp.zeros((C, Nout, M), jnp.float32)
    acc1 = jnp.zeros((C, Nout, M), jnp.float32)
    for f in range(8):
        mf = (fine == f)[None]
        acc0 = jnp.where(mf, T[f], acc0)
        acc1 = jnp.where(mf, T[f + 1], acc1)
    return acc0 * (1.0 - frac) + acc1 * frac


def _axis_kernel(src_ref, off_ref, frac_ref, out_ref, *, r: int):
    """1D banded resample along the sublane axis.

    src (C, Nout + 2h, M) carries the halo; out (C, Nout, M) is the
    interior: out[c, i, j] = src[c, h+i+off, j]*(1-frac)
                           + src[c, h+i+off+1, j]*frac.
    """
    C, NI, M = src_ref.shape
    Nout = out_ref.shape[1]
    h = (NI - Nout) // 2
    out_ref[:] = _select_lerp(
        lambda base: src_ref[:, base:base + Nout + 8, :],
        off_ref[:], frac_ref[:], (C, Nout, M), r, h)


def _axis_kernel_inpad(src_ref, off_ref, frac_ref, out_ref, pad_ref,
                       *, r: int):
    """_axis_kernel taking the UNPADDED (C, N, M) whole-axis source and
    replicating the halo into a VMEM scratch in-kernel.  This replaces
    the XLA-level ``jnp.pad(mode="edge")`` of the single-band path,
    whose materialisation cost a full HBM round trip of the haloed
    plane per warp (~0.2-0.3ms each at (64, 224², 5) — the
    pad_maximum fusions in the headline trace)."""
    C, N, M = src_ref.shape
    h = (pad_ref.shape[1] - N) // 2
    x = src_ref[:]
    pad_ref[:, h:h + N, :] = x
    pad_ref[:, :h, :] = jnp.broadcast_to(x[:, :1, :], (C, h, M))
    pad_ref[:, h + N:, :] = jnp.broadcast_to(x[:, N - 1:, :], (C, h, M))
    out_ref[:] = _select_lerp(
        lambda base: pad_ref[:, base:base + N + 8, :],
        off_ref[:], frac_ref[:], (C, N, M), r, h)


def _axis_warp_inpad(src: jax.Array, off: jax.Array, frac: jax.Array,
                     r: int) -> jax.Array:
    """(B, C, N, M) UNPADDED source + (B, N, M) offsets → (B, C, N, M)
    banded 1D resample along axis 2, halo replicated in-kernel."""
    B, C, N, M = src.shape
    h = _halo(r)
    return pl.pallas_call(
        functools.partial(_axis_kernel_inpad, r=r),
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
        scratch_shapes=[pltpu.VMEM((C, N + 2 * h, M), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_BYTES),
        interpret=pallas_interpret(),
    )(src, off, frac)


def _axis_warp(src: jax.Array, off: jax.Array, frac: jax.Array,
               r: int) -> jax.Array:
    """(B, C, Nout + 2h, M) haloed source + (B, Nout, M) offsets →
    (B, C, Nout, M) banded 1D resample along axis 2."""
    B, C, NI, M = src.shape
    Nout = off.shape[1]
    return pl.pallas_call(
        functools.partial(_axis_kernel, r=r),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, C, NI, M), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Nout, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, Nout, M), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, C, Nout, M), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, Nout, M), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SCOPED_VMEM_BYTES),
        interpret=pallas_interpret(),
    )(src, off, frac)


# The kernel's scoped VMEM limit (Mosaic default is 16MB; the v5e has
# 128MB physical).  The nine T planes live in scoped VMEM, so the
# limit is raised and the band model below sizes the TOTAL working set
# (scoped + double-buffered pipeline blocks) against _TOTAL_BUDGET.
_SCOPED_VMEM_BYTES = 100 * 1024 * 1024
_TOTAL_BUDGET_FLOATS = 94 * 1024 * 1024 // 4


def _band_size(c: int, m: int, r: int) -> int:
    """Interior rows per band whose kernel working set fits VMEM, or 0
    when even the minimum 8-row band overflows (caller then splits
    channels).  Accounting per band of ``n`` interior rows (lane-padded
    width mp): scoped — nine T planes 9·C·n, accumulators 2·C·n, chunk
    slice C·(n+8), index/mask planes ~7·n; pipelined — in blocks
    2·C·(n+2h), off/frac 4·n, out 2·C·n, plus ~5·n of residual scoped
    temporaries → ≈ (16C+16)·n + (4h+16)·C rows against a budget with
    ~6% margin.  The per-row coefficient and the margin are calibrated
    live: grid>1 makes Mosaic double-buffer the pipelined blocks (a
    B=1-only calibration of this model compiled at 100MB/coeff 11 but
    OOM'd scoped VMEM at B=2 with a (C=3, m=983, n=424) block at
    107.78M); the current values keep that worst case ≈94M.  Verified
    at (C=5, m=224, n=224) grid 64 and (C=3, m=983/1920) grid 2."""
    mp = -(-m // 128) * 128
    rows_budget = _TOTAL_BUDGET_FLOATS // mp
    h = _halo(r)
    band = (rows_budget - (4 * h + 16) * c) // (16 * c + 16)
    if band < 8:
        return 0
    return (band // 8) * 8


def _axis_warp_any(src: jax.Array, off: jax.Array, frac: jax.Array,
                   r: int) -> jax.Array:
    """_axis_warp with automatic row-banding for large shapes: each
    band's INPUT slice carries an h=(r+8)-row halo (edge-padded at
    image boundaries) while offsets/outputs are the interior band
    only — no compute is spent on halo rows.  Offsets are relative, so
    they transfer to band-local coordinates unchanged."""
    B, C, N, M = src.shape
    band = _band_size(C, M, r)
    if band == 0 and C > 1:
        # Even an 8-row band overflows at this width: gather indices
        # are shared across channels, so split channels instead.
        half = C // 2
        return jnp.concatenate(
            [_axis_warp_any(src[:, :half], off, frac, r),
             _axis_warp_any(src[:, half:], off, frac, r)], axis=1)
    # Whole-axis-in-one-band case (every pipeline shape at ≤256²): the
    # in-kernel-replicate variant skips the XLA edge-pad round trip.
    # Its scratch adds ~C·(N+2h) rows — charged against the same
    # budget via the band recheck with c+1 "channels".
    if N <= _band_size(C + 1, M, r):
        return _axis_warp_inpad(src, off, frac, r)
    band = max(band, 8)
    h = _halo(r)
    outs = []
    for s in range(0, N, band):
        e = min(s + band, N)
        s0, e0 = max(s - h, 0), min(e + h, N)
        pad_top, pad_bot = h - (s - s0), h - (e0 - e)
        blk = src[:, :, s0:e0, :]
        if pad_top or pad_bot:
            blk = jnp.pad(blk, [(0, 0), (0, 0), (pad_top, pad_bot),
                                (0, 0)], mode="edge")
        outs.append(_axis_warp(blk, off[:, s:e], frac[:, s:e], r))
    if len(outs) == 1:
        return outs[0]
    return jnp.concatenate(outs, axis=2)


def _v_offsets(dy: jax.Array, h: int, r: int):
    """Vertical-pass (offset, frac) planes from the flow's dy — the
    exact clamp/floor chain of pallas_warp_cf's row pass, factored out
    so the W-space fused Farneback iteration (ops/pallas/
    farneback_kernels.warp_neq_corr_pallas) can run the row resample
    standalone and bit-identically."""
    B = dy.shape[0]
    yy = jax.lax.broadcasted_iota(jnp.float32, (B,) + dy.shape[1:], 1)
    ys = jnp.clip(yy + dy, 0.0, h - 1.0)
    y0 = jnp.clip(jnp.floor(ys), 0.0, h - 2.0)
    fy = ys - y0
    off = jnp.clip(y0 - yy, -r, r).astype(jnp.int32)
    return off, fy


@functools.partial(jax.jit, static_argnames=("r",))
def pallas_warp_v_cf(img_cf: jax.Array, dy: jax.Array,
                     r: int = DEFAULT_BAND) -> jax.Array:
    """The ROW pass of pallas_warp_cf alone: (B, C, H, W) resampled
    vertically by dy (B, H, W) → (B, C, H, W).  Bit-identical to the
    first half of pallas_warp_cf; the fused Farneback iteration
    completes the column pass inside its W-space kernel."""
    B, C, H, W = img_cf.shape
    r = max(1, min(r, H - 2, W - 2))
    off, fy = _v_offsets(dy, H, r)
    return _axis_warp_any(img_cf.astype(jnp.float32), off, fy, r)


@functools.partial(jax.jit, static_argnames=("r", "w_img"))
def pallas_warp_cf(img_cf: jax.Array, dx: jax.Array, dy: jax.Array,
                   r: int = DEFAULT_BAND,
                   w_img: int = 0) -> jax.Array:
    """Channels-first bilinear warp: (B, C, H, W) by per-pixel
    displacements dx, dy each (B, H, W) → (B, C, H, W);
    out(p) = img(p + d(p)), clamped borders, |d| clamped to ±r.

    This is pallas_warp without the NHWC layout round trips — the
    fused Farneback iteration chains channels-first through
    poly → warp → window-blur, so the inter-kernel transposes (the
    ~1ms/call layout tax at 224², STATUS r2 known gap) vanish.

    ``w_img`` > 0 marks the lane axis as n = W // w_img images packed
    side by side (flow.tvl1's lane packing): the horizontal pass then
    computes per-image coordinates/clamps, so every sample stays inside
    its own image — ONLY the offset planes change; the sweep kernels
    are byte-identical, and the column pad at the packed block's edges
    is never selected by an interior image.  Bit-exact per image vs the
    unpacked warp."""
    B, C, H, W = img_cf.shape
    wi = w_img or W
    r = max(1, min(r, H - 2, wi - 2))
    img_cf = img_cf.astype(jnp.float32)

    xx = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 2)
    if w_img:
        xx = xx % float(w_img)          # per-image column coordinate
    xs = jnp.clip(xx + dx, 0.0, wi - 1.0)
    x0 = jnp.clip(jnp.floor(xs), 0.0, wi - 2.0)
    fx = xs - x0
    dx_off = jnp.clip(x0 - xx, -r, r).astype(jnp.int32)
    dy_off, fy = _v_offsets(dy, H, r)

    mid = _axis_warp_any(img_cf, dy_off, fy, r)          # rows resolved
    midT = mid.transpose(0, 1, 3, 2)                     # (B, C, W, H)
    outT = _axis_warp_any(midT, dx_off.transpose(0, 2, 1),
                          fx.transpose(0, 2, 1), r)
    return outT.transpose(0, 1, 3, 2)                    # (B, C, H, W)


@functools.partial(jax.jit, static_argnames=("r",))
def pallas_warp(img: jax.Array, flow: jax.Array,
                r: int = DEFAULT_BAND) -> jax.Array:
    """Bilinear warp of (B, H, W, C) by flow (B, H, W, 2):
    out(p) = img(p + flow(p)), clamped borders, |flow| clamped to ±r.

    Drop-in for ops.kernels.warp_by_flow on the flow hot path.  Images
    of any size are handled by row-banding with input-side halos (the
    per-band working set, not the image, must fit VMEM)."""
    img_cf = img.astype(jnp.float32).transpose(0, 3, 1, 2)
    out_cf = pallas_warp_cf(img_cf, flow[..., 0], flow[..., 1], r=r)
    return out_cf.transpose(0, 2, 3, 1)                  # (B, H, W, C)


def warp_fits_vmem(h: int, w: int, _c: int = 1,
                   r: int = DEFAULT_BAND) -> bool:
    """Always true since row-banding landed — kept for call sites that
    gate on it (returns False only for absurd widths where even one
    8-row banded block exceeds VMEM for a single channel).

    ``_c`` is ignored: _axis_warp_any splits channels when a band
    overflows, so the gate is channel-independent by construction."""
    r = max(1, min(r, h - 2, w - 2))
    m = max(h, w)
    mp = -(-m // 128) * 128
    rows_budget = _TOTAL_BUDGET_FLOATS // mp
    return rows_budget - (4 * _halo(r) + 16) > 8 * 27
