"""Pallas TPU kernels for Farneback's remaining hot stages.

After the warp kernel, profiling shows the polynomial expansion and the
window-average+solve stage dominating: both are separable correlations
that XLA evaluates as HBM-streaming shift-adds (each tap re-reads the
array), far off speed-of-light.  Both reduce to ONE generic kernel:

``_sep_corr_kernel`` — a banded weighted sum along the sublane axis:
the input channels are written once into a replicate-padded VMEM
scratch, and each output channel is a statically-unrolled tap
accumulation over static slices of that scratch (two live arrays, no
masks, no dynamic slicing).  A 2D separable correlation is two calls
with an XLA transpose between — the same decomposition as the warp
kernel, chosen for Mosaic-compile speed and bounded VMEM liveness
(a first fused attempt kept ~150 masked temporaries live and OOM'd
scoped VMEM at 224²).

- ``poly_expansion_pallas`` (SURVEY.md §2b #2): vertical pass computes
  the (g, xg, xxg) basis correlations; horizontal pass the six basis
  products; the inverse-Gramian combine is XLA elementwise (it fuses).
- ``update_flow_pallas`` (#3): winsize box/Gaussian window average of
  the five normal-equation planes per axis; the 2x2 solve is XLA
  elementwise.

Replicate borders throughout (matching ops.kernels.sepcorr, which the
cv2-parity suite gates); both paths are compared against the XLA
reference in tests/test_pallas_farneback.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_analytics_tpu.config import FarnebackConfig
from video_analytics_tpu.ops.kernels import gaussian_kernel_1d
from video_analytics_tpu.utils.platform import pallas_interpret

# A "plan" is a tuple of (input_channel, taps) per output channel.
Plan = Tuple[Tuple[int, Tuple[float, ...]], ...]


def _sep_corr_kernel(x_ref, out_ref, pad_ref, *, plan: Plan, r: int,
                     epilogue: Optional[str] = None):
    """x (Cin, N, M) → out (Cout, N, M): out[o] = corr(x[cin_o],
    taps_o) along the sublane axis, replicate border.

    Uniform taps (the winsize box window — Farneback's default and the
    per-iteration hot loop) take a binary-doubling window-sum path:
    partial sums of length 2^j are built once per input channel and the
    k-window decomposes into ≤log2(k)+popcount(k) adds plus ONE scalar
    multiply, vs k multiply-adds tap-by-tap (k=15 → 7 ops vs 15).  The
    summation tree is a reordering of the same f32 adds; the cv2-parity
    suite (bit-level flow gates) runs against it.

    epilogue="solve2x2": the plan's 5 outputs are the window-averaged
    normal-equation planes (g11, g12, g22, h1, h2); instead of writing
    all 5 to HBM (and re-reading them for an XLA solve), the cv2
    regularised 2×2 solve runs in-register and only the 2 flow
    channels are written — the update_flow HBM-traffic cut the
    roofline identified (flow is bandwidth-bound at 0.7 FLOP/B).
    Identical f32 formula to flow.farneback._solve_flow."""
    Cin, N, M = x_ref.shape
    x = x_ref[:]
    pad_ref[:, r:r + N, :] = x
    if r:       # r == 0 (all-1-tap plan): no border, and Pallas
                # rejects the empty border-write slices outright
        pad_ref[:, :r, :] = jnp.broadcast_to(x[:, :1, :], (Cin, r, M))
        pad_ref[:, r + N:, :] = jnp.broadcast_to(x[:, N - 1:, :],
                                                 (Cin, r, M))
    if epilogue is None:
        _plan_outputs(pad_ref, plan, r, N,
                      emit=lambda o, res: out_ref.__setitem__(o, res))
    elif epilogue == "solve2x2":
        outs = []
        _plan_outputs(pad_ref, plan, r, N,
                      emit=lambda o, res: outs.append(res))
        g11, g12, g22, h1, h2 = outs
        idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
        out_ref[0] = (g22 * h1 - g12 * h2) * idet
        out_ref[1] = (g11 * h2 - g12 * h1) * idet
    else:
        raise ValueError(f"unknown epilogue {epilogue!r}")


def _plan_outputs(pad_ref, plan: Plan, r: int, N: int, emit) -> None:
    """Per-plan-entry corr outputs over the replicate-padded scratch,
    handed to `emit(o, res)` in order — shared by the generic sep-corr
    kernel and the fused normal-equations kernel (both take the
    binary-doubling window-sum fast path for uniform taps)."""
    sums_cache = {}

    def window_sums(cin: int, k: int):
        """Doubled partial sums over pad[cin]: arrs[p][i] =
        sum(pad[cin, i:i+p]); built lazily, shared across outputs.
        Grows an existing cache entry when a later output needs a
        larger window (the binary decomposition below uses each power
        at most once, so it needs powers up to the largest one ≤ k)."""
        L = N + 2 * r
        arrs = sums_cache.setdefault(cin, {1: pad_ref[cin, :, :]})
        p = max(arrs)
        while p * 2 <= k:
            prev = arrs[p]
            lp = L - (p - 1)
            arrs[p * 2] = prev[:lp - p] + prev[p:lp]
            p *= 2
        return arrs

    for o, (cin, taps) in enumerate(plan):
        k = len(taps)
        if k >= 8 and all(t == taps[0] for t in taps):
            arrs = window_sums(cin, k)
            acc = None
            off, rem = 0, k
            p = max(arrs)
            while p >= 1:
                if rem >= p:
                    seg = arrs[p][off:off + N]
                    acc = seg if acc is None else acc + seg
                    off += p
                    rem -= p
                p //= 2
            res = float(taps[0]) * acc
        else:
            acc = None
            for i, w in enumerate(taps):
                sl = pad_ref[cin, i:i + N, :]
                term = float(w) * sl
                acc = term if acc is None else acc + term
            res = acc
        emit(o, res)


def _sep_corr_axis(x: jax.Array, plan: Plan,
                   epilogue: Optional[str] = None) -> jax.Array:
    """(B, Cin, N, M) → (B, Cout, N, M), correlation along axis 2."""
    B, Cin, N, M = x.shape
    r = max(len(t) for _, t in plan) // 2
    cout = 2 if epilogue == "solve2x2" else len(plan)
    return pl.pallas_call(
        functools.partial(_sep_corr_kernel, plan=plan, r=r,
                          epilogue=epilogue),
        grid=(B,),
        in_specs=[pl.BlockSpec((None, Cin, N, M), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, cout, N, M),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, cout, N, M), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Cin, N + 2 * r, M), jnp.float32)],
        interpret=pallas_interpret(),
    )(x.astype(jnp.float32))


def _sep_corr_axis_any(x: jax.Array, plan: Plan,
                       epilogue: Optional[str] = None) -> jax.Array:
    """_sep_corr_axis with automatic row-banding + halo for large
    shapes (same scheme as ops/pallas/warp.py: halo'd blocks, kernel
    unchanged, halo rows discarded)."""
    B, Cin, N, M = x.shape
    r = max(len(t) for _, t in plan) // 2
    # The epilogue keeps all plan outputs live before writing its 2
    # flow channels, so the VMEM model must still count them.
    cout = len(plan) + (2 if epilogue else 0)
    # Empirical Mosaic cost model (see ops/pallas/warp._band_size).
    # The binary-doubling (uniform-tap/box) kernel path keeps its
    # partial-sum cache live across the WHOLE output loop (sums_cache
    # persists per input channel), so the allowance must scale with the
    # plan: ~floor(log2(k)) partial-sum planes per distinct uniform-tap
    # input channel (k=15 → 3 planes; update_flow's 5-channel box plan
    # → 15 planes, not a flat 4 — ADVICE r3, low).  +2 covers the
    # non-uniform path's acc/slice liveness.
    uni_k = {}
    for cin, taps in plan:
        k = len(taps)
        if k >= 8 and all(t == taps[0] for t in taps):
            uni_k[cin] = max(uni_k.get(cin, 0), k)
    cache_planes = sum(k.bit_length() - 1 for k in uni_k.values())
    budget = 14 * 1024 * 1024 // 4
    mp = -(-M // 128) * 128
    band = budget // ((3 * (Cin + cout) + 2 + cache_planes) * mp) \
        - (2 * r + 8)
    band = max(8, (band // 8) * 8)
    if N <= band:
        return _sep_corr_axis(x, plan, epilogue)
    h = r
    outs = []
    for s in range(0, N, band):
        e = min(s + band, N)
        s0, e0 = max(s - h, 0), min(e + h, N)
        pad_top, pad_bot = h - (s - s0), h - (e0 - e)
        blk = x[:, :, s0:e0, :]
        if pad_top or pad_bot:
            blk = jnp.pad(blk, [(0, 0), (0, 0), (pad_top, pad_bot),
                                (0, 0)], mode="edge")
        out_b = _sep_corr_axis(blk, plan, epilogue)
        outs.append(out_b[:, :, h:h + (e - s), :])
    return jnp.concatenate(outs, axis=2)


def sep_corr2d_pallas(x: jax.Array, v_plan: Plan, h_plan: Plan,
                      h_epilogue: Optional[str] = None,
                      transposed_out: bool = False) -> jax.Array:
    """(B, Cin, H, W): vertical pass with v_plan, then horizontal pass
    (via transpose) with h_plan → (B, Cout, H, W).  h_epilogue rides on
    the horizontal pass (see _sep_corr_kernel): with "solve2x2" only
    the 2 solved flow channels cross HBM after the h-pass instead of
    the 5 normal-equation planes.  transposed_out=True skips the final
    layout restore and returns (B, Cout, W, H) — callers that consume
    the transposed layout anyway (the W-space fused iteration's R0T)
    save the round trip."""
    v = _sep_corr_axis_any(x, v_plan)                   # (B, Cv, H, W)
    vT = v.transpose(0, 1, 3, 2)                        # (B, Cv, W, H)
    hT = _sep_corr_axis_any(vT, h_plan, h_epilogue)     # (B, Co, W, H)
    return hT if transposed_out else hT.transpose(0, 1, 3, 2)


# ---------------------------------------------------------------------------
# Fused normal-equations + vertical corr (the per-iteration HBM cut)
# ---------------------------------------------------------------------------


def _neq_sep_corr_kernel(r0_ref, r1w_ref, flow_ref, inb_ref, att_ref,
                         out_ref, pad_ref, *, taps, r: int):
    """Normal-equations prologue + vertical window corr in ONE kernel:
    the 5 M planes (flow.farneback._normal_equations — the single
    cv2-parity implementation, called here under the Pallas tracer)
    exist only in VMEM scratch, never in HBM.  The roofline (STATUS
    r4) showed the Farneback iteration chain is bandwidth-bound at 0.7
    FLOP/B; this removes M's HBM write+read (10 plane traversals per
    iteration) from that chain.  `inb` is the cv2 OOB interior mask
    precomputed host/XLA-side as f32 (elementwise on dx/dy, cheap);
    `att` is the shared border-attenuation plane."""
    from video_analytics_tpu.flow.farneback import _normal_equations

    C, N, M = r0_ref.shape
    r0 = r0_ref[:]
    r1w = r1w_ref[:]
    dx = flow_ref[0]
    dy = flow_ref[1]
    inb = inb_ref[:] != 0.0
    att = att_ref[:]
    m = _normal_equations(tuple(r0[i] for i in range(5)),
                          tuple(r1w[i] for i in range(5)),
                          dx, dy, inb, att)
    for i in range(5):
        pad_ref[i, r:r + N, :] = m[i]
        if r:
            pad_ref[i, :r, :] = jnp.broadcast_to(m[i][:1], (r, M))
            pad_ref[i, r + N:, :] = jnp.broadcast_to(m[i][N - 1:],
                                                     (r, M))
    plan = tuple((c, taps) for c in range(5))
    _plan_outputs(pad_ref, plan, r, N,
                  emit=lambda o, res: out_ref.__setitem__(o, res))


def _neq_corr_axis(r0, r1w, flow, inb, att, taps) -> jax.Array:
    """(B, 5, N, M) poly pairs + (B, 2, N, M) flow + masks → (B, 5,
    N, M) vertically window-averaged normal-equation planes."""
    B, C, N, M = r0.shape
    r = len(taps) // 2
    f32 = jnp.float32
    bspec = lambda c: pl.BlockSpec((None, c, N, M),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_neq_sep_corr_kernel, taps=taps, r=r),
        grid=(B,),
        in_specs=[bspec(5), bspec(5), bspec(2),
                  pl.BlockSpec((None, N, M), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((N, M), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=bspec(5),
        out_shape=jax.ShapeDtypeStruct((B, 5, N, M), f32),
        scratch_shapes=[pltpu.VMEM((5, N + 2 * r, M), f32)],
        interpret=pallas_interpret(),
    )(r0.astype(f32), r1w.astype(f32), flow.astype(f32),
      inb.astype(f32), att.astype(f32))


def _neq_corr_axis_any(r0, r1w, flow, inb, att, taps) -> jax.Array:
    """_neq_corr_axis with the same row-banding + halo scheme as
    _sep_corr_axis_any (halo'd row blocks of every operand; the
    prologue recomputes M on halo rows — exact, they are pure
    elementwise)."""
    B, C, N, M = r0.shape
    r = len(taps) // 2
    # VMEM model: the 13 input planes are consumed ONCE by the
    # elementwise prologue and die before the corr loop (unlike the
    # generic kernel, whose inputs stay live as the pad source), so
    # they weigh 2× (operand + one live copy), not the empirical 3×;
    # the pad scratch (5 ch), window-sum cache and ~8 prologue
    # temporaries carry the 3× Mosaic factor.  Keeping 224² unbanded
    # matters: banding splices 13 operand-slice copies per band into
    # the chain, which measurably cancels the fusion's traffic win
    # (r4 probe: flow_seq 31.8ms banded vs 22.8ms pre-fusion).
    uni = len(taps) >= 8 and all(t == taps[0] for t in taps)
    cache_planes = 5 * (len(taps).bit_length() - 1) if uni else 0
    budget = 14 * 1024 * 1024 // 4
    mp = -(-M // 128) * 128
    band = budget // ((13 + 3 * 5 + 8 + 2 + cache_planes) * mp) \
        - (2 * r + 8)
    band = max(8, (band // 8) * 8)
    if N <= band:
        return _neq_corr_axis(r0, r1w, flow, inb, att, taps)
    h = r
    outs = []
    for s in range(0, N, band):
        e = min(s + band, N)
        s0, e0 = max(s - h, 0), min(e + h, N)
        pad_top, pad_bot = h - (s - s0), h - (e0 - e)
        sl = lambda x, ax: jax.lax.slice_in_dim(x, s0, e0, axis=ax)
        blks = [sl(r0, 2), sl(r1w, 2), sl(flow, 2), sl(inb, 1),
                sl(att, 0)]
        if pad_top or pad_bot:
            def pad(x, ax):
                cfgp = [(0, 0)] * x.ndim
                cfgp[ax] = (pad_top, pad_bot)
                return jnp.pad(x, cfgp, mode="edge")
            blks = [pad(blks[0], 2), pad(blks[1], 2), pad(blks[2], 2),
                    pad(blks[3], 1), pad(blks[4], 0)]
        out_b = _neq_corr_axis(*blks, taps)
        outs.append(out_b[:, :, h:h + (e - s), :])
    return jnp.concatenate(outs, axis=2)


@functools.partial(jax.jit, static_argnames=("cfg",))
def update_flow_fused_pallas(R0: jax.Array, R1w: jax.Array,
                             flow_cf: jax.Array,
                             cfg: FarnebackConfig) -> jax.Array:
    """Channels-first fused flow update WITHOUT materializing M:
    (B, 5, H, W) poly pair + warped pair + (B, 2, H, W) flow →
    (B, 2, H, W) new flow.  Pipeline: OOB mask (XLA elementwise) →
    [normal equations + vertical window avg] (one Pallas kernel) →
    transpose → [horizontal window avg + 2×2 solve] (one Pallas
    kernel) → transpose.  Numerically the same f32 ops as
    update_matrices_cf + update_flow_pallas (the shared
    _normal_equations/_solve formulas), minus 16 HBM plane traversals
    per iteration."""
    from video_analytics_tpu.flow.farneback import (
        _border_attenuation, _oob_mask)
    from video_analytics_tpu.ops.kernels import farneback_window_taps

    B, _, H, W = R0.shape
    taps = farneback_window_taps(cfg.winsize, cfg.gaussian_window)
    dx, dy = flow_cf[:, 0], flow_cf[:, 1]
    inb = _oob_mask(dx, dy, H, W).astype(jnp.float32)
    att = _border_attenuation(H, W)
    v = _neq_corr_axis_any(R0, R1w, flow_cf, inb, att, taps)
    vT = v.transpose(0, 1, 3, 2)                        # (B, 5, W, H)
    plan = tuple((c, taps) for c in range(5))
    hT = _sep_corr_axis_any(vT, plan, epilogue="solve2x2")
    return hT.transpose(0, 1, 3, 2)                     # (B, 2, H, W)


# ---------------------------------------------------------------------------
# W-space fused iteration tail: warp column pass + normal equations +
# horizontal window average in ONE kernel (r4).
#
# The r4 roofline showed the Farneback iteration chain is HBM-bound at
# 0.7 FLOP/B even after the neq fusion: the warped expansion R1w still
# round-trips HBM (10 plane traversals/iteration) and the chain pays 4
# layout transposes.  Observation: the warp's COLUMN pass, the
# normal-equations build, and ONE of the two separable window-average
# passes all operate in the transposed (B, C, W, H) layout — so they
# fuse into a single kernel in which R1w and the un-averaged M planes
# exist only in VMEM.  The window average commutes across its two
# separable passes under replicate borders (identical terms, different
# f32 summation order — corr_H∘corr_W ≡ corr_W∘corr_H with clipped
# indexing), so running the horizontal pass first is a pure
# accumulation-order change, gated by the same pipeline-level parity
# tests as the rest of the fused path.
#
# New per-iteration chain (flow/farneback._fused_iteration):
#   row-pass warp (H-space) → T → [col-pass warp + neq + corr-W]
#   (this kernel) → T → [corr-H + 2×2 solve] (sep-corr epilogue)
# vs the old: warp(v) → T → warp(h) → T → [neq+corr-v] → T →
#   [corr-h+solve] → T — i.e. 10 fewer plane traversals and 2 fewer
# transposes per iteration.
#
# No in-kernel op mixes lanes (the warp sweep and the window corr run
# along the sublane axis; neq is elementwise), so the grid tiles the
# LANE dim (original image rows) with no halo when VMEM demands it.
# ---------------------------------------------------------------------------


def _warp_neq_corr_kernel(midT_ref, r0T_ref, flowT_ref, attT_ref,
                          out_ref, pad_ref, mpad_ref, *, taps,
                          r: int, w_true: int, h_true: int, mc: int):
    """One (C=5, W, Mc) lane-chunk block: column-pass banded warp of the
    row-resampled expansion `midT`, cv2 normal equations vs `r0T`, and
    the horizontal window average — all VMEM-resident.  Layout: sublane
    = image column (x), lane = image row (y)."""
    from video_analytics_tpu.flow.farneback import _normal_equations
    from video_analytics_tpu.ops.pallas.warp import _select_lerp

    C, N, M = midT_ref.shape
    h = (pad_ref.shape[1] - N) // 2
    x = midT_ref[:]
    pad_ref[:, h:h + N, :] = x
    pad_ref[:, :h, :] = jnp.broadcast_to(x[:, :1, :], (C, h, M))
    pad_ref[:, h + N:, :] = jnp.broadcast_to(x[:, N - 1:, :], (C, h, M))

    dxT = flowT_ref[0]
    dyT = flowT_ref[1]
    # Global pixel coordinates: sublane = column (whole axis in-block),
    # lane = row (offset by the lane-chunk index).
    j = pl.program_id(1)
    # Mosaic requires integer iota; cast after.
    xx = jax.lax.broadcasted_iota(jnp.int32, (N, M), 0).astype(jnp.float32)
    yy = (jax.lax.broadcasted_iota(jnp.int32, (N, M), 1)
          + j * mc).astype(jnp.float32)
    # Column-pass offsets — the exact clamp/floor chain of
    # pallas_warp_cf's column pass.
    xs = jnp.clip(xx + dxT, 0.0, w_true - 1.0)
    x0 = jnp.clip(jnp.floor(xs), 0.0, w_true - 2.0)
    fx = xs - x0
    offx = jnp.clip(x0 - xx, -r, r).astype(jnp.int32)
    r1w = _select_lerp(lambda base: pad_ref[:, base:base + N + 8, :],
                       offx, fx, (C, N, M), r, h)

    # cv2's FarnebackUpdateMatrices interior test (_oob_mask), in
    # transposed coordinates.
    x1 = jnp.floor(xx + dxT)
    y1 = jnp.floor(yy + dyT)
    inb = (x1 >= 0) & (x1 < w_true - 1) & (y1 >= 0) & (y1 < h_true - 1)
    m = _normal_equations(tuple(r0T_ref[i] for i in range(5)),
                          tuple(r1w[i] for i in range(5)),
                          dxT, dyT, inb, attT_ref[:])

    rc = len(taps) // 2
    for i in range(5):
        mpad_ref[i, rc:rc + N, :] = m[i]
        if rc:
            mpad_ref[i, :rc, :] = jnp.broadcast_to(m[i][:1], (rc, M))
            mpad_ref[i, rc + N:, :] = jnp.broadcast_to(m[i][N - 1:],
                                                       (rc, M))
    plan = tuple((c, taps) for c in range(5))
    _plan_outputs(mpad_ref, plan, rc, N,
                  emit=lambda o, res: out_ref.__setitem__(o, res))


def _warp_neq_lane_chunk(w: int, h: int, r: int, rc: int) -> int:
    """Largest 128-multiple lane-chunk whose block working set fits the
    VMEM budget, or 0 when even a 128-lane chunk overflows (caller
    falls back to the unfused chain).  Row accounting per chunk of Mc
    lanes: double-buffered pipeline blocks (13 in + 5 out planes of N
    sublanes ≈ 36N), pad scratch 5(N+2h), mpad 5(N+2rc), nine warp
    T planes + accumulators 55N, window-sum cache 15N, neq/misc
    temporaries ~18N → ≈ 134N + 10h + 10rc sublane rows of Mc lanes."""
    N = w
    rows = 134 * N + 10 * (r + 8) + 10 * rc
    budget = 80 * 1024 * 1024 // 4
    mc = budget // rows // 128 * 128
    mp = -(-h // 128) * 128
    return min(mc, mp)


def warp_neq_corr_fits(h: int, w: int, r: int, winsize: int) -> bool:
    return _warp_neq_lane_chunk(w, h, r, winsize // 2) >= 128


@functools.partial(jax.jit, static_argnames=("taps", "r"))
def warp_neq_corr_pallas(midT: jax.Array, r0T: jax.Array,
                         flowT: jax.Array, attT: jax.Array,
                         taps: Tuple[float, ...], r: int) -> jax.Array:
    """(B, 5, W, H) row-resampled expansion + transposed pair/flow →
    (B, 5, W, H) horizontally window-averaged normal-equation planes.
    The finishing vertical average + solve runs in H-space
    (_sep_corr_axis_any epilogue="solve2x2")."""
    B, C, W, H = midT.shape
    rc = len(taps) // 2
    mc = _warp_neq_lane_chunk(W, H, r, rc)
    if mc < 128:
        raise ValueError(
            f"warp_neq_corr_pallas: block for (W={W}, H={H}, r={r}, "
            f"rc={rc}) exceeds VMEM — gate with warp_neq_corr_fits")
    grid = (B, -(-H // mc))
    f32 = jnp.float32
    hh = r + 8
    bspec = lambda c: pl.BlockSpec((None, c, W, mc),
                                   lambda i, j: (i, 0, 0, j),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_warp_neq_corr_kernel, taps=taps, r=r,
                          w_true=W, h_true=H, mc=mc),
        grid=grid,
        in_specs=[bspec(5), bspec(5), bspec(2),
                  pl.BlockSpec((W, mc), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=bspec(5),
        out_shape=jax.ShapeDtypeStruct((B, 5, W, H), f32),
        scratch_shapes=[pltpu.VMEM((5, W + 2 * hh, mc), f32),
                        pltpu.VMEM((5, W + 2 * rc, mc), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(midT.astype(f32), r0T.astype(f32), flowT.astype(f32),
      attT.astype(f32))


# ---------------------------------------------------------------------------
# W-space iteration tail: in-kernel transpose + vertical window average
# + 2×2 solve in ONE kernel (r4b).
#
# After the W-space fusion the iteration chain still pays an XLA
# transpose of the 5 h-averaged planes (hT → hh) followed by a separate
# sep-corr solve pass: 10 + 7 plane traversals.  Measured on the real
# chip, the XLA 5-plane transpose at (64, 5, 224, 224) runs at only
# ~93 GB/s (~11% of HBM peak) — transposes are the chain's most
# bandwidth-inefficient step.  Mosaic supports in-register 2D f32
# transposes (probed exact on v5e), so this kernel reads hT in W-major
# blocks, transposes each tile in VMEM, runs the vertical window
# average along the now-sublane image rows, and solves — 7 traversals
# total, and the transpose rides VREG shuffles instead of HBM.
# ---------------------------------------------------------------------------


def _tsolve_kernel(hT_ref, out_ref, mpad_ref, *, taps, rc: int):
    """(5, WB, H) h-averaged normal-equation planes (sublane = image
    column, lane = image row) → (2, H, WB) solved flow.  Per channel:
    in-register transpose → replicate-pad over image rows → the same
    _plan_outputs window average as the sep-corr solve path → cv2
    regularised 2×2 solve.  Bit-identical f32 ops to
    [hT.transpose → _sep_corr_axis_any(epilogue="solve2x2")]."""
    C, WB, H = hT_ref.shape
    for c in range(C):
        t = hT_ref[c].T                                  # (H, WB)
        mpad_ref[c, rc:rc + H, :] = t
        if rc:
            mpad_ref[c, :rc, :] = jnp.broadcast_to(t[:1], (rc, WB))
            mpad_ref[c, rc + H:, :] = jnp.broadcast_to(t[H - 1:],
                                                       (rc, WB))
    plan = tuple((c, taps) for c in range(5))
    outs = []
    _plan_outputs(mpad_ref, plan, rc, H,
                  emit=lambda o, res: outs.append(res))
    g11, g12, g22, h1, h2 = outs
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    out_ref[0] = (g22 * h1 - g12 * h2) * idet
    out_ref[1] = (g11 * h2 - g12 * h1) * idet


def _tsolve_wband(w: int, h: int, rc: int) -> int:
    """Largest 8-multiple W-band (sublane rows of the hT block) whose
    working set fits VMEM, or 0 when even 8 overflows.  Words per
    W-band column of H lanes: double-buffered in blocks 2·5·Hp,
    transposed tiles ~2·5·H, mpad 5·(H+2rc), window-sum cache
    3·5·(H+2rc) (k=15 box), epilogue outs + temporaries ~8·H, out
    blocks 2·2·H → ≈ 50·H + 20·rc words per sublane row with ~15%
    Mosaic margin."""
    hp = -(-h // 128) * 128
    words_per_row = 50 * hp + 20 * rc
    budget = int(80 * 1024 * 1024 // 4 / 1.15)
    band = budget // words_per_row
    return max(0, (band // 8) * 8)


def tsolve_fits(w: int, h: int, winsize: int) -> bool:
    # Banded blocks must be 128-multiples (wb is a LANE block on the
    # flow output), so a model band under 128 only fits if the whole
    # axis does.
    return _tsolve_wband(w, h, winsize // 2) >= min(w, 128)


@functools.partial(jax.jit, static_argnames=("taps",))
def corr_solve_from_T_pallas(hT: jax.Array,
                             taps: Tuple[float, ...]) -> jax.Array:
    """(B, 5, W, H) horizontally window-averaged normal-equation planes
    (the W-space kernel's output layout) → (B, 2, H, W) solved flow,
    with the layout restore, the vertical window average, and the 2×2
    solve fused into one kernel (no HBM transpose round trip)."""
    B, C, W, H = hT.shape
    rc = len(taps) // 2
    wb = _tsolve_wband(W, H, rc)
    # Whole axis in one block when it fits (block == dim needs no
    # alignment); otherwise 128-multiples (wb is both a sublane block
    # on hT and a LANE block on the flow output — the fits gate
    # guarantees wb >= 128 here).
    wb = W if wb >= W else (wb // 128) * 128
    grid = (B, -(-W // wb))
    f32 = jnp.float32
    return pl.pallas_call(
        functools.partial(_tsolve_kernel, taps=taps, rc=rc),
        grid=grid,
        in_specs=[pl.BlockSpec((None, 5, wb, H), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, 2, H, wb), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, H, W), f32),
        scratch_shapes=[pltpu.VMEM((5, H + 2 * rc, wb), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(hT.astype(f32))


# ---------------------------------------------------------------------------
# W-space middle-iteration kernel: transpose + v-avg + solve + NEXT
# iteration's row warp in ONE kernel (r4b).
#
# Every W-space iteration except the last feeds its solved flow
# straight back into the next iteration's row-pass warp of R1 — three
# more HBM passes (the warp kernel, the mid → midT transpose, and the
# flow → flowT transpose) that all stay column-local: the row warp for
# image column w gathers only over image rows of that same column, and
# the solved flow tile is already in (rows, columns) register layout.
# So the _tsolve_kernel extends to also read the R1 column slab, run
# the exact pallas_warp_v_cf select-lerp on the just-solved dy, and
# emit midT and flowT for the next W-space kernel — per middle
# iteration this replaces 25 plane traversals (warp 11, transposes
# 10+4) with 12 (R1 read 5, midT write 5, flowT write 2) and two
# dispatches with zero.
# ---------------------------------------------------------------------------


def _tsolve_warp_kernel(hT_ref, r1_ref, flow_ref, flowT_ref, midT_ref,
                        mpad_ref, wpad_ref, *, taps, rc: int, r: int,
                        h_true: int):
    """(5, WB, H) h-averaged neq planes + (5, H, WB) R1 column slab →
    solved flow (2, H, WB) + flowT (2, WB, H) + row-warped R1 midT
    (5, WB, H).  The solve half is _tsolve_kernel verbatim; the warp
    half is pallas_warp_v_cf's exact _v_offsets clamp chain +
    _select_lerp, with the halo replicate-padded in-kernel (full image
    H is sublane-resident, so borders are the real image borders)."""
    from video_analytics_tpu.ops.pallas.warp import _select_lerp

    C, WB, H = hT_ref.shape
    for c in range(C):
        t = hT_ref[c].T                                  # (H, WB)
        mpad_ref[c, rc:rc + H, :] = t
        if rc:
            mpad_ref[c, :rc, :] = jnp.broadcast_to(t[:1], (rc, WB))
            mpad_ref[c, rc + H:, :] = jnp.broadcast_to(t[H - 1:],
                                                       (rc, WB))
    plan = tuple((c, taps) for c in range(5))
    outs = []
    _plan_outputs(mpad_ref, plan, rc, H,
                  emit=lambda o, res: outs.append(res))
    g11, g12, g22, h1, h2 = outs
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    fx = (g22 * h1 - g12 * h2) * idet
    fy = (g11 * h2 - g12 * h1) * idet
    flow_ref[0] = fx
    flow_ref[1] = fy
    flowT_ref[0] = fx.T
    flowT_ref[1] = fy.T

    hh = r + 8
    x = r1_ref[:]
    wpad_ref[:, hh:hh + H, :] = x
    wpad_ref[:, :hh, :] = jnp.broadcast_to(x[:, :1, :], (C, hh, WB))
    wpad_ref[:, hh + H:, :] = jnp.broadcast_to(x[:, H - 1:, :],
                                               (C, hh, WB))
    # _v_offsets, bit-identically (integer iota for Mosaic, then cast).
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, WB), 0) \
        .astype(jnp.float32)
    ys = jnp.clip(yy + fy, 0.0, h_true - 1.0)
    y0 = jnp.clip(jnp.floor(ys), 0.0, h_true - 2.0)
    fyv = ys - y0
    off = jnp.clip(y0 - yy, -r, r).astype(jnp.int32)
    mid = _select_lerp(lambda base: wpad_ref[:, base:base + H + 8, :],
                       off, fyv, (C, H, WB), r, hh)
    for c in range(C):
        midT_ref[c] = mid[c].T


def _tsolve_warp_wband(w: int, h: int, rc: int, r: int) -> int:
    """Largest W-band for the solve+warp kernel.  Words per sublane row
    (H lanes, padded hp): the _tsolve accounting ~50·hp + 20·rc, plus
    the warp half — R1 blocks double-buffered 10·hp, wpad 5·(hp+2hh),
    nine T planes + accumulators 55·hp, mid + midT transposes +
    out blocks ~25·hp, offset/frac planes ~6·hp → ≈ 151·hp + 10·hh
    + 20·rc with a 15% margin, against the same 80MB ceiling as the
    sibling warp kernels (v5e has 128MB physical VMEM)."""
    hp = -(-h // 128) * 128
    hh = r + 8
    words_per_row = 151 * hp + 10 * hh + 20 * rc
    budget = int(80 * 1024 * 1024 // 4 / 1.15)
    band = budget // words_per_row
    return max(0, (band // 8) * 8)


def tsolve_warp_fits(w: int, h: int, winsize: int, r: int) -> bool:
    # Same 128-multiple constraint on banded blocks as tsolve_fits.
    return _tsolve_warp_wband(w, h, winsize // 2, r) >= min(w, 128)


@functools.partial(jax.jit, static_argnames=("taps", "r"))
def corr_solve_warp_from_T_pallas(hT: jax.Array, R1: jax.Array,
                                  taps: Tuple[float, ...], r: int):
    """(B, 5, W, H) h-averaged neq planes + (B, 5, H, W) second-image
    expansion → (flow (B, 2, H, W), flowT (B, 2, W, H), midT
    (B, 5, W, H)): the W-space iteration's finishing v-avg + solve AND
    the next iteration's row-pass warp + layout transposes, fused.
    flow/flowT are bit-identical to corr_solve_from_T_pallas (+
    transpose); midT is bit-identical to
    pallas_warp_v_cf(R1, flow[:, 1], r).transpose."""
    B, C, W, H = hT.shape
    rc = len(taps) // 2
    wb = _tsolve_warp_wband(W, H, rc, r)
    wb = W if wb >= W else (wb // 128) * 128
    grid = (B, -(-W // wb))
    f32 = jnp.float32
    hh = r + 8
    return pl.pallas_call(
        functools.partial(_tsolve_warp_kernel, taps=taps, rc=rc, r=r,
                          h_true=H),
        grid=grid,
        in_specs=[pl.BlockSpec((None, 5, wb, H), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, 5, H, wb), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((None, 2, H, wb), lambda i, j: (i, 0, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 2, wb, H), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 5, wb, H), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, 2, H, W), f32),
                   jax.ShapeDtypeStruct((B, 2, W, H), f32),
                   jax.ShapeDtypeStruct((B, 5, W, H), f32)],
        scratch_shapes=[pltpu.VMEM((5, H + 2 * rc, wb), f32),
                        pltpu.VMEM((5, H + 2 * hh, wb), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(hT.astype(f32), R1.astype(f32))


def _warp_emit_kernel(r1_ref, flow_ref, flowT_ref, midT_ref, wpad_ref,
                      *, r: int, h_true: int):
    """Level-prologue variant of _tsolve_warp_kernel: row-pass warp of
    the R1 column slab by the INITIAL flow (upsampled from the coarser
    level, or zeros) + in-register transposes emitting midT/flowT for
    the first W-space kernel — replacing the standalone warp pass and
    both XLA layout transposes of the old prologue."""
    from video_analytics_tpu.ops.pallas.warp import _select_lerp

    C, H, WB = r1_ref.shape
    hh = r + 8
    x = r1_ref[:]
    wpad_ref[:, hh:hh + H, :] = x
    wpad_ref[:, :hh, :] = jnp.broadcast_to(x[:, :1, :], (C, hh, WB))
    wpad_ref[:, hh + H:, :] = jnp.broadcast_to(x[:, H - 1:, :],
                                               (C, hh, WB))
    fx = flow_ref[0]
    fy = flow_ref[1]
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, WB), 0) \
        .astype(jnp.float32)
    ys = jnp.clip(yy + fy, 0.0, h_true - 1.0)
    y0 = jnp.clip(jnp.floor(ys), 0.0, h_true - 2.0)
    fyv = ys - y0
    off = jnp.clip(y0 - yy, -r, r).astype(jnp.int32)
    mid = _select_lerp(lambda base: wpad_ref[:, base:base + H + 8, :],
                       off, fyv, (C, H, WB), r, hh)
    for c in range(C):
        midT_ref[c] = mid[c].T
    flowT_ref[0] = fx.T
    flowT_ref[1] = fy.T


@functools.partial(jax.jit, static_argnames=("r",))
def warp_emit_T_pallas(R1: jax.Array, flow_cf: jax.Array, r: int):
    """(B, 5, H, W) second-image expansion + (B, 2, H, W) initial flow
    → (flowT (B, 2, W, H), midT (B, 5, W, H)): the W-space level
    prologue in one kernel.  midT ≡ pallas_warp_v_cf(R1,
    flow[:, 1], r).transpose; flowT is the exact transpose.  Shares
    corr_solve_warp_from_T's VMEM band model (a strict over-estimate:
    no solve half here)."""
    B, C, H, W = R1.shape
    wb = _tsolve_warp_wband(W, H, 0, r)
    wb = W if wb >= W else (wb // 128) * 128
    grid = (B, -(-W // wb))
    f32 = jnp.float32
    hh = r + 8
    return pl.pallas_call(
        functools.partial(_warp_emit_kernel, r=r, h_true=H),
        grid=grid,
        in_specs=[pl.BlockSpec((None, 5, H, wb), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, 2, H, wb), lambda i, j: (i, 0, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((None, 2, wb, H), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 5, wb, H), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, 2, W, H), f32),
                   jax.ShapeDtypeStruct((B, 5, W, H), f32)],
        scratch_shapes=[pltpu.VMEM((5, H + 2 * hh, wb), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(R1.astype(f32), flow_cf.astype(f32))


# ---------------------------------------------------------------------------
# Whole-level Farneback kernel (r4b): ALL iterations of one pyramid
# level in ONE kernel.
#
# At headline shapes (≤ ~288² per plane) the full working set of an
# iteration — both poly expansions, the flow, the warp/select
# machinery and the window-average scratches — fits VMEM at once.  The
# lane-sweep ban that forced the W-space chain's kernel boundaries
# dissolves once tiles can be transposed IN-REGISTER between stages
# (Mosaic supports 2D f32 VREG transposes), so the whole iteration
# loop runs inside one pallas_call with a fori_loop: per level the HBM
# traffic collapses from ~119 plane traversals (two-kernel W-space
# chain) to 16 — read R0T, R1, the initial flow and attT once, write
# the final flow once — and per-iteration dispatch overhead vanishes.
# The per-pixel f32 math is stage-for-stage identical to the W-space
# chain (same _v_offsets / column clamp chains, same
# _normal_equations, same _plan_outputs averages, same solve).
# ---------------------------------------------------------------------------


def _level_kernel(r0T_ref, r1_ref, flow0_ref, attT_ref, out_ref,
                  wpad_ref, wpadT_ref, mpadT_ref, mpad_ref, flow_ref,
                  *, taps, r: int, rc: int, iterations: int):
    """One batch element's whole level: (5, W, H) R0T + (5, H, W) R1 +
    (2, H, W) initial flow → (2, H, W) final flow after `iterations`
    fused Farneback iterations, everything VMEM-resident."""
    from video_analytics_tpu.flow.farneback import _normal_equations
    from video_analytics_tpu.ops.pallas.warp import _select_lerp

    C, H, W = r1_ref.shape
    hh = r + 8
    # R1 is constant across iterations: replicate-pad it once.
    x = r1_ref[:]
    wpad_ref[:, hh:hh + H, :] = x
    wpad_ref[:, :hh, :] = jnp.broadcast_to(x[:, :1, :], (C, hh, W))
    wpad_ref[:, hh + H:, :] = jnp.broadcast_to(x[:, H - 1:, :],
                                               (C, hh, W))
    flow_ref[:] = flow0_ref[:]
    attT = attT_ref[:]
    r0T = tuple(r0T_ref[i] for i in range(5))
    plan = tuple((c, taps) for c in range(5))

    yyH = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0) \
        .astype(jnp.float32)                 # sublane = image row
    xxT = jax.lax.broadcasted_iota(jnp.int32, (W, H), 0) \
        .astype(jnp.float32)                 # sublane = image column
    yyT = jax.lax.broadcasted_iota(jnp.int32, (W, H), 1) \
        .astype(jnp.float32)                 # lane    = image row

    def body(_, carry):
        fx = flow_ref[0]
        fy = flow_ref[1]
        # Row-pass warp (H-layout): pallas_warp_v_cf's exact chain.
        ys = jnp.clip(yyH + fy, 0.0, H - 1.0)
        y0 = jnp.clip(jnp.floor(ys), 0.0, H - 2.0)
        fyv = ys - y0
        offy = jnp.clip(y0 - yyH, -r, r).astype(jnp.int32)
        mid = _select_lerp(
            lambda base: wpad_ref[:, base:base + H + 8, :],
            offy, fyv, (C, H, W), r, hh)
        # To W-space in registers; pad for the column-pass warp.
        for c in range(C):
            t = mid[c].T
            wpadT_ref[c, hh:hh + W, :] = t
            wpadT_ref[c, :hh, :] = jnp.broadcast_to(t[:1], (hh, H))
            wpadT_ref[c, hh + W:, :] = jnp.broadcast_to(t[W - 1:],
                                                        (hh, H))
        dxT = fx.T
        dyT = fy.T
        # Column-pass warp: warp_neq_corr's exact chain.
        xs = jnp.clip(xxT + dxT, 0.0, W - 1.0)
        x0 = jnp.clip(jnp.floor(xs), 0.0, W - 2.0)
        fxv = xs - x0
        offx = jnp.clip(x0 - xxT, -r, r).astype(jnp.int32)
        r1w = _select_lerp(
            lambda base: wpadT_ref[:, base:base + W + 8, :],
            offx, fxv, (C, W, H), r, hh)
        # cv2 interior test + normal equations, in transposed coords.
        x1 = jnp.floor(xxT + dxT)
        y1 = jnp.floor(yyT + dyT)
        inb = (x1 >= 0) & (x1 < W - 1) & (y1 >= 0) & (y1 < H - 1)
        m = _normal_equations(r0T, tuple(r1w[i] for i in range(5)),
                              dxT, dyT, inb, attT)
        # Horizontal window average (sublane sweep in W-space).
        for i in range(5):
            mpadT_ref[i, rc:rc + W, :] = m[i]
            if rc:
                mpadT_ref[i, :rc, :] = jnp.broadcast_to(m[i][:1],
                                                        (rc, H))
                mpadT_ref[i, rc + W:, :] = jnp.broadcast_to(
                    m[i][W - 1:], (rc, H))
        hTs = []
        _plan_outputs(mpadT_ref, plan, rc, W,
                      emit=lambda o, res: hTs.append(res))
        # Back to H-layout in registers; vertical average + solve.
        for i in range(5):
            t = hTs[i].T
            mpad_ref[i, rc:rc + H, :] = t
            if rc:
                mpad_ref[i, :rc, :] = jnp.broadcast_to(t[:1], (rc, W))
                mpad_ref[i, rc + H:, :] = jnp.broadcast_to(t[H - 1:],
                                                           (rc, W))
        outs = []
        _plan_outputs(mpad_ref, plan, rc, H,
                      emit=lambda o, res: outs.append(res))
        g11, g12, g22, h1, h2 = outs
        idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
        flow_ref[0] = (g22 * h1 - g12 * h2) * idet
        flow_ref[1] = (g11 * h2 - g12 * h1) * idet
        return carry

    jax.lax.fori_loop(0, iterations, body, 0)
    out_ref[:] = flow_ref[:]


def _level_kernel_planes(h: int, w: int, r: int, rc: int,
                         taps_len: int) -> float:
    """Peak working set of _level_kernel in units of max(h,w)²-f32
    planes: pipeline blocks (13 in + 2 out, double-buffered ≈ 30),
    persistent scratches wpad/wpadT 10(+2hh rows)/flow 2, per-stage
    mpads 10(+2rc), nine select T planes ×5ch + accumulators 47 (live
    through each of the two warps), window-sum cache ≈ 5·log2(k) ×2
    passes' peak 15, transposed copies/neq temporaries ~25, offset/
    mask planes ~8."""
    cache = 5 * max(0, taps_len.bit_length() - 1)
    return 30 + 12 + 10 + 47 + cache + 25 + 8 \
        + (20 * (r + 8) + 20 * rc) / max(h, w)


def level_kernel_fits(h: int, w: int, r: int, winsize: int) -> bool:
    planes = _level_kernel_planes(h, w, r, winsize // 2, winsize)
    # Planes exist in both layouts; charge the larger padded area
    # (sublanes →8, lanes →128).
    area_h = (-(-h // 8) * 8) * (-(-w // 128) * 128)
    area_t = (-(-w // 8) * 8) * (-(-h // 128) * 128)
    words = planes * max(area_h, area_t)
    return words * 1.15 <= 80 * 1024 * 1024 // 4


@functools.partial(jax.jit, static_argnames=("taps", "r", "iterations"))
def farneback_level_pallas(R0T: jax.Array, R1: jax.Array,
                           flow0: jax.Array, attT: jax.Array,
                           taps: Tuple[float, ...], r: int,
                           iterations: int) -> jax.Array:
    """(B, 5, W, H) R0 transposed expansion + (B, 5, H, W) R1 +
    (B, 2, H, W) initial flow → (B, 2, H, W) flow after `iterations`
    whole-level fused iterations (see _level_kernel)."""
    B, C, H, W = R1.shape
    rc = len(taps) // 2
    f32 = jnp.float32
    hh = r + 8
    return pl.pallas_call(
        functools.partial(_level_kernel, taps=taps, r=r, rc=rc,
                          iterations=iterations),
        grid=(B,),
        in_specs=[pl.BlockSpec((None, 5, W, H), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, 5, H, W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, 2, H, W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((W, H), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, 2, H, W), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 2, H, W), f32),
        scratch_shapes=[pltpu.VMEM((5, H + 2 * hh, W), f32),
                        pltpu.VMEM((5, W + 2 * hh, H), f32),
                        pltpu.VMEM((5, W + 2 * rc, H), f32),
                        pltpu.VMEM((5, H + 2 * rc, W), f32),
                        pltpu.VMEM((2, H, W), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(R0T.astype(f32), R1.astype(f32), flow0.astype(f32),
      attT.astype(f32))


# ---------------------------------------------------------------------------
# Polynomial expansion
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n", "sigma", "cf",
                                              "layout"))
def poly_expansion_pallas(img: jax.Array, n: int, sigma: float,
                          cf: bool = False, layout: str = ""):
    """(B, H, W) → poly coefficients; two VMEM passes.  Matches
    flow.farneback.poly_expansion numerically.

    Layouts (``layout`` overrides ``cf`` when given):
      ""/"nhwc": (B, H, W, 5); cf=True or "cf": channels-first
      (B, 5, H, W) — the kernels' native layout; "cf_t": transposed
      channels-first (B, 5, W, H) — what the W-space fused iteration
      consumes for R0, obtained FREE (the sep-corr h-pass already ends
      in this layout); "cf_both": (cf, cf_t) tuple — the sequence form
      needs R1 in cf and R0 in cf_t, costing one 5-plane transpose
      (cheaper than the 6-plane restore the plain cf path pays)."""
    from video_analytics_tpu.flow.farneback import _poly_exp_setup
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_setup(n, sigma)
    g, xg, xxg = tuple(map(float, g)), tuple(map(float, xg)), \
        tuple(map(float, xxg))
    if not layout:
        layout = "cf" if cf else "nhwc"
    # Vertical: (vg, vx, vxx); horizontal combos:
    # s1=vg·g sx=vg·xg sxx=vg·xxg sy=vx·g sxy=vx·xg syy=vxx·g
    v_plan = ((0, g), (0, xg), (0, xxg))
    h_plan = ((0, g), (0, xg), (0, xxg), (1, g), (1, xg), (2, g))
    s = sep_corr2d_pallas(img[:, None], v_plan, h_plan,
                          transposed_out=layout in ("cf_t", "cf_both"))
    s1, sx, sxx, sy, sxy, syy = (s[:, i] for i in range(6))
    bx = sx * ig11
    by = sy * ig11
    cxx = s1 * ig03 + sxx * ig33
    cyy = s1 * ig03 + syy * ig33
    cxy = sxy * ig55
    if layout == "nhwc":
        return jnp.stack([bx, by, cxx, cyy, cxy], axis=-1)
    R = jnp.stack([bx, by, cxx, cyy, cxy], axis=1)
    if layout == "cf_t":
        return R                                  # (B, 5, W, H)
    if layout == "cf_both":
        return R.transpose(0, 1, 3, 2), R         # (cf, cf_t)
    return R                                      # "cf": (B, 5, H, W)


# ---------------------------------------------------------------------------
# Fused per-level prologue (r5): cv2's pre-blur, the pyramid resize and
# the WHOLE polynomial expansion in ONE kernel per frame.
#
# Per level the old prologue chain was gaussian_blur (2 XLA shift-add
# passes at FULL resolution) → jax.image.resize → poly v-kernel → XLA
# 3-plane transpose → poly h-kernel → XLA inverse-Gramian combine (+ a
# 5-plane layout transpose for the second layout) — ~30-40 HBM plane
# traversals and ~7 dispatches per frame per level, against the 16
# traversals the whole-level iteration kernel needs.  Here the frame is
# read from HBM once and only the 5/10 expansion planes are written
# back; every intermediate (blurred image, resized level image, basis
# correlations) lives in VMEM, with in-register 2D transposes between
# the separable passes (the farneback_level_pallas pattern).
#
# Numerics: the two blur passes and the whole poly section accumulate
# taps in exactly ops.kernels._conv1d / _plan_outputs order, so they
# are bit-identical to the XLA/Pallas path.  The pyramid resize is the
# one reordered stage: cv2/jax bilinear halving at exact power-of-two
# sizes reduces to a static two-tap 0.5/0.5 average per axis (src
# position dec·i + (dec-1)/2 lands mid-pair for every dec = 2^k), which
# this kernel applies x-axis-first where jax.image.resize applies
# y-first — a pure f32 rounding-order difference, gated in
# tests/test_pallas_farneback.py.  The fused path only engages when
# the level size is an exact 2^k divisor of the frame (cv2's rounded
# pyramid at pyr_scale=0.5 — every shipped shape qualifies); everything
# else falls back to the unfused chain.
# ---------------------------------------------------------------------------


def _pad_rows(pad_ref, x, n, reflect: bool, ch: Optional[int] = None):
    """Write x (N, M) into pad_ref rows [n, n+N) and fill the n border
    rows per side: reflect-101 (cv2 GaussianBlur BORDER_DEFAULT) or
    replicate (the sep-corr convention).  `ch` selects a channel of a
    3D pad scratch."""
    N, M = x.shape

    def put(rows, val):
        if ch is None:
            pad_ref[rows, :] = val
        else:
            pad_ref[ch, rows, :] = val

    put(slice(n, n + N), x)
    if not n:
        return
    if reflect:
        for i in range(1, n + 1):
            put(slice(n - i, n - i + 1), x[i:i + 1, :])
            put(slice(n + N - 1 + i, n + N + i), x[N - 1 - i:N - i, :])
    else:
        put(slice(0, n), jnp.broadcast_to(x[:1, :], (n, M)))
        put(slice(n + N, n + N + n),
            jnp.broadcast_to(x[N - 1:, :], (n, M)))


def _corr_rows(pad_ref, taps, N, ch: Optional[int] = None):
    """Sublane correlation over a padded scratch in ops.kernels._conv1d
    tap order (bit-parity with the XLA path rides on this order)."""
    acc = None
    for i, w in enumerate(taps):
        sl = pad_ref[i:i + N, :] if ch is None else pad_ref[ch, i:i + N, :]
        t = float(w) * sl
        acc = t if acc is None else acc + t
    return acc


def _decimate2(x, dec: int, out_n: int):
    """Static power-of-two bilinear decimation along the sublane axis:
    out[i] = 0.5·x[dec·i + dec/2 - 1] + 0.5·x[dec·i + dec/2] — exactly
    jax.image.resize(method='linear', antialias=False) for an exact
    dec× reduction (sample point dec·i + (dec-1)/2)."""
    if dec == 1:
        return x
    a = dec // 2 - 1
    y = x.reshape(out_n, dec, x.shape[1])
    return 0.5 * y[:, a, :] + 0.5 * y[:, a + 1, :]


def _poly_prologue_kernel(x_ref, *refs, blur, g, xg, xxg, igs,
                          dec: int, lh: int, lw: int, emit: str):
    """One frame's whole level prologue: (H, W) full-res frame →
    the 5 poly-expansion planes in channels-first ((5, lh, lw)) and/or
    transposed ((5, lw, lh)) layout, all intermediates VMEM-resident."""
    outs, scratch = refs[:-4], refs[-4:]
    bpad_ref, bpadT_ref, vpad_ref, hpadT_ref = scratch
    H, W = x_ref.shape
    nb = len(blur) // 2
    npo = len(g) // 2

    # cv2 pre-blur at FULL resolution (reflect-101), v then h pass —
    # the h pass runs on the in-register transpose so both are sublane
    # sweeps.
    _pad_rows(bpad_ref, x_ref[:], nb, reflect=True)
    vb = _corr_rows(bpad_ref, blur, H)                   # (H, W)
    _pad_rows(bpadT_ref, vb.T, nb, reflect=True)
    hbT = _corr_rows(bpadT_ref, blur, W)                 # (W, H)

    # Pyramid resize: x-axis first (sublane in the transposed layout),
    # then y-axis after transposing back.
    IT = _decimate2(hbT, dec, lw)                        # (lw, H)
    I = _decimate2(IT.T, dec, lh)                        # (lh, lw)

    # Poly expansion: vertical basis pass (replicate borders) ...
    _pad_rows(vpad_ref, I, npo, reflect=False)
    vg = _corr_rows(vpad_ref, g, lh)
    vx = _corr_rows(vpad_ref, xg, lh)
    vxx = _corr_rows(vpad_ref, xxg, lh)
    # ... horizontal pass on the in-register transposes ...
    for c, arr in enumerate((vg, vx, vxx)):
        _pad_rows(hpadT_ref, arr.T, npo, reflect=False, ch=c)
    s1 = _corr_rows(hpadT_ref, g, lw, ch=0)
    sx = _corr_rows(hpadT_ref, xg, lw, ch=0)
    sxx = _corr_rows(hpadT_ref, xxg, lw, ch=0)
    sy = _corr_rows(hpadT_ref, g, lw, ch=1)
    sxy = _corr_rows(hpadT_ref, xg, lw, ch=1)
    syy = _corr_rows(hpadT_ref, g, lw, ch=2)
    # ... inverse-Gramian combine (identical f32 expressions to
    # poly_expansion_pallas' XLA epilogue), in the transposed layout.
    ig11, ig03, ig33, ig55 = igs
    planes_T = (sx * ig11, sy * ig11,
                s1 * ig03 + sxx * ig33,
                s1 * ig03 + syy * ig33,
                sxy * ig55)                              # each (lw, lh)
    if emit == "cf_t":
        for i, p in enumerate(planes_T):
            outs[0][i] = p
    elif emit == "cf":
        for i, p in enumerate(planes_T):
            outs[0][i] = p.T
    else:                                                # cf_both
        for i, p in enumerate(planes_T):
            outs[0][i] = p.T
            outs[1][i] = p


def prologue_fits(h: int, w: int, lh: int, lw: int,
                  blur_len: int, poly_n: int) -> bool:
    """Gate for the fused per-level prologue: exact power-of-two level
    geometry + a VMEM working-set model (planes exist in both layouts;
    charge the larger padded area, same convention as
    level_kernel_fits).  Working set: pipeline in block (1 full-res
    plane) + out blocks (10 level planes), double-buffered; bpad scratch
    ~2 full-res planes; ~6 full-res register intermediates (x, vb, two
    transposes, hbT, IT); vpad + hpadT + ~18 level-size temporaries."""
    if lh <= 0 or lw <= 0 or h % lh or w % lw:
        return False
    dec = h // lh
    if w // lw != dec or dec & (dec - 1) or lh * dec != h or lw * dec != w:
        return False
    area_f = max((-(-h // 8) * 8) * (-(-w // 128) * 128),
                 (-(-w // 8) * 8) * (-(-h // 128) * 128))
    area_l = max((-(-lh // 8) * 8) * (-(-lw // 128) * 128),
                 (-(-lw // 8) * 8) * (-(-lh // 128) * 128))
    words = 10 * area_f + 42 * area_l
    return words * 1.15 <= 80 * 1024 * 1024 // 4


@functools.partial(jax.jit, static_argnames=("blur", "n", "sigma",
                                              "out_hw", "layout"))
def poly_prologue_pallas(frames: jax.Array, blur: Tuple[float, ...],
                         n: int, sigma: float, out_hw: Tuple[int, int],
                         layout: str = "cf_both"):
    """(T, H, W) full-res frames → per-level poly expansion(s) at
    `out_hw` = (lh, lw) with cv2's per-level pre-blur `blur` applied at
    full resolution first (flow/farneback._smooth_and_resize semantics,
    reference: SURVEY.md §2b #2/#7 — cv2 buildOpticalFlowPyramid +
    FarnebackPolyExp).  layout: "cf" → (T, 5, lh, lw); "cf_t" →
    (T, 5, lw, lh); "cf_both" → (cf, cf_t) tuple."""
    from video_analytics_tpu.flow.farneback import _poly_exp_setup
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_setup(n, sigma)
    g, xg, xxg = (tuple(map(float, a)) for a in (g, xg, xxg))
    T, H, W = frames.shape
    lh, lw = out_hw
    dec = H // lh
    nb = len(blur) // 2
    npo = len(g) // 2
    f32 = jnp.float32
    out_cf = jax.ShapeDtypeStruct((T, 5, lh, lw), f32)
    out_cft = jax.ShapeDtypeStruct((T, 5, lw, lh), f32)
    spec_cf = pl.BlockSpec((None, 5, lh, lw), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_cft = pl.BlockSpec((None, 5, lw, lh), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    if layout == "cf":
        out_shape, out_specs = out_cf, spec_cf
    elif layout == "cf_t":
        out_shape, out_specs = out_cft, spec_cft
    elif layout == "cf_both":
        out_shape, out_specs = [out_cf, out_cft], [spec_cf, spec_cft]
    else:
        raise ValueError(f"unknown layout {layout!r}")
    return pl.pallas_call(
        functools.partial(_poly_prologue_kernel, blur=blur, g=g, xg=xg,
                          xxg=xxg, igs=(ig11, ig03, ig33, ig55),
                          dec=dec, lh=lh, lw=lw, emit=layout),
        grid=(T,),
        in_specs=[pl.BlockSpec((None, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((H + 2 * nb, W), f32),
                        pltpu.VMEM((W + 2 * nb, H), f32),
                        pltpu.VMEM((lh + 2 * npo, lw), f32),
                        pltpu.VMEM((3, lw + 2 * npo, lh), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=pallas_interpret(),
    )(frames.astype(f32))


# ---------------------------------------------------------------------------
# Window average + 2x2 solve
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "cf"))
def update_flow_pallas(M: jax.Array, cfg: FarnebackConfig,
                       cf: bool = False) -> jax.Array:
    """(B, H, W, 5) normal-equation planes → (B, H, W, 2) flow: window
    average in VMEM per axis, 2x2 solve fused by XLA.  Matches
    _solve_flow(_blur_M(M)) numerically.  With cf=True both sides are
    channels-first ((B, 5, H, W) → (B, 2, H, W)) and the layout
    round trips drop out of the iteration chain."""
    from video_analytics_tpu.ops.kernels import farneback_window_taps
    taps = farneback_window_taps(cfg.winsize, cfg.gaussian_window)
    Mcf = M.astype(jnp.float32)
    if not cf:
        Mcf = Mcf.transpose(0, 3, 1, 2)                 # (B, 5, H, W)
    plan = tuple((c, taps) for c in range(5))
    # cv2's regularised 2×2 solve runs INSIDE the horizontal pass
    # (same f32 formula — see _sep_corr_kernel epilogue), so only 2
    # channels cross HBM after the h-pass instead of 5.
    flow = sep_corr2d_pallas(Mcf, plan, plan, h_epilogue="solve2x2")
    return flow if cf else flow.transpose(0, 2, 3, 1)


def farneback_stage_fits_vmem(h: int, w: int) -> bool:
    """Always true since row-banding landed — false only for absurd
    widths where a single 64-row banded block exceeds VMEM."""
    m = max(h, w)
    return 20 * m * 40 * 4 < 13 * 1024 * 1024
