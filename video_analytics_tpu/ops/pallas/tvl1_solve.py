"""Pallas TPU kernel: fused TV-L1 primal-dual solver (+ median).

The XLA while-loop solver streams ~15 (B,H,W) arrays through HBM on
every one of its ~300 iterations per warp — measured 2.5s for 32 pairs
at 224² (12.8 pairs/s), entirely HBM-bandwidth-bound.  This kernel
keeps the whole solver state (u, v, the four dual fields, the warped
gradients and residual) resident in VMEM for ALL iterations of a warp:
HBM is touched once in and once out per warp, a ~30x traffic cut.

Contents per (batch) grid step, all VMEM:
- the ρ-threshold v-step, the u-step (u = v + θ·div p), and the dual
  ascent — elementwise VPU work; spatial derivatives are pltpu.roll
  shifts with boundary masks (forward diff: zero last row/col;
  divergence: first row/col passthrough);
- the 3x3/5x5 median filter between outer iterations as an odd-even
  transposition sorting network over the 9/25 shifted planes
  (SURVEY.md §7 hard-part #4) — min/max ops only, no gather/sort;
- the cv2-style convergence gate: mean-squared update computed on the
  last inner iteration of each outer round; when it drops under ε² the
  remaining outer rounds become no-ops via pl.when.

Semantics match flow/tvl1.py's XLA reference solver (same update
order, same outer-boundary early exit); tests compare the two in
interpret mode on small configs.

Three granularities ship, picked per (level, batch) by VMEM gates:
per-warp whole-plane (`tvl1_solve_warp[_packed]`), row-banded chunked
for planes past VMEM (`tvl1_solve_warp_banded`, 1080p), and — r5c,
the widest — the whole-SCALE kernel (`tvl1_scale_pallas`): every warp
round's banded warp + grad/ρ prep + primal-dual solve plus the
scale-end median in ONE pallas_call, HBM touched once per scale (see
the section comment above `_scale_kernel_packed`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_analytics_tpu.config import TVL1Config
from video_analytics_tpu.utils.platform import pallas_interpret


def _roll(x, shift: int, axis: int):
    """pltpu.roll with negative shifts mapped to the equivalent
    non-negative circular shift."""
    n = x.shape[axis]
    return pltpu.roll(x, shift % n, axis)


def _median_network(planes):
    """Median of a list of (H, W) planes via the pruned Batcher
    selection network shared with ops/median.py — 113 min/max pairs
    for 25 planes vs 300 for the odd-even transposition sort this
    replaced (the median runs every outer round, so it was ~25% of the
    solver kernel's VPU work).  Same median, exact."""
    from video_analytics_tpu.ops.median import _median_network as _net
    network, median_wire = _net(len(planes))
    wires = list(planes)
    for (i, j) in network:
        if j < 0:
            wires[i] = wires[-1 - j]
        else:
            lo = jnp.minimum(wires[i], wires[j])
            hi = jnp.maximum(wires[i], wires[j])
            wires[i], wires[j] = lo, hi
    return wires[median_wire]


def _median2d(x, k: int):
    """k×k median of (H, W) with replicate border, via shifted planes
    + sorting network (k in {3, 5})."""
    H, W = x.shape
    r = k // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    planes = []
    for dy in range(-r, r + 1):
        # Vertical shift with replicate border.
        sy = _roll(x, -dy, 0)
        if dy < 0:
            sy = jnp.where(rows < -dy, x[0:1, :], sy)
        elif dy > 0:
            sy = jnp.where(rows >= H - dy, x[H - 1:H, :], sy)
        for dx in range(-r, r + 1):
            s = _roll(sy, -dx, 1)
            if dx < 0:
                s = jnp.where(cols < -dx, sy[:, 0:1], s)
            elif dx > 0:
                s = jnp.where(cols >= W - dx, sy[:, W - 1:W], s)
            planes.append(s)
    return _median_network(planes)


def _solver_kernel(I1wx_ref, I1wy_ref, grad_ref, rho_c_ref,
                   uin_ref, vin_ref, uout_ref, vout_ref,
                   *, cfg: TVL1Config):
    H, W = uin_ref.shape
    f32 = jnp.float32
    l_t = cfg.lambda_ * cfg.theta
    taut = cfg.tau / cfg.theta
    eps2 = cfg.epsilon * cfg.epsilon
    n_px = H * W

    I1wx = I1wx_ref[:]
    I1wy = I1wy_ref[:]
    grad = grad_ref[:]
    rho_c = rho_c_ref[:]
    # Loop-invariant hoists: one divide per warp, not per iteration.
    th = l_t * grad
    inv_grad = 1.0 / jnp.maximum(grad, 1e-10)

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    not_last_row = (rows < H - 1).astype(f32)
    not_last_col = (cols < W - 1).astype(f32)
    first_row = rows == 0
    first_col = cols == 0

    def fwd_grad(x):
        gx = (_roll(x, -1, 1) - x) * not_last_col
        gy = (_roll(x, -1, 0) - x) * not_last_row
        return gx, gy

    def div(p1, p2):
        d1 = jnp.where(first_col, p1, p1 - _roll(p1, 1, 1))
        d2 = jnp.where(first_row, p2, p2 - _roll(p2, 1, 0))
        return d1 + d2

    def step_core(state, with_err: bool):
        # The convergence error is only read at outer-round boundaries,
        # so all but the round's last inner step skip computing it
        # (with_err=False) — ~10% of the round's VPU work.  The dual
        # normalisation divides once and multiplies twice (was two
        # divides per field pair).
        u, v, p11, p12, p21, p22, err = state
        rho = rho_c + I1wx * u + I1wy * v
        d = jnp.where(
            rho < -th, l_t,
            jnp.where(rho > th, -l_t, -rho * inv_grad))
        v1 = u + d * I1wx
        v2 = v + d * I1wy
        un = v1 + cfg.theta * div(p11, p12)
        vn = v2 + cfg.theta * div(p21, p22)
        if with_err:
            err = jnp.sum((un - u) ** 2 + (vn - v) ** 2) / n_px
        ux, uy = fwd_grad(un)
        vx, vy = fwd_grad(vn)
        inv1 = 1.0 / (1.0 + taut * jnp.sqrt(ux * ux + uy * uy))
        inv2 = 1.0 / (1.0 + taut * jnp.sqrt(vx * vx + vy * vy))
        p11n = (p11 + taut * ux) * inv1
        p12n = (p12 + taut * uy) * inv1
        p21n = (p21 + taut * vx) * inv2
        p22n = (p22 + taut * vy) * inv2
        return un, vn, p11n, p12n, p21n, p22n, err

    def inner_step(_, state):
        return step_core(state, with_err=False)

    def outer_step(_, state):
        u, v, p11, p12, p21, p22, err = state
        converged = err < eps2

        def run(st):
            u, v, p11, p12, p21, p22, err = st
            if cfg.median_filtering > 1:
                u = _median2d(u, cfg.median_filtering)
                v = _median2d(v, cfg.median_filtering)
            st = jax.lax.fori_loop(
                0, cfg.inner_iterations - 1, inner_step,
                (u, v, p11, p12, p21, p22, err))
            return step_core(st, with_err=True)

        return jax.lax.cond(converged, lambda st: st, run, state)

    zeros = jnp.zeros((H, W), f32)
    init = (uin_ref[:], vin_ref[:], zeros, zeros, zeros, zeros,
            jnp.asarray(jnp.inf, f32))
    u, v, *_rest, err = jax.lax.fori_loop(
        0, cfg.outer_iterations, outer_step, init)
    uout_ref[:] = u
    vout_ref[:] = v


@functools.partial(jax.jit, static_argnames=("cfg",))
def tvl1_solve_warp(I1wx: jax.Array, I1wy: jax.Array, grad: jax.Array,
                    rho_c: jax.Array, u: jax.Array, v: jax.Array,
                    cfg: TVL1Config) -> Tuple[jax.Array, jax.Array]:
    """All primal-dual iterations of one TV-L1 warp, VMEM-resident.

    Args: (B, H, W) warped gradients / |∇I|² / residual constant and
    the current flow estimate.  Returns updated (u, v).
    """
    B, H, W = u.shape
    u2, v2 = pl.pallas_call(
        functools.partial(_solver_kernel, cfg=cfg),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ] + [
            pl.BlockSpec((None, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        ],
        interpret=pallas_interpret(),
    )(I1wx.astype(jnp.float32), I1wy.astype(jnp.float32),
      grad.astype(jnp.float32), rho_c.astype(jnp.float32),
      u.astype(jnp.float32), v.astype(jnp.float32))
    return u2, v2


def solver_fits_vmem(h: int, w: int, median: int) -> bool:
    """VMEM working-set check: solver state + median planes."""
    state = 12 * h * w                       # u,v,p×4,gradients,temps
    planes = (median * median + 2) * h * w if median > 1 else 0
    return (state + planes) * 4 < 13 * 1024 * 1024


# ---------------------------------------------------------------------------
# Lane-packed whole-plane solver (r5).
#
# The VPU probe (r5, STATUS "TV-L1 224² floor") showed the whole-plane
# solver running AT the VPU arithmetic floor per PADDED lane — and
# Mosaic pads the lane dim to 128: a 224-wide plane computes 256 lanes
# (12.5% waste), 179 computes 256 (43%), 143 computes 256 (79%).  The
# pyramid's mid levels therefore burn a third of their VPU time on pad
# lanes.  Packing n_img batch images side by side along the lane axis
# makes the padding amortise: 4×224 = 896 lanes exactly, 4×179 → 768
# (192/image), 4×143 → 640 (160/image), 4×92 → 384 (96/image).
#
# Semantics per image are EXACT: every elementwise op is unchanged; the
# lane rolls in the forward gradient / divergence do cross image seams,
# but the same boundary where-selects that already handle the image
# border discard the leaked values (a seam IS a pair of image borders);
# the in-kernel median clamps its horizontal shifts per image (same
# iterated-clamped-shift construction as the banded kernel's
# _median2d_global); and the cv2 ε convergence gate is evaluated
# per image (masked sums), with converged images' state frozen by a
# round-end select while seam-mates keep iterating — each image follows
# exactly the trajectory it would follow alone, up to the f32 reduction
# order of its convergence sum (same caveat as the banded solver).
# ---------------------------------------------------------------------------


def _median2d_xi(x, xi, w_img: int, k: int):
    """k×k median of an (H, Wp) lane-packed block with replicate
    borders per IMAGE horizontally (xi = per-image column index) and at
    the block edges vertically (H is unpacked)."""
    H, W = x.shape
    r = k // 2
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    planes = []
    ups = [x]
    downs = [x]
    for _ in range(r):
        p = ups[-1]
        ups.append(jnp.where(rows <= 0, p, _roll(p, 1, 0)))
        p = downs[-1]
        downs.append(jnp.where(rows >= H - 1, p, _roll(p, -1, 0)))
    for sy in ups[::-1][:-1] + [x] + downs[1:]:
        row = [sy]
        left = [sy]
        for _ in range(r):
            p = row[-1]
            row.append(jnp.where(xi <= 0, p, _roll(p, 1, 1)))
            p = left[-1]
            left.append(jnp.where(xi >= w_img - 1, p, _roll(p, -1, 1)))
        planes.extend(row[::-1][:-1] + [sy] + left[1:])
    return _median_network(planes)


def _pd_solve_packed(I1wx, I1wy, grad, rho_c, uin, vin,
                     *, cfg: TVL1Config, n_img: int, w_img: int):
    """All primal-dual iterations of one warp on an (H, n_img·w_img)
    lane-packed VALUE block with per-image borders, medians and ε gates
    (see module comment) — the body of _solver_kernel_packed, factored
    out so the whole-scale fused kernel (r5b, _scale_kernel_packed)
    can run the identical solver on its in-kernel-warped planes.
    Returns the updated (u, v)."""
    H, W = uin.shape
    f32 = jnp.float32
    l_t = cfg.lambda_ * cfg.theta
    taut = cfg.tau / cfg.theta
    eps2 = cfg.epsilon * cfg.epsilon
    n_px = H * w_img

    th = l_t * grad
    inv_grad = 1.0 / jnp.maximum(grad, 1e-10)

    rows = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    # Per-image column index and masks (static n_img, where-chain —
    # Mosaic iota must stay integer).
    xi = cols
    for kimg in range(1, n_img):
        xi = jnp.where(cols >= kimg * w_img, cols - kimg * w_img, xi)
    img_masks = [((cols >= kimg * w_img) & (cols < (kimg + 1) * w_img))
                 for kimg in range(n_img)]
    not_last_row = (rows < H - 1).astype(f32)
    not_last_col = (xi < w_img - 1).astype(f32)
    first_row = rows == 0
    first_col = xi == 0

    def fwd_grad(x):
        # The lane roll reads across image seams; the border masks
        # (a seam is a pair of image borders) zero those terms exactly.
        gx = (_roll(x, -1, 1) - x) * not_last_col
        gy = (_roll(x, -1, 0) - x) * not_last_row
        return gx, gy

    def div(p1, p2):
        d1 = jnp.where(first_col, p1, p1 - _roll(p1, 1, 1))
        d2 = jnp.where(first_row, p2, p2 - _roll(p2, 1, 0))
        return d1 + d2

    def step_core(state, with_err: bool):
        u, v, p11, p12, p21, p22, errs = state
        rho = rho_c + I1wx * u + I1wy * v
        d = jnp.where(
            rho < -th, l_t,
            jnp.where(rho > th, -l_t, -rho * inv_grad))
        v1 = u + d * I1wx
        v2 = v + d * I1wy
        un = v1 + cfg.theta * div(p11, p12)
        vn = v2 + cfg.theta * div(p21, p22)
        if with_err:
            d2 = (un - u) ** 2 + (vn - v) ** 2
            # Tuple of per-image scalars (not a rank-1 vector: Mosaic
            # handles 0/2-rank values; the tuple rides the loop carry).
            errs = tuple(jnp.sum(jnp.where(m, d2, 0.0)) / n_px
                         for m in img_masks)
        ux, uy = fwd_grad(un)
        vx, vy = fwd_grad(vn)
        inv1 = 1.0 / (1.0 + taut * jnp.sqrt(ux * ux + uy * uy))
        inv2 = 1.0 / (1.0 + taut * jnp.sqrt(vx * vx + vy * vy))
        p11n = (p11 + taut * ux) * inv1
        p12n = (p12 + taut * uy) * inv1
        p21n = (p21 + taut * vx) * inv2
        p22n = (p22 + taut * vy) * inv2
        return un, vn, p11n, p12n, p21n, p22n, errs

    def inner_step(_, state):
        return step_core(state, with_err=False)

    def outer_step(_, state):
        u, v, p11, p12, p21, p22, errs = state
        conv = tuple(e < eps2 for e in errs)   # per-image ε gates

        def run(st):
            u0, v0, q11, q12, q21, q22, errs0 = st
            u1, v1 = u0, v0
            if cfg.median_filtering > 1:
                u1 = _median2d_xi(u1, xi, w_img, cfg.median_filtering)
                v1 = _median2d_xi(v1, xi, w_img, cfg.median_filtering)
            st2 = jax.lax.fori_loop(
                0, cfg.inner_iterations - 1, inner_step,
                (u1, v1, q11, q12, q21, q22, errs0))
            un, vn, r11, r12, r21, r22, errn = \
                step_core(st2, with_err=True)
            # Freeze converged images: their state (incl. the median)
            # passes through untouched, exactly as if their solo kernel
            # had taken the ε exit this round.
            keep = img_masks[0] & conv[0]
            for kimg in range(1, n_img):
                keep = keep | (img_masks[kimg] & conv[kimg])
            sel = lambda old, new: jnp.where(keep, old, new)
            errs1 = tuple(
                jnp.where(conv[kimg], errs0[kimg], errn[kimg])
                for kimg in range(n_img))
            return (sel(u0, un), sel(v0, vn), sel(q11, r11),
                    sel(q12, r12), sel(q21, r21), sel(q22, r22), errs1)

        all_conv = conv[0]
        for c in conv[1:]:
            all_conv = jnp.logical_and(all_conv, c)
        return jax.lax.cond(all_conv, lambda st: st, run, state)

    zeros = jnp.zeros((H, W), f32)
    init = (uin, vin, zeros, zeros, zeros, zeros,
            tuple(jnp.asarray(jnp.inf, f32) for _ in range(n_img)))
    u, v, *_rest, errs = jax.lax.fori_loop(
        0, cfg.outer_iterations, outer_step, init)
    return u, v


def _solver_kernel_packed(I1wx_ref, I1wy_ref, grad_ref, rho_c_ref,
                          uin_ref, vin_ref, uout_ref, vout_ref,
                          *, cfg: TVL1Config, n_img: int, w_img: int):
    """_solver_kernel on an (H, n_img·w_img) lane-packed block with
    per-image borders, medians and ε gates (see module comment)."""
    uout_ref[:], vout_ref[:] = _pd_solve_packed(
        I1wx_ref[:], I1wy_ref[:], grad_ref[:], rho_c_ref[:],
        uin_ref[:], vin_ref[:], cfg=cfg, n_img=n_img, w_img=w_img)


@functools.partial(jax.jit, static_argnames=("cfg", "n_img", "w_img"))
def tvl1_solve_warp_packed(I1wx: jax.Array, I1wy: jax.Array,
                           grad: jax.Array, rho_c: jax.Array,
                           u: jax.Array, v: jax.Array,
                           cfg: TVL1Config, n_img: int,
                           w_img: int) -> Tuple[jax.Array, jax.Array]:
    """All primal-dual iterations of one TV-L1 warp on lane-packed
    planes: (B/n_img, H, n_img·w_img) arrays packing n_img images side
    by side along the lane axis (flow.tvl1._pack_lanes layout)."""
    if n_img == 1:
        return tvl1_solve_warp(I1wx, I1wy, grad, rho_c, u, v, cfg)
    B, H, W = u.shape
    assert W == n_img * w_img
    spec = pl.BlockSpec((None, H, W), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    u2, v2 = pl.pallas_call(
        functools.partial(_solver_kernel_packed, cfg=cfg, n_img=n_img,
                          w_img=w_img),
        grid=(B,),
        in_specs=[spec] * 6,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((B, H, W), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PACKED_SCOPED_BYTES),
        interpret=pallas_interpret(),
    )(I1wx.astype(jnp.float32), I1wy.astype(jnp.float32),
      grad.astype(jnp.float32), rho_c.astype(jnp.float32),
      u.astype(jnp.float32), v.astype(jnp.float32))
    return u2, v2


_PACKED_SCOPED_BYTES = 100 * 1024 * 1024


def packed_solver_fits(h: int, w_img: int, n_img: int,
                       median: int) -> bool:
    """VMEM model for the packed kernel: peak live planes are the
    median phase (25 shifted planes + 5 hoisted consts + 6 state) plus
    Mosaic's double-buffered pipeline blocks (8 × 2); lane dim padded
    to the 128 tile.  Margin via the banded kernel's calibrated
    1.1515 scoped-stack factor."""
    wp = -(-(n_img * w_img) // 128) * 128
    live = (25 if median > 1 else 12) + 5 + 6 + 16
    return live * h * wp * 4 * 1.1515 < _PACKED_SCOPED_BYTES


def pack_choice(h: int, w: int, batch: int, median: int) -> int:
    """Largest n_img in (4, 2) that strictly reduces padded lanes per
    image, divides the batch, and fits VMEM — else 1."""
    pad = lambda n: -(-(n * w) // 128) * 128
    for n in (4, 2):
        if (batch % n == 0 and pad(n) * 1.0 / n < pad(1)
                and packed_solver_fits(h, w, n, median)):
            return n
    return 1


# ---------------------------------------------------------------------------
# Whole-SCALE fused kernel (r5b): warp + ρ/grad prep + every warp's
# primal-dual iterations + the scale-end median in ONE pallas_call per
# pyramid scale — the farneback_kernels._level_kernel treatment for the
# DEFAULT flow algorithm.
#
# After lane packing, the 224² driver still pays per scale `warps`
# rounds of [two banded-warp passes + two XLA plane transposes + an XLA
# grad/ρ prep] around each solver dispatch — 0.74 ms/pair of non-solver
# wall at 224² (STATUS "TV-L1 224² floor analysis"), dominated by the
# inter-stage HBM round trips and the XLA transposes (~93 GB/s
# measured).  This kernel keeps one whole scale VMEM-resident:
# I1/I1x/I1y are replicate-padded into a persistent scratch ONCE; each
# warp iteration then runs pallas_warp_cf's exact offset/lerp chain
# in-kernel (row pass in H-layout, in-register tile transpose, column
# pass in W-layout with per-image packed coordinates, transpose back),
# forms grad/ρ_c, and runs the identical packed primal-dual solver body
# (_pd_solve_packed); the scale-end median runs per image before the
# final store.  HBM is touched once in and once out per SCALE, and the
# warp↔solver transposes ride VREG shuffles instead of HBM.
#
# Semantics: the same f32 op chain as [pallas_warp_cf → XLA grad/ρ prep
# → tvl1_solve_warp_packed → median_filter2d]; the only tolerated
# difference is FMA contraction in the grad/ρ expressions (XLA fuses
# them differently than Mosaic) — gated by tests/test_tvl1.py's
# scale-kernel equivalence tests.
# ---------------------------------------------------------------------------


def _scale_kernel_packed(I0_ref, I13_ref, uin_ref, vin_ref,
                         uout_ref, vout_ref, wpad_ref, wpadT_ref,
                         *, cfg: TVL1Config, n_img: int, w_img: int,
                         r: int, final_median: bool):
    """One batch block's whole pyramid scale: (H, Wp) packed I0 +
    (3, H, Wp) packed [I1, I1x, I1y] + packed initial (u, v) →
    packed (u, v) after cfg.warps fused warp+solve rounds."""
    from video_analytics_tpu.ops.pallas.warp import _select_lerp

    C, H, W = I13_ref.shape
    f32 = jnp.float32
    hh = r + 8
    wi = w_img

    # I1 and its gradients are constant across warps: replicate-pad the
    # row-pass source once.
    x = I13_ref[:]
    wpad_ref[:, hh:hh + H, :] = x
    wpad_ref[:, :hh, :] = jnp.broadcast_to(x[:, :1, :], (C, hh, W))
    wpad_ref[:, hh + H:, :] = jnp.broadcast_to(x[:, H - 1:, :],
                                               (C, hh, W))
    I0 = I0_ref[:]

    rows_f = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0).astype(f32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    xi = cols
    for kimg in range(1, n_img):
        xi = jnp.where(cols >= kimg * wi, cols - kimg * wi, xi)
    # Transposed-layout per-image column coordinate (sublane = packed
    # column) for the column-pass warp.
    colsT = jax.lax.broadcasted_iota(jnp.int32, (W, H), 0)
    xiT = colsT
    for kimg in range(1, n_img):
        xiT = jnp.where(colsT >= kimg * wi, colsT - kimg * wi, xiT)
    xiT_f = xiT.astype(f32)

    def warp_body(_, carry):
        u, v = carry
        # Row pass: pallas_warp_cf's exact vertical chain (_v_offsets).
        ys = jnp.clip(rows_f + v, 0.0, H - 1.0)
        y0 = jnp.clip(jnp.floor(ys), 0.0, H - 2.0)
        fy = ys - y0
        offy = jnp.clip(y0 - rows_f, -r, r).astype(jnp.int32)
        mid = _select_lerp(
            lambda base: wpad_ref[:, base:base + H + 8, :],
            offy, fy, (C, H, W), r, hh)
        # To W-layout in registers; replicate-pad at the PACKED block's
        # column edges (interior images never select into the pad: the
        # per-image clamps keep every offset inside its own image).
        for c in range(C):
            t = mid[c].T
            wpadT_ref[c, hh:hh + W, :] = t
            wpadT_ref[c, :hh, :] = jnp.broadcast_to(t[:1], (hh, H))
            wpadT_ref[c, hh + W:, :] = jnp.broadcast_to(t[W - 1:],
                                                        (hh, H))
        # Column pass: pallas_warp_cf's exact horizontal chain, in
        # transposed coordinates (elementwise, so layout-commutative).
        uT = u.T
        xs = jnp.clip(xiT_f + uT, 0.0, wi - 1.0)
        x0 = jnp.clip(jnp.floor(xs), 0.0, wi - 2.0)
        fx = xs - x0
        offx = jnp.clip(x0 - xiT_f, -r, r).astype(jnp.int32)
        wT = _select_lerp(
            lambda base: wpadT_ref[:, base:base + W + 8, :],
            offx, fx, (C, W, H), r, hh)
        I1w = wT[0].T
        I1wx = wT[1].T
        I1wy = wT[2].T
        grad = I1wx * I1wx + I1wy * I1wy
        rho_c = I1w - I1wx * u - I1wy * v - I0
        return _pd_solve_packed(I1wx, I1wy, grad, rho_c, u, v,
                                cfg=cfg, n_img=n_img, w_img=wi)

    u, v = jax.lax.fori_loop(0, cfg.warps, warp_body,
                             (uin_ref[:], vin_ref[:]))
    if final_median and cfg.median_filtering > 1:
        u = _median2d_xi(u, xi, wi, cfg.median_filtering)
        v = _median2d_xi(v, xi, wi, cfg.median_filtering)
    uout_ref[:] = u
    vout_ref[:] = v


@functools.partial(jax.jit, static_argnames=("cfg", "n_img", "w_img",
                                             "r", "final_median"))
def tvl1_scale_pallas(I0: jax.Array, I13: jax.Array, u: jax.Array,
                      v: jax.Array, cfg: TVL1Config, n_img: int,
                      w_img: int, r: int,
                      final_median: bool = True
                      ) -> Tuple[jax.Array, jax.Array]:
    """One whole TV-L1 pyramid scale — all cfg.warps rounds of
    [banded warp + grad/ρ prep + primal-dual solve] plus the scale-end
    median — as ONE Pallas kernel on lane-packed planes.

    Args: I0 (B, H, n_img·w_img) packed reference frame; I13
    (B, 3, H, n_img·w_img) packed [I1, I1x, I1y]; u, v packed initial
    flow; r the scale's displacement band (flow.farneback._level_band).
    Returns the packed (u, v) after the whole scale.
    """
    B, H, W = u.shape
    assert W == n_img * w_img
    r = max(1, min(r, H - 2, w_img - 2))
    hh = r + 8
    f32 = jnp.float32
    spec = pl.BlockSpec((None, H, W), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    spec3 = pl.BlockSpec((None, 3, H, W), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    u2, v2 = pl.pallas_call(
        functools.partial(_scale_kernel_packed, cfg=cfg, n_img=n_img,
                          w_img=w_img, r=r, final_median=final_median),
        grid=(B,),
        in_specs=[spec, spec3, spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((B, H, W), f32)] * 2,
        scratch_shapes=[pltpu.VMEM((3, H + 2 * hh, W), f32),
                        pltpu.VMEM((3, W + 2 * hh, H), f32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_PACKED_SCOPED_BYTES),
        interpret=pallas_interpret(),
    )(I0.astype(f32), I13.astype(f32), u.astype(f32), v.astype(f32))
    return u2, v2


def scale_kernel_fits(h: int, w_img: int, n_img: int, median: int,
                      r: int) -> bool:
    """VMEM model for the whole-scale kernel.  Planes are charged per
    layout (H-layout: sublane=image row; T-layout: sublane=packed
    column), each at its padded tile area:
    H-layout — pipeline blocks (6 in + 2 out, double-buffered ≈ 16),
    wpad 3, mid + back-transposed warps 6, solver peak (median 25 +
    consts 6 + state/duals 6 + temps ~8) 45, masks/iota ~5 → 75;
    T-layout — wpadT 3, nine select T planes + accumulators 33,
    offset/frac planes ~5, warped 3 → 44; plus the pad scratches' halo
    rows.  Conservative: warp-phase and solver-phase planes are summed
    even though their live ranges barely overlap (the r3 grid>1
    double-buffering lesson says over-, not under-charge)."""
    r = max(1, min(r, h - 2, w_img - 2))
    hh = r + 8
    w = n_img * w_img
    area_h = (-(-h // 8) * 8) * (-(-w // 128) * 128)
    area_t = (-(-w // 8) * 8) * (-(-h // 128) * 128)
    words = 75 * area_h + 44 * area_t \
        + 6 * hh * (-(-w // 128) * 128) + 6 * hh * (-(-h // 128) * 128)
    return words * 1.15 <= _PACKED_SCOPED_BYTES // 4 * 0.8


def scale_pack_choice(h: int, w: int, batch: int, median: int,
                      r: int) -> int:
    """Largest n_img in (4, 2, 1) that divides the batch, does not
    increase padded lanes per image, and fits the whole-scale kernel's
    VMEM model — 0 when none fits (caller falls back to the per-warp
    chain)."""
    pad = lambda n: -(-(n * w) // 128) * 128
    for n in (4, 2, 1):
        if (batch % n == 0 and pad(n) * 1.0 / n <= pad(1)
                and scale_kernel_fits(h, w, n, median, r)):
            return n
    return 0

# ---------------------------------------------------------------------------
# Row-banded solver for shapes beyond the whole-plane kernel's VMEM
# (VERDICT r1 #2; BASELINE config #5 — native-resolution 1080p TV-L1).
#
# Scheme (r3, DMA-windowed): the image is split into row bands; each
# band block carries a halo wide enough that `chunk` primal-dual
# iterations (dependency radius 1 row/iteration) plus the round-opening
# median (radius 2) leave the band interior BIT-EXACT vs the global
# iteration.  State (u, v, p) lives in a PERSISTENT PADDED (B, Hpad, W)
# layout in HBM; every kernel instance DMAs its overlapping window
# straight out of those planes (8-aligned dynamic sublane starts) and
# DMAs its interior band back — there is no XLA-level window
# gather/scatter, no pad, no reassembly, and since the 5x5 median runs
# INSIDE the first chunk of each round (with image-global replicate
# borders via clamped shifts), a whole outer round costs exactly
# ceil(K/chunk) kernel dispatches and a tiny flag computation.  The
# convergence structure mirrors the monolithic kernel's outer_step:
# per-image ε gate, plus (adaptive=True) per-band gating where
# converged bands and their neighbours-of-converged pass through for
# ~free.  True-boundary behaviour comes from the block's global row
# offset (program_id-derived), so ONE Mosaic kernel serves all bands,
# rounds and levels of a given block shape.
# ---------------------------------------------------------------------------


def _clamped_shift_planes(x, rowg, h_true: int, r: int):
    """2r+1 vertically shifted copies of the (N, W) block `x` with
    replicate border at the IMAGE edges (rowg==0 / rowg==h_true-1),
    independent of where the block sits: iterated clamped shifts
    compose to x[clip(rowg+d, 0, h-1)] for every in-image row."""
    up = [x]
    down = [x]
    for _ in range(r):
        p = up[-1]
        up.append(jnp.where(rowg <= 0, p, _roll(p, 1, 0)))
        p = down[-1]
        down.append(jnp.where(rowg >= h_true - 1, p, _roll(p, -1, 0)))
    return up[::-1][:-1] + [x] + down[1:]


def _median2d_global(x, rowg, h_true: int, k: int, w_true: int):
    """k×k median of a band block with image-global replicate border
    (exact match of ops.median.median_filter2d on all in-image rows;
    `w_true` is the image width — the block's lane dim may be padded
    to the 128 tile)."""
    N, W = x.shape
    r = k // 2
    cols = jax.lax.broadcasted_iota(jnp.int32, (N, W), 1)
    planes = []
    for sy in _clamped_shift_planes(x, rowg, h_true, r):
        row = [sy]
        left = [sy]
        for _ in range(r):
            p = row[-1]
            row.append(jnp.where(cols <= 0, p, _roll(p, 1, 1)))
            p = left[-1]
            left.append(jnp.where(cols >= w_true - 1, p, _roll(p, -1, 1)))
        planes.extend(row[::-1][:-1] + [sy] + left[1:])
    return _median_network(planes)


def _dma_chunk_kernel(uin, vin, p11i, p12i, p21i, p22i,
                      I1wx_h, I1wy_h, grad_h, rho_h,
                      act_ref,
                      uout, vout, p11o, p12o, p21o, p22o, err_ref,
                      sin, sout, in_sems, out_sems,
                      *, cfg: TVL1Config, iters: int, h_true: int,
                      w_true: int, band: int, halo: int, NB: int,
                      do_median: bool):
    """`iters` primal-dual iterations (preceded, when do_median, by the
    round-opening median) on one (band + 2·halo, W) block, windowed by
    manual DMA from the persistent padded state planes.

    Inactive blocks (act==0: their image converged, or — adaptive mode
    — the band and its neighbours individually met the ε criterion)
    copy their interior through unchanged; the first/last band of each
    image also re-writes the constant zero pad rows so the padded
    layout stays closed under chunk application."""
    g = pl.program_id(0)
    b = g // NB
    i = g % NB
    n_blk = band + 2 * halo
    row0 = i * band                       # window start in padded rows
    W = sin.shape[2]
    f32 = jnp.float32
    l_t = cfg.lambda_ * cfg.theta
    taut = cfg.tau / cfg.theta

    in_refs = (uin, vin, p11i, p12i, p21i, p22i,
               I1wx_h, I1wy_h, grad_h, rho_h)
    dmas = [pltpu.make_async_copy(ref.at[b, pl.ds(row0, n_blk), :],
                                  sin.at[k], in_sems.at[k])
            for k, ref in enumerate(in_refs)]
    for d in dmas:
        d.start()
    for d in dmas:
        d.wait()

    rowg = (jax.lax.broadcasted_iota(jnp.int32, (n_blk, W), 0)
            + (row0 - halo))
    cols = jax.lax.broadcasted_iota(jnp.int32, (n_blk, W), 1)
    last_row = rowg >= h_true - 1
    # The lane dim may be padded to the 128 tile: the image's column
    # boundary (w_true-1) is where the forward difference must vanish,
    # and the pad columns are excluded from the convergence error.
    last_col = cols >= w_true - 1
    first_row = rowg == 0
    first_col = cols == 0
    rows_blk = jax.lax.broadcasted_iota(jnp.int32, (n_blk, W), 0)
    interior = ((rows_blk >= halo) & (rows_blk < halo + band)
                & (rowg < h_true) & (cols < w_true))

    I1wx = sin[6]
    I1wy = sin[7]
    grad = sin[8]
    rho_c = sin[9]
    # Loop-invariant hoists: one divide per chunk, not per iteration
    # (grad's pad cols/rows are zero, so both planes stay finite).
    th = l_t * grad
    inv_grad = 1.0 / jnp.maximum(grad, 1e-10)

    def fwd_grad(x):
        # where-selects, not multiplicative masks: the pad rows hold
        # finite values by construction, and selects keep it that way.
        gx = jnp.where(last_col, 0.0, _roll(x, -1, 1) - x)
        gy = jnp.where(last_row, 0.0, _roll(x, -1, 0) - x)
        return gx, gy

    def div(p1, p2):
        d1 = jnp.where(first_col, p1, p1 - _roll(p1, 1, 1))
        d2 = jnp.where(first_row, p2, p2 - _roll(p2, 1, 0))
        return d1 + d2

    def step_core(state, with_err: bool):
        # Same err-on-last-step-only + divide-once structure as the
        # whole-plane kernel (_solver_kernel.step_core).
        u, v, p11, p12, p21, p22, err = state
        rho = rho_c + I1wx * u + I1wy * v
        d = jnp.where(
            rho < -th, l_t,
            jnp.where(rho > th, -l_t, -rho * inv_grad))
        v1 = u + d * I1wx
        v2 = v + d * I1wy
        un = v1 + cfg.theta * div(p11, p12)
        vn = v2 + cfg.theta * div(p21, p22)
        if with_err:
            err = jnp.sum(jnp.where(interior,
                                    (un - u) ** 2 + (vn - v) ** 2, 0.0))
        ux, uy = fwd_grad(un)
        vx, vy = fwd_grad(vn)
        inv1 = 1.0 / (1.0 + taut * jnp.sqrt(ux * ux + uy * uy))
        inv2 = 1.0 / (1.0 + taut * jnp.sqrt(vx * vx + vy * vy))
        p11n = (p11 + taut * ux) * inv1
        p12n = (p12 + taut * uy) * inv1
        p21n = (p21 + taut * vx) * inv2
        p22n = (p22 + taut * vy) * inv2
        return un, vn, p11n, p12n, p21n, p22n, err

    def inner_step(_, state):
        return step_core(state, with_err=False)

    active = act_ref[g] > 0

    @pl.when(active)
    def _run():
        u0 = sin[0]
        v0 = sin[1]
        if do_median and cfg.median_filtering > 1:
            u0 = _median2d_global(u0, rowg, h_true,
                                  cfg.median_filtering, w_true)
            v0 = _median2d_global(v0, rowg, h_true,
                                  cfg.median_filtering, w_true)
        init = (u0, v0, sin[2], sin[3], sin[4], sin[5],
                jnp.asarray(0.0, f32))
        state = jax.lax.fori_loop(0, iters - 1, inner_step, init)
        u, v, p11, p12, p21, p22, err = step_core(state, with_err=True)
        sl = slice(halo, halo + band)
        sout[0] = u[sl]
        sout[1] = v[sl]
        sout[2] = p11[sl]
        sout[3] = p12[sl]
        sout[4] = p21[sl]
        sout[5] = p22[sl]
        err_ref[:] = jnp.full(err_ref.shape, err, f32)

    @pl.when(jnp.logical_not(active))
    def _passthrough():
        for k in range(6):
            sout[k] = sin[k, halo:halo + band]
        err_ref[:] = jnp.zeros(err_ref.shape, f32)

    out_refs = (uout, vout, p11o, p12o, p21o, p22o)
    odmas = [pltpu.make_async_copy(sout.at[k],
                                   ref.at[b, pl.ds(halo + row0, band), :],
                                   out_sems.at[k])
             for k, ref in enumerate(out_refs)]
    for d in odmas:
        d.start()
    for d in odmas:
        d.wait()

    Hp = NB * band

    @pl.when(i == 0)
    def _top_pad():
        pdmas = []
        for k in range(6):
            sout[k, :halo] = sin[k, :halo]
            d = pltpu.make_async_copy(
                sout.at[k, pl.ds(0, halo)],
                out_refs[k].at[b, pl.ds(0, halo), :], out_sems.at[k])
            d.start()
            pdmas.append(d)
        for d in pdmas:
            d.wait()

    @pl.when(i == NB - 1)
    def _bottom_pad():
        pdmas = []
        for k in range(6):
            sout[k, :halo] = sin[k, n_blk - halo:]
            d = pltpu.make_async_copy(
                sout.at[k, pl.ds(0, halo)],
                out_refs[k].at[b, pl.ds(halo + Hp, halo), :],
                out_sems.at[k])
            d.start()
            pdmas.append(d)
        for d in pdmas:
            d.wait()


def _run_chunk(state6, consts4, act, cfg: TVL1Config, iters: int,
               h_true: int, w_true: int, band: int, halo: int, NB: int,
               do_median: bool):
    """One pallas_call over all (batch × band) blocks; operands are the
    persistent padded (B, Hpad, Wp) planes, windowed in-kernel by DMA
    (Wp = w_true rounded up to the 128 lane tile)."""
    B, Hpad, W = state6[0].shape
    G = B * NB
    n_blk = band + 2 * halo
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    outs = pl.pallas_call(
        functools.partial(_dma_chunk_kernel, cfg=cfg, iters=iters,
                          h_true=h_true, w_true=w_true, band=band,
                          halo=halo, NB=NB, do_median=do_median),
        grid=(G,),
        in_specs=[anyspec] * 10 + [
            pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[anyspec] * 6 + [
            pl.BlockSpec((None, 1, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((B, Hpad, W), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((G, 1, 128), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((10, n_blk, W), jnp.float32),
            pltpu.VMEM((6, band, W), jnp.float32),
            pltpu.SemaphoreType.DMA((10,)),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BANDED_SCOPED_BYTES),
        interpret=pallas_interpret(),
    )(*state6, *consts4, act)
    return list(outs[:6]), outs[6][:, 0, 0]


# VMEM model for the DMA-windowed kernel: explicit scratch is
# 10 × n_blk (windows) + 6 × band (interior staging) f32 rows; the
# compiler's scoped temporaries peak during the in-kernel 5x5 median
# (25 live shift planes + the window scratch) — modelled as 30 × n_blk
# rows.  Both pools must fit the v5e's 128MB physical VMEM with
# margin; the scoped limit is raised via CompilerParams.
_BANDED_SCOPED_BYTES = 100 * 1024 * 1024
# The row model below ((10 + TEMP)·n_blk + 6·band rows of 4·Wp bytes)
# underestimates Mosaic's actual scoped-VMEM stack (measured r3 on
# v5e: (691,1229) band=352/chunk=20 modeled 88.4MB but compiled to a
# 100.61MiB stack → OOM at the 100MB scoped limit — factor 1.138 —
# while 1080p band=216/chunk=20 modeled 86.84MiB compiled and ran at
# B=1 and B=4, bounding its factor at ≤100/86.84 = 1.1515).  The
# budget divides by that worst-case inferred bound, so every admitted
# pick fits even at the most pessimistic factor the evidence allows;
# a miss is a loud compile error (remote-helper HTTP 500), never
# silent corruption.
_BANDED_VMEM_FACTOR = 1.1515
_BANDED_TOTAL_BYTES = int(_BANDED_SCOPED_BYTES / _BANDED_VMEM_FACTOR)
_BANDED_TEMP_PLANES = 30


def banded_params(h: int, w: int,
                  cfg: TVL1Config) -> Optional[Tuple[int, int]]:
    """(band, chunk) for the banded solver, or None when banding can't
    beat the fallback (too few affordable rows).

    Chunk = iterations per kernel dispatch; halo = chunk + 4 rounded up
    to 8 (iteration dependency radius + median radius + DMA sublane
    alignment).  Cost model per outer round: redundant halo compute
    (the halo rows iterate too) + HBM window traffic at 0.15× the cost
    of a compute row-iteration.  The traffic coefficient is CALIBRATED
    against a measured 1080p sweep of the DMA kernel (r3, real v5e-1:
    band=216/chunk=20 24.76 ms, 216/15 25.10, 216/12 25.38, 216/10
    25.32, 192/30 27.30, 184/30 27.85 per warp-solve at B=1; same
    ordering at B=4) — t=0.15 reproduces both the ordering and the
    27.85/24.76 ratio, while the previous t=0.5 wrongly favoured
    one-dispatch rounds (chunk=K) whose bigger halo costs 6 bands
    instead of 5.  Ties (same band/halo/chunk-count) break toward the
    larger chunk: its trailing chunk is shorter, measured ~1% faster.
    Cross-validated at 864×1536 (B=4 sweep): the model's pick
    (288, 12) timed 46.82 ms vs 46.26 best (288, 10) — within 1.2%.
    """
    wp = -(-w // 128) * 128
    row_bytes = 4 * wp
    budget_rows = _BANDED_TOTAL_BYTES // row_bytes
    K = cfg.inner_iterations
    best = None
    for chunk in range(4, K + 1):
        halo = -(-(chunk + 4) // 8) * 8
        # (10 + TEMP) × n_blk + 6 × band <= budget_rows
        denom = 10 + _BANDED_TEMP_PLANES + 6
        band = (budget_rows - (10 + _BANDED_TEMP_PLANES) * 2 * halo) \
            // denom // 8 * 8
        if band < halo or band < 8:
            continue
        band = min(band, max(8, -(-h // 8) * 8))
        # Balance bands: shrink band to the smallest multiple of 8
        # giving the same band count (less halo-redundant compute).
        n_bands = -(-h // band)
        band = max(halo, -(-(-(-h // n_bands)) // 8) * 8)
        n_chunks = -(-K // chunk)
        n_blk = band + 2 * halo
        compute = sum(n_blk * min(chunk, K - c0)
                      for c0 in range(0, K, chunk))
        traffic = n_chunks * (10 * n_blk + 6 * band) * 0.15
        cost = n_bands * (compute + traffic)
        if best is None or cost <= best[0]:
            best = (cost, band, chunk)
    if best is None:
        return None
    return best[1], best[2]


@functools.partial(jax.jit,
                   static_argnames=("cfg", "band", "chunk", "adaptive"))
def tvl1_solve_warp_banded(I1wx: jax.Array, I1wy: jax.Array,
                           grad: jax.Array, rho_c: jax.Array,
                           u: jax.Array, v: jax.Array,
                           cfg: TVL1Config, band: int, chunk: int,
                           adaptive: bool = True
                           ) -> Tuple[jax.Array, jax.Array]:
    """All outer rounds of one TV-L1 warp for planes too large for the
    whole-plane kernel, via DMA-windowed row bands.

    adaptive=False: bit-exact to `tvl1_solve_warp` up to the
    convergence test's reduction order (per-band partial sums vs one
    whole-plane sum) — gated in tests/test_tvl1.py.

    adaptive=True (VERDICT r2 next #5, convergence-adaptive banding):
    each band applies cv2's ε convergence criterion to ITSELF — a band
    whose mean-squared update fell under ε² stops iterating (its kernel
    blocks pass state through for ~free) unless a NEIGHBOUR band is
    still active, in which case it keeps running so boundary updates
    propagate exactly.  The skipped updates are by definition below the
    same ε threshold cv2 uses to stop the whole image, so the deviation
    from the non-adaptive result is of the order the algorithm already
    declares converged (gated in tests/test_tvl1.py vs the monolithic
    kernel)."""
    import numpy as np

    B, H, W = u.shape
    K = cfg.inner_iterations
    eps2 = cfg.epsilon * cfg.epsilon
    n_px = H * W
    halo = -(-(chunk + 4) // 8) * 8
    if band < halo:
        raise ValueError(f"band ({band}) must be >= halo ({halo})")
    NB = -(-H // band)
    Hp = NB * band
    Hpad = Hp + 2 * halo
    Wp = -(-W // 128) * 128    # VMEM DMA windows need lane-tile width

    def pad_planes(x):
        return jnp.pad(x.astype(jnp.float32),
                       ((0, 0), (halo, Hpad - halo - H), (0, Wp - W)))

    consts4 = [pad_planes(x) for x in (I1wx, I1wy, grad, rho_c)]
    zeros = jnp.zeros_like(u)
    state6 = [pad_planes(x) for x in (u, v, zeros, zeros, zeros, zeros)]

    band_px = jnp.asarray(
        np.minimum(band, H - band * np.arange(NB)).astype(np.float32)
        * W)
    chunk_sizes = [min(chunk, K - c0) for c0 in range(0, K, chunk)]

    def global_err(err_band):        # (B, NB) band SUMS → (B,) mean
        return err_band.sum(axis=1) / n_px

    def run_round(state):
        *planes, err_band, r = state
        gerr = global_err(err_band)
        conv = gerr < eps2
        if adaptive:
            # Run a band iff it (or a neighbour, whose boundary updates
            # could reach it) has not met the per-band ε criterion
            # (band mean-squared update >= ε², i.e. sum >= ε²·band_px).
            active = err_band >= eps2 * band_px
            run_flags = active
            run_flags = run_flags.at[:, :-1].set(
                run_flags[:, :-1] | active[:, 1:])
            run_flags = run_flags.at[:, 1:].set(
                run_flags[:, 1:] | active[:, :-1])
            run_flags = run_flags & ~conv[:, None]
        else:
            run_flags = jnp.broadcast_to(~conv[:, None], (B, NB))
        act = run_flags.reshape(B * NB).astype(jnp.int32)
        cur = list(planes)
        err_blocks = None
        for ci, iters in enumerate(chunk_sizes):
            cur, err_blocks = _run_chunk(cur, consts4, act, cfg, iters,
                                         H, W, band, halo, NB,
                                         do_median=(ci == 0))
        err_new = err_blocks.reshape(B, NB)
        err_band = jnp.where(run_flags, err_new, err_band)
        return tuple(cur) + (err_band, r + 1)

    # One while_loop over outer rounds instead of a chain of
    # outer_iterations lax.conds: a skipped cond still dispatches and
    # copies its carried state (measured ~0.18ms × 200 skipped rounds
    # per 1080p pair — a third of device time), while the loop stops
    # dead at convergence.
    def round_cond(state):
        *_, err_band, r = state
        return jnp.logical_and(
            r < cfg.outer_iterations,
            jnp.logical_not(jnp.all(global_err(err_band) < eps2)))

    state = tuple(state6) + (jnp.full((B, NB), jnp.inf, jnp.float32),
                             jnp.int32(0))
    state = jax.lax.while_loop(round_cond, run_round, state)
    out = lambda x: x[:, halo:halo + H, :W]
    return out(state[0]), out(state[1])
