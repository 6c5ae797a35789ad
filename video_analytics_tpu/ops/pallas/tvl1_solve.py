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
        th = l_t * grad
        d = jnp.where(
            rho < -th, l_t,
            jnp.where(rho > th, -l_t, -rho / jnp.maximum(grad, 1e-10)))
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
# Row-banded solver for shapes beyond the whole-plane kernel's VMEM
# (VERDICT r1 #2; BASELINE config #5 — native-resolution 1080p TV-L1).
#
# Scheme: the image is split into row bands; each band is processed
# with a halo of `chunk` rows on each side, wide enough that `chunk`
# primal-dual iterations (dependency radius 1 row/iteration) leave the
# band interior BIT-EXACT vs the global iteration.  State (u, v, p)
# round-trips HBM once per chunk instead of once per iteration — a
# ~chunk× HBM-traffic cut, which is what the solver is bound by.  The
# outer-round structure (median filter, ε convergence gate) runs at the
# XLA level between chunks, exactly mirroring the monolithic kernel's
# outer_step; windows are gathered/scattered by XLA (overlapping
# BlockSpecs aren't expressible), so there is ONE Mosaic kernel for all
# bands, rounds and levels of a given block shape — true-boundary
# behaviour comes in as a global-row-index data plane, not as static
# masks that would respecialise per band.
# ---------------------------------------------------------------------------


def _chunk_kernel(I1wx_ref, I1wy_ref, grad_ref, rho_c_ref,
                  uin_ref, vin_ref,
                  p11i_ref, p12i_ref, p21i_ref, p22i_ref, rowg_ref,
                  act_ref,
                  uout_ref, vout_ref,
                  p11o_ref, p12o_ref, p21o_ref, p22o_ref, err_ref,
                  *, cfg: TVL1Config, iters: int, h_true: int,
                  band: int, halo: int):
    """`iters` primal-dual iterations on one (band + 2·halo, W) block.

    Semantics identical to `_solver_kernel`'s inner_step, with the
    row-boundary masks driven by the global row index plane (rowg) so
    image edges behave exactly like the whole-plane kernel no matter
    which band they fall in; `err` is the final iteration's squared
    update summed over the band's interior TRUE rows only.

    `act` (per-block scalar plane) is the convergence-adaptive gate:
    inactive blocks skip ALL iteration compute and pass their state
    through unchanged (the VPU work is what the banded 1080p solver is
    bound by, so converged bands become ~free).
    """
    N, W = uin_ref.shape
    f32 = jnp.float32
    l_t = cfg.lambda_ * cfg.theta
    taut = cfg.tau / cfg.theta

    I1wx = I1wx_ref[:]
    I1wy = I1wy_ref[:]
    grad = grad_ref[:]
    rho_c = rho_c_ref[:]
    rowg = rowg_ref[:]

    rows_blk = jax.lax.broadcasted_iota(jnp.int32, (N, W), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (N, W), 1)
    not_last_row = (rowg < h_true - 1).astype(f32)
    not_last_col = (cols < W - 1).astype(f32)
    first_row = rowg == 0
    first_col = cols == 0
    interior = ((rows_blk >= halo) & (rows_blk < halo + band)
                & (rowg < h_true)).astype(f32)

    def fwd_grad(x):
        gx = (_roll(x, -1, 1) - x) * not_last_col
        gy = (_roll(x, -1, 0) - x) * not_last_row
        return gx, gy

    def div(p1, p2):
        d1 = jnp.where(first_col, p1, p1 - _roll(p1, 1, 1))
        d2 = jnp.where(first_row, p2, p2 - _roll(p2, 1, 0))
        return d1 + d2

    def step_core(state, with_err: bool):
        # Same err-on-last-step-only + divide-once structure as the
        # whole-plane kernel (see _solver_kernel.step_core); the err is
        # only consumed after the round's final chunk.
        u, v, p11, p12, p21, p22, err = state
        rho = rho_c + I1wx * u + I1wy * v
        th = l_t * grad
        d = jnp.where(
            rho < -th, l_t,
            jnp.where(rho > th, -l_t, -rho / jnp.maximum(grad, 1e-10)))
        v1 = u + d * I1wx
        v2 = v + d * I1wy
        un = v1 + cfg.theta * div(p11, p12)
        vn = v2 + cfg.theta * div(p21, p22)
        if with_err:
            err = jnp.sum(((un - u) ** 2 + (vn - v) ** 2) * interior)
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

    active = act_ref[0, 0] > 0.5

    @pl.when(active)
    def _run():
        init = (uin_ref[:], vin_ref[:], p11i_ref[:], p12i_ref[:],
                p21i_ref[:], p22i_ref[:], jnp.asarray(0.0, f32))
        state = jax.lax.fori_loop(0, iters - 1, inner_step, init)
        u, v, p11, p12, p21, p22, err = step_core(state, with_err=True)
        uout_ref[:] = u
        vout_ref[:] = v
        p11o_ref[:] = p11
        p12o_ref[:] = p12
        p21o_ref[:] = p21
        p22o_ref[:] = p22
        err_ref[:] = jnp.full(err_ref.shape, err, f32)

    @pl.when(jnp.logical_not(active))
    def _passthrough():
        uout_ref[:] = uin_ref[:]
        vout_ref[:] = vin_ref[:]
        p11o_ref[:] = p11i_ref[:]
        p12o_ref[:] = p12i_ref[:]
        p21o_ref[:] = p21i_ref[:]
        p22o_ref[:] = p22i_ref[:]
        err_ref[:] = jnp.zeros(err_ref.shape, f32)


def _run_chunk(blocks, rowg_blocks, act_blocks, cfg: TVL1Config,
               iters: int, h_true: int, band: int, halo: int):
    """One pallas_call over all (batch × band) blocks: 10 state/const
    planes + row-index plane + per-block active flag in, 6 state planes
    + per-block err out."""
    G, N, W = blocks[0].shape
    state_shape = jax.ShapeDtypeStruct((G, N, W), jnp.float32)
    blk = lambda: pl.BlockSpec((None, N, W), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)
    scalar_blk = lambda: pl.BlockSpec((None, 1, 128), lambda g: (g, 0, 0),
                                      memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_chunk_kernel, cfg=cfg, iters=iters,
                          h_true=h_true, band=band, halo=halo),
        grid=(G,),
        in_specs=[blk() for _ in range(11)] + [scalar_blk()],
        out_specs=[blk() for _ in range(6)] + [scalar_blk()],
        out_shape=[state_shape] * 6 + [
            jax.ShapeDtypeStruct((G, 1, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_BANDED_SCOPED_BYTES),
        interpret=pallas_interpret(),
    )(*blocks, rowg_blocks, act_blocks)
    return outs[:6], outs[6][:, 0, 0]


# VMEM model, measured on the v5e: the kernel's scoped (stack) working
# set is ~28 (n_blk, lane-padded W) f32 planes (operand copies + fori
# carry + dual-step temps; Mosaic reported 27.9MB at n_blk=132, W=1920)
# and the pipelined operands add 17 × 2 double-buffered blocks.  The
# scoped limit is raised via CompilerParams (default 16MB); both pools
# must fit the v5e's 128MB physical VMEM with margin.
_BANDED_SCOPED_BYTES = 100 * 1024 * 1024
_BANDED_TOTAL_BYTES = 96 * 1024 * 1024
_BANDED_PLANES = 28 + 2 * 17


def banded_params(h: int, w: int,
                  cfg: TVL1Config) -> Optional[Tuple[int, int]]:
    """(band, chunk) for the banded solver, or None when banding can't
    beat the fallback (too few affordable rows).

    Picks the chunk (iterations per HBM round-trip; halo = chunk + 2)
    minimising HBM traffic ≈ ceil(K/chunk) · n_blk/band given the VMEM
    row budget.
    """
    wp = -(-w // 128) * 128
    budget_rows = int(_BANDED_TOTAL_BYTES // (_BANDED_PLANES * 4 * wp))
    if budget_rows < 32:
        return None
    best = None
    K = cfg.inner_iterations
    for chunk in range(4, K + 1):
        band = (budget_rows - 2 * (chunk + 2)) // 8 * 8
        if band < 8:
            continue
        band = min(band, max(8, -(-h // 8) * 8))
        n_bands = -(-h // band)
        cost = (-(-K // chunk)) * n_bands * (band + 2 * (chunk + 2))
        if best is None or cost < best[0]:
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
    whole-plane kernel, via row bands with `chunk`-iteration halos.

    adaptive=False: bit-exact to `tvl1_solve_warp` up to the
    convergence test's reduction order (per-band partial sums vs one
    whole-plane sum).

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
    B, H, W = u.shape
    K = cfg.inner_iterations
    eps2 = cfg.epsilon * cfg.epsilon
    n_px = H * W
    halo = chunk + 2
    NB = -(-H // band)
    Hp = NB * band
    n_blk = band + 2 * halo

    consts = [x.astype(jnp.float32) for x in (I1wx, I1wy, grad, rho_c)]

    def pad_rows(x):
        return jnp.pad(x, ((0, 0), (halo, Hp + halo - H), (0, 0)))

    def windows(x):                       # (b, Hp+2halo, W) → (b·NB, n_blk, W)
        blks = jnp.stack([x[:, i * band:i * band + n_blk]
                          for i in range(NB)], axis=1)
        return blks.reshape(x.shape[0] * NB, n_blk, W)

    def assemble(blk):                    # (B·NB, n_blk, W) → (B, H, W)
        x = blk.reshape(B, NB, n_blk, W)[:, :, halo:halo + band]
        return x.reshape(B, Hp, W)[:, :H]

    const_blocks = [windows(pad_rows(x)) for x in consts]
    rowg = jnp.arange(-halo, Hp + halo, dtype=jnp.int32)
    rowg = jnp.broadcast_to(rowg[None, :, None], (1, Hp + 2 * halo, W))
    rowg_blocks = jnp.tile(windows(rowg), (B, 1, 1))

    import numpy as np
    # True pixels per band (the last band may be ragged).
    band_px = jnp.asarray(
        np.minimum(band, H - band * np.arange(NB)).astype(np.float32)
        * W)

    # Chunk sizes exactly partitioning the K inner iterations of a round.
    chunk_sizes = [min(chunk, K - c0) for c0 in range(0, K, chunk)]

    def global_err(err_band):        # (B, NB) band SUMS → (B,) mean
        return err_band.sum(axis=1) / n_px

    def run_round(state):
        u, v, p11, p12, p21, p22, err_band = state
        gerr = global_err(err_band)
        conv = (gerr < eps2)[:, None, None]
        if cfg.median_filtering > 1:
            from video_analytics_tpu.ops.median import median_filter2d
            u = jnp.where(conv, u, median_filter2d(u, cfg.median_filtering))
            v = jnp.where(conv, v, median_filter2d(v, cfg.median_filtering))
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
            run_flags = run_flags & ~conv[:, :, 0]
        else:
            run_flags = jnp.broadcast_to(~conv[:, :, 0], (B, NB))
        act_blocks = jnp.broadcast_to(
            run_flags.astype(jnp.float32).reshape(B * NB, 1, 1),
            (B * NB, 1, 128))
        cu, cv, cp11, cp12, cp21, cp22 = u, v, p11, p12, p21, p22
        err_blocks = None
        for iters in chunk_sizes:
            blocks = const_blocks + [
                windows(pad_rows(x))
                for x in (cu, cv, cp11, cp12, cp21, cp22)]
            (ub, vb, p11b, p12b, p21b, p22b), err_blocks = _run_chunk(
                blocks, rowg_blocks, act_blocks, cfg, iters, H, band,
                halo)
            cu, cv = assemble(ub), assemble(vb)
            cp11, cp12 = assemble(p11b), assemble(p12b)
            cp21, cp22 = assemble(p21b), assemble(p22b)
        err_new = err_blocks.reshape(B, NB)
        err_band = jnp.where(run_flags, err_new, err_band)
        sel = lambda old, new: jnp.where(conv, old, new)
        return (sel(u, cu), sel(v, cv), sel(p11, cp11), sel(p12, cp12),
                sel(p21, cp21), sel(p22, cp22), err_band)

    zeros = jnp.zeros((B, H, W), jnp.float32)
    state = (u.astype(jnp.float32), v.astype(jnp.float32),
             zeros, zeros, zeros, zeros,
             jnp.full((B, NB), jnp.inf, jnp.float32))
    for _ in range(cfg.outer_iterations):
        state = jax.lax.cond(jnp.all(global_err(state[-1]) < eps2),
                             lambda s: s, run_round, state)
    return state[0], state[1]
