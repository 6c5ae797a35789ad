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
from typing import Tuple

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
    """Odd-even transposition sort over a list of (H, W) planes;
    returns the median plane.  O(n²) compare-exchanges of VPU min/max —
    no data movement, no sort primitive needed."""
    n = len(planes)
    planes = list(planes)
    for rnd in range(n):
        start = rnd % 2
        for i in range(start, n - 1, 2):
            a, b = planes[i], planes[i + 1]
            planes[i] = jnp.minimum(a, b)
            planes[i + 1] = jnp.maximum(a, b)
    return planes[n // 2]


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

    def inner_step(_, state):
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
        err = jnp.sum((un - u) ** 2 + (vn - v) ** 2) / n_px
        ux, uy = fwd_grad(un)
        vx, vy = fwd_grad(vn)
        ng1 = 1.0 + taut * jnp.sqrt(ux * ux + uy * uy)
        ng2 = 1.0 + taut * jnp.sqrt(vx * vx + vy * vy)
        p11n = (p11 + taut * ux) / ng1
        p12n = (p12 + taut * uy) / ng1
        p21n = (p21 + taut * vx) / ng2
        p22n = (p22 + taut * vy) / ng2
        return un, vn, p11n, p12n, p21n, p22n, err

    def outer_step(_, state):
        u, v, p11, p12, p21, p22, err = state
        converged = err < eps2

        def run(st):
            u, v, p11, p12, p21, p22, err = st
            if cfg.median_filtering > 1:
                u = _median2d(u, cfg.median_filtering)
                v = _median2d(v, cfg.median_filtering)
            return jax.lax.fori_loop(
                0, cfg.inner_iterations, inner_step,
                (u, v, p11, p12, p21, p22, err))

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
