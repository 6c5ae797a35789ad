"""TV-L1 dense optical flow (Zach, Pock, Bischof 2007), TPU-native.

Replaces the reference pipeline's ``cv2.optflow.DualTVL1OpticalFlow``
(OpenCV contrib C++; not present in this environment, so the test
oracle is an independent numpy implementation of the same published
algorithm).  Parameter names and defaults mirror the OpenCV API
(SURVEY.md §3.2); iteration structure follows the IPOL reference
implementation (Sánchez Pérez et al. 2013) that OpenCV's is based on:

per scale (coarse→fine), per warp:
  - bilinearly warp I1 and ∇I1 by the current flow u0,
  - ρ(u) = I1w(p) + ⟨∇I1w, u − u0⟩ − I0  (linearised residual),
  - iterate: v-step — soft threshold ρ against λθ|∇I1w|²;
             u-step — u = v + θ·div(p);
             dual step — p ← (p + (τ/θ)∇u) / (1 + (τ/θ)|∇u|);
  - median-filter u between outer iterations (OpenCV extension),
  - stop early when the mean squared update < ε² (lax.while_loop).

TPU mapping: the per-pixel updates are pure VPU elementwise work; the
warp is a vectorised gather; each (scale, warp) is ONE fused
while_loop so the whole pyramid compiles to a single XLA program,
batched over frame pairs.
"""

from __future__ import annotations

import functools
import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from video_analytics_tpu.config import TVL1Config
from video_analytics_tpu.ops.kernels import (
    bilinear_sample, centered_gradient, divergence, forward_gradient,
    gaussian_blur, resize_area_like)
from video_analytics_tpu.ops.median import median_filter2d

_MIN_SIZE = 16         # coarsest pyramid level must keep both dims >= this
_ZOOM_SIGMA0 = 0.6     # IPOL pre-smoothing constant for pyramid downscale
_GRAD_EPS = 1e-10      # guard for the v-step division


def _level_sizes(h: int, w: int, cfg: TVL1Config) -> List[Tuple[int, int]]:
    """Finest-first level sizes, clamped so the coarsest dim >= 16."""
    sizes = [(h, w)]
    for s in range(1, cfg.nscales):
        scale = cfg.scale_step ** s
        lh, lw = int(round(h * scale)), int(round(w * scale))
        if min(lh, lw) < _MIN_SIZE:
            break
        sizes.append((lh, lw))
    return sizes


def _downscale(img: jax.Array, out_hw: Tuple[int, int],
               zoom: float) -> jax.Array:
    """IPOL zoom-out: Gaussian pre-smooth with σ = 0.6·√(1/z² − 1),
    then bilinear resize."""
    sigma = _ZOOM_SIGMA0 * math.sqrt(1.0 / zoom ** 2 - 1.0) \
        if zoom < 1.0 else 0.0
    sm = gaussian_blur(img, sigma) if sigma > 1e-6 else img
    return resize_area_like(sm, out_hw)


def _warp_step(I1: jax.Array, I1x: jax.Array, I1y: jax.Array,
               u: jax.Array, v: jax.Array, band: Optional[int] = None,
               use_pallas: Optional[bool] = None, w_img: int = 0):
    """Warp I1 and its gradients by the current flow (u, v).

    On TPU this is the Pallas banded warp (ops/pallas/warp.py — the
    gather-free hot-path kernel); elsewhere, when the level is too
    large for the kernel's VMEM working set, or with use_pallas=False
    (the `--exact` escape hatch), the exact XLA gather.  `band` scales
    the sweep to the pyramid level's displacement envelope (see
    flow.farneback._level_band — same argument).  ``w_img`` > 0 marks
    lane-packed planes (see _pack_lanes)."""
    from video_analytics_tpu.ops.pallas.warp import (
        DEFAULT_BAND, pallas_warp_cf, warp_fits_vmem)
    from video_analytics_tpu.utils.platform import on_tpu

    B, H, W = I1.shape
    if use_pallas is None:
        use_pallas = on_tpu()
    if use_pallas and warp_fits_vmem(H, W, 3):
        # Channels-first stack (the kernel's native layout): the three
        # planes concatenate without an NHWC transpose round trip.
        w = pallas_warp_cf(jnp.stack([I1, I1x, I1y], axis=1), u, v,
                           r=band or DEFAULT_BAND, w_img=w_img)
        return w[:, 0], w[:, 1], w[:, 2]
    assert not w_img, "packed planes require the Pallas warp"
    yy = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 2)
    w = bilinear_sample(jnp.stack([I1, I1x, I1y], axis=-1),
                        yy + v, xx + u)
    return w[..., 0], w[..., 1], w[..., 2]


def _pack_lanes(x: jax.Array, n: int) -> jax.Array:
    """(B, H, W) → (B/n, H, n·W): images b·n..b·n+n-1 side by side
    along the lane axis.  Mosaic pads the lane dim to the 128 tile, so
    packing amortises that padding across n images (e.g. 4×224 = 896
    exact lanes vs 4×(224→256)); see ops/pallas/tvl1_solve.py's
    lane-packed solver for the per-image semantics."""
    B, H, W = x.shape
    return x.reshape(B // n, n, H, W).transpose(0, 2, 1, 3) \
            .reshape(B // n, H, n * W)


def _unpack_lanes(x: jax.Array, n: int) -> jax.Array:
    Bn, H, Wn = x.shape
    return x.reshape(Bn, H, n, Wn // n).transpose(0, 2, 1, 3) \
            .reshape(Bn * n, H, Wn // n)


def _solve_warp(I0, I1w, I1wx, I1wy, u0, v0, u, v, cfg: TVL1Config):
    """All primal-dual iterations for one warp, as one while_loop."""
    l_t = cfg.lambda_ * cfg.theta
    taut = cfg.tau / cfg.theta
    grad = I1wx * I1wx + I1wy * I1wy
    # Loop-invariant hoists (shared with the Pallas kernels): the
    # threshold plane and the reciprocal of the gradient magnitude —
    # one divide per warp instead of one per iteration.
    th = l_t * grad
    inv_grad = 1.0 / jnp.maximum(grad, _GRAD_EPS)
    rho_c = I1w - I1wx * u0 - I1wy * v0 - I0
    n_px = u.shape[1] * u.shape[2]
    eps2 = cfg.epsilon * cfg.epsilon
    total = cfg.outer_iterations * cfg.inner_iterations

    p11 = jnp.zeros_like(u)
    p12 = jnp.zeros_like(u)
    p21 = jnp.zeros_like(u)
    p22 = jnp.zeros_like(u)

    def body(state):
        u, v, p11, p12, p21, p22, step, err_prev = state

        # Median filtering at outer-iteration boundaries.
        if cfg.median_filtering > 1:
            at_outer = (step % cfg.inner_iterations) == 0
            u, v = jax.lax.cond(
                at_outer,
                lambda uv: (median_filter2d(uv[0], cfg.median_filtering),
                            median_filter2d(uv[1], cfg.median_filtering)),
                lambda uv: uv, (u, v))

        # v-step: soft threshold of the linearised residual.
        rho = rho_c + I1wx * u + I1wy * v
        d = jnp.where(
            rho < -th, l_t,
            jnp.where(rho > th, -l_t, -rho * inv_grad))
        v1 = u + d * I1wx
        v2 = v + d * I1wy

        # u-step: couple to the TV-regularised field.
        un = v1 + cfg.theta * divergence(p11, p12)
        vn = v2 + cfg.theta * divergence(p21, p22)
        # The convergence error is only read at outer boundaries, i.e.
        # from the round's last inner step — skip it elsewhere (the
        # fused Pallas kernels do the same; see tvl1_solve.step_core).
        is_last_inner = (step % cfg.inner_iterations) == \
            cfg.inner_iterations - 1
        err = jax.lax.cond(
            is_last_inner,
            lambda ab: jnp.max(jnp.sum(
                (ab[0] - ab[2]) ** 2 + (ab[1] - ab[3]) ** 2,
                axis=(1, 2)) / n_px),
            lambda ab: err_prev,
            (un, vn, u, v))

        # dual step (divide once per field pair, multiply twice).
        ux, uy = forward_gradient(un)
        vx, vy = forward_gradient(vn)
        inv_u = 1.0 / (1.0 + taut * jnp.sqrt(ux * ux + uy * uy))
        inv_v = 1.0 / (1.0 + taut * jnp.sqrt(vx * vx + vy * vy))
        p11 = (p11 + taut * ux) * inv_u
        p12 = (p12 + taut * uy) * inv_u
        p21 = (p21 + taut * vx) * inv_v
        p22 = (p22 + taut * vy) * inv_v
        return un, vn, p11, p12, p21, p22, step + 1, err

    def cond(state):
        *_, step, err = state
        converged = err < eps2
        at_outer = (step % cfg.inner_iterations) == 0
        # Early exit is only taken at outer boundaries (cv2 semantics).
        return jnp.logical_and(step < total,
                               jnp.logical_not(
                                   jnp.logical_and(at_outer, converged)))

    init = (u, v, p11, p12, p21, p22, jnp.int32(0), jnp.float32(jnp.inf))
    u, v, *_ = jax.lax.while_loop(cond, body, init)
    return u, v


def tvl1(prev: jax.Array, nxt: jax.Array,
         cfg: TVL1Config = TVL1Config(),
         initial_flow: Optional[jax.Array] = None,
         use_pallas: Optional[bool] = None,
         exact_warp: bool = False,
         scale_fused: Optional[bool] = None) -> jax.Array:
    """Dense TV-L1 flow for a batch of gray frame pairs.

    Args:
      prev, nxt: (B, H, W) float32 in [0, 255] (or uint8).
      cfg: TVL1Config (static under jit).
      initial_flow: optional (B, H, W, 2) seed.
      use_pallas: None → auto (Pallas on TPU); True/False forces both
        the warp and solver paths.
      exact_warp: force the exact XLA gather warp while leaving the
        solver path governed by `use_pallas` (isolates the bit-exact
        Pallas solvers from the separable-warp approximation).
      scale_fused: None → auto (the whole-scale fused kernel,
        ops/pallas/tvl1_solve.tvl1_scale_pallas, wherever its VMEM gate
        passes); False forces the per-warp chain (the A/B escape
        hatch); True asserts the gate passes at every scale.

    Returns:
      (B, H, W, 2) float32 flow (dx, dy): prev(p) ≈ next(p + flow(p)).
    """
    I0_full = prev.astype(jnp.float32)
    I1_full = nxt.astype(jnp.float32)
    B, H, W = I0_full.shape

    # Batch rounding for lane packing (r5c): the packed kernels need
    # n | batch, so an odd batch (the pipeline's T-1 = 63 pairs) used
    # to forfeit packing entirely and pay the full 128-lane tile pad
    # per image at every scale (~1.4x the packed solver lanes at 224²).
    # Round the batch up to a multiple of 4 with dummy dup pairs and
    # slice the result back — exact for the real pairs (packing is
    # per-image exact), and the dummy work is bounded to ≤15%.
    from video_analytics_tpu.utils.platform import on_tpu
    if use_pallas if use_pallas is not None else on_tpu():
        Bp = -(-B // 4) * 4
        if B % 4 and B > 1 and (Bp - B) <= max(1, B * 0.15):
            def _pad(x):
                dup = jnp.broadcast_to(x[-1:], (Bp - B,) + x.shape[1:])
                return jnp.concatenate([x, dup], axis=0)
            out = tvl1(_pad(I0_full), _pad(I1_full), cfg,
                       initial_flow=None if initial_flow is None else
                       _pad(initial_flow.astype(jnp.float32)),
                       use_pallas=use_pallas, exact_warp=exact_warp,
                       scale_fused=scale_fused)
            return out[:B]

    sizes = _level_sizes(H, W, cfg)

    # Build pyramids finest→coarsest, each level from the previous one.
    I0s, I1s = [I0_full], [I1_full]
    for s in range(1, len(sizes)):
        I0s.append(_downscale(I0s[-1], sizes[s], cfg.scale_step))
        I1s.append(_downscale(I1s[-1], sizes[s], cfg.scale_step))

    u = v = None
    for s in range(len(sizes) - 1, -1, -1):
        lh, lw = sizes[s]
        I0, I1 = I0s[s], I1s[s]
        if u is None:
            if cfg.use_initial_flow and initial_flow is not None:
                scale = cfg.scale_step ** s
                f = jax.image.resize(initial_flow.astype(jnp.float32),
                                     (B, lh, lw, 2), method="linear",
                                     antialias=False) * scale
                u, v = f[..., 0], f[..., 1]
            else:
                u = jnp.zeros((B, lh, lw), jnp.float32)
                v = jnp.zeros((B, lh, lw), jnp.float32)
        else:
            u = resize_area_like(u, (lh, lw)) * (1.0 / cfg.scale_step)
            v = resize_area_like(v, (lh, lw)) * (1.0 / cfg.scale_step)

        I1x, I1y = centered_gradient(I1)
        # On TPU the whole per-warp solver runs as one VMEM-resident
        # Pallas kernel (ops/pallas/tvl1_solve.py, ~30x less HBM
        # traffic); planes too large for it use the row-banded chunked
        # kernel (HBM once per `chunk` iterations instead of per
        # iteration); otherwise the XLA while-loop reference.
        from video_analytics_tpu.ops.pallas.tvl1_solve import (
            banded_params, pack_choice, scale_pack_choice,
            solver_fits_vmem, tvl1_scale_pallas, tvl1_solve_warp,
            tvl1_solve_warp_packed, tvl1_solve_warp_banded)
        from video_analytics_tpu.utils.platform import on_tpu
        pallas_ok = use_pallas if use_pallas is not None else on_tpu()
        fused = pallas_ok and solver_fits_vmem(lh, lw,
                                               cfg.median_filtering)
        banded = None
        if pallas_ok and not fused:
            banded = banded_params(lh, lw, cfg)
        from video_analytics_tpu.flow.farneback import _level_band
        band = _level_band(cfg.scale_step ** s)
        # Whole-scale fused kernel (r5b): every warp round + the
        # scale-end median in ONE pallas_call, HBM touched once per
        # scale (tvl1_solve.tvl1_scale_pallas).  Gated by its VMEM
        # model; scale_fused=False is the per-warp-chain A/B hatch.
        n_scale = 0
        if (pallas_ok and fused and not exact_warp
                and scale_fused is not False):
            n_scale = scale_pack_choice(lh, lw, B,
                                        cfg.median_filtering, band)
        if scale_fused and not n_scale:
            raise ValueError(
                f"scale_fused=True but the whole-scale kernel does not "
                f"fit VMEM at level {(lh, lw)} (batch {B})")
        if n_scale:
            if n_scale > 1:
                I0p, u, v = (_pack_lanes(x, n_scale)
                             for x in (I0, u, v))
                I13 = jnp.stack(
                    [_pack_lanes(x, n_scale) for x in (I1, I1x, I1y)],
                    axis=1)
            else:
                I0p = I0
                I13 = jnp.stack([I1, I1x, I1y], axis=1)
            u, v = tvl1_scale_pallas(I0p, I13, u, v, cfg,
                                     n_img=n_scale, w_img=lw, r=band)
            if n_scale > 1:
                u = _unpack_lanes(u, n_scale)
                v = _unpack_lanes(v, n_scale)
            continue
        # Lane packing (r5): the whole-plane solver runs at the VPU
        # floor per PADDED lane, so n side-by-side images amortise the
        # 128-lane tile padding (see tvl1_solve.py).  Exact per image;
        # warp offsets/solver masks are per-image-aware.
        n_pack = (pack_choice(lh, lw, B, cfg.median_filtering)
                  if fused and not exact_warp else 1)
        if n_pack > 1:
            I0, I1, I1x, I1y, u, v = (
                _pack_lanes(x, n_pack)
                for x in (I0, I1, I1x, I1y, u, v))
        for _ in range(cfg.warps):
            u0, v0 = u, v
            I1w, I1wx, I1wy = _warp_step(
                I1, I1x, I1y, u0, v0, band=band,
                use_pallas=False if exact_warp else use_pallas,
                w_img=lw if n_pack > 1 else 0)
            if fused or banded:
                grad = I1wx * I1wx + I1wy * I1wy
                rho_c = I1w - I1wx * u0 - I1wy * v0 - I0
                if fused:
                    u, v = tvl1_solve_warp_packed(
                        I1wx, I1wy, grad, rho_c, u, v, cfg,
                        n_img=n_pack, w_img=lw)
                else:
                    u, v = tvl1_solve_warp_banded(
                        I1wx, I1wy, grad, rho_c, u, v, cfg,
                        band=banded[0], chunk=banded[1])
            else:
                u, v = _solve_warp(I0, I1w, I1wx, I1wy, u0, v0, u, v,
                                   cfg)
        if n_pack > 1:
            u = _unpack_lanes(u, n_pack)
            v = _unpack_lanes(v, n_pack)
        if cfg.median_filtering > 1:
            u = median_filter2d(u, cfg.median_filtering)
            v = median_filter2d(v, cfg.median_filtering)
    return jnp.stack([u, v], axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def tvl1_jit(prev: jax.Array, nxt: jax.Array,
             cfg: TVL1Config = TVL1Config()) -> jax.Array:
    return tvl1(prev, nxt, cfg)
