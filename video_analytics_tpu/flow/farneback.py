"""Farnebäck 2003 dense optical flow, TPU-native.

Replaces the reference pipeline's ``cv2.calcOpticalFlowFarneback``
(OpenCV C++ CPU) with a JAX implementation whose whole pyramid traces
into one XLA program: the per-level polynomial expansions are separable
correlations (conv unit), the displacement solve is elementwise (VPU),
and everything is batched over frame pairs.  Parity vs the cv2 oracle
is tolerance-tested (BASELINE.json config #2, flow-field L2 check).

Algorithm per Farnebäck's paper + OpenCV's documented semantics:
each pixel neighbourhood is fit with a quadratic f(x) = xᵀAx + bᵀx + c
via Gaussian-weighted least squares; for a displacement d between two
expansions, A = (A1 + A2w)/2, Δb = -(b2w - b1)/2 + A·d; d is solved
from window-averaged normal equations (AᵀA)d = AᵀΔb, iterated with
re-warping, coarse-to-fine over an image pyramid.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_analytics_tpu.config import FarnebackConfig
from video_analytics_tpu.ops.kernels import (
    bilinear_sample, box_blur, gaussian_kernel_1d, gaussian_blur,
    sepcorr, resize_area_like)


# ---------------------------------------------------------------------------
# Polynomial expansion
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _poly_exp_setup(n: int, sigma: float):
    """1D applicability kernels + the inverse-Gramian coefficients.

    Mirrors OpenCV's FarnebackPrepareGaussian: build the 6x6 Gramian of
    the basis (1, x, y, x², y², xy) under the separable Gaussian
    applicability, invert, and keep the entries used for coefficient
    recovery (ig11, ig03, ig33, ig55).
    """
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x ** 2) / (2.0 * sigma * sigma))
    g /= g.sum()
    xg = x * g
    xxg = x * x * g

    G = np.zeros((6, 6), np.float64)
    for yy in range(-n, n + 1):
        for xx in range(-n, n + 1):
            w = g[yy + n] * g[xx + n]
            G[0, 0] += w
            G[1, 1] += w * xx * xx
            G[3, 3] += w * xx ** 4
            G[5, 5] += w * xx * xx * yy * yy
    G[2, 2] = G[1, 1]
    G[4, 4] = G[3, 3]
    G[0, 3] = G[0, 4] = G[3, 0] = G[4, 0] = G[1, 1]
    G[3, 4] = G[4, 3] = G[5, 5]
    invG = np.linalg.inv(G)
    ig11, ig03, ig33, ig55 = invG[1, 1], invG[0, 3], invG[3, 3], invG[5, 5]
    return (g.astype(np.float32), xg.astype(np.float32),
            xxg.astype(np.float32),
            float(ig11), float(ig03), float(ig33), float(ig55))


def poly_expansion(img: jax.Array, n: int, sigma: float) -> jax.Array:
    """(B, H, W) image → (B, H, W, 5) poly coefficients
    (bx, by, axx, ayy, axy-basis) via separable correlations."""
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_setup(n, sigma)
    g, xg, xxg = jnp.asarray(g), jnp.asarray(xg), jnp.asarray(xxg)

    img = img.astype(jnp.float32)
    # b* = correlation with (basis · applicability); separable passes.
    s1 = sepcorr(img, g, g)        # const
    sx = sepcorr(img, g, xg)       # x
    sy = sepcorr(img, xg, g)       # y
    sxx = sepcorr(img, g, xxg)     # x²
    syy = sepcorr(img, xxg, g)     # y²
    sxy = sepcorr(img, xg, xg)     # xy

    bx = sx * ig11
    by = sy * ig11
    cxx = s1 * ig03 + sxx * ig33
    cyy = s1 * ig03 + syy * ig33
    cxy = sxy * ig55
    return jnp.stack([bx, by, cxx, cyy, cxy], axis=-1)


# ---------------------------------------------------------------------------
# Matrix update + flow solve
# ---------------------------------------------------------------------------

_BORDER_WEIGHTS = (0.14, 0.14, 0.4472, 0.4472, 0.4472)


@functools.lru_cache(maxsize=32)
def _border_attenuation_np(h: int, w: int) -> np.ndarray:
    nb = len(_BORDER_WEIGHTS)
    wy = np.ones(h, np.float32)
    wx = np.ones(w, np.float32)
    for i, s in enumerate(_BORDER_WEIGHTS):
        if i < h:
            wy[i] *= s
            wy[h - 1 - i] *= s
        if i < w:
            wx[i] *= s
            wx[w - 1 - i] *= s
    return np.outer(wy, wx)


def _border_attenuation(h: int, w: int) -> jax.Array:
    return jnp.asarray(_border_attenuation_np(h, w))


def _normal_equations(r0, r1w, dx, dy, inb, att):
    """The shared cv2-parity core of update_matrices{,_cf} AND the
    fused Pallas prologue (ops/pallas/farneback_kernels
    ._neq_sep_corr_kernel): per-pixel normal-equation entries from the
    two images' poly planes (`r0`, `r1w` are 5-tuples of plane arrays)
    — OOB branch, border attenuation and the G/h products, returned as
    5 planes.  Kept in ONE place because the 0.5/0.25 factors and the
    OOB fallback were derived empirically to bit-level cv2 parity;
    layout variants must not be able to diverge.  `att` is the
    (broadcastable) border-attenuation plane
    (cv2-style: entries within 5px of the frame are down-weighted so
    the window average trusts interior pixels more)."""
    a11 = jnp.where(inb, (r0[2] + r1w[2]) * 0.5, r0[2])
    a22 = jnp.where(inb, (r0[3] + r1w[3]) * 0.5, r0[3])
    a12 = jnp.where(inb, (r0[4] + r1w[4]) * 0.25, r0[4] * 0.5)
    b1w = jnp.where(inb, r1w[0], 0.0)
    b2w = jnp.where(inb, r1w[1], 0.0)
    dbx = (r0[0] - b1w) * 0.5 + a11 * dx + a12 * dy
    dby = (r0[1] - b2w) * 0.5 + a12 * dx + a22 * dy

    a11, a22, a12 = a11 * att, a22 * att, a12 * att
    dbx, dby = dbx * att, dby * att

    g11 = a11 * a11 + a12 * a12
    g12 = (a11 + a22) * a12
    g22 = a22 * a22 + a12 * a12
    h1 = a11 * dbx + a12 * dby
    h2 = a12 * dbx + a22 * dby
    return g11, g12, g22, h1, h2


def _oob_mask(dx, dy, h, w):
    """cv2's FarnebackUpdateMatrices interior test: floor(p + flow)
    must stay inside [0, size-2] on both axes (which excludes the
    exact last row/column even at zero flow)."""
    B = dx.shape[0]
    yy = jax.lax.broadcasted_iota(jnp.float32, (B, h, w), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (B, h, w), 2)
    x1 = jnp.floor(xx + dx)
    y1 = jnp.floor(yy + dy)
    return (x1 >= 0) & (x1 < w - 1) & (y1 >= 0) & (y1 < h - 1)


def update_matrices(R0: jax.Array, R1: jax.Array,
                    flow: jax.Array,
                    use_pallas: Optional[bool] = None,
                    band: Optional[int] = None) -> jax.Array:
    """Per-pixel normal-equation entries (B, H, W, 5) =
    (G11, G12, G22, h1, h2) from paired expansions and current flow.

    The warp of R1 is the hot path: on TPU it uses the Pallas banded
    separable warp (ops/pallas/warp.py) — exact per axis, and exact
    overall wherever the flow's vertical component is locally smooth,
    which box-blurred Farneback flow is; parity vs cv2 is gated in
    tests with the kernel enabled.  Set use_pallas=False to force the
    exact XLA gather (~50x slower on TPU).

    Out-of-bounds semantics mirror cv2's FarnebackUpdateMatrices
    exactly: where floor(p + flow) leaves [0, size-2] on either axis
    (which includes the exact last row/column even at zero flow, since
    cv2's interior test is floor(fy) < height-1), the warped expansion
    is discarded and A := A0, Δb := b0/2 — derived empirically to
    bit-level flow parity on both window types (see tests).
    """
    from video_analytics_tpu.ops.pallas.warp import (
        DEFAULT_BAND, pallas_warp, warp_fits_vmem)
    from video_analytics_tpu.utils.platform import on_tpu

    B, H, W, _ = R0.shape
    dx, dy = flow[..., 0], flow[..., 1]
    if use_pallas is None:
        use_pallas = on_tpu() and warp_fits_vmem(H, W, R0.shape[-1])
    if use_pallas:
        R1w = pallas_warp(R1, flow, r=band or DEFAULT_BAND)
    else:
        yy = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 1)
        xx = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 2)
        R1w = bilinear_sample(R1, yy + dy, xx + dx)

    inb = _oob_mask(dx, dy, H, W)
    planes = _normal_equations(
        tuple(R0[..., i] for i in range(5)),
        tuple(R1w[..., i] for i in range(5)), dx, dy, inb,
        _border_attenuation(H, W)[None])
    return jnp.stack(planes, axis=-1)


def update_matrices_cf(R0: jax.Array, R1: jax.Array,
                       flow_cf: jax.Array,
                       band: Optional[int] = None) -> jax.Array:
    """Channels-first twin of ``update_matrices`` for the fused TPU
    path: R0/R1 (B, 5, H, W) poly coefficients, flow_cf (B, 2, H, W)
    → M (B, 5, H, W).  Same math and OOB semantics; the warp consumes
    and produces channels-first (ops/pallas/warp.pallas_warp_cf), so
    no NHWC layout round trip enters the iteration chain."""
    from video_analytics_tpu.ops.pallas.warp import (
        DEFAULT_BAND, pallas_warp_cf)

    B, _, H, W = R0.shape
    dx, dy = flow_cf[:, 0], flow_cf[:, 1]
    R1w = pallas_warp_cf(R1, dx, dy, r=band or DEFAULT_BAND)
    inb = _oob_mask(dx, dy, H, W)
    planes = _normal_equations(
        tuple(R0[:, i] for i in range(5)),
        tuple(R1w[:, i] for i in range(5)), dx, dy, inb,
        _border_attenuation(H, W)[None])
    return jnp.stack(planes, axis=1)


def _fused_iteration(R0: jax.Array, R1: jax.Array, flow_cf: jax.Array,
                     cfg, band: Optional[int]) -> jax.Array:
    """One channels-first Farneback iteration with M fused away:
    banded Pallas warp → [normal equations + vertical window avg]
    → [horizontal window avg + 2×2 solve] — M and the blurred planes
    never touch HBM (ops/pallas/farneback_kernels
    .update_flow_fused_pallas).  Same f32 math as update_matrices_cf +
    update_flow_pallas."""
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        update_flow_fused_pallas)
    from video_analytics_tpu.ops.pallas.warp import (
        DEFAULT_BAND, pallas_warp_cf)

    dx, dy = flow_cf[:, 0], flow_cf[:, 1]
    R1w = pallas_warp_cf(R1, dx, dy, r=band or DEFAULT_BAND)
    return update_flow_fused_pallas(R0, R1w, flow_cf, cfg)


def _window_taps(cfg: FarnebackConfig):
    """1D window-average taps (box, or Gaussian with
    OPTFLOW_FARNEBACK_GAUSSIAN) as a static tuple."""
    from video_analytics_tpu.ops.kernels import farneback_window_taps
    return farneback_window_taps(cfg.winsize, cfg.gaussian_window)


def _wspace_ok(lh: int, lw: int, band: int, cfg: FarnebackConfig) -> bool:
    """Gate for the W-space fused iteration (r4): the single fused
    [col-warp + neq + corr] block must fit VMEM."""
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        warp_neq_corr_fits)
    r = max(1, min(band, lh - 2, lw - 2))
    return warp_neq_corr_fits(lh, lw, r, cfg.winsize)


def _fused_iteration_wspace(R0T: jax.Array, R1: jax.Array,
                            flow_cf: jax.Array, cfg,
                            band: Optional[int]) -> jax.Array:
    """One channels-first Farneback iteration with BOTH R1w and M fused
    away (r4): row-pass warp (H-space) → transpose → [col-pass warp +
    normal equations + horizontal window avg] (one W-space kernel,
    ops/pallas/farneback_kernels.warp_neq_corr_pallas) → transpose →
    [vertical window avg + 2×2 solve].  `R0T` is the (B, 5, W, H)
    transposed expansion of the first image (poly layout "cf_t").

    Same per-pixel f32 ops as _fused_iteration; the only numeric
    difference is the order of the two separable window-average passes
    (horizontal first), a pure f32 accumulation reorder — equivalence
    is gated in tests/test_pallas_farneback.py."""
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        _sep_corr_axis_any, corr_solve_from_T_pallas, tsolve_fits,
        warp_neq_corr_pallas)
    from video_analytics_tpu.ops.pallas.warp import (
        DEFAULT_BAND, pallas_warp_v_cf)

    B, _, H, W = R1.shape
    r = max(1, min(band or DEFAULT_BAND, H - 2, W - 2))
    mid = pallas_warp_v_cf(R1, flow_cf[:, 1], r=r)      # rows resolved
    midT = mid.transpose(0, 1, 3, 2)                    # (B, 5, W, H)
    flowT = flow_cf.transpose(0, 1, 3, 2)
    attT = _border_attenuation(W, H)     # == _border_attenuation(H,W).T
    taps = _window_taps(cfg)
    hT = warp_neq_corr_pallas(midT, R0T, flowT, attT, taps, r=r)
    if tsolve_fits(W, H, cfg.winsize):
        # Layout restore + vertical avg + solve in one kernel (the hT
        # HBM transpose round trip drops out; bit-identical f32 ops).
        return corr_solve_from_T_pallas(hT, taps)
    hh = hT.transpose(0, 1, 3, 2)                       # (B, 5, H, W)
    plan = tuple((c, taps) for c in range(5))
    return _sep_corr_axis_any(hh, plan, epilogue="solve2x2")


def _wspace_level(R0T: jax.Array, R1: jax.Array, flow_cf: jax.Array,
                  cfg, band: Optional[int]) -> jax.Array:
    """All cfg.iterations W-space fused iterations of one pyramid
    level.  Middle iterations run as just TWO kernels — the W-space
    [col-warp + neq + h-avg] kernel and the [transpose + v-avg + solve
    + next row-warp] kernel (corr_solve_warp_from_T_pallas) — so the
    row-warp pass and both 5-plane layout transposes drop out of the
    chain; the last iteration finishes with the solve-only tail.
    Bit-identical per-pixel f32 ops to iterating
    _fused_iteration_wspace (gated in tests/test_pallas_farneback.py);
    falls back to it when the fused block exceeds VMEM."""
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        corr_solve_from_T_pallas, corr_solve_warp_from_T_pallas,
        farneback_level_pallas, level_kernel_fits, tsolve_fits,
        tsolve_warp_fits, warp_emit_T_pallas, warp_neq_corr_pallas)
    from video_analytics_tpu.ops.pallas.warp import DEFAULT_BAND

    B, _, H, W = R1.shape
    r = max(1, min(band or DEFAULT_BAND, H - 2, W - 2))
    taps = _window_taps(cfg)
    attT = _border_attenuation(W, H)

    if level_kernel_fits(H, W, r, cfg.winsize):
        # Whole level in ONE kernel: 16 HBM plane traversals per level
        # instead of ~119 (farneback_level_pallas).
        return farneback_level_pallas(R0T, R1, flow_cf, attT, taps, r,
                                      cfg.iterations)

    if not (tsolve_warp_fits(W, H, cfg.winsize, r)
            and tsolve_fits(W, H, cfg.winsize)):
        for _ in range(cfg.iterations):
            flow_cf = _fused_iteration_wspace(R0T, R1, flow_cf, cfg,
                                              band)
        return flow_cf

    flowT, midT = warp_emit_T_pallas(R1, flow_cf, r)
    for it in range(cfg.iterations):
        hT = warp_neq_corr_pallas(midT, R0T, flowT, attT, taps, r=r)
        if it < cfg.iterations - 1:
            flow_cf, flowT, midT = corr_solve_warp_from_T_pallas(
                hT, R1, taps, r)
        else:
            flow_cf = corr_solve_from_T_pallas(hT, taps)
    return flow_cf


def _solve_flow(M: jax.Array) -> jax.Array:
    """2x2 solve with cv2's regularised inverse 1/(det + 1e-3).

    det = (a11·a22 - a12²)² ≥ 0, so the +1e-3 is a pure Tikhonov-style
    damping: near borders cv2's attenuation shrinks det by scale⁴ and
    the regulariser dominates, damping the flow toward 0 — reproducing
    this (rather than a thresholded true inverse) is what closes the
    border band to exact cv2 parity."""
    g11, g12, g22, h1, h2 = (M[..., i] for i in range(5))
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    fx = (g22 * h1 - g12 * h2) * idet
    fy = (g11 * h2 - g12 * h1) * idet
    return jnp.stack([fx, fy], axis=-1)


def _blur_M(M: jax.Array, cfg: FarnebackConfig) -> jax.Array:
    B, H, W, C = M.shape
    flat = M.transpose(0, 3, 1, 2).reshape(B * C, H, W)
    if cfg.gaussian_window:
        m = cfg.winsize // 2
        sigma = m * 0.3
        k = gaussian_kernel_1d(sigma, n=m)
        blurred = sepcorr(flat, jnp.asarray(k), jnp.asarray(k))
    else:
        blurred = box_blur(flat, cfg.winsize)
    return blurred.reshape(B, C, H, W).transpose(0, 2, 3, 1)


def _level_sizes(h: int, w: int, cfg: FarnebackConfig):
    """Static per-level (h, w, scale), coarsest-first, finest-last.

    cv2 semantics: levels are clamped so no level's side drops below 32
    px (min_size), and level k has scale pyr_scale**k for k=levels..0.
    """
    min_size = 32
    levels = cfg.levels
    scale = 1.0
    for k in range(cfg.levels):
        scale *= cfg.pyr_scale
        if w * scale < min_size or h * scale < min_size:
            levels = k
            break
    sizes = []
    for k in range(levels, -1, -1):
        s = cfg.pyr_scale ** k
        sizes.append((int(round(h * s)), int(round(w * s)), s))
    return sizes


def _smooth_taps(scale: float) -> Tuple[float, ...]:
    """cv2's per-level pre-blur taps: sigma=(1/scale-1)*0.5 with the
    auto ksize rule, except scale>=1 where cv2's minimum-3 clamp yields
    the fixed [0.25, 0.5, 0.25] kernel (getGaussianKernel(3, 0)) — cv2
    ALWAYS pre-blurs, including at full resolution (found empirically:
    restores interior single-iteration parity from ~0.08px to
    ~0.017px).  Single source for this cv2-parity-sensitive constant,
    shared with the fused prologue kernel."""
    if scale >= 1.0:
        return (0.25, 0.5, 0.25)
    sigma = (1.0 / scale - 1.0) * 0.5
    from video_analytics_tpu.ops.kernels import gaussian_kernel_1d
    return tuple(float(t) for t in gaussian_kernel_1d(sigma))


def _smooth_and_resize(img: jax.Array, scale: float,
                       out_hw: Tuple[int, int]) -> jax.Array:
    """OpenCV's per-level image prep: Gaussian blur (taps from
    _smooth_taps, reflect-101 border) on the ORIGINAL image, then
    bilinear resize."""
    from video_analytics_tpu.ops.kernels import sepcorr
    k = jnp.asarray(np.array(_smooth_taps(scale), np.float32))
    sm = sepcorr(img, k, k, border="reflect")
    if scale >= 1.0:
        return sm
    return resize_area_like(sm, out_hw)


def _level_band(scale: float, envelope: Optional[int] = None) -> int:
    """Warp sweep band for a pyramid level.  The kernel's exactness
    envelope is ±`envelope` px of displacement at full resolution
    (default DEFAULT_BAND); a level at `scale` only ever represents
    scale-times-smaller displacements, so its band shrinks
    proportionally (+8 rows margin for transient iteration overshoot).
    Sweep cost is linear in the band, so the coarse levels get ~2x
    cheaper with no change to any flow within the envelope.

    The fused feature/classify pipelines pass a reduced envelope of
    flow_bound+4: their flow is clipped to ±flow_bound px right after
    the solver (the two-stream storage convention), so displacements
    past ~24 px cannot affect the features either way."""
    from video_analytics_tpu.ops.pallas.warp import DEFAULT_BAND
    base = min(envelope or DEFAULT_BAND, DEFAULT_BAND)
    b = int(np.ceil(base * scale)) + 8
    return min(base, max(8, b))


def farneback(prev: jax.Array, nxt: jax.Array,
              cfg: FarnebackConfig = FarnebackConfig(),
              initial_flow: Optional[jax.Array] = None,
              use_pallas: Optional[bool] = None) -> jax.Array:
    """Dense flow for a batch of gray frame pairs.

    Args:
      prev, nxt: (B, H, W) float32 in [0, 255] (or uint8).
      cfg: FarnebackConfig (static under jit).
      initial_flow: optional (B, H, W, 2) seed
        (cv2.OPTFLOW_USE_INITIAL_FLOW).

    Returns:
      (B, H, W, 2) float32 flow, channels (dx, dy):
      prev(p) ≈ next(p + flow(p)).
    """
    prev = prev.astype(jnp.float32)
    nxt = nxt.astype(jnp.float32)
    B, H, W = prev.shape
    sizes = _level_sizes(H, W, cfg)

    # On TPU the three per-level stages run as fused Pallas kernels
    # (ops/pallas/): single-read poly expansion, banded warp inside
    # update_matrices, and window-average+solve — decided once for the
    # whole pyramid so the flow can stay CHANNELS-FIRST across levels
    # and iterations (no NHWC layout round trips between kernels).
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        farneback_stage_fits_vmem, poly_expansion_pallas)
    from video_analytics_tpu.utils.platform import on_tpu
    fused = (use_pallas if use_pallas is not None else on_tpu()) \
        and all(farneback_stage_fits_vmem(lh, lw) for lh, lw, _ in sizes)

    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        poly_prologue_pallas, prologue_fits)

    flow = None
    for li, (lh, lw, scale) in enumerate(sizes):
        fshape = (B, 2, lh, lw) if fused else (B, lh, lw, 2)
        if flow is None:
            if cfg.use_initial_flow and initial_flow is not None:
                f = jax.image.resize(initial_flow.astype(jnp.float32),
                                     (B, lh, lw, 2), method="linear",
                                     antialias=False) * scale
                flow = f.transpose(0, 3, 1, 2) if fused else f
            else:
                flow = jnp.zeros(fshape, jnp.float32)
        else:
            # cv2: bilinear-resize the coarser flow and scale values by
            # exactly 1/pyr_scale (not the rounded size ratio).
            flow = jax.image.resize(flow, fshape, method="linear",
                                    antialias=False) * (1.0 / cfg.pyr_scale)

        band = _level_band(scale)
        wspace = fused and _wspace_ok(lh, lw, band, cfg)
        btaps = _smooth_taps(scale)
        if wspace and prologue_fits(H, W, lh, lw, len(btaps),
                                    cfg.poly_n):
            # Fused prologue: blur + resize + poly expansion in one
            # kernel per frame, each layout from its own image.
            R0T = poly_prologue_pallas(prev, btaps, cfg.poly_n,
                                       cfg.poly_sigma, (lh, lw),
                                       layout="cf_t")
            R1 = poly_prologue_pallas(nxt, btaps, cfg.poly_n,
                                      cfg.poly_sigma, (lh, lw),
                                      layout="cf")
        elif wspace:
            # W-space fused iterations consume R0 transposed (free from
            # the poly h-pass) and R1 channels-first.
            I0 = _smooth_and_resize(prev, scale, (lh, lw))
            I1 = _smooth_and_resize(nxt, scale, (lh, lw))
            R0T = poly_expansion_pallas(I0, cfg.poly_n, cfg.poly_sigma,
                                        layout="cf_t")
            R1 = poly_expansion_pallas(I1, cfg.poly_n, cfg.poly_sigma,
                                       cf=True)
        elif fused:
            I0 = _smooth_and_resize(prev, scale, (lh, lw))
            I1 = _smooth_and_resize(nxt, scale, (lh, lw))
            R0 = poly_expansion_pallas(I0, cfg.poly_n, cfg.poly_sigma,
                                       cf=True)
            R1 = poly_expansion_pallas(I1, cfg.poly_n, cfg.poly_sigma,
                                       cf=True)
        else:
            I0 = _smooth_and_resize(prev, scale, (lh, lw))
            I1 = _smooth_and_resize(nxt, scale, (lh, lw))
            R0 = poly_expansion(I0, cfg.poly_n, cfg.poly_sigma)
            R1 = poly_expansion(I1, cfg.poly_n, cfg.poly_sigma)

        if wspace:
            flow = _wspace_level(R0T, R1, flow, cfg, band)
        elif fused:
            for it in range(cfg.iterations):
                flow = _fused_iteration(R0, R1, flow, cfg, band)
        else:
            M = update_matrices(R0, R1, flow, use_pallas=use_pallas,
                                band=band)
            for it in range(cfg.iterations):
                flow = _solve_flow(_blur_M(M, cfg))
                if it < cfg.iterations - 1:
                    M = update_matrices(R0, R1, flow,
                                        use_pallas=use_pallas, band=band)
    return flow.transpose(0, 2, 3, 1) if fused else flow


@functools.partial(jax.jit, static_argnames=("cfg",))
def farneback_jit(prev: jax.Array, nxt: jax.Array,
                  cfg: FarnebackConfig = FarnebackConfig()) -> jax.Array:
    return farneback(prev, nxt, cfg)


def farneback_sequence(frames: jax.Array,
                       cfg: FarnebackConfig = FarnebackConfig(),
                       use_pallas: Optional[bool] = None,
                       envelope: Optional[int] = None) -> jax.Array:
    """Flow for all consecutive pairs of a (T, H, W) frame sequence.

    Identical math to ``farneback(frames[:-1], frames[1:], cfg)`` but
    the per-frame work — the per-level Gaussian smoothing/resize and
    the polynomial expansion, which the pair form computes twice per
    interior frame — runs once per frame and is paired by slicing.
    This is the form the fused feature/classify pipelines use
    (runtime/pipeline.py), where every frame is interior.
    """
    frames = frames.astype(jnp.float32)
    T, H, W = frames.shape
    sizes = _level_sizes(H, W, cfg)

    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        farneback_stage_fits_vmem, poly_expansion_pallas)
    from video_analytics_tpu.utils.platform import on_tpu
    fused = (use_pallas if use_pallas is not None else on_tpu()) \
        and all(farneback_stage_fits_vmem(lh, lw) for lh, lw, _ in sizes)

    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        poly_prologue_pallas, prologue_fits)

    flow = None
    for li, (lh, lw, scale) in enumerate(sizes):
        fshape = (T - 1, 2, lh, lw) if fused else (T - 1, lh, lw, 2)
        if flow is None:
            flow = jnp.zeros(fshape, jnp.float32)
        else:
            flow = jax.image.resize(flow, fshape, method="linear",
                                    antialias=False) * (1.0 / cfg.pyr_scale)

        band = _level_band(scale, envelope)
        wspace = fused and _wspace_ok(lh, lw, band, cfg)
        btaps = _smooth_taps(scale)
        if wspace and prologue_fits(H, W, lh, lw, len(btaps),
                                    cfg.poly_n):
            # Fused prologue (r5): blur + resize + BOTH expansion
            # layouts of every frame in one kernel — the level image
            # and the basis correlations never touch HBM.
            R, RT = poly_prologue_pallas(frames, btaps, cfg.poly_n,
                                         cfg.poly_sigma, (lh, lw),
                                         layout="cf_both")
            R0T, R1 = RT[:-1], R[1:]
        elif wspace:
            # Both layouts of the shared per-frame expansion: R1 slices
            # the cf form, R0 the transposed form (one extra 5-plane
            # transpose per level — cheaper than the R1w round trip it
            # replaces).
            I = _smooth_and_resize(frames, scale, (lh, lw))
            R, RT = poly_expansion_pallas(I, cfg.poly_n, cfg.poly_sigma,
                                          layout="cf_both")
            R0T, R1 = RT[:-1], R[1:]
        elif fused:
            I = _smooth_and_resize(frames, scale, (lh, lw))
            R = poly_expansion_pallas(I, cfg.poly_n, cfg.poly_sigma,
                                      cf=True)
            R0, R1 = R[:-1], R[1:]
        else:
            I = _smooth_and_resize(frames, scale, (lh, lw))
            R = poly_expansion(I, cfg.poly_n, cfg.poly_sigma)
            R0, R1 = R[:-1], R[1:]

        if wspace:
            flow = _wspace_level(R0T, R1, flow, cfg, band)
        elif fused:
            for it in range(cfg.iterations):
                flow = _fused_iteration(R0, R1, flow, cfg, band)
        else:
            M = update_matrices(R0, R1, flow, use_pallas=use_pallas,
                                band=band)
            for it in range(cfg.iterations):
                flow = _solve_flow(_blur_M(M, cfg))
                if it < cfg.iterations - 1:
                    M = update_matrices(R0, R1, flow,
                                        use_pallas=use_pallas, band=band)
    return flow.transpose(0, 2, 3, 1) if fused else flow
