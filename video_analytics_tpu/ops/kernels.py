"""Shared image-processing primitives for the flow algorithms.

Pure-XLA building blocks (separable correlations as 1D convolutions —
XLA maps these onto the TPU's convolution path; bilinear warps as
vectorised gathers).  The Pallas fused versions of the hot paths live
in ops/pallas/; these are the reference implementations and the
fallbacks on non-TPU backends.

Border conventions deliberately mirror OpenCV (SURVEY.md §7 "hard
parts" #2): replicate borders for correlations, clamped continuous
coordinates for warps.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(sigma: float, n: Optional[int] = None) -> np.ndarray:
    """Normalised 1D Gaussian over offsets [-n, n].

    When n is None uses OpenCV's automatic ksize rule
    (cvRound(sigma*5)|1 capped below at 3 → n = ksize//2)."""
    if n is None:
        ksize = max(int(round(sigma * 5)) | 1, 3)
        n = ksize // 2
    x = np.arange(-n, n + 1, dtype=np.float64)
    g = np.exp(-(x ** 2) / (2.0 * sigma * sigma))
    return (g / g.sum()).astype(np.float32)


def farneback_window_taps(winsize: int, gaussian: bool):
    """Farneback 1D window-average taps as a static tuple: the winsize
    box window, or cv2's OPTFLOW_FARNEBACK_GAUSSIAN (σ = m·0.3 over
    [-m, m], m = winsize//2).  Single source for a cv2-parity-sensitive
    constant used by flow/farneback.py and the Pallas kernels."""
    if gaussian:
        m = winsize // 2
        return tuple(float(t) for t in gaussian_kernel_1d(m * 0.3, n=m))
    return tuple([1.0 / winsize] * winsize)


def _conv1d(x: jax.Array, k: jax.Array, axis: int) -> jax.Array:
    """Correlate (B, H, W) with a 1D kernel along H (axis=1) or W
    (axis=2), VALID — caller handles padding.

    Implemented as an unrolled shift-and-add rather than lax.conv: for
    these short single-channel kernels that is pure VPU work at full
    f32 (flow numerics need it — the MXU conv path's reduced precision
    visibly perturbs flow), fuses with neighbours, and compiles ~8x
    faster than a HIGHEST-precision conv on TPU.
    """
    n = k.shape[0]
    size = x.shape[axis] - n + 1
    acc = None
    for i in range(n):
        if axis == 1:
            sl = x[:, i:i + size, :]
        else:
            sl = x[:, :, i:i + size]
        term = k[i] * sl
        acc = term if acc is None else acc + term
    return acc


def pad_border(x: jax.Array, n: int, axes: Tuple[int, ...] = (1, 2),
               mode: str = "edge") -> jax.Array:
    """mode='edge' ≙ cv2 BORDER_REPLICATE; 'reflect' ≙ BORDER_REFLECT_101."""
    pads = [(0, 0)] * x.ndim
    for a in axes:
        pads[a] = (n, n)
    return jnp.pad(x, pads, mode=mode)


def sepcorr(x: jax.Array, ky: jax.Array, kx: jax.Array,
            border: str = "edge") -> jax.Array:
    """Separable 2D correlation of (B, H, W): vertical kernel ky then
    horizontal kernel kx (both length 2n+1)."""
    ny, nx = ky.shape[0] // 2, kx.shape[0] // 2
    xp = pad_border(x, ny, axes=(1,), mode=border)
    xp = pad_border(xp, nx, axes=(2,), mode=border)
    y = _conv1d(xp, jnp.asarray(ky), axis=1)
    y = _conv1d(y, jnp.asarray(kx), axis=2)
    return y


def gaussian_blur(x: jax.Array, sigma: float, n: Optional[int] = None,
                  border: str = "reflect") -> jax.Array:
    """(B, H, W) Gaussian blur; default border reflect-101 like cv2's
    GaussianBlur with BORDER_DEFAULT."""
    g = gaussian_kernel_1d(sigma, n)
    gj = jnp.asarray(g)
    return sepcorr(x, gj, gj, border=border)


def box_blur(x: jax.Array, winsize: int,
             border: str = "edge") -> jax.Array:
    """(B, H, W) normalised box filter."""
    k = jnp.full((winsize,), 1.0 / winsize, x.dtype)
    return sepcorr(x, k, k, border=border)


def resize_area_like(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize of (B, H, W) → (B, h, w) (cv2 INTER_LINEAR)."""
    b = x.shape[0]
    return jax.image.resize(x, (b, *out_hw), method="linear",
                            antialias=False)


def bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array
                    ) -> jax.Array:
    """Sample (B, H, W, C) at continuous (ys, xs) of shape (B, h, w).

    Coordinates are clamped to the valid image rectangle (replicate
    border, cv2-style out-of-range handling).  Returns (B, h, w, C).
    """
    B, H, W, C = img.shape
    ys = jnp.clip(ys, 0.0, H - 1.0)
    xs = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.clip(jnp.floor(ys), 0, H - 2).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 2).astype(jnp.int32)
    fy = (ys - y0)[..., None]
    fx = (xs - x0)[..., None]

    def gather_one(im, yy, xx):
        flat = im.reshape(H * W, C)
        idx = yy * W + xx
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            *idx.shape, C)

    g = jax.vmap(gather_one)
    p00 = g(img, y0, x0)
    p01 = g(img, y0, x0 + 1)
    p10 = g(img, y0 + 1, x0)
    p11 = g(img, y0 + 1, x0 + 1)
    top = p00 * (1 - fx) + p01 * fx
    bot = p10 * (1 - fx) + p11 * fx
    return top * (1 - fy) + bot * fy


def centered_gradient(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Central-difference gradient of (B, H, W) with replicate borders
    (border derivative = one-sided difference halved, cv2-style).
    Returns (dx, dy)."""
    xp = pad_border(x, 1, axes=(2,), mode="edge")
    gx = (xp[:, :, 2:] - xp[:, :, :-2]) * 0.5
    yp = pad_border(x, 1, axes=(1,), mode="edge")
    gy = (yp[:, 2:, :] - yp[:, :-2, :]) * 0.5
    return gx, gy


def forward_gradient(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Forward differences with zero at the last row/col (the adjoint
    convention the TV dual update needs)."""
    gx = jnp.concatenate(
        [x[:, :, 1:] - x[:, :, :-1], jnp.zeros_like(x[:, :, :1])], axis=2)
    gy = jnp.concatenate(
        [x[:, 1:, :] - x[:, :-1, :], jnp.zeros_like(x[:, :1, :])], axis=1)
    return gx, gy


def divergence(p1: jax.Array, p2: jax.Array) -> jax.Array:
    """Backward-difference divergence, the negative adjoint of
    forward_gradient: div(p)(i,j) = p1(i,j)-p1(i,j-1) + p2(i,j)-p2(i-1,j),
    with the first col/row using p directly."""
    d1 = jnp.concatenate(
        [p1[:, :, :1], p1[:, :, 1:] - p1[:, :, :-1]], axis=2)
    d2 = jnp.concatenate(
        [p2[:, :1, :], p2[:, 1:, :] - p2[:, :-1, :]], axis=1)
    return d1 + d2


def warp_by_flow(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward-warp (B, H, W, C) by flow (B, H, W, 2) where
    flow[..., 0] = dx, flow[..., 1] = dy: out(p) = img(p + flow(p))."""
    B, H, W, _ = flow.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 1)
    xx = jax.lax.broadcasted_iota(jnp.float32, (B, H, W), 2)
    return bilinear_sample(img, yy + flow[..., 1], xx + flow[..., 0])
