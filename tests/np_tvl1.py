"""Independent numpy implementation of TV-L1 flow (the test oracle).

Written directly from the published algorithm (Zach/Pock/Bischof 2007;
IPOL Sánchez Pérez et al. 2013) with plain loops over scales/warps and
vectorised numpy inner updates.  Deliberately shares NO code with
video_analytics_tpu.flow.tvl1 — it exists to catch bugs by agreement
of two implementations of the same spec (cv2's DualTVL1 is unavailable
in this environment).
"""

import numpy as np
import cv2

from video_analytics_tpu.config import TVL1Config


def _centered_gradient(img):
    gx = np.empty_like(img)
    gx[:, 1:-1] = (img[:, 2:] - img[:, :-2]) * 0.5
    gx[:, 0] = (img[:, 1] - img[:, 0]) * 0.5
    gx[:, -1] = (img[:, -1] - img[:, -2]) * 0.5
    gy = np.empty_like(img)
    gy[1:-1, :] = (img[2:, :] - img[:-2, :]) * 0.5
    gy[0, :] = (img[1, :] - img[0, :]) * 0.5
    gy[-1, :] = (img[-1, :] - img[-2, :]) * 0.5
    return gx, gy


def _forward_gradient(x):
    gx = np.zeros_like(x)
    gy = np.zeros_like(x)
    gx[:, :-1] = x[:, 1:] - x[:, :-1]
    gy[:-1, :] = x[1:, :] - x[:-1, :]
    return gx, gy


def _divergence(p1, p2):
    d = np.empty_like(p1)
    d[:, 0] = p1[:, 0]
    d[:, 1:] = p1[:, 1:] - p1[:, :-1]
    d2 = np.empty_like(p2)
    d2[0, :] = p2[0, :]
    d2[1:, :] = p2[1:, :] - p2[:-1, :]
    return d + d2


def _bilinear(img, ys, xs):
    H, W = img.shape
    ys = np.clip(ys, 0.0, H - 1.0)
    xs = np.clip(xs, 0.0, W - 1.0)
    y0 = np.clip(np.floor(ys), 0, H - 2).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, W - 2).astype(np.int64)
    fy = ys - y0
    fx = xs - x0
    p00 = img[y0, x0]
    p01 = img[y0, x0 + 1]
    p10 = img[y0 + 1, x0]
    p11 = img[y0 + 1, x0 + 1]
    return (p00 * (1 - fx) + p01 * fx) * (1 - fy) + \
           (p10 * (1 - fx) + p11 * fx) * fy


def _median(x, k):
    if k <= 1:
        return x
    n = k // 2
    xp = np.pad(x, n, mode="edge")
    H, W = x.shape
    stack = np.stack([xp[i:i + H, j:j + W]
                      for i in range(k) for j in range(k)], axis=-1)
    return np.median(stack, axis=-1)


def _downscale(img, out_hw, zoom):
    sigma = 0.6 * np.sqrt(1.0 / zoom ** 2 - 1.0)
    # Gaussian kernel matching ops.kernels.gaussian_kernel_1d + reflect101
    ksize = max(int(round(sigma * 5)) | 1, 3)
    sm = cv2.GaussianBlur(img, (ksize, ksize), sigma,
                          borderType=cv2.BORDER_REFLECT_101)
    return cv2.resize(sm, (out_hw[1], out_hw[0]),
                      interpolation=cv2.INTER_LINEAR)


def tvl1_np(I0, I1, cfg: TVL1Config = TVL1Config()):
    """(H, W) float32 pair → (H, W, 2) flow, same spec as the jax impl."""
    I0 = I0.astype(np.float32)
    I1 = I1.astype(np.float32)
    H, W = I0.shape

    sizes = [(H, W)]
    for s in range(1, cfg.nscales):
        scale = cfg.scale_step ** s
        lh, lw = int(round(H * scale)), int(round(W * scale))
        if min(lh, lw) < 16:
            break
        sizes.append((lh, lw))

    I0s, I1s = [I0], [I1]
    for s in range(1, len(sizes)):
        I0s.append(_downscale(I0s[-1], sizes[s], cfg.scale_step))
        I1s.append(_downscale(I1s[-1], sizes[s], cfg.scale_step))

    l_t = cfg.lambda_ * cfg.theta
    taut = cfg.tau / cfg.theta
    u = v = None
    for s in range(len(sizes) - 1, -1, -1):
        lh, lw = sizes[s]
        if u is None:
            u = np.zeros((lh, lw), np.float32)
            v = np.zeros((lh, lw), np.float32)
        else:
            u = cv2.resize(u, (lw, lh), interpolation=cv2.INTER_LINEAR) \
                / cfg.scale_step
            v = cv2.resize(v, (lw, lh), interpolation=cv2.INTER_LINEAR) \
                / cfg.scale_step
        I0l, I1l = I0s[s], I1s[s]
        I1x, I1y = _centered_gradient(I1l)
        yy, xx = np.mgrid[0:lh, 0:lw].astype(np.float32)
        for _ in range(cfg.warps):
            u0, v0 = u.copy(), v.copy()
            I1w = _bilinear(I1l, yy + v0, xx + u0)
            I1wx = _bilinear(I1x, yy + v0, xx + u0)
            I1wy = _bilinear(I1y, yy + v0, xx + u0)
            grad = I1wx ** 2 + I1wy ** 2
            rho_c = I1w - I1wx * u0 - I1wy * v0 - I0l
            p11 = np.zeros_like(u)
            p12 = np.zeros_like(u)
            p21 = np.zeros_like(u)
            p22 = np.zeros_like(u)
            err = np.inf
            step = 0
            total = cfg.outer_iterations * cfg.inner_iterations
            while step < total:
                if step % cfg.inner_iterations == 0:
                    if err < cfg.epsilon ** 2:
                        break
                    if cfg.median_filtering > 1:
                        u = _median(u, cfg.median_filtering)
                        v = _median(v, cfg.median_filtering)
                rho = rho_c + I1wx * u + I1wy * v
                th = l_t * grad
                d = np.where(
                    rho < -th, l_t,
                    np.where(rho > th, -l_t,
                             -rho / np.maximum(grad, 1e-10)))
                v1 = u + d * I1wx
                v2 = v + d * I1wy
                un = v1 + cfg.theta * _divergence(p11, p12)
                vn = v2 + cfg.theta * _divergence(p21, p22)
                err = np.sum((un - u) ** 2 + (vn - v) ** 2) / (lh * lw)
                ux, uy = _forward_gradient(un)
                vx, vy = _forward_gradient(vn)
                ng1 = 1.0 + taut * np.sqrt(ux ** 2 + uy ** 2)
                ng2 = 1.0 + taut * np.sqrt(vx ** 2 + vy ** 2)
                p11 = (p11 + taut * ux) / ng1
                p12 = (p12 + taut * uy) / ng1
                p21 = (p21 + taut * vx) / ng2
                p22 = (p22 + taut * vy) / ng2
                u, v = un, vn
                step += 1
        if cfg.median_filtering > 1:
            u = _median(u, cfg.median_filtering)
            v = _median(v, cfg.median_filtering)
    return np.stack([u, v], axis=-1)
