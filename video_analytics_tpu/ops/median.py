"""Median filtering of flow fields (TV-L1 uses 3x3/5x5 medians between
warps to reject outliers).

Implementation: stack the k² shifted neighbourhoods (replicate border,
cv2.medianBlur semantics) and reduce with a fixed-size median — XLA
lowers this to a sort of k² lanes per pixel, fully vectorised on the
VPU.  A Pallas sorting-network version can replace it if profiling
shows the sort dominating; so far it doesn't.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def median_filter2d(x: jax.Array, ksize: int) -> jax.Array:
    """Median filter (B, H, W) with a ksize×ksize window, replicate
    border — matches cv2.medianBlur for interior pixels and border
    convention BORDER_REPLICATE."""
    if ksize <= 1:
        return x
    if ksize % 2 != 1:
        raise ValueError(f"ksize must be odd, got {ksize}")
    n = ksize // 2
    xp = jnp.pad(x, [(0, 0), (n, n), (n, n)], mode="edge")
    H, W = x.shape[1], x.shape[2]
    windows = [
        xp[:, i:i + H, j:j + W]
        for i in range(ksize) for j in range(ksize)
    ]
    stack = jnp.stack(windows, axis=-1)
    return jnp.median(stack, axis=-1)
