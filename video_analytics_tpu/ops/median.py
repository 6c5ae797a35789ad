"""Median filtering of flow fields (TV-L1 uses 3x3/5x5 medians between
warps to reject outliers).

Implementation: stack the k² shifted neighbourhoods (replicate border,
cv2.medianBlur semantics) and reduce with a *median-selection network*:
Batcher's odd-even mergesort on the next power of two, with (a) wires
above k² initialised to +inf and constant-folded away at trace time,
and (b) backward pruning to the single median output wire — ~100
min/max pairs for k=5 instead of XLA's general 25-lane sort (the sort
was 15% of the whole TV-L1 device profile; the network fuses into the
surrounding elementwise work).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=8)
def _batcher_pairs(n: int) -> Tuple[Tuple[int, int], ...]:
    """Batcher odd-even mergesort compare-exchange pairs for n wires
    (n a power of two), in execution order; each (i, j) has i < j and
    sorts ascending (wire i gets min)."""
    pairs: List[Tuple[int, int]] = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(0, min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return tuple(pairs)


@functools.lru_cache(maxsize=8)
def _median_network(k2: int) -> Tuple[Tuple[Tuple[int, int], ...], int]:
    """(compare-exchange pairs, median wire) computing the median of k2
    values (k2 must be odd — enforced by median_filter2d; for even k2
    the network would return the upper-middle element, not the mean of
    the two middles), derived from a padded Batcher sort by (a) dropping
    exchanges that only move +inf padding (wires >= k2 start at +inf:
    min(x, inf) = x means such an exchange just renames wires, tracked
    symbolically) and (b) backward-pruning exchanges that cannot reach
    the median wire."""
    n = 1
    while n < k2:
        n *= 2
    median_wire = k2 // 2          # 0-indexed: the (k2//2 + 1)-th smallest
    # Symbolic forward pass: wire -> is it known +inf?
    inf = [w >= k2 for w in range(n)]
    kept: List[Tuple[int, int]] = []
    for (i, j) in _batcher_pairs(n):
        if inf[i] and inf[j]:
            continue
        if inf[i] or inf[j]:
            # min lands on wire i (the finite one), +inf on wire j:
            # pure renaming, no compute.  Record as a "move" with
            # sentinel j == -1 - source.
            src = j if inf[i] else i
            if src != i:
                kept.append((i, -1 - src))
            inf[i], inf[j] = False, True
            continue
        kept.append((i, j))
    # Backward prune to the median wire.
    needed = {median_wire}
    pruned: List[Tuple[int, int]] = []
    for (i, j) in reversed(kept):
        if j < 0:                   # move src -> i
            if i in needed:
                pruned.append((i, j))
                needed.discard(i)
                needed.add(-1 - j)
            continue
        if i in needed or j in needed:
            pruned.append((i, j))
            needed.add(i)
            needed.add(j)
    return tuple(reversed(pruned)), median_wire


def _median_select(stack: jax.Array) -> jax.Array:
    """Median over the last axis (size k²) via the pruned network."""
    k2 = stack.shape[-1]
    network, median_wire = _median_network(k2)
    wires = [stack[..., i] for i in range(k2)]
    for (i, j) in network:
        if j < 0:
            wires[i] = wires[-1 - j]
        else:
            lo = jnp.minimum(wires[i], wires[j])
            hi = jnp.maximum(wires[i], wires[j])
            wires[i], wires[j] = lo, hi
    return wires[median_wire]


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
    return _median_select(stack)
