"""Flow-shape bucketing (SURVEY.md §7 hard-part #3).

Every distinct (H, W) a flow driver sees compiles its own XLA program —
and the Pallas pyramid kernels take minutes per new shape on Mosaic.
Bucketing pads inputs up to a small ladder of shapes (multiples of
`BUCKET_MULTIPLE`, edge-replicated) so nearby video resolutions share
one cached executable; the flow is computed at the bucketed shape and
cropped back.

Semantics note: edge-replicated padding gives zero image gradient in
the pad band, so the computed flow differs from the native-shape flow
only in a border band (the same band where dense flow is ill-posed
anyway).  Exact-parity paths (tests, library calls) use the drivers
directly; bucketing is applied at the pipeline/CLI level where
arbitrary user resolutions arrive.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

BUCKET_MULTIPLE = 64


def bucket_hw(h: int, w: int, multiple: int = BUCKET_MULTIPLE
              ) -> Tuple[int, int]:
    """The bucketed (padded-up) shape for an (h, w) frame."""
    return (-(-h // multiple) * multiple, -(-w // multiple) * multiple)


def bucketed_flow(flow_fn: Callable[[jax.Array, jax.Array], jax.Array],
                  prev: jax.Array, nxt: jax.Array,
                  multiple: int = BUCKET_MULTIPLE) -> jax.Array:
    """Run `flow_fn` on edge-padded-to-bucket gray pairs, crop back.

    prev/nxt: (B, H, W); returns (B, H, W, 2).  All (H, W) within the
    same bucket share one compiled executable of `flow_fn`.
    """
    B, H, W = prev.shape
    bh, bw = bucket_hw(H, W, multiple)
    if (bh, bw) == (H, W):
        return flow_fn(prev, nxt)
    pad = ((0, 0), (0, bh - H), (0, bw - W))
    flow = flow_fn(jnp.pad(prev, pad, mode="edge"),
                   jnp.pad(nxt, pad, mode="edge"))
    return flow[:, :H, :W]
