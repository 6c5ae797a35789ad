"""Pallas TPU kernels for Farneback's remaining hot stages.

After the warp kernel, profiling shows the polynomial expansion and the
window-average+solve stage dominating: both are separable correlations
that XLA evaluates as HBM-streaming shift-adds (each tap re-reads the
array), far off speed-of-light.  Both reduce to ONE generic kernel:

``_sep_corr_kernel`` — a banded weighted sum along the sublane axis:
the input channels are written once into a replicate-padded VMEM
scratch, and each output channel is a statically-unrolled tap
accumulation over static slices of that scratch (two live arrays, no
masks, no dynamic slicing).  A 2D separable correlation is two calls
with an XLA transpose between — the same decomposition as the warp
kernel, chosen for Mosaic-compile speed and bounded VMEM liveness
(a first fused attempt kept ~150 masked temporaries live and OOM'd
scoped VMEM at 224²).

- ``poly_expansion_pallas`` (SURVEY.md §2b #2): vertical pass computes
  the (g, xg, xxg) basis correlations; horizontal pass the six basis
  products; the inverse-Gramian combine is XLA elementwise (it fuses).
- ``update_flow_pallas`` (#3): winsize box/Gaussian window average of
  the five normal-equation planes per axis; the 2x2 solve is XLA
  elementwise.

Replicate borders throughout (matching ops.kernels.sepcorr, which the
cv2-parity suite gates); both paths are compared against the XLA
reference in tests/test_pallas_farneback.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from video_analytics_tpu.config import FarnebackConfig
from video_analytics_tpu.ops.kernels import gaussian_kernel_1d
from video_analytics_tpu.utils.platform import pallas_interpret

# A "plan" is a tuple of (input_channel, taps) per output channel.
Plan = Tuple[Tuple[int, Tuple[float, ...]], ...]


def _sep_corr_kernel(x_ref, out_ref, pad_ref, *, plan: Plan, r: int):
    """x (Cin, N, M) → out (Cout, N, M): out[o] = corr(x[cin_o],
    taps_o) along the sublane axis, replicate border.

    Uniform taps (the winsize box window — Farneback's default and the
    per-iteration hot loop) take a binary-doubling window-sum path:
    partial sums of length 2^j are built once per input channel and the
    k-window decomposes into ≤log2(k)+popcount(k) adds plus ONE scalar
    multiply, vs k multiply-adds tap-by-tap (k=15 → 7 ops vs 15).  The
    summation tree is a reordering of the same f32 adds; the cv2-parity
    suite (bit-level flow gates) runs against it."""
    Cin, N, M = x_ref.shape
    x = x_ref[:]
    pad_ref[:, r:r + N, :] = x
    if r:       # r == 0 (all-1-tap plan): no border, and Pallas
                # rejects the empty border-write slices outright
        pad_ref[:, :r, :] = jnp.broadcast_to(x[:, :1, :], (Cin, r, M))
        pad_ref[:, r + N:, :] = jnp.broadcast_to(x[:, N - 1:, :],
                                                 (Cin, r, M))
    sums_cache = {}

    def window_sums(cin: int, k: int):
        """Doubled partial sums over pad[cin]: arrs[p][i] =
        sum(pad[cin, i:i+p]); built lazily, shared across outputs.
        Grows an existing cache entry when a later output needs a
        larger window (the binary decomposition below uses each power
        at most once, so it needs powers up to the largest one ≤ k)."""
        L = N + 2 * r
        arrs = sums_cache.setdefault(cin, {1: pad_ref[cin, :, :]})
        p = max(arrs)
        while p * 2 <= k:
            prev = arrs[p]
            lp = L - (p - 1)
            arrs[p * 2] = prev[:lp - p] + prev[p:lp]
            p *= 2
        return arrs

    for o, (cin, taps) in enumerate(plan):
        k = len(taps)
        if k >= 8 and all(t == taps[0] for t in taps):
            arrs = window_sums(cin, k)
            acc = None
            off, rem = 0, k
            p = max(arrs)
            while p >= 1:
                if rem >= p:
                    seg = arrs[p][off:off + N]
                    acc = seg if acc is None else acc + seg
                    off += p
                    rem -= p
                p //= 2
            out_ref[o] = float(taps[0]) * acc
            continue
        acc = None
        for i, w in enumerate(taps):
            sl = pad_ref[cin, i:i + N, :]
            term = float(w) * sl
            acc = term if acc is None else acc + term
        out_ref[o] = acc


def _sep_corr_axis(x: jax.Array, plan: Plan) -> jax.Array:
    """(B, Cin, N, M) → (B, Cout, N, M), correlation along axis 2."""
    B, Cin, N, M = x.shape
    r = max(len(t) for _, t in plan) // 2
    cout = len(plan)
    return pl.pallas_call(
        functools.partial(_sep_corr_kernel, plan=plan, r=r),
        grid=(B,),
        in_specs=[pl.BlockSpec((None, Cin, N, M), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, cout, N, M),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, cout, N, M), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((Cin, N + 2 * r, M), jnp.float32)],
        interpret=pallas_interpret(),
    )(x.astype(jnp.float32))


def _sep_corr_axis_any(x: jax.Array, plan: Plan) -> jax.Array:
    """_sep_corr_axis with automatic row-banding + halo for large
    shapes (same scheme as ops/pallas/warp.py: halo'd blocks, kernel
    unchanged, halo rows discarded)."""
    B, Cin, N, M = x.shape
    r = max(len(t) for _, t in plan) // 2
    cout = len(plan)
    # Empirical Mosaic cost model (see ops/pallas/warp._band_size).
    # The binary-doubling (uniform-tap/box) kernel path keeps its
    # partial-sum cache live across the WHOLE output loop (sums_cache
    # persists per input channel), so the allowance must scale with the
    # plan: ~floor(log2(k)) partial-sum planes per distinct uniform-tap
    # input channel (k=15 → 3 planes; update_flow's 5-channel box plan
    # → 15 planes, not a flat 4 — ADVICE r3, low).  +2 covers the
    # non-uniform path's acc/slice liveness.
    uni_k = {}
    for cin, taps in plan:
        k = len(taps)
        if k >= 8 and all(t == taps[0] for t in taps):
            uni_k[cin] = max(uni_k.get(cin, 0), k)
    cache_planes = sum(k.bit_length() - 1 for k in uni_k.values())
    budget = 14 * 1024 * 1024 // 4
    mp = -(-M // 128) * 128
    band = budget // ((3 * (Cin + cout) + 2 + cache_planes) * mp) \
        - (2 * r + 8)
    band = max(8, (band // 8) * 8)
    if N <= band:
        return _sep_corr_axis(x, plan)
    h = r
    outs = []
    for s in range(0, N, band):
        e = min(s + band, N)
        s0, e0 = max(s - h, 0), min(e + h, N)
        pad_top, pad_bot = h - (s - s0), h - (e0 - e)
        blk = x[:, :, s0:e0, :]
        if pad_top or pad_bot:
            blk = jnp.pad(blk, [(0, 0), (0, 0), (pad_top, pad_bot),
                                (0, 0)], mode="edge")
        out_b = _sep_corr_axis(blk, plan)
        outs.append(out_b[:, :, h:h + (e - s), :])
    return jnp.concatenate(outs, axis=2)


def sep_corr2d_pallas(x: jax.Array, v_plan: Plan,
                      h_plan: Plan) -> jax.Array:
    """(B, Cin, H, W): vertical pass with v_plan, then horizontal pass
    (via transpose) with h_plan → (B, Cout, H, W)."""
    v = _sep_corr_axis_any(x, v_plan)                   # (B, Cv, H, W)
    vT = v.transpose(0, 1, 3, 2)                        # (B, Cv, W, H)
    hT = _sep_corr_axis_any(vT, h_plan)                 # (B, Co, W, H)
    return hT.transpose(0, 1, 3, 2)


# ---------------------------------------------------------------------------
# Polynomial expansion
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n", "sigma", "cf"))
def poly_expansion_pallas(img: jax.Array, n: int, sigma: float,
                          cf: bool = False) -> jax.Array:
    """(B, H, W) → (B, H, W, 5) poly coefficients; two VMEM passes.
    Matches flow.farneback.poly_expansion numerically.  With cf=True
    returns channels-first (B, 5, H, W) — the kernel's native layout,
    so the fused CF iteration chain skips the NHWC restack."""
    from video_analytics_tpu.flow.farneback import _poly_exp_setup
    g, xg, xxg, ig11, ig03, ig33, ig55 = _poly_exp_setup(n, sigma)
    g, xg, xxg = tuple(map(float, g)), tuple(map(float, xg)), \
        tuple(map(float, xxg))
    # Vertical: (vg, vx, vxx); horizontal combos:
    # s1=vg·g sx=vg·xg sxx=vg·xxg sy=vx·g sxy=vx·xg syy=vxx·g
    v_plan = ((0, g), (0, xg), (0, xxg))
    h_plan = ((0, g), (0, xg), (0, xxg), (1, g), (1, xg), (2, g))
    s = sep_corr2d_pallas(img[:, None], v_plan, h_plan)
    s1, sx, sxx, sy, sxy, syy = (s[:, i] for i in range(6))
    bx = sx * ig11
    by = sy * ig11
    cxx = s1 * ig03 + sxx * ig33
    cyy = s1 * ig03 + syy * ig33
    cxy = sxy * ig55
    return jnp.stack([bx, by, cxx, cyy, cxy], axis=1 if cf else -1)


# ---------------------------------------------------------------------------
# Window average + 2x2 solve
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("cfg", "cf"))
def update_flow_pallas(M: jax.Array, cfg: FarnebackConfig,
                       cf: bool = False) -> jax.Array:
    """(B, H, W, 5) normal-equation planes → (B, H, W, 2) flow: window
    average in VMEM per axis, 2x2 solve fused by XLA.  Matches
    _solve_flow(_blur_M(M)) numerically.  With cf=True both sides are
    channels-first ((B, 5, H, W) → (B, 2, H, W)) and the layout
    round trips drop out of the iteration chain."""
    if cfg.gaussian_window:
        m = cfg.winsize // 2
        taps = tuple(float(t) for t in gaussian_kernel_1d(m * 0.3, n=m))
    else:
        taps = tuple([1.0 / cfg.winsize] * cfg.winsize)
    Mcf = M.astype(jnp.float32)
    if not cf:
        Mcf = Mcf.transpose(0, 3, 1, 2)                 # (B, 5, H, W)
    plan = tuple((c, taps) for c in range(5))
    blurred = sep_corr2d_pallas(Mcf, plan, plan)
    g11, g12, g22, h1, h2 = (blurred[:, i] for i in range(5))
    # cv2's regularised inverse (see flow.farneback._solve_flow).
    idet = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
    fx = (g22 * h1 - g12 * h2) * idet
    fy = (g11 * h2 - g12 * h1) * idet
    return jnp.stack([fx, fy], axis=1 if cf else -1)


def farneback_stage_fits_vmem(h: int, w: int) -> bool:
    """Always true since row-banding landed — false only for absurd
    widths where a single 64-row banded block exceeds VMEM."""
    m = max(h, w)
    return 20 * m * 40 * 4 < 13 * 1024 * 1024
