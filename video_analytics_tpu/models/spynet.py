"""SpyNet-style learned optical flow (Ranjan & Black 2017; see
PAPERS.md — retrieved as the TPU-friendly direction for flow).

Why this exists alongside the classical solvers: Farneback/TV-L1 are
iterative VPU/elementwise programs, but a *learned* pyramid flow
network is almost pure convolution — it runs on the MXU at bf16 and
needs no data-dependent iteration, making it the natural TPU-first
flow family (the same coarse-to-fine + warp structure, with the
per-level solver replaced by a 5-layer CNN).  Each level k predicts a
residual flow from (I0_k, warp(I1_k, up(flow)), up(flow)); the warp
reuses the Pallas banded-warp kernel on TPU.

This is a model family + training capability (synthetic-motion
supervision below); it is intentionally not the default `flow_algo`
until trained weights exist — the classical solvers carry the parity
story.
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from video_analytics_tpu.ops.kernels import resize_area_like, warp_by_flow


class SpyNetLevel(nn.Module):
    """One pyramid level: 4-channel input (I0, I1w, u, v) → residual
    flow.  7x7 convs, bf16-compute friendly."""

    features: Tuple[int, ...] = (32, 64, 32, 16)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Conv(f, (7, 7), padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(2, (7, 7), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(x)
        return x.astype(jnp.float32)


class SpyNet(nn.Module):
    """Stack of per-level residual predictors (separate weights per
    level, coarse→fine, like the original)."""

    levels: int = 4
    dtype: Any = jnp.float32

    def setup(self):
        self.nets = [SpyNetLevel(dtype=self.dtype, name=f"level{k}")
                     for k in range(self.levels)]

    def _pyramid(self, img: jax.Array) -> List[jax.Array]:
        """(B, H, W) → levels, finest first, /2 each (2x2 mean pool)."""
        pyr = [img]
        for _ in range(self.levels - 1):
            b, h, w = pyr[-1].shape
            pyr.append(resize_area_like(pyr[-1], (h // 2, w // 2)))
        return pyr

    def __call__(self, prev: jax.Array, nxt: jax.Array,
                 train_all_levels: bool = False):
        """(B, H, W) gray in [0,255] → (B, H, W, 2) flow (dx, dy).

        train_all_levels=True also returns the per-level flows for
        deep supervision.
        """
        # Zero-mean, roughly unit-variance inputs (the /255-only scale
        # left ~0.06 std on typical content — too weak a signal).
        p0 = self._pyramid((prev.astype(jnp.float32) / 255.0 - 0.5) * 4.0)
        p1 = self._pyramid((nxt.astype(jnp.float32) / 255.0 - 0.5) * 4.0)
        flow = None
        per_level = []
        for k in range(self.levels - 1, -1, -1):
            I0, I1 = p0[k], p1[k]
            b, h, w = I0.shape
            if flow is None:
                flow = jnp.zeros((b, h, w, 2), jnp.float32)
            else:
                flow = jax.image.resize(flow, (b, h, w, 2),
                                        method="linear",
                                        antialias=False) * 2.0
            I1w = warp_by_flow(I1[..., None], flow)[..., 0]
            inp = jnp.stack([I0, I1w], axis=-1)
            inp = jnp.concatenate([inp, flow], axis=-1)
            flow = flow + self.nets[k](inp)
            per_level.append(flow)
        if train_all_levels:
            return flow, per_level
        return flow


def default_spynet_checkpoint() -> str:
    """Path of the bundled synthetic-trained SpyNet weights.

    Shipped as package data (video_analytics_tpu/checkpoints_data/) so
    pip installs carry it; raises FileNotFoundError with a pointer to
    --spynet-checkpoint if the data file is missing.
    """
    import os
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "checkpoints_data",
        "spynet_synthetic.msgpack")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"bundled SpyNet checkpoint missing at {path}; pass "
            "--spynet-checkpoint (or retrain: models/spynet.py "
            "make_spynet_train_step on synthetic_pair data)")
    return path


def init_spynet(model: SpyNet, key: jax.Array,
                input_hw: Tuple[int, int] = (64, 64)):
    dummy = jnp.zeros((1, *input_hw), jnp.float32)
    return model.init(key, dummy, dummy)


# ---------------------------------------------------------------------------
# Synthetic-motion training (no external data needed)
# ---------------------------------------------------------------------------

def synthetic_pair(key: jax.Array, batch: int, h: int, w: int,
                   local_blobs: int = 0, full_affine: bool = False,
                   hard_objects: int = 0):
    """Random band-limited images + random smooth flows; returns
    (prev, nxt, gt_flow) with nxt ≈ warp of prev.

    local_blobs > 0 adds that many Gaussian-windowed local translations
    on top of the global affine field — the moving-object regime real
    action video lives in (a foreground moving against a differently-
    moving background), which pure affine training misses.

    full_affine=True (r5, VERDICT r4 task 6) replaces the diagonal
    linear term with a full similarity field s·R(θ) − I (rotation ±4°,
    zoom ×[0.95, 1.07]) — the rotation/zoom regime the r4 held-out
    evaluation showed the shipped checkpoint losing to TV-L1 on.

    hard_objects > 0 pastes that many sharp-edged textured squares
    translating with their OWN velocity over the affine background
    (mirrors tools/flow_quality._squares_batch): hard flow
    discontinuities + genuinely occluded/disoccluded pixels, which
    Gaussian-blended blobs cannot produce.
    """
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    base = jax.random.uniform(k1, (batch, h + 16, w + 16), minval=0.0,
                              maxval=255.0)
    from video_analytics_tpu.ops.kernels import gaussian_blur
    # Band-limited texture at ~2 scales (coarse structure survives the
    # pyramid; fine detail anchors subpixel motion), re-stretched to
    # full contrast.
    base = gaussian_blur(base, 1.5) * 0.5 + gaussian_blur(base, 5.0)
    lo = jnp.min(base, axis=(1, 2), keepdims=True)
    hi = jnp.max(base, axis=(1, 2), keepdims=True)
    base = (base - lo) / jnp.maximum(hi - lo, 1e-6) * 255.0
    prev = base[:, 8:8 + h, 8:8 + w]
    # Smooth flow: constant translation + small linear term.
    t = jax.random.uniform(k2, (batch, 1, 1, 2), minval=-3.0, maxval=3.0)
    yy = jax.lax.broadcasted_iota(jnp.float32, (batch, h, w), 1) / h - 0.5
    xx = jax.lax.broadcasted_iota(jnp.float32, (batch, h, w), 2) / w - 0.5
    if full_affine:
        # s·R(θ) − I applied to centred PIXEL coords: true
        # rotation+zoom fields (cross terms the diagonal form lacks).
        kt, ks = jax.random.split(k3)
        theta = jax.random.uniform(kt, (batch, 1, 1),
                                   minval=-0.07, maxval=0.07)
        s = jax.random.uniform(ks, (batch, 1, 1),
                               minval=0.95, maxval=1.07)
        x_px = xx * w
        y_px = yy * h
        c, sn = jnp.cos(theta), jnp.sin(theta)
        gx = (s * c - 1.0) * x_px - s * sn * y_px
        gy = s * sn * x_px + (s * c - 1.0) * y_px
        gt = t + jnp.stack([gx, gy], axis=-1)
    else:
        a = jax.random.uniform(k3, (batch, 1, 1, 2),
                               minval=-1.0, maxval=1.0)
        gt = t + a * jnp.stack([xx, yy], axis=-1)
    if local_blobs:
        kc, ks, ku = jax.random.split(k4, 3)
        cs = jax.random.uniform(kc, (batch, local_blobs, 2),
                                minval=0.15, maxval=0.85)
        sig = jax.random.uniform(ks, (batch, local_blobs, 1, 1),
                                 minval=0.06, maxval=0.2)
        us = jax.random.uniform(ku, (batch, local_blobs, 1, 1, 2),
                                minval=-3.0, maxval=3.0)
        # Normalised pixel coords (batch, h, w).
        px = xx + 0.5
        py = yy + 0.5
        for i in range(local_blobs):
            d2 = ((px - cs[:, i, 0, None, None]) ** 2
                  + (py - cs[:, i, 1, None, None]) ** 2)
            wgt = jnp.exp(-d2 / (2.0 * sig[:, i] ** 2))
            gt = gt + wgt[..., None] * us[:, i]
    # Convention (matches farneback/tvl1): prev(p) ≈ nxt(p + flow(p)),
    # i.e. warp_by_flow(nxt, flow) ≈ prev.  Generating nxt by warping
    # the base with -gt gives exactly flow = gt as the label.
    nxt = warp_by_flow(base[..., None], jnp.pad(
        -gt, [(0, 0), (8, 8), (8, 8), (0, 0)], mode="edge"))[
        :, 8:8 + h, 8:8 + w, 0]
    if hard_objects:
        # Sharp-edged textured squares with their own velocity, pasted
        # EXPLICITLY into both frames (the smooth-warp construction
        # above cannot represent a flow discontinuity): object at c in
        # prev shows tex(p), at c+u in nxt shows tex(p−u), so
        # nxt(p + u) = prev(p) inside the square and the strips the
        # square covers/uncovers are genuinely occluded/disoccluded.
        kc, khs, ku, ktex = jax.random.split(k5, 4)
        tex = gaussian_blur(jax.random.uniform(
            ktex, (batch, h, w), minval=0.0, maxval=255.0), 2.0)
        tex = tex * 0.5 + 110.0
        px = (xx + 0.5) * w
        py = (yy + 0.5) * h
        cs = jax.random.uniform(kc, (batch, hard_objects, 2),
                                minval=0.2, maxval=0.8) \
            * jnp.asarray([w, h], jnp.float32)
        half = jax.random.uniform(khs, (batch, hard_objects, 1, 1),
                                  minval=0.05, maxval=0.12) * min(h, w)
        uo = jax.random.uniform(ku, (batch, hard_objects, 2),
                                minval=-4.0, maxval=4.0)
        for i in range(hard_objects):
            cx = cs[:, i, 0, None, None]
            cy = cs[:, i, 1, None, None]
            ux = uo[:, i, 0, None, None]
            uy = uo[:, i, 1, None, None]
            hf = half[:, i]
            inside_prev = (jnp.abs(px - cx) < hf) \
                & (jnp.abs(py - cy) < hf)
            inside_next = (jnp.abs(px - (cx + ux)) < hf) \
                & (jnp.abs(py - (cy + uy)) < hf)
            shift = jnp.broadcast_to(-uo[:, i, None, None, :],
                                     (batch, h, w, 2))
            tex_shift = warp_by_flow(tex[..., None], shift)[..., 0]
            prev = jnp.where(inside_prev, tex, prev)
            nxt = jnp.where(inside_next, tex_shift, nxt)
            gt = jnp.where(inside_prev[..., None],
                           uo[:, i, None, None, :], gt)
    return prev, nxt, gt


def make_spynet_train_step(model: SpyNet, tx, batch: int = 8,
                           hw: Tuple[int, int] = (64, 64),
                           local_blobs: int = 0,
                           full_affine: bool = False,
                           hard_objects: int = 0):
    """EPE loss with deep supervision over levels."""
    import optax

    def loss_fn(params, prev, nxt, gt):
        flow, per_level = model.apply({"params": params}, prev, nxt,
                                      train_all_levels=True)
        loss = 0.0
        for f in per_level:
            b, h, w, _ = f.shape
            scale = h / gt.shape[1]
            gt_k = jax.image.resize(gt, (b, h, w, 2), method="linear",
                                    antialias=False) * scale
            loss = loss + jnp.mean(
                jnp.sqrt(jnp.sum((f - gt_k) ** 2, -1) + 1e-6))
        epe = jnp.mean(jnp.sqrt(jnp.sum((flow - gt) ** 2, -1) + 1e-8))
        return loss, epe

    @jax.jit
    def step(params, opt_state, key):
        prev, nxt, gt = synthetic_pair(key, batch, *hw,
                                       local_blobs=local_blobs,
                                       full_affine=full_affine,
                                       hard_objects=hard_objects)
        (loss, epe), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, prev, nxt, gt)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, epe

    return step
