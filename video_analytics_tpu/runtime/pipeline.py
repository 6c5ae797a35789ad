"""Fused end-to-end jit pipelines.

Where the reference moves data between script stages through the
filesystem (frames dir → flow dir → feature files → predictions), here
each stage is a jit-compiled XLA program and the full classifier is ONE
program: decoded frames go host→HBM once, and preprocessing, optical
flow, both CNN streams, temporal pooling and fusion all run on-device
with flow staying resident in HBM between the flow solver and the
flow-stream CNN (the key fusion win, SURVEY.md §3.2)."""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_analytics_tpu.config import (
    FarnebackConfig, PipelineConfig, PreprocessConfig, TVL1Config)
from video_analytics_tpu.flow.farneback import farneback
from video_analytics_tpu.flow.tvl1 import tvl1
from video_analytics_tpu.models.two_stream import TwoStreamModel
from video_analytics_tpu.ops import preprocess as pp


def _spynet_flow(prev: jax.Array, nxt: jax.Array,
                 flow_variables) -> jax.Array:
    """Learned flow inside the fused pipelines: SpyNet (models/spynet —
    MXU-resident convs, the TPU-first flow family) applied with the
    params the caller carries as variables["flow"] (loaded from the
    bundled or a user checkpoint; never part of the two-stream
    msgpack)."""
    if flow_variables is None:
        raise ValueError(
            'flow_algo="spynet" needs SpyNet params: attach them as '
            'variables["flow"] (CLI: --algo spynet loads '
            "--spynet-checkpoint or the bundled weights)")
    from video_analytics_tpu.models.spynet import SpyNet
    return SpyNet(levels=4).apply(flow_variables, prev, nxt)


def compute_flow(gray_pairs_prev: jax.Array, gray_pairs_next: jax.Array,
                 cfg: PipelineConfig, flow_variables=None) -> jax.Array:
    """(B, H, W) gray pairs → (B, H, W, 2) flow with the configured
    algorithm."""
    use_pallas = False if cfg.exact_warp else None
    if cfg.flow_algo == "spynet":
        return _spynet_flow(gray_pairs_prev, gray_pairs_next,
                            flow_variables)
    if cfg.flow_algo == "tvl1":
        return tvl1(gray_pairs_prev, gray_pairs_next, cfg.tvl1,
                    use_pallas=use_pallas)
    return farneback(gray_pairs_prev, gray_pairs_next, cfg.farneback,
                     use_pallas=use_pallas)


def compute_flow_sequence(gray: jax.Array, cfg: PipelineConfig,
                          bounded: bool = False,
                          flow_variables=None) -> jax.Array:
    """(T, H, W) gray sequence → (T-1, H, W, 2) consecutive-pair flow.

    Same result as ``compute_flow(gray[:-1], gray[1:], cfg)``; for
    Farneback the per-frame pyramid prep and polynomial expansions are
    shared across the pairs (flow/farneback.farneback_sequence) instead
    of being recomputed for each side of each pair.

    bounded=True tells the Farneback warp kernels the caller clips the
    result to ±flow_bound px (normalize_flow_stack does, immediately
    after) so they can sweep a flow_bound+4 displacement envelope
    instead of the full 32 px — ~20% less sweep work.  This is an
    APPROXIMATION, not an identity: the reduced band is exact for
    displacements within the envelope, but pixels moving faster than
    it clamp differently, and the winsize window-average can bleed
    those differences a few pixels into sub-envelope neighbours before
    the final clip (A/B-gated on >envelope motion in
    tests/test_pipeline.py::test_bounded_envelope_feature_ab).  The
    compute-flow CLI surface keeps bounded=False."""
    use_pallas = False if cfg.exact_warp else None
    if cfg.flow_algo == "spynet":
        return _spynet_flow(gray[:-1], gray[1:], flow_variables)
    if cfg.flow_algo == "tvl1":
        return tvl1(gray[:-1], gray[1:], cfg.tvl1, use_pallas=use_pallas)
    from video_analytics_tpu.flow.farneback import farneback_sequence
    envelope = (int(np.ceil(cfg.preprocess.flow_bound)) + 4
                if bounded else None)
    return farneback_sequence(gray, cfg.farneback, envelope=envelope,
                              use_pallas=use_pallas)


@functools.partial(jax.jit, static_argnames=("cfg",))
def flow_from_frames(frames: jax.Array, cfg: PipelineConfig) -> jax.Array:
    """(T, H, W, 3) uint8 RGB → (T-1, H, W, 2) dense flow at input
    resolution (the compute-flow CLI surface)."""
    gray = pp.rgb_to_gray(frames)
    return compute_flow_sequence(gray, cfg)


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def rgb_features(frames: jax.Array, variables,
                 model, cfg: PreprocessConfig) -> jax.Array:
    """(T, H, W, 3) uint8 → (T, 512) ResNet-18 penultimate features,
    preprocess fused with the CNN stem."""
    x = pp.preprocess_clip(frames, cfg)
    return model.apply(variables, x, return_features=True)


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def flow_features(frames: jax.Array, variables,
                  model, cfg: PipelineConfig,
                  flow_variables=None) -> jax.Array:
    """(T, H, W, 3) uint8 → (N, 512) flow-stream features: gray →
    crop → flow → stack → CNN, all one program, flow HBM-resident."""
    x = pp.resize_short_center_crop(frames, cfg.preprocess.resize_short,
                                    cfg.preprocess.crop,
                                    src_hw=cfg.preprocess.src_hw)
    gray = pp.rgb_to_gray(x)
    flow = compute_flow_sequence(gray, cfg, bounded=True,
                                 flow_variables=flow_variables)
    stacks = pp.stacked_flow_input(flow, cfg.preprocess.flow_stack,
                                   cfg.preprocess.flow_bound,
                                   dtype=getattr(model, "dtype", None))
    return model.apply(variables, stacks, return_features=True)


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def classify_window(frames: jax.Array, variables: Dict[str, Any],
                    model: TwoStreamModel,
                    cfg: PipelineConfig) -> jax.Array:
    """One clip window (T, H, W, 3) uint8 → fused class probs (C,).

    The complete two-stream classifier as a single XLA program.  With
    flow_algo="spynet" the (frozen) SpyNet params ride along as
    variables["flow"] — learned flow feeding the temporal stream, all
    still one program.
    """
    rgb = pp.preprocess_clip(frames, cfg.preprocess)
    s_logits = model.spatial_logits(variables, rgb)

    x = pp.resize_short_center_crop(frames, cfg.preprocess.resize_short,
                                    cfg.preprocess.crop,
                                    src_hw=cfg.preprocess.src_hw)
    gray = pp.rgb_to_gray(x)
    flow = compute_flow_sequence(gray, cfg, bounded=True,
                                 flow_variables=variables.get("flow"))
    stacks = pp.stacked_flow_input(
        flow, cfg.preprocess.flow_stack, cfg.preprocess.flow_bound,
        dtype=getattr(model.temporal, "dtype", None))
    t_logits = model.temporal_logits(variables, stacks)

    return model.fuse(s_logits, t_logits)


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def classify_batch(windows: jax.Array, variables: Dict[str, Any],
                   model: TwoStreamModel,
                   cfg: PipelineConfig) -> jax.Array:
    """(B, T, H, W, 3) uint8 windows → (B, C) fused probs.  vmap over
    the batch; shard the leading axis over the mesh 'data' axis to
    scale (parallel/mesh.py)."""
    return jax.vmap(
        lambda w: classify_window(frames=w, variables=variables,
                                  model=model, cfg=cfg)
    )(windows)


def sample_window(num_frames: int, window: int,
                  rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Host-side frame-index sampling: one evenly-spaced (eval) or
    random (train) window of `window` indices, clamped for short clips."""
    if num_frames >= window:
        if rng is None:
            start = (num_frames - window) // 2
        else:
            start = int(rng.integers(0, num_frames - window + 1))
        return np.arange(start, start + window)
    # Short clip: repeat last frame.
    idx = np.arange(window)
    return np.clip(idx, 0, num_frames - 1)
