"""Two-stream training: spatial / flow-stream / joint fine-tuning.

SURVEY.md §3.5: accuracy parity requires fine-tuning, and the temporal
(flow) stream is the half that carries most of the accuracy in the
two-stream architecture.  This module provides the full learn path:

- ``build_examples``: ONE jitted XLA program that turns a batch of raw
  uint8 frame windows into training inputs for either or both streams —
  resize → shared random crop+flip (temporally coherent within a
  window) → {normalized RGB middle frame, dense flow computed on-device
  over the cropped window → stacked 2L-channel input}.  Flow never
  leaves HBM between the solver and the CNN, the same fusion as the
  inference pipeline (runtime/pipeline.py).
- per-stream train steps reusing runtime/train.py's generic ResNet step
  (gradient psum over the mesh 'data' axis is inserted by XLA from the
  input shardings).
- ``two_stream_variables``: assemble an eval-ready
  ``{"spatial": ..., "temporal": ...}`` checkpoint from the train
  states, loadable directly by classify-clip / eval-ucf101.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from video_analytics_tpu.config import PipelineConfig
from video_analytics_tpu.models.two_stream import TwoStreamModel
from video_analytics_tpu.ops import preprocess as pp
from video_analytics_tpu.runtime.train import (
    TrainState, create_train_state, make_train_step)

STREAMS = ("rgb", "flow", "both")


def train_window_len(cfg: PipelineConfig) -> int:
    """Frames per training window: enough for one flow stack."""
    return cfg.preprocess.flow_stack + 1


@functools.partial(jax.jit, static_argnames=("cfg", "stream"))
def build_examples(windows: jax.Array, key: jax.Array,
                   cfg: PipelineConfig, stream: str,
                   flow_variables=None) -> Dict[str, jax.Array]:
    """(B, T, H, W, 3) uint8 frame windows → per-stream training inputs.

    Returns {"rgb": (B, c, c, 3)} and/or {"flow": (B, c, c, 2L)} with
    c = cfg.preprocess.crop and L = cfg.preprocess.flow_stack (requires
    T >= L + 1).  The random crop/flip is shared across a window's
    frames so the flow sees a temporally coherent crop.
    flow_variables carries (frozen) SpyNet params when
    cfg.flow_algo == "spynet" — the flow STREAM trains on learned flow
    while the flow NET itself stays fixed.
    """
    B, T = windows.shape[:2]
    L = cfg.preprocess.flow_stack
    x = pp.resize_short_side(windows, cfg.preprocess.resize_short)
    keys = jax.random.split(key, B)
    # Horizontal flip only when the config asks for it: flipping frames
    # negates the flow's u channel, which is a VALID augmentation only
    # for flip-invariant label sets (UCF101 actions) and silently
    # poisons direction-sensitive labels — r2 bug fix: was flip=True
    # unconditionally, a 50% label-noise ceiling on any left/right
    # distinction trained through this path.
    x = jax.vmap(
        lambda w, k: pp.random_crop_flip(
            w, cfg.preprocess.crop, k,
            flip=cfg.preprocess.random_flip))(x, keys)
    out: Dict[str, jax.Array] = {}
    if stream in ("rgb", "both"):
        out["rgb"] = pp.normalize(x[:, T // 2], cfg.preprocess.mean,
                                  cfg.preprocess.std)
    if stream in ("flow", "both"):
        if T < L + 1:
            raise ValueError(f"need window >= {L + 1} frames, got {T}")
        from video_analytics_tpu.runtime.pipeline import compute_flow
        gray = pp.rgb_to_gray(x)                      # (B, T, c, c)
        c = gray.shape[-1]
        prev = gray[:, :L].reshape(B * L, *gray.shape[2:])
        nxt = gray[:, 1:L + 1].reshape(B * L, *gray.shape[2:])
        flow = compute_flow(prev, nxt, cfg,           # (B*L, c, c, 2)
                            flow_variables=flow_variables)
        flow = flow.reshape(B, L, c, c, 2)
        # (B, c, c, L, 2) → channels ordered [u0,v0,u1,v1,...], matching
        # ops.preprocess.stack_flow_windows.
        stacks = flow.transpose(0, 2, 3, 1, 4).reshape(B, c, c, 2 * L)
        out["flow"] = pp.normalize_flow_stack(stacks,
                                              cfg.preprocess.flow_bound)
    return out


def create_two_stream_states(model: TwoStreamModel, variables,
                             tx: optax.GradientTransformation,
                             stream: str) -> Dict[str, TrainState]:
    """One TrainState per trained stream (keys: 'rgb', 'flow')."""
    states: Dict[str, TrainState] = {}
    if stream in ("rgb", "both"):
        states["rgb"] = create_train_state(model.spatial,
                                           variables["spatial"], tx)
    if stream in ("flow", "both"):
        states["flow"] = create_train_state(model.temporal,
                                            variables["temporal"], tx)
    return states


def make_two_stream_train_steps(model: TwoStreamModel,
                                tx: optax.GradientTransformation,
                                stream: str):
    """Per-stream jitted train steps {name: step(state, x, y)}."""
    steps = {}
    if stream in ("rgb", "both"):
        steps["rgb"] = make_train_step(model.spatial, tx)
    if stream in ("flow", "both"):
        steps["flow"] = make_train_step(model.temporal, tx)
    return steps


def two_stream_variables(base_variables,
                         states: Dict[str, TrainState]):
    """Fold trained states back into the full two-stream variables dict
    (streams that weren't trained keep their initial/loaded values)."""
    out = dict(base_variables)
    if "rgb" in states:
        out["spatial"] = {"params": states["rgb"].params,
                          "batch_stats": states["rgb"].batch_stats}
    if "flow" in states:
        out["temporal"] = {"params": states["flow"].params,
                           "batch_stats": states["flow"].batch_stats}
    return out
