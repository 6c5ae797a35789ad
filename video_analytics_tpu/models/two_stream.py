"""Two-stream action recognition: RGB stream + flow stream, temporal
pooling, late fusion (Simonyan & Zisserman 2014 — the architecture the
reference pipeline implements; SURVEY.md §2b #10-11).

Everything here is pure-functional over flax variables so the whole
classifier traces into one XLA program together with preprocessing and
flow (runtime/pipeline.py); temporal pooling is an associative mean so
long clips can be reduced as streamed partial sums (SURVEY.md §5,
sliding-window design).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from video_analytics_tpu.models.resnet import (
    ResNet, resnet18, flow_stream_resnet18)


@dataclasses.dataclass(frozen=True)
class TwoStreamModel:
    """Bundle of the two stream networks + fusion weights.

    Frozen → hashable → usable as a jit static argument.  The model
    objects are static config (flax modules); variables are passed
    explicitly to keep everything jit-friendly.
    """

    spatial: ResNet
    temporal: ResNet
    fusion_weights: Tuple[float, float] = (1.0, 1.5)

    @classmethod
    def create(cls, num_classes: int = 101, flow_stack: int = 10,
               fusion_weights: Tuple[float, float] = (1.0, 1.5),
               dtype: Any = jnp.float32,
               width: int = 64,
               arch: str = "resnet18") -> "TwoStreamModel":
        from video_analytics_tpu.models.resnet import resnet34, resnet50
        builders = {"resnet18": resnet18, "resnet34": resnet34,
                    "resnet50": resnet50}
        if arch not in builders:
            raise ValueError(f"unknown arch {arch!r}; "
                             f"choose from {sorted(builders)}")
        build = builders[arch]
        return cls(
            spatial=build(num_classes=num_classes, dtype=dtype,
                          width=width),
            temporal=build(num_classes=num_classes, dtype=dtype,
                           width=width, in_channels=2 * flow_stack),
            fusion_weights=fusion_weights,
        )

    def folded(self) -> "TwoStreamModel":
        """Inference-only form with every BatchNorm folded into its
        preceding conv (models/convert.fold_batchnorm pairs it with
        fold_variables below) — the per-activation normalize pass
        disappears from the compiled eval/serve/bench programs."""
        return dataclasses.replace(
            self,
            spatial=self.spatial.clone(fold_bn=True),
            temporal=self.temporal.clone(fold_bn=True))

    @staticmethod
    def fold_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
        """Fold both streams' variables for a folded() model; extra
        entries (e.g. the SpyNet 'flow' params) pass through."""
        from video_analytics_tpu.models.convert import fold_batchnorm
        return {k: (fold_batchnorm(v) if k in ("spatial", "temporal")
                    else v)
                for k, v in variables.items()}

    def init_variables(self, key: jax.Array,
                       input_hw: Tuple[int, int] = (224, 224)
                       ) -> Dict[str, Any]:
        ks, kt = jax.random.split(key)
        dummy_rgb = jnp.zeros((1, *input_hw, self.spatial.in_channels))
        dummy_flow = jnp.zeros((1, *input_hw, self.temporal.in_channels))
        return {
            "spatial": self.spatial.init(ks, dummy_rgb),
            "temporal": self.temporal.init(kt, dummy_flow),
        }

    # -- per-stream heads ---------------------------------------------------

    def spatial_logits(self, variables, frames: jax.Array,
                       train: bool = False) -> jax.Array:
        """(T, H, W, 3) preprocessed frames → clip logits (C,) via
        temporal mean pooling of per-frame logits."""
        logits = self.spatial.apply(variables["spatial"], frames,
                                    train=train)
        return jnp.mean(logits, axis=0)

    def temporal_logits(self, variables, flow_stacks: jax.Array,
                        train: bool = False) -> jax.Array:
        """(N, H, W, 2L) stacked flow windows → clip logits (C,)."""
        logits = self.temporal.apply(variables["temporal"], flow_stacks,
                                     train=train)
        return jnp.mean(logits, axis=0)

    # -- fusion -------------------------------------------------------------

    def fuse(self, spatial_logits: jax.Array,
             temporal_logits: jax.Array) -> jax.Array:
        """Late fusion: weighted average of per-stream softmax scores."""
        ws, wt = self.fusion_weights
        probs = (ws * jax.nn.softmax(spatial_logits, axis=-1)
                 + wt * jax.nn.softmax(temporal_logits, axis=-1))
        return probs / (ws + wt)

    def classify(self, variables, frames: jax.Array,
                 flow_stacks: jax.Array) -> jax.Array:
        """Fused class probabilities for one clip."""
        return self.fuse(self.spatial_logits(variables, frames),
                         self.temporal_logits(variables, flow_stacks))


def top1(probs: jax.Array) -> jax.Array:
    return jnp.argmax(probs, axis=-1)
