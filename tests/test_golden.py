"""Determinism / golden tests (SURVEY.md §4.5): fixed-seed pipelines
hashed against stored goldens to catch silent numeric drift across
jax/library upgrades.  Goldens were produced by this code on CPU
(jax 0.9.0, 2026-08-16); a legitimate numerics change requires
regenerating them (run this file with REGEN=1)."""

import hashlib
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens.json")


def _digest(arr: np.ndarray, decimals: int = 3) -> str:
    """Hash of values rounded to `decimals` — tolerant of sub-1e-3
    noise, sensitive to real drift."""
    q = np.round(np.asarray(arr, np.float64), decimals) + 0.0  # kill -0.0
    return hashlib.sha256(q.tobytes()).hexdigest()[:16]


def _compute_goldens():
    from tests.fixtures import smooth_pair, moving_square_frames
    from video_analytics_tpu.config import (
        FarnebackConfig, PreprocessConfig, TVL1Config)
    from video_analytics_tpu.flow import farneback, tvl1
    from video_analytics_tpu import ops
    from video_analytics_tpu.models.resnet import resnet18, init_resnet

    out = {}
    rng = np.random.default_rng(1234)
    f1, f2 = smooth_pair(rng, 64, 80, dx=1.5, dy=-0.5)
    fb = farneback(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                   FarnebackConfig(levels=1, iterations=2))
    out["farneback"] = _digest(fb)
    tv = tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
              TVL1Config(nscales=2, warps=2, outer_iterations=2,
                         inner_iterations=5))
    out["tvl1"] = _digest(tv)

    frames = np.stack(moving_square_frames(num=3, h=240, w=320))
    pre = ops.preprocess_clip_jit(jnp.asarray(frames), PreprocessConfig())
    out["preprocess"] = _digest(pre)

    model = resnet18(num_classes=11)
    variables = init_resnet(model, jax.random.PRNGKey(7), input_hw=(64, 64))
    x = jnp.asarray(np.linspace(-1, 1, 2 * 64 * 64 * 3, dtype=np.float32)
                    .reshape(2, 64, 64, 3))
    logits = model.apply(variables, x)
    out["resnet18_init7"] = _digest(logits, decimals=2)
    return out


def test_goldens():
    computed = _compute_goldens()
    if os.environ.get("REGEN") == "1" or not os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH, "w") as f:
            json.dump(computed, f, indent=1)
    with open(GOLDEN_PATH) as f:
        stored = json.load(f)
    assert computed == stored, (
        f"numeric drift detected:\n stored={stored}\n computed={computed}\n"
        "If intentional, regenerate with REGEN=1 pytest tests/test_golden.py")
