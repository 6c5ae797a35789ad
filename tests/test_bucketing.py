"""Shape-bucketing tests (SURVEY.md §7 hard-part #3, VERDICT r1 #7):
nearby input resolutions must share ONE compiled flow executable, and
bucketed flow must match unbucketed flow away from the border."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.fixtures import smooth_pair
from video_analytics_tpu.config import FarnebackConfig
from video_analytics_tpu.flow.farneback import farneback
from video_analytics_tpu.ops.bucketing import (
    BUCKET_MULTIPLE, bucket_hw, bucketed_flow)

CFG = FarnebackConfig(levels=1, iterations=2)


def test_bucket_hw():
    assert bucket_hw(100, 130) == (128, 192)
    assert bucket_hw(90, 126) == (128, 128)
    assert bucket_hw(128, 192) == (128, 192)
    assert bucket_hw(129, 192) == (192, 192)


def test_two_nearby_sizes_compile_one_program(rng):
    base = jax.jit(lambda a, b: farneback(a, b, CFG))
    for h, w in [(100, 130), (90, 140), (97, 129)]:
        f1, f2 = smooth_pair(rng, h, w, dx=1.0, dy=0.5)
        out = bucketed_flow(base, jnp.asarray(f1[None]),
                            jnp.asarray(f2[None]))
        assert out.shape == (1, h, w, 2)
    assert base._cache_size() == 1    # one bucket → one executable


def test_bucketed_flow_matches_interior(rng):
    h, w = 100, 130
    f1, f2 = smooth_pair(rng, h, w, dx=1.8, dy=-0.7)
    prev = jnp.asarray(f1[None])
    nxt = jnp.asarray(f2[None])
    native = np.asarray(farneback(prev, nxt, CFG))[0]
    bucketed = np.asarray(bucketed_flow(
        lambda a, b: farneback(a, b, CFG), prev, nxt))[0]
    assert bucketed.shape == native.shape
    # Replicate padding only perturbs a border band; the interior of
    # the cropped result matches the native computation tightly.
    diff = np.linalg.norm(bucketed - native, axis=-1)
    assert diff[16:-16, 16:-16].max() < 0.02, diff[16:-16, 16:-16].max()
    # And still recovers the true motion.
    inner = bucketed[16:-16, 16:-16].reshape(-1, 2).mean(0)
    np.testing.assert_allclose(inner, [1.8, -0.7], atol=0.2)
