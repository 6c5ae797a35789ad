"""TV-L1 tests: agreement with the independent numpy oracle, known
ground-truth motion recovery, and median filter parity vs cv2
(BASELINE.json config #3)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from tests.fixtures import smooth_pair
from tests.np_tvl1 import tvl1_np
from video_analytics_tpu.config import TVL1Config
from video_analytics_tpu.flow import tvl1, tvl1_jit
from video_analytics_tpu.ops.median import median_filter2d


# Small config keeps the CPU oracle fast; same spec as the defaults.
FAST = TVL1Config(nscales=3, warps=2, outer_iterations=4,
                  inner_iterations=10, median_filtering=5)


def test_matches_numpy_oracle(rng):
    f1, f2 = smooth_pair(rng, 64, 80, dx=1.4, dy=-0.8)
    ref = tvl1_np(f1, f2, FAST)
    ours = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                           FAST))[0]
    epe = np.linalg.norm(ours - ref, axis=-1)
    assert epe.mean() < 5e-3, epe.mean()
    assert epe.max() < 0.1, epe.max()


def test_matches_numpy_oracle_no_median(rng):
    cfg = TVL1Config(nscales=2, warps=2, outer_iterations=3,
                     inner_iterations=8, median_filtering=0)
    f1, f2 = smooth_pair(rng, 48, 64, dx=0.9, dy=0.6)
    ref = tvl1_np(f1, f2, cfg)
    ours = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                           cfg))[0]
    epe = np.linalg.norm(ours - ref, axis=-1)
    assert epe.mean() < 5e-3, epe.mean()


def test_ground_truth_translation(rng):
    f1, f2 = smooth_pair(rng, 96, 128, dx=2.3, dy=-1.1)
    out = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                          TVL1Config()))[0]
    inner = out[10:-10, 10:-10]
    np.testing.assert_allclose(inner.reshape(-1, 2).mean(0),
                               [2.3, -1.1], atol=0.15)
    epe = np.linalg.norm(inner - np.array([2.3, -1.1]), axis=-1)
    assert epe.mean() < 0.12, epe.mean()


def test_batched_jit(rng):
    f1, f2 = smooth_pair(rng, 48, 64, dx=1.0, dy=0.5)
    prev = jnp.stack([jnp.asarray(f1)] * 2)
    nxt = jnp.stack([jnp.asarray(f2)] * 2)
    out = tvl1_jit(prev, nxt, FAST)
    assert out.shape == (2, 48, 64, 2)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]),
                               atol=1e-6)


def test_median_filter_matches_cv2(rng):
    x = rng.uniform(-5, 5, (40, 56)).astype(np.float32)
    ours = np.asarray(median_filter2d(jnp.asarray(x[None]), 5))[0]
    ref = cv2.medianBlur(x, 5)
    # cv2.medianBlur uses BORDER_REPLICATE for float input too;
    # interiors must match exactly.
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=1e-6)


def test_median_filter_3x3_full(rng):
    x = rng.uniform(-5, 5, (20, 24)).astype(np.float32)
    ours = np.asarray(median_filter2d(jnp.asarray(x[None]), 3))[0]
    ref = cv2.medianBlur(x, 3)
    np.testing.assert_allclose(ours[1:-1, 1:-1], ref[1:-1, 1:-1], atol=1e-6)
