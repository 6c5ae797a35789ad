"""End-to-end pipeline tests: fused classify/extract programs and the
two-stream model (BASELINE.json configs #1/#3/#4 plumbing)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.fixtures import moving_square_frames
from video_analytics_tpu.config import (
    FarnebackConfig, PipelineConfig, PreprocessConfig)
from video_analytics_tpu.models.two_stream import TwoStreamModel
from video_analytics_tpu.runtime import pipeline as rp


FAST = PipelineConfig(flow_algo="farneback",
                      farneback=FarnebackConfig(levels=1, iterations=2),
                      window=12)


@pytest.fixture(scope="module")
def two_stream():
    model = TwoStreamModel.create(num_classes=7, flow_stack=10)
    variables = model.init_variables(jax.random.PRNGKey(0))
    return model, variables


@pytest.fixture(scope="module")
def clip():
    return np.stack(moving_square_frames(num=12, h=240, w=320))


def test_rgb_features(two_stream, clip):
    model, variables = two_stream
    feats = rp.rgb_features(jnp.asarray(clip), variables["spatial"],
                            model.spatial, FAST.preprocess)
    assert feats.shape == (12, 512)
    assert np.isfinite(np.asarray(feats)).all()


def test_flow_features(two_stream, clip):
    model, variables = two_stream
    feats = rp.flow_features(jnp.asarray(clip), variables["temporal"],
                             model.temporal, FAST)
    # 12 frames → 11 flow fields → 2 stacked windows of 10.
    assert feats.shape == (2, 512)
    assert np.isfinite(np.asarray(feats)).all()


def test_classify_window_probs(two_stream, clip):
    model, variables = two_stream
    probs = rp.classify_window(jnp.asarray(clip), variables, model, FAST)
    p = np.asarray(probs)
    assert p.shape == (7,)
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-5)
    assert (p >= 0).all()


def test_classify_batch_matches_single(two_stream, clip):
    model, variables = two_stream
    windows = jnp.stack([jnp.asarray(clip)] * 2)
    batch_probs = rp.classify_batch(windows, variables, model, FAST)
    single = rp.classify_window(jnp.asarray(clip), variables, model, FAST)
    assert batch_probs.shape == (2, 7)
    np.testing.assert_allclose(np.asarray(batch_probs[0]),
                               np.asarray(single), atol=1e-5)


def test_flow_from_frames(clip):
    flow = rp.flow_from_frames(jnp.asarray(clip[:6]), FAST)
    f = np.asarray(flow)
    assert f.shape == (5, 240, 320, 2)
    # The square translates (2, 1) px/frame; check the median flow in
    # the square's interior.
    sq = f[0, 12:32, 14:32]
    assert abs(np.median(sq[..., 0]) - 2.0) < 0.5
    assert abs(np.median(sq[..., 1]) - 1.0) < 0.5


def test_sample_window():
    idx = rp.sample_window(100, 16)
    assert len(idx) == 16 and idx[0] == 42 and idx[-1] == 57
    idx = rp.sample_window(5, 8)
    assert list(idx) == [0, 1, 2, 3, 4, 4, 4, 4]
    r = np.random.default_rng(0)
    idx = rp.sample_window(100, 16, rng=r)
    assert len(idx) == 16 and 0 <= idx[0] <= 84


def test_bounded_envelope_feature_ab():
    """A/B gate for the bounded-envelope approximation (ADVICE r2 #1):
    on content with >envelope (>24 px) motion, the reduced-band flow is
    NOT identical to the full-band flow even after the ±flow_bound
    clip — the winsize window-average bleeds band-clamp differences
    into sub-envelope neighbours.  This quantifies that error so the
    'identical features' claim stays honest: measured on this fixture
    max 3.2 px, mean 0.074, 5.4% of pixels >0.5 px; gated at ~1.5x.
    Within-envelope motion is exactly equal
    (test_farneback.test_bounded_envelope_equivalence)."""
    import cv2
    from video_analytics_tpu.flow.farneback import farneback_sequence
    from video_analytics_tpu.config import FarnebackConfig

    rng = np.random.default_rng(0)
    h = w = 192
    pad = 48
    big = rng.uniform(0, 255, (h + 2 * pad, w + 2 * pad)).astype(
        np.float32)
    big = cv2.GaussianBlur(big, (31, 31), 0)
    big = (big - big.min()) / np.ptp(big) * 255.0
    f1 = big[pad:pad + h, pad:pad + w].copy()
    m2 = np.float32([[1, 0, 28.0], [0, 1, 6.0]])
    f2w = cv2.warpAffine(big, m2, big.shape[::-1],
                         flags=cv2.INTER_CUBIC)
    f2 = f2w[pad:pad + h, pad:pad + w].copy()
    frames = jnp.asarray(np.stack([f1, f2]))
    full = np.asarray(farneback_sequence(frames, FarnebackConfig(),
                                         use_pallas=True))
    red = np.asarray(farneback_sequence(frames, FarnebackConfig(),
                                        use_pallas=True, envelope=24))
    # The fixture genuinely produces >envelope displacements.
    assert np.abs(full).max() > 24.0
    bound = 20.0
    d = np.linalg.norm(np.clip(full, -bound, bound)
                       - np.clip(red, -bound, bound), axis=-1)
    assert d.max() < 5.0, d.max()
    assert d.mean() < 0.12, d.mean()
    assert (d > 0.5).mean() < 0.09, (d > 0.5).mean()


def test_exact_warp_config():
    """PipelineConfig(exact_warp=True) (`compute-flow --exact`) routes
    all flow warps through the exact XLA gather: off-TPU the default
    path is already the gather, so both must agree bitwise."""
    import dataclasses
    from tests.fixtures import smooth_pair
    from video_analytics_tpu.config import TVL1Config
    rng = np.random.default_rng(1)
    f1, f2 = smooth_pair(rng, 64, 96, dx=2.0, dy=-1.0)
    prev = jnp.asarray(f1[None])
    nxt = jnp.asarray(f2[None])
    fast_tv = TVL1Config(nscales=2, warps=2, outer_iterations=3,
                         inner_iterations=8)
    for algo in ("farneback", "tvl1"):
        cfg_d = PipelineConfig(flow_algo=algo, tvl1=fast_tv,
                               farneback=FAST.farneback)
        cfg_e = dataclasses.replace(cfg_d, exact_warp=True)
        a = np.asarray(rp.compute_flow(prev, nxt, cfg_d))
        b = np.asarray(rp.compute_flow(prev, nxt, cfg_e))
        np.testing.assert_array_equal(a, b)


def test_fusion_weights():
    model = TwoStreamModel.create(num_classes=4,
                                  fusion_weights=(1.0, 3.0))
    s = jnp.asarray([10.0, 0.0, 0.0, 0.0])
    t = jnp.asarray([0.0, 10.0, 0.0, 0.0])
    fused = np.asarray(model.fuse(s, t))
    # Temporal stream weighted 3x: class 1 must dominate.
    assert fused.argmax() == 1
    np.testing.assert_allclose(fused.sum(), 1.0, atol=1e-6)
