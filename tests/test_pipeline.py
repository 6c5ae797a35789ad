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


def test_fusion_weights():
    model = TwoStreamModel.create(num_classes=4,
                                  fusion_weights=(1.0, 3.0))
    s = jnp.asarray([10.0, 0.0, 0.0, 0.0])
    t = jnp.asarray([0.0, 10.0, 0.0, 0.0])
    fused = np.asarray(model.fuse(s, t))
    # Temporal stream weighted 3x: class 1 must dominate.
    assert fused.argmax() == 1
    np.testing.assert_allclose(fused.sum(), 1.0, atol=1e-6)
