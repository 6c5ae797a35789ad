"""Parity tests: fused jit preprocessing vs the cv2/numpy oracles."""

import cv2
import numpy as np
import jax
import jax.numpy as jnp

from video_analytics_tpu.config import PreprocessConfig, IMAGENET_MEAN, IMAGENET_STD
from video_analytics_tpu import ops


def test_resize_matches_cv2(rng):
    img = rng.uniform(0, 255, (120, 160, 3)).astype(np.float32)
    ours = np.asarray(ops.resize_bilinear(jnp.asarray(img), (256, 340)))
    ref = cv2.resize(img, (340, 256), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref).max() < 1e-2, np.abs(ours - ref).max()


def test_resize_downscale_matches_cv2(rng):
    img = rng.uniform(0, 255, (240, 320, 3)).astype(np.float32)
    ours = np.asarray(ops.resize_bilinear(jnp.asarray(img), (112, 149)))
    ref = cv2.resize(img, (149, 112), interpolation=cv2.INTER_LINEAR)
    assert np.abs(ours - ref).max() < 2e-2, np.abs(ours - ref).max()


def test_resize_short_side_shapes():
    x = jnp.zeros((4, 240, 320, 3), jnp.uint8)
    y = ops.resize_short_side(x, 256)
    assert y.shape == (4, 256, 341, 3)
    x = jnp.zeros((4, 320, 240, 3), jnp.uint8)
    y = ops.resize_short_side(x, 256)
    assert y.shape == (4, 341, 256, 3)


def test_center_crop_matches_torchvision_convention(rng):
    img = rng.uniform(0, 255, (2, 256, 341, 3)).astype(np.float32)
    out = np.asarray(ops.center_crop(jnp.asarray(img), 224))
    top = int(round((256 - 224) / 2.0))
    left = int(round((341 - 224) / 2.0))
    np.testing.assert_array_equal(out, img[:, top:top + 224, left:left + 224])


def test_normalize(rng):
    img = rng.integers(0, 256, (3, 8, 8, 3)).astype(np.uint8)
    out = np.asarray(ops.normalize(jnp.asarray(img), IMAGENET_MEAN, IMAGENET_STD))
    ref = (img.astype(np.float32) / 255.0 - np.array(IMAGENET_MEAN)) \
        / np.array(IMAGENET_STD)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_preprocess_clip_end_to_end(rng):
    frames = rng.integers(0, 256, (6, 240, 320, 3)).astype(np.uint8)
    cfg = PreprocessConfig()
    out = ops.preprocess_clip_jit(jnp.asarray(frames), cfg)
    assert out.shape == (6, 224, 224, 3)
    # Oracle: cv2 resize + torchvision-style center crop + normalize.
    ref_frames = []
    for f in frames:
        r = cv2.resize(f.astype(np.float32), (341, 256),
                       interpolation=cv2.INTER_LINEAR)
        top, left = int(round((256 - 224) / 2)), int(round((341 - 224) / 2))
        r = r[top:top + 224, left:left + 224]
        r = (r / 255.0 - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
        ref_frames.append(r)
    ref = np.stack(ref_frames)
    assert np.abs(np.asarray(out) - ref).max() < 1e-3


def test_random_crop_flip_shapes_and_determinism():
    x = jnp.arange(2 * 40 * 50 * 3, dtype=jnp.float32).reshape(2, 40, 50, 3)
    key = jax.random.PRNGKey(0)
    a = ops.random_crop_flip(x, 32, key, flip=True)
    b = ops.random_crop_flip(x, 32, key, flip=True)
    assert a.shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Same crop offset across the clip (temporal coherence): both frames
    # come from the same window.
    c = ops.random_crop_flip(x, 32, jax.random.PRNGKey(3), flip=False)
    src = np.asarray(x)
    found = False
    for top in range(40 - 32 + 1):
        for left in range(50 - 32 + 1):
            if np.array_equal(np.asarray(c), src[:, top:top+32, left:left+32]):
                found = True
    assert found


def test_rgb_to_gray_matches_cv2(rng):
    img = rng.integers(0, 256, (32, 33, 3)).astype(np.uint8)
    ours = np.asarray(ops.rgb_to_gray(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
    assert np.abs(ours - ref).max() <= 0.51  # cv2 rounds to uint8


def test_stack_flow_windows():
    t, h, w = 12, 8, 9
    flow = jnp.arange(t * h * w * 2, dtype=jnp.float32).reshape(t, h, w, 2)
    wins = ops.stack_flow_windows(flow, stack=10, stride=1)
    assert wins.shape == (3, h, w, 20)
    np.testing.assert_array_equal(
        np.asarray(wins[1, ..., 0:2]), np.asarray(flow[1]))
    np.testing.assert_array_equal(
        np.asarray(wins[2, ..., 18:20]), np.asarray(flow[11]))


def test_normalize_flow_stack():
    x = jnp.asarray([[-50.0, -20.0, 0.0, 10.0, 99.0]])
    out = np.asarray(ops.normalize_flow_stack(x, bound=20.0))
    np.testing.assert_allclose(out, [[-1.0, -1.0, 0.0, 0.5, 1.0]])


def test_stacked_flow_input_bitexact(rng):
    """The normalize/cast-before-stack fusion is bitwise identical to
    the stack-then-normalize-then-cast chain the CNN used to see
    (per-element ops with constants commute with the stacking copy)."""
    flow = jnp.asarray(rng.normal(scale=30.0, size=(12, 8, 9, 2))
                       .astype(np.float32))
    for dtype in (None, jnp.bfloat16):
        fused = ops.stacked_flow_input(flow, stack=10, bound=20.0,
                                       dtype=dtype)
        ref = ops.normalize_flow_stack(
            ops.stack_flow_windows(flow, stack=10), bound=20.0)
        if dtype is not None:
            ref = ref.astype(dtype)
        assert fused.dtype == ref.dtype
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(ref))


def test_fused_resize_crop_matches_two_op_chain(rng):
    """resize_short_center_crop ≡ center_crop∘resize_short_side at
    several geometries (fp weight noise only)."""
    from video_analytics_tpu.ops.preprocess import (
        center_crop, resize_short_side, resize_short_center_crop)
    import cv2
    for (h, w, short, crop) in [(240, 320, 256, 224), (1080, 1920, 256, 224),
                                (120, 160, 64, 56), (333, 217, 96, 80)]:
        # Band-limited content (like video): the two implementations
        # compute sample positions with different f32 op orders, so on
        # white noise the ~1e-4 px positional noise shows as large
        # value deltas at 1080p; on smooth content it vanishes.
        raw = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
        sm = cv2.GaussianBlur(raw, (9, 9), 0)
        x = jnp.asarray(np.stack([sm, sm[::-1]]))
        ref = center_crop(resize_short_side(x, short), crop)
        fused = resize_short_center_crop(x, short, crop)
        assert fused.shape == ref.shape
        d = float(jnp.abs(fused - ref).max())
        # residual fp weight noise; ~40x below the bf16 resolution the
        # CNNs consume at.
        assert d < 2e-2, (h, w, d)


def test_transport_crop_slice_bitexact(rng):
    """Host-side slice_crop_source + device resize with src_hw must be
    BIT-identical to handing the device the full frame: both paths give
    scale_and_translate the same operand bytes and the same fractional
    offsets (the transport-crop contract, ingest/windows.py)."""
    from video_analytics_tpu.ingest import slice_crop_source

    for h, w in [(240, 320), (320, 240), (226, 226), (241, 319),
                 (120, 160)]:
        x = rng.uniform(0, 255, (2, h, w, 3)).astype(np.uint8)
        full = np.asarray(ops.resize_short_center_crop(
            jnp.asarray(x), 256, 224))
        sl, hw = slice_crop_source(x, 256, 224)
        assert hw == (h, w)
        if min(h, w) > 224:
            assert sl.size < x.size, (h, w)
        pre = np.asarray(ops.resize_short_center_crop(
            jnp.asarray(sl), 256, 224, src_hw=hw))
        np.testing.assert_array_equal(pre, full)


def test_transport_crop_preprocess_clip_and_guards(rng):
    """preprocess_clip honours cfg.src_hw; shape mismatches and the
    random_crop combination are rejected loudly."""
    import pytest
    from video_analytics_tpu.ingest import slice_crop_source

    x = rng.uniform(0, 255, (2, 240, 320, 3)).astype(np.uint8)
    cfg = PreprocessConfig()
    full = np.asarray(ops.preprocess_clip(jnp.asarray(x), cfg))
    sl, hw = slice_crop_source(x, cfg.resize_short, cfg.crop)
    cfg_t = PreprocessConfig(src_hw=hw)
    pre = np.asarray(ops.preprocess_clip(jnp.asarray(sl), cfg_t))
    np.testing.assert_array_equal(pre, full)
    with pytest.raises(ValueError):  # full frame + src_hw set
        ops.preprocess_clip(jnp.asarray(x), cfg_t)
    with pytest.raises(ValueError):  # random_crop + src_hw
        PreprocessConfig(src_hw=hw, random_crop=True)
