"""Auxiliary subsystem tests: profiling timer, flow visualization,
multi-window classification averaging."""

import numpy as np
import jax.numpy as jnp

from video_analytics_tpu.io.flowio import flow_to_color
from video_analytics_tpu.runtime.profiling import StageTimer


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        x = sum(range(1000))
    with t.stage("a"):
        pass
    with t.stage("b", fence=jnp.ones(4)):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2 and rep["b"]["count"] == 1
    assert rep["a"]["total_s"] >= 0


def test_flow_to_color():
    flow = np.zeros((16, 20, 2), np.float32)
    flow[:8, :, 0] = 5.0    # rightward motion top half
    flow[8:, :, 1] = -5.0   # upward motion bottom half
    img = flow_to_color(flow)
    assert img.shape == (16, 20, 3) and img.dtype == np.uint8
    # Different directions → different hues.
    assert not np.array_equal(img[2, 2], img[12, 2])


def test_multiwindow_average(tmp_path):
    """classify_clip_file with N windows averages probabilities."""
    import jax
    from tests.fixtures import moving_square_frames
    from video_analytics_tpu.config import (
        FarnebackConfig, PipelineConfig)
    from video_analytics_tpu.io.video import synthesize_video
    from video_analytics_tpu.models.two_stream import TwoStreamModel
    from video_analytics_tpu.runtime.evaluate import classify_clip_file

    cfg = PipelineConfig(flow_algo="farneback",
                         farneback=FarnebackConfig(levels=0, iterations=1),
                         window=12)
    model = TwoStreamModel.create(num_classes=3, flow_stack=10)
    variables = model.init_variables(jax.random.PRNGKey(0))
    path = str(tmp_path / "c.mp4")
    synthesize_video(path, moving_square_frames(30, 120, 160), fps=10)
    p1 = classify_clip_file(path, variables, model, cfg, num_windows=1)
    p3 = classify_clip_file(path, variables, model, cfg, num_windows=3)
    assert p1.shape == p3.shape == (3,)
    np.testing.assert_allclose(p3.sum(), 1.0, atol=1e-5)
    assert not np.allclose(p1, p3)  # different snippets contribute
    # The batched one-dispatch path must equal the serial per-window
    # protocol exactly (classify_batch is a vmap of classify_window).
    from video_analytics_tpu.io.video import VideoReader
    from video_analytics_tpu.runtime.pipeline import classify_window
    with VideoReader(path) as r:
        frames = r.read_all(max_frames=300)
    win = max(cfg.window, cfg.preprocess.flow_stack + 1)
    starts = np.linspace(0, len(frames) - win, 3).astype(int)
    serial = np.mean([np.asarray(classify_window(frames[s:s + win],
                                                 variables, model, cfg))
                      for s in starts], axis=0)
    np.testing.assert_allclose(p3, serial, atol=1e-5)


def test_evaluate_batched_windowed_decode(tmp_path):
    """On clips long enough that the snippet windows cover <60% of the
    frames, evaluate_batched's loader seek-decodes ONLY the windows
    (VideoReader.read_window) — the result must stay protocol-identical
    to the serial per-clip driver, which decodes everything."""
    import jax
    from tests.fixtures import moving_square_frames
    from video_analytics_tpu.config import FarnebackConfig, PipelineConfig
    from video_analytics_tpu.io.dataset import ClipRecord
    from video_analytics_tpu.io.video import synthesize_video
    from video_analytics_tpu.models.two_stream import TwoStreamModel
    from video_analytics_tpu.runtime.evaluate import (
        evaluate, evaluate_batched)

    cfg = PipelineConfig(flow_algo="farneback",
                         farneback=FarnebackConfig(levels=0, iterations=1),
                         window=12)
    model = TwoStreamModel.create(num_classes=3, flow_stack=10)
    variables = model.init_variables(jax.random.PRNGKey(0))
    records = []
    for i in range(3):
        p = str(tmp_path / f"c{i}.mp4")
        synthesize_video(p, moving_square_frames(42, 120, 160), fps=10)
        records.append(ClipRecord(path=p, label=i % 3, class_name=str(i)))
    for nw in (1, 2):
        r1 = evaluate(records, variables, model, cfg, num_windows=nw)
        r2 = evaluate_batched(records, variables, model, cfg,
                              batch_clips=2, num_windows=nw)
        assert r2.total == r1.total == 3
        assert r2.failed == r1.failed == 0
        assert r2.correct == r1.correct


def test_host_resize_matches_device_resize(tmp_path):
    """Host-side pre-resize (ingest bandwidth lever) must be numerics-
    matched to the on-device resize_short_side."""
    import jax.numpy as jnp
    from video_analytics_tpu.ingest import host_resize_short
    from video_analytics_tpu.ops import preprocess as pp

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 255, (3, 300, 400, 3)).astype(np.uint8)
    host = host_resize_short(frames, 256)
    dev = np.asarray(pp.resize_short_side(jnp.asarray(frames), 256))
    assert host.shape == dev.shape == (3, 256, 341, 3)
    # cv2 rounds to uint8; the float device path must agree within
    # that quantisation.
    assert np.abs(host.astype(np.float32) - dev).max() <= 1.0
    # No-op below the target size.
    small = rng.integers(0, 255, (2, 120, 160, 3)).astype(np.uint8)
    assert host_resize_short(small, 256) is small


def test_evaluate_batched(tmp_path):
    """Batched+prefetched eval matches the per-clip driver's protocol."""
    import jax
    from tests.fixtures import moving_square_frames
    from video_analytics_tpu.config import FarnebackConfig, PipelineConfig
    from video_analytics_tpu.io.dataset import ClipRecord
    from video_analytics_tpu.io.video import synthesize_video
    from video_analytics_tpu.models.two_stream import TwoStreamModel
    from video_analytics_tpu.runtime.evaluate import (
        evaluate, evaluate_batched)

    cfg = PipelineConfig(flow_algo="farneback",
                         farneback=FarnebackConfig(levels=0, iterations=1),
                         window=12)
    model = TwoStreamModel.create(num_classes=3, flow_stack=10)
    variables = model.init_variables(jax.random.PRNGKey(0))
    records = []
    for i in range(3):
        p = str(tmp_path / f"c{i}.mp4")
        synthesize_video(p, moving_square_frames(14, 120, 160), fps=10)
        records.append(ClipRecord(path=p, label=i % 3, class_name=str(i)))
    # Include one corrupt clip: must be counted as failed, not crash.
    bad = str(tmp_path / "bad.mp4")
    open(bad, "wb").write(b"junk")
    records.append(ClipRecord(path=bad, label=0, class_name="x"))

    r1 = evaluate(records, variables, model, cfg)
    r2 = evaluate_batched(records, variables, model, cfg,
                          batch_clips=2)
    assert r2.total == r1.total == 3
    assert r2.failed == 1
    assert r2.correct == r1.correct
    # Failure accounting names the exact clip that failed (SURVEY §5).
    assert [p for p, _ in r2.failures] == [bad]
    assert [p for p, _ in r1.failures] == [bad]


def test_evaluate_batched_transport_crop_ab(tmp_path):
    """transport_crop=True (host slices to the consumed source window,
    device applies the same offsets via src_hw) must match
    transport_crop=False (full frames over the transport) — the bytes
    reaching the resize are identical by construction."""
    import jax
    from tests.fixtures import moving_square_frames
    from video_analytics_tpu.config import FarnebackConfig, PipelineConfig
    from video_analytics_tpu.io.dataset import ClipRecord
    from video_analytics_tpu.io.video import synthesize_video
    from video_analytics_tpu.models.two_stream import TwoStreamModel
    from video_analytics_tpu.runtime.evaluate import evaluate_batched

    cfg = PipelineConfig(flow_algo="farneback",
                         farneback=FarnebackConfig(levels=0, iterations=1),
                         window=12)
    model = TwoStreamModel.create(num_classes=3, flow_stack=10)
    variables = model.init_variables(jax.random.PRNGKey(0))
    records = []
    for i in range(3):
        p = str(tmp_path / f"c{i}.mp4")
        synthesize_video(p, moving_square_frames(16, 120, 160), fps=10)
        records.append(ClipRecord(path=p, label=i % 3, class_name=str(i)))
    r_t = evaluate_batched(records, variables, model, cfg, batch_clips=2,
                           transport_crop=True)
    r_f = evaluate_batched(records, variables, model, cfg, batch_clips=2,
                           transport_crop=False)
    assert r_t.total == r_f.total == 3
    assert r_t.failed == r_f.failed == 0
    assert r_t.correct == r_f.correct


def test_evaluate_batched_mixed_resolutions(tmp_path):
    """Resolution-heterogeneous record lists must complete with correct
    accuracy (VERDICT r3 missing #3): evaluate_batched groups pending
    clips by post-loader window shape + source-crop geometry and
    flushes each group independently, instead of raising when a batch
    would mix resolutions."""
    import jax
    from tests.fixtures import moving_square_frames
    from video_analytics_tpu.config import FarnebackConfig, PipelineConfig
    from video_analytics_tpu.io.dataset import ClipRecord
    from video_analytics_tpu.io.video import synthesize_video
    from video_analytics_tpu.models.two_stream import TwoStreamModel
    from video_analytics_tpu.runtime.evaluate import (
        evaluate, evaluate_batched)

    cfg = PipelineConfig(flow_algo="farneback",
                         farneback=FarnebackConfig(levels=0, iterations=1),
                         window=12)
    model = TwoStreamModel.create(num_classes=3, flow_stack=10)
    variables = model.init_variables(jax.random.PRNGKey(0))
    records = []
    # Interleave two source resolutions so grouping (not luck of
    # batching order) is what keeps each flush uniform.
    for i, (h, w) in enumerate([(120, 160), (96, 128),
                                (120, 160), (96, 128), (120, 160)]):
        p = str(tmp_path / f"c{i}.mp4")
        synthesize_video(p, moving_square_frames(16, h, w), fps=10)
        records.append(ClipRecord(path=p, label=i % 3, class_name=str(i)))
    r1 = evaluate(records, variables, model, cfg)
    r2 = evaluate_batched(records, variables, model, cfg, batch_clips=2)
    assert r2.total == r1.total == 5
    assert r2.failed == r1.failed == 0
    assert r2.correct == r1.correct
