"""Video/flow I/O round-trip tests."""

import numpy as np

from tests.fixtures import moving_square_frames
from video_analytics_tpu.io import (
    VideoReader, write_frames, read_frames_dir,
    write_flo, read_flo, quantize_flow, dequantize_flow)
from video_analytics_tpu.io.video import synthesize_video


def test_video_roundtrip(tmp_path):
    frames = moving_square_frames(num=8, h=64, w=80)
    path = str(tmp_path / "clip.mp4")
    synthesize_video(path, frames, fps=8.0)
    with VideoReader(path) as r:
        decoded = r.read_all()
    assert decoded.shape == (8, 64, 80, 3)
    # Lossy codec: mean abs error should still be small.
    err = np.abs(decoded.astype(np.float32) -
                 np.stack(frames).astype(np.float32)).mean()
    assert err < 8.0, err


def test_read_window_parity(tmp_path):
    """Seek-decode of a window must be bit-identical to slicing the
    full decode (the clips/sec lever: eval decodes only its snippet
    windows), and the container's frame-count metadata must be exact
    for our encoder (the windowed loader trusts it)."""
    frames = moving_square_frames(num=40, h=64, w=80)
    path = str(tmp_path / "clip.mp4")
    synthesize_video(path, frames, fps=10.0)
    with VideoReader(path) as r:
        full = r.read_all()
    assert full.shape[0] == 40
    with VideoReader(path) as r:
        assert r.frame_count == 40
        # Forward seeks on one reader — the eval loader's access shape.
        for start, count in [(0, 5), (12, 16), (17, 16), (35, 5)]:
            win = r.read_window(start, count)
            np.testing.assert_array_equal(win, full[start:start + count])
    # Past-the-end window: loud IOError (the loader falls back).
    with VideoReader(path) as r:
        try:
            r.read_window(30, 16)
            assert False, "expected IOError for short window"
        except IOError:
            pass


def test_frames_dir_roundtrip(tmp_path):
    frames = moving_square_frames(num=5, h=48, w=64)
    d = str(tmp_path / "frames")
    paths = write_frames(frames, d, quality=98)
    assert len(paths) == 5
    loaded = read_frames_dir(d)
    assert loaded.shape == (5, 48, 64, 3)
    err = np.abs(loaded.astype(np.float32) -
                 np.stack(frames).astype(np.float32)).mean()
    assert err < 8.0, err


def test_flo_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    flow = rng.normal(0, 5, (33, 47, 2)).astype(np.float32)
    p = str(tmp_path / "f.flo")
    write_flo(p, flow)
    back = read_flo(p)
    np.testing.assert_array_equal(flow, back)


def test_snippet_windows_reject_lying_frame_count(tmp_path, monkeypatch):
    """Window placement derives from the container frame count, which
    "may be approximate for some containers" — the seek path must
    probe-validate it (io.video._frame_count_exact) and fall back to
    the exact full-decode placement when metadata over- OR
    under-reports, keeping decode_snippet_windows bit-identical to
    read_all-based windowing either way."""
    from video_analytics_tpu.io.video import decode_snippet_windows

    frames = moving_square_frames(num=40, h=64, w=80)
    path = str(tmp_path / "clip.mp4")
    synthesize_video(path, frames, fps=10.0)
    with VideoReader(path) as r:
        full = r.read_all()
    expected = full[17:23][None]        # start (40-6)//2 from ACTUAL t

    for lie in (43, 38):                # over- and under-report
        monkeypatch.setattr(VideoReader, "frame_count",
                            property(lambda self, lie=lie: lie))
        wins = decode_snippet_windows(path, window=6, num_windows=1)
        np.testing.assert_array_equal(wins, expected, err_msg=str(lie))
    monkeypatch.undo()
    # Truthful metadata keeps the (validated) seek path bit-identical.
    wins = decode_snippet_windows(path, window=6, num_windows=1)
    np.testing.assert_array_equal(wins, expected)


def test_snippet_windows_multi_window_seek_path(tmp_path, monkeypatch):
    """ADVICE r3 regressions (high + medium): the frame-count probe
    leaves the demuxer mid-stream, so read_window must seek even for
    start == 0.  Before the fix, (a) with max_frames clamping t the
    first window silently contained frames [t, t+window) instead of
    [0, window); (b) without max_frames the probe ended at EOF, so the
    first window of every num_windows>1 call raised IOError and the
    whole clip took the full-decode fallback — the seek fast path
    never fired for multi-window requests."""
    from video_analytics_tpu.io import video as vid

    frames = moving_square_frames(num=40, h=64, w=80)
    path = str(tmp_path / "clip.mp4")
    synthesize_video(path, frames, fps=10.0)
    with VideoReader(path) as r:
        full = r.read_all()

    # (a) max_frames clamps t to 20, windows of 5 at starts [0, 15].
    wins = vid.decode_snippet_windows(path, window=5, num_windows=2,
                                      max_frames=20)
    np.testing.assert_array_equal(wins[0], full[0:5])
    np.testing.assert_array_equal(wins[1], full[15:20])

    # (b) the seek fast path must actually fire (no full decode) for a
    # multi-window request whose windows cover <60% of the clip.
    calls = []
    orig_read_all = vid.VideoReader.read_all

    def counting_read_all(self, max_frames=None):
        calls.append(1)
        return orig_read_all(self, max_frames=max_frames)

    monkeypatch.setattr(vid.VideoReader, "read_all", counting_read_all)
    wins = vid.decode_snippet_windows(path, window=6, num_windows=3)
    assert not calls, "seek fast path fell back to full decode"
    np.testing.assert_array_equal(wins[0], full[0:6])
    np.testing.assert_array_equal(wins[1], full[17:23])
    np.testing.assert_array_equal(wins[2], full[34:40])


def test_flow_quantization():
    rng = np.random.default_rng(2)
    flow = rng.normal(0, 8, (17, 19, 2)).astype(np.float32)
    q = quantize_flow(flow, bound=20.0)
    assert q.dtype == np.uint8
    deq = dequantize_flow(q, bound=20.0)
    inside = np.abs(flow) <= 20.0
    assert np.abs((deq - flow)[inside]).max() <= 20.0 / 255.0 + 1e-5


def test_ucf101_lists(tmp_path):
    ann = tmp_path / "ann"
    ann.mkdir()
    (ann / "classInd.txt").write_text("1 ApplyEyeMakeup\n2 Basketball\n")
    (ann / "trainlist01.txt").write_text(
        "ApplyEyeMakeup/v_A_g01_c01.avi 1\nBasketball/v_B_g01_c01.avi 2\n")
    (ann / "testlist01.txt").write_text("Basketball/v_B_g02_c02.avi\n")
    from video_analytics_tpu.io.dataset import UCF101
    ds = UCF101(videos_root=str(tmp_path / "videos"),
                annotations_root=str(ann), split=1)
    tr = ds.train_records()
    te = ds.test_records()
    assert [r.label for r in tr] == [0, 1]
    assert te[0].label == 1 and te[0].class_name == "Basketball"
    assert ds.classes == ["ApplyEyeMakeup", "Basketball"]


def test_progress_manifest(tmp_path):
    from video_analytics_tpu.io.dataset import ProgressManifest
    p = str(tmp_path / "m.txt")
    m = ProgressManifest(p)
    assert not m.is_done("a")
    m.mark_done("a")
    m.mark_done("b")
    m2 = ProgressManifest(p)
    assert m2.is_done("a") and m2.is_done("b") and len(m2) == 2


def test_synthetic_ucf101_dataset(tmp_path):
    """The synthetic UCF101-layout builder (bench clips/sec dataset):
    real encoded containers in the exact reference layout, parseable by
    the UCF101 loader, decodable, and runnable through batched eval."""
    import jax
    from video_analytics_tpu.config import FarnebackConfig, PipelineConfig
    from video_analytics_tpu.io.synthetic import build_synthetic_ucf101
    from video_analytics_tpu.io.video import VideoReader
    from video_analytics_tpu.models.two_stream import TwoStreamModel
    from video_analytics_tpu.runtime.evaluate import evaluate_batched

    root = str(tmp_path / "ds")
    ds = build_synthetic_ucf101(root, num_classes=2, clips_per_class=2,
                                num_frames=14, h=120, w=160)
    train, test = ds.train_records(), ds.test_records()
    assert len(train) == 2 and len(test) == 2
    assert ds.classes == ["Right", "Left"]
    assert {r.label for r in test} == {0, 1}
    with VideoReader(test[0].path) as r:
        frames = r.read_all()
    assert frames.shape == (14, 120, 160, 3)
    # Idempotent rebuild: same files, no re-encode (mtimes unchanged).
    import os
    mtime = os.path.getmtime(test[0].path)
    ds2 = build_synthetic_ucf101(root, num_classes=2, clips_per_class=2,
                                 num_frames=14, h=120, w=160)
    assert os.path.getmtime(ds2.test_records()[0].path) == mtime

    cfg = PipelineConfig(flow_algo="farneback",
                         farneback=FarnebackConfig(levels=0, iterations=1),
                         window=12)
    model = TwoStreamModel.create(num_classes=2, flow_stack=10)
    variables = model.init_variables(jax.random.PRNGKey(0))
    res = evaluate_batched(test, variables, model, cfg, batch_clips=2)
    assert res.total == 2 and res.failed == 0
