"""Ingest tests: windowing invariants + prefetcher threading stress
(SURVEY.md §5 race-detection story: the prefetcher is the only threaded
component — stress it)."""

import numpy as np
import pytest

from video_analytics_tpu.ingest import (
    sliding_windows, window_starts, DevicePrefetcher, prefetch_clips)


def test_window_starts_cover_tail():
    starts = window_starts(100, 16, 8)
    assert starts[0] == 0 and starts[-1] == 84
    # Every frame covered.
    covered = set()
    for s in starts:
        covered.update(range(s, s + 16))
    assert covered == set(range(100))


def test_window_starts_short_clip():
    assert window_starts(5, 16, 8) == [0]


def test_sliding_windows_shapes():
    frames = np.arange(20 * 4 * 4 * 3).reshape(20, 4, 4, 3)
    wins = list(sliding_windows(frames, 16, 8))
    assert [w.shape for w in wins] == [(16, 4, 4, 3)] * 2
    np.testing.assert_array_equal(wins[1], frames[4:20])


def test_sliding_windows_pad_short():
    frames = np.arange(3 * 2 * 2 * 1).reshape(3, 2, 2, 1)
    wins = list(sliding_windows(frames, 8, 4))
    assert len(wins) == 1 and wins[0].shape == (8, 2, 2, 1)
    np.testing.assert_array_equal(wins[0][3:], np.repeat(frames[-1:], 5, 0))


def test_device_prefetcher_order_and_values():
    batches = [np.full((4, 4), i, np.float32) for i in range(20)]
    out = [np.asarray(b) for b in DevicePrefetcher(batches, depth=3)]
    assert len(out) == 20
    for i, b in enumerate(out):
        np.testing.assert_array_equal(b, batches[i])


def test_device_prefetcher_propagates_errors():
    def gen():
        yield np.zeros(3)
        raise RuntimeError("boom")
    pf = DevicePrefetcher(gen(), depth=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(pf)


def test_prefetch_clips_stress():
    """Many tiny 'clips', several workers, small queue: all items must
    arrive exactly once, corrupt ones skipped, no deadlock."""
    paths = [f"clip{i}" for i in range(60)]

    def loader(p):
        i = int(p[4:])
        if i % 13 == 0:
            raise IOError("corrupt")
        return np.full((2, 2), i, np.int32)

    got = {}
    for path, arr, dt in prefetch_clips(paths, loader, num_workers=4,
                                        queue_depth=2):
        got[path] = arr[0, 0]
        assert dt >= 0
    expect = {p for p in paths if int(p[4:]) % 13 != 0}
    assert set(got) == expect
    for p, v in got.items():
        assert v == int(p[4:])


# ---------------------------------------------------------------------------
# TrainWindowSampler (the ingest-fed train loop, VERDICT r2 missing #3)
# ---------------------------------------------------------------------------

def _make_train_clips(tmp_path, n=4, frames=8):
    from tests.fixtures import moving_square_frames
    from video_analytics_tpu.io.dataset import ClipRecord
    from video_analytics_tpu.io.video import synthesize_video
    records = []
    for i in range(n):
        p = str(tmp_path / f"t{i}.mp4")
        synthesize_video(p, moving_square_frames(frames, 120, 160), fps=8)
        records.append(ClipRecord(path=p, label=i % 2, class_name=str(i)))
    return records


def test_train_sampler_decodes_ahead(tmp_path):
    """Decode genuinely overlaps the consumer: while the consumer
    'trains' (sleeps), worker threads keep filling the queue — the
    next batch is already decoded when the step finishes."""
    import time
    from video_analytics_tpu.ingest.train_loader import TrainWindowSampler

    records = _make_train_clips(tmp_path)
    with TrainWindowSampler(records, window=6, batch=2, num_workers=2,
                            queue_depth=8) as s:
        it = s.batches()
        w, y = next(it)
        assert w.shape == (2, 6, 120, 160, 3) and y.shape == (2,)
        time.sleep(2.0)               # a long "train step"
        # Workers decoded ahead during the sleep.
        assert s.qsize() >= 6, s.qsize()
        w2, _ = next(it)              # and the next batch is instant
        assert w2.shape == w.shape
        assert s.stats["windows"] == 4


def test_train_sampler_window_cache(tmp_path):
    """--cache-dir: first run decodes containers and writes per-clip
    .npy; a second sampler over the same cache does ZERO container
    decodes."""
    from video_analytics_tpu.ingest.train_loader import TrainWindowSampler

    records = _make_train_clips(tmp_path, n=1)
    cache = str(tmp_path / "cache")
    with TrainWindowSampler(records, window=4, batch=2, num_workers=2,
                            cache_dir=cache) as s:
        it = s.batches()
        a = next(it)
        next(it)
        assert s.stats["decodes"] >= 1
    import os
    assert len([f for f in os.listdir(cache)
                if f.endswith(".npy")]) == 1

    with TrainWindowSampler(records, window=4, batch=2, num_workers=2,
                            cache_dir=cache, seed=0) as s2:
        it2 = s2.batches()
        b = next(it2)
        next(it2)
        assert s2.stats["decodes"] == 0
        assert s2.stats["cache_hits"] >= 2
    assert a[0].shape == b[0].shape
    # The cache holds exactly the decoded frames (lossless round-trip).
    from video_analytics_tpu.io.video import VideoReader
    cached = np.load(os.path.join(
        cache, [f for f in os.listdir(cache) if f.endswith(".npy")][0]))
    with VideoReader(records[0].path) as r:
        np.testing.assert_array_equal(cached, r.read_all(max_frames=120))


def test_train_sampler_all_corrupt_raises(tmp_path):
    """Every record failing must surface as an error, not a hang."""
    from video_analytics_tpu.io.dataset import ClipRecord
    from video_analytics_tpu.ingest.train_loader import TrainWindowSampler

    bad = []
    for i in range(2):
        p = str(tmp_path / f"bad{i}.mp4")
        open(p, "wb").write(b"junk")
        bad.append(ClipRecord(path=p, label=0, class_name="x"))
    with TrainWindowSampler(bad, window=4, batch=2,
                            num_workers=2) as s:
        with pytest.raises(RuntimeError, match="decode workers"):
            next(s.batches())
        assert s.stats["failures"] >= 2
