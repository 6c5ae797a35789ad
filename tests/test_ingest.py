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
