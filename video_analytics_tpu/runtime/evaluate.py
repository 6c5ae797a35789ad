"""UCF101 split-1 evaluation driver (BASELINE.json config #4).

Streams test clips, classifies sliding windows with the fused
two-stream pipeline, and aggregates top-1 clip accuracy.  Per-clip
failures (corrupt videos) are caught, logged and counted rather than
aborting the run; a ProgressManifest makes long runs resumable
(SURVEY.md §5: failure detection / cheap restart)."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Iterable, List, Optional

import jax
import numpy as np

from video_analytics_tpu.config import PipelineConfig
from video_analytics_tpu.io.dataset import ClipRecord, ProgressManifest
from video_analytics_tpu.io.video import VideoReader
from video_analytics_tpu.models.two_stream import TwoStreamModel
from video_analytics_tpu.runtime.pipeline import (
    classify_window, sample_window)
from video_analytics_tpu.utils.logging import get_logger

log = get_logger("tpuva.eval")


@dataclasses.dataclass
class EvalResult:
    total: int = 0
    correct: int = 0
    failed: int = 0

    @property
    def top1(self) -> float:
        return self.correct / max(self.total, 1)

    def as_dict(self) -> Dict[str, Any]:
        return {"total": self.total, "correct": self.correct,
                "failed": self.failed, "top1": self.top1}


def classify_clip_file(path: str, variables, model: TwoStreamModel,
                       cfg: PipelineConfig,
                       max_frames: int = 300,
                       num_windows: int = 1) -> np.ndarray:
    """Decode one clip, classify → class probs.

    num_windows=1: the centre window (fast smoke/eval).
    num_windows=N: N evenly-spaced windows, probabilities averaged —
    the classic two-stream multi-snippet protocol (temporal pooling is
    associative, so window probs reduce exactly via a running mean).
    """
    with VideoReader(path) as r:
        frames = r.read_all(max_frames=max_frames)
    # Window must cover flow_stack+1 frames to build one flow stack.
    win = max(cfg.window, cfg.preprocess.flow_stack + 1)
    t = len(frames)
    if num_windows <= 1 or t <= win:
        idx = sample_window(t, win)
        return np.asarray(classify_window(frames[idx], variables,
                                          model, cfg))
    starts = np.linspace(0, t - win, num_windows).astype(int)
    acc = None
    for s in starts:
        p = np.asarray(classify_window(frames[s:s + win], variables,
                                       model, cfg))
        acc = p if acc is None else acc + p
    return acc / len(starts)


def evaluate_batched(records: List[ClipRecord], variables,
                     model: TwoStreamModel, cfg: PipelineConfig,
                     batch_windows: int = 8,
                     num_workers: int = 2,
                     mesh=None,
                     max_frames: int = 300) -> EvalResult:
    """Throughput-oriented eval: threaded decode (ingest.prefetch_clips)
    → centre windows batched `batch_windows` at a time → one
    classify_batch launch per batch (amortises kernel dispatch),
    optionally sharded over a mesh's 'data' axis.

    Same protocol as evaluate(num_windows=1); failures are contained in
    the decode workers.
    """
    import jax.numpy as jnp
    from video_analytics_tpu.ingest.prefetch import prefetch_clips
    from video_analytics_tpu.io.video import VideoReader
    from video_analytics_tpu.parallel.mesh import (
        data_sharding, pad_to_multiple, replicated)
    from video_analytics_tpu.runtime.pipeline import classify_batch

    win = max(cfg.window, cfg.preprocess.flow_stack + 1)
    by_path = {r.path: r for r in records}

    def loader(path):
        with VideoReader(path) as r:
            frames = r.read_all(max_frames=max_frames)
        idx = sample_window(len(frames), win)
        return frames[idx]

    if mesh is not None:
        variables = jax.device_put(variables, replicated(mesh))

    result = EvalResult()
    pending: List = []

    def flush():
        if not pending:
            return
        paths, wins = zip(*pending)
        pending.clear()
        arr = np.stack(wins)
        n = len(arr)
        if mesh is not None:
            arr, _ = pad_to_multiple(arr, mesh.devices.shape[0])
            arr = jax.device_put(jnp.asarray(arr),
                                 data_sharding(mesh, arr.ndim))
        probs = np.asarray(classify_batch(jnp.asarray(arr), variables,
                                          model, cfg))[:n]
        for p, pr in zip(paths, probs):
            rec = by_path[p]
            result.total += 1
            result.correct += int(int(pr.argmax()) == rec.label)

    errors: List = []
    for path, window, _dt in prefetch_clips(
            [r.path for r in records], loader,
            num_workers=num_workers):
        pending.append((path, window))
        if len(pending) >= batch_windows:
            flush()
    flush()
    result.failed = len(records) - result.total
    return result


def evaluate(records: Iterable[ClipRecord], variables,
             model: TwoStreamModel, cfg: PipelineConfig,
             manifest_path: Optional[str] = None,
             predictions_path: Optional[str] = None,
             limit: Optional[int] = None,
             num_windows: int = 1) -> EvalResult:
    """Top-1 clip accuracy over a record list."""
    manifest = ProgressManifest(manifest_path) if manifest_path else None
    result = EvalResult()
    preds_f = open(predictions_path, "a") if predictions_path else None
    try:
        for i, rec in enumerate(records):
            if limit is not None and i >= limit:
                break
            key = rec.path
            if manifest and manifest.is_done(key):
                continue
            try:
                probs = classify_clip_file(rec.path, variables, model, cfg,
                                           num_windows=num_windows)
                pred = int(probs.argmax())
            except Exception as e:  # corrupt clip: log, count, continue
                log.warning("clip failed: %s (%s)", rec.path, e)
                result.failed += 1
                continue
            result.total += 1
            result.correct += int(pred == rec.label)
            if preds_f:
                preds_f.write(json.dumps(
                    {"path": rec.path, "label": rec.label,
                     "pred": pred}) + "\n")
            if manifest:
                manifest.mark_done(key)
            if (i + 1) % 50 == 0:
                log.info("evaluated %d clips, top1=%.4f",
                         result.total, result.top1)
    finally:
        if preds_f:
            preds_f.close()
    return result
