"""UCF101 split-1 evaluation driver (BASELINE.json config #4).

Streams test clips, classifies sliding windows with the fused
two-stream pipeline, and aggregates top-1 clip accuracy.  Per-clip
failures (corrupt videos) are caught, logged and counted rather than
aborting the run; a ProgressManifest makes long runs resumable
(SURVEY.md §5: failure detection / cheap restart)."""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import Any, Dict, Iterable, List, Optional

import jax
import numpy as np

from video_analytics_tpu.config import PipelineConfig
from video_analytics_tpu.io.dataset import ClipRecord, ProgressManifest
from video_analytics_tpu.models.two_stream import TwoStreamModel
from video_analytics_tpu.runtime.pipeline import classify_window
from video_analytics_tpu.utils.logging import get_logger

log = get_logger("tpuva.eval")


@dataclasses.dataclass
class EvalResult:
    total: int = 0
    correct: int = 0
    failed: int = 0
    # (path, repr(exception)) for every clip that failed to decode/run.
    failures: List = dataclasses.field(default_factory=list)

    @property
    def top1(self) -> float:
        return self.correct / max(self.total, 1)

    def as_dict(self) -> Dict[str, Any]:
        return {"total": self.total, "correct": self.correct,
                "failed": self.failed, "top1": self.top1,
                "failures": [{"path": p, "error": e}
                             for p, e in self.failures]}


def classify_clip_file(path: str, variables, model: TwoStreamModel,
                       cfg: PipelineConfig,
                       max_frames: int = 300,
                       num_windows: int = 1) -> np.ndarray:
    """Decode one clip, classify → class probs.

    num_windows=1: the centre window (fast smoke/eval).
    num_windows=N: N evenly-spaced windows, probabilities averaged —
    the classic two-stream multi-snippet protocol (temporal pooling is
    associative, so window probs reduce exactly via a mean).  The N
    windows are stacked and classified in ONE vmapped dispatch
    (runtime.pipeline.classify_batch) — through a high-RTT transport
    N serial launches would pay N× dispatch latency for no reason.
    Only the windows themselves are decoded when they cover a small
    part of the clip (io.video.decode_snippet_windows).
    """
    from video_analytics_tpu.io.video import decode_snippet_windows
    from video_analytics_tpu.runtime.pipeline import classify_batch

    # Window must cover flow_stack+1 frames to build one flow stack.
    win = max(cfg.window, cfg.preprocess.flow_stack + 1)
    wins = decode_snippet_windows(path, win, num_windows,
                                  max_frames=max_frames,
                                  repeat_short=False)
    # Transport crop: only the source window the fused resize+crop
    # samples crosses host→HBM (bit-identical; see evaluate_batched).
    from video_analytics_tpu.ingest import apply_transport_crop
    wins, cfg = apply_transport_crop(wins, cfg)
    if wins.shape[0] == 1:
        return np.asarray(classify_window(wins[0], variables,
                                          model, cfg))
    probs = np.asarray(classify_batch(wins, variables, model, cfg))
    return probs.mean(0)


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def _batch_clip_metrics(windows, labels, valid, variables,
                        model: TwoStreamModel, cfg: PipelineConfig):
    """(B, N, T, H, W, 3) snippet windows → (correct_count, preds).

    Multi-snippet protocol on device: per-clip probs are the mean over
    the N snippets (matching classify_clip_file), the top-1 match count
    is reduced ON DEVICE — under a mesh sharding the batch axis is
    sharded and XLA inserts the psum for the sum (SURVEY.md §3.4: the
    only cross-device control point), so only one scalar comes home.
    """
    import jax.numpy as jnp

    def one_clip(wins):
        probs = jax.vmap(
            lambda w: classify_window(w, variables, model, cfg))(wins)
        return probs.mean(0)

    clip_probs = jax.vmap(one_clip)(windows)          # (B, C)
    preds = clip_probs.argmax(-1)
    correct = jnp.sum(jnp.where(valid, preds == labels, False))
    return correct, preds


def evaluate_batched(records: List[ClipRecord], variables,
                     model: TwoStreamModel, cfg: PipelineConfig,
                     batch_clips: int = 8,
                     num_workers: int = 2,
                     mesh=None,
                     max_frames: int = 300,
                     num_windows: int = 1,
                     host_resize: bool = False,
                     transport_crop: bool = True) -> EvalResult:
    """Throughput-oriented eval: threaded decode (ingest.prefetch_clips)
    → `num_windows` evenly-spaced snippet windows per clip → batches of
    `batch_clips` clips per launch (amortises dispatch), optionally
    sharded over a mesh's 'data' axis with the accuracy reduction on
    device.

    Protocol-identical to evaluate(num_windows=N); decode failures are
    contained in the workers and reported per path in result.failures.

    transport_crop=True (default) slices each decoded window in the
    decode worker to the exact source region the fused resize+crop
    samples (ingest.slice_crop_source) so only consumed pixels cross
    the host→HBM transport — bit-identical results (the device applies
    the same fractional offsets via PreprocessConfig.src_hw), ~0.6x
    transfer bytes at SD source resolutions.  Requires the clips in a
    batch to share one resolution (mixed resolutions already cannot
    np.stack into one batch).
    """
    import jax.numpy as jnp
    from video_analytics_tpu.ingest.prefetch import prefetch_clips
    from video_analytics_tpu.io.video import decode_snippet_windows
    from video_analytics_tpu.parallel.mesh import (
        data_sharding, replicated)

    win = max(cfg.window, cfg.preprocess.flow_stack + 1)
    by_path = {r.path: r for r in records}
    if mesh is not None:
        # One compiled shape: batches always pad to batch_clips, which
        # must shard evenly over the data axis.
        ddim = int(mesh.devices.shape[0])
        batch_clips = ((batch_clips + ddim - 1) // ddim) * ddim

    if cfg.preprocess.random_crop:
        transport_crop = False      # needs the full frame on device

    def loader(path):
        # Snippet windows only — decode_snippet_windows seeks past the
        # frames the protocol never consumes (the host-decode Amdahl
        # term of this driver).
        wins = decode_snippet_windows(path, win, num_windows,
                                      max_frames=max_frames)
        if host_resize:
            # Pre-resize in the decode worker: numerics-matched to the
            # device resize (cv2 INTER_LINEAR parity), cuts host→HBM
            # bandwidth ~(H/short)² for high-res clips.
            from video_analytics_tpu.ingest import host_resize_short
            wins = np.stack([host_resize_short(w,
                                               cfg.preprocess.resize_short)
                             for w in wins])
        if transport_crop:
            from video_analytics_tpu.ingest import slice_crop_source
            wins, hw = slice_crop_source(wins, cfg.preprocess.resize_short,
                                         cfg.preprocess.crop)
            return wins, hw
        return wins, None

    if mesh is not None:
        variables = jax.device_put(variables, replicated(mesh))

    result = EvalResult()
    pending: List = []
    # Per-batch `correct` counts stay ON DEVICE until the very end:
    # fetching the scalar inside flush() would block the consumer
    # thread on the batch's completion (one transport RTT + the device
    # work) before the next batch could even be dispatched — deferring
    # the fetches lets dispatches pipeline on the device stream while
    # the decode workers keep feeding.
    #
    # Measured dead end (r3, keep it dead): staging the device_put on
    # a separate DevicePrefetcher thread (decode ∥ transfer ∥ dispatch)
    # REGRESSED clips/sec 27.9 → 17-18 on the 1-core host — the extra
    # thread only adds GIL/scheduler contention, while device_put is
    # already asynchronous from this consumer thread (the decode
    # workers keep feeding through prefetch_clips' queue meanwhile).
    correct_parts: List = []

    def flush():
        if not pending:
            return
        paths, winss, hws = zip(*pending)
        pending.clear()
        if len(set(hws)) != 1:
            raise ValueError(
                f"clips in a batch must share one resolution, got "
                f"source sizes {sorted(set(hws))}")
        if hws[0] is None:
            batch_cfg = cfg
        else:
            batch_cfg = dataclasses.replace(
                cfg, preprocess=dataclasses.replace(
                    cfg.preprocess, src_hw=hws[0]))
        n = len(winss)
        arr = np.stack(winss)                     # (n, N, T, H, W, 3)
        labels = np.asarray([by_path[p].label for p in paths], np.int32)
        valid = np.ones(n, bool)
        if n < batch_clips:                       # pad → one XLA program
            pad = batch_clips - n
            arr = np.concatenate([arr, np.repeat(arr[-1:], pad, 0)])
            labels = np.concatenate([labels, np.zeros(pad, np.int32)])
            valid = np.concatenate([valid, np.zeros(pad, bool)])
        if mesh is not None:
            arr = jax.device_put(jnp.asarray(arr),
                                 data_sharding(mesh, arr.ndim))
            labels = jax.device_put(jnp.asarray(labels),
                                    data_sharding(mesh, 1))
            valid_d = jax.device_put(jnp.asarray(valid),
                                     data_sharding(mesh, 1))
        else:
            arr = jnp.asarray(arr)
            labels = jnp.asarray(labels)
            valid_d = jnp.asarray(valid)
        correct, _ = _batch_clip_metrics(arr, labels, valid_d,
                                         variables, model, batch_cfg)
        result.total += n
        correct_parts.append(correct)

    for path, (wins, hw), _dt in prefetch_clips(
            [r.path for r in records], loader,
            num_workers=num_workers, error_log=result.failures):
        pending.append((path, wins, hw))
        if len(pending) >= batch_clips:
            flush()
    flush()
    result.correct = sum(int(c) for c in correct_parts)
    result.failed = len(result.failures)
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
                result.failures.append((rec.path, repr(e)))
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
