"""North-star benchmark: frames/sec/chip (decode-excluded) for dense
optical flow + CNN feature extraction, vs the measured CPU reference.

The reference pipeline (cv2 Farneback + torch-CPU ResNet-18) publishes
no numbers (BASELINE.md), so its throughput is MEASURED here on the
same host, on the same frames, at the same 224x224 resolution, then
compared with the fused TPU pipeline (gray → Farneback flow → stacked
flow features, + RGB features; all one jit program per stage).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuva_jax_cache")

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

H, W = 224, 224          # both pipelines run at the standard crop size
N_FRAMES = 65            # frames per measured chunk (64 flow pairs)
CPU_PAIRS = 6            # CPU reference sample size (it's slow)
FLOW_STACK = 10


def make_frames(n, h, w, seed=0):
    """Synthetic UCF101-like content: band-limited moving texture."""
    import cv2
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h + 64, w + 64, 3)).astype(np.float32)
    base = cv2.GaussianBlur(base, (11, 11), 0)
    frames = []
    for t in range(n):
        dx, dy = int(2 * t) % 40, int(1.3 * t) % 40
        frames.append(base[dy:dy + h, dx:dx + w].astype(np.uint8))
    return np.stack(frames)


def measure_cpu_reference(frames):
    """cv2 Farneback + torch ResNet-18 (CPU), per-frame, like the
    reference scripts: returns frames/sec (decode-excluded)."""
    import cv2
    import torch
    from tests.torch_resnet import random_torch_resnet18

    gray = [cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in frames]
    model = random_torch_resnet18(seed=0)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    n = CPU_PAIRS
    # Warm up torch once (thread pools etc).
    with torch.no_grad():
        model(torch.zeros(1, 3, H, W))
    # Host wall time is noisy on this 1-core box: best of 3 passes.
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for i in range(n):
            cv2.calcOpticalFlowFarneback(gray[i], gray[i + 1], None,
                                         0.5, 3, 15, 3, 5, 1.2, 0)
            x = (frames[i].astype(np.float32) / 255.0 - mean) / std
            with torch.no_grad():
                model(torch.from_numpy(x.transpose(2, 0, 1)[None]),
                      return_features=True)
        best = min(best, time.perf_counter() - t0)
    return n / best


def measure_tpu(frames):
    """Fused TPU pipeline: flow + flow-stream features + RGB features
    for a chunk of frames; returns frames/sec/chip steady-state."""
    import jax
    import jax.numpy as jnp
    from video_analytics_tpu.config import (
        FarnebackConfig, PipelineConfig, PreprocessConfig)
    from video_analytics_tpu.models.two_stream import TwoStreamModel
    from video_analytics_tpu.flow.farneback import farneback
    from video_analytics_tpu.ops import preprocess as pp

    cfg = PipelineConfig(flow_algo="farneback")
    model = TwoStreamModel.create(num_classes=101, flow_stack=FLOW_STACK,
                                  dtype=jnp.bfloat16)
    variables = model.init_variables(jax.random.PRNGKey(0))

    @jax.jit
    def features(frames_u8):
        gray = pp.rgb_to_gray(frames_u8)
        flow = farneback(gray[:-1], gray[1:], cfg.farneback)
        stacks = pp.stack_flow_windows(flow, FLOW_STACK)
        stacks = pp.normalize_flow_stack(stacks)
        f_feats = model.temporal.apply(variables["temporal"], stacks,
                                       return_features=True)
        rgb = pp.normalize(frames_u8, cfg.preprocess.mean,
                           cfg.preprocess.std)
        r_feats = model.spatial.apply(variables["spatial"], rgb,
                                      return_features=True)
        return f_feats, r_feats

    x = jnp.asarray(frames)
    jax.block_until_ready(features(x))  # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(features(x))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return (len(frames) - 1) / dt


def measure_tvl1(frames):
    """TV-L1 throughput (BASELINE config #3): fused Pallas solver."""
    import jax
    import jax.numpy as jnp
    from video_analytics_tpu.config import TVL1Config
    from video_analytics_tpu.flow.tvl1 import tvl1_jit
    from video_analytics_tpu.ops import rgb_to_gray

    gray = jnp.asarray(np.stack(frames[:33])).astype(jnp.float32)
    gray = rgb_to_gray(gray)
    cfg = TVL1Config()
    prev, nxt = gray[:-1], gray[1:]
    jax.block_until_ready(tvl1_jit(prev, nxt, cfg))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(tvl1_jit(prev, nxt, cfg))
        times.append(time.perf_counter() - t0)
    return 32 / min(times)


def measure_sustained_1080p():
    """BASELINE config #5: sustained 1080p sliding-window two-stream
    pipeline — host windows + double-buffered prefetch feeding the
    fused classifier; frames/sec decode-excluded."""
    import jax
    import jax.numpy as jnp
    from video_analytics_tpu.config import (
        FarnebackConfig, PipelineConfig)
    from video_analytics_tpu.ingest import (
        DevicePrefetcher, sliding_windows)
    from video_analytics_tpu.models.two_stream import TwoStreamModel
    from video_analytics_tpu.runtime.pipeline import classify_window

    from video_analytics_tpu.runtime.pipeline import classify_batch

    cfg = PipelineConfig(flow_algo="farneback", window=16)
    model = TwoStreamModel.create(num_classes=101, flow_stack=FLOW_STACK,
                                  dtype=jnp.bfloat16)
    variables = model.init_variables(jax.random.PRNGKey(0))
    stream = make_frames(128, 1080, 1920, seed=3)
    WB = 4  # windows per device batch: amortises kernel dispatch

    def run_once():
        n_frames = 0
        wins = list(sliding_windows(stream, cfg.window, cfg.window))
        batches = [np.stack(wins[i:i + WB])
                   for i in range(0, len(wins) - WB + 1, WB)]
        for wb in DevicePrefetcher(batches, depth=2):
            probs = classify_batch(wb, variables, model, cfg)
            n_frames += WB * cfg.window
        jax.block_until_ready(probs)
        return n_frames

    run_once()                      # compile
    best = 0.0
    # Wall time through the tunnel is noisy (shared transport): take
    # the best of three timed passes as the capability number.
    for _ in range(3):
        t0 = time.perf_counter()
        n = run_once()
        best = max(best, n / (time.perf_counter() - t0))
    return best


def main():
    frames = make_frames(N_FRAMES, H, W)
    # Sustained runs FIRST: the other measurements leave live device
    # buffers/executables that measurably degrade the large-shape
    # pipeline afterwards (HBM fragmentation through the tunnel).
    try:
        sustained = round(measure_sustained_1080p(), 2)
    except Exception:
        sustained = None
    cpu_fps = measure_cpu_reference(frames)
    tpu_fps = measure_tpu(frames)
    try:
        tvl1_pps = round(measure_tvl1(frames), 2)
    except Exception:
        tvl1_pps = None
    print(json.dumps({
        "metric": "frames_per_sec_per_chip_flow_plus_features",
        "value": round(tpu_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(tpu_fps / cpu_fps, 2),
        "cpu_reference_fps": round(cpu_fps, 2),
        "tvl1_pairs_per_sec_224": tvl1_pps,
        "sustained_1080p_two_stream_fps": sustained,
    }))


if __name__ == "__main__":
    main()
