"""Roofline / MFU accounting for the hot programs (VERDICT r3 missing
#4: "nothing says how fast the framework is relative to the CHIP").

For each hot program this measures wall time per call (deep dispatch
groups through the tunnel, same discipline as bench.py) and reads the
compiled executable's own cost model (``Compiled.cost_analysis()``:
FLOPs + HBM bytes accessed), then places the program on the v5e
roofline:

  - achieved TFLOP/s and MFU (vs the MXU bf16 peak for CNN stages,
    vs the ~VPU f32 peak for the flow kernels — flow is shift-add VPU
    work by design, the MXU has nothing to do there)
  - achieved GB/s vs HBM peak (the usual TPU bound)
  - arithmetic intensity (FLOP/byte) vs the machine balance point,
    i.e. which roof the program sits under

Peaks used (public v5e-1 numbers; VPU is an estimate):
  MXU bf16  197 TFLOP/s      HBM  819 GB/s
  VPU f32   ~2 TFLOP/s  (8x128 lanes x ~940MHz x 2 FLOP/lane, est.)

Run ALONE on the TPU: `python tools/roofline.py [--skip-1080p] [--reps N]`
Prints one JSON line + a markdown table for STATUS.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuva_jax_cache")

MXU_PEAK = 197e12          # v5e bf16
VPU_PEAK = 2e12            # est. f32 VPU
HBM_PEAK = 819e9


def _cost(compiled):
    """(flops, bytes) from the executable's cost analysis (defensive:
    key spelling has drifted across jax versions)."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", ca.get("bytes_accessed", 0.0)))
    return flops, byts


def measure(name, fn, args, perturb, reps=8, passes=3, unit_calls=1):
    """Compile fn(*args); return dict with wall ms/call (median of
    `passes` deep groups of `reps` dispatches, each perturbed so
    identical re-dispatches cannot alias) + the executable's cost."""
    import jax
    import numpy as np

    jfn = jax.jit(fn)
    lowered = jfn.lower(*args)
    compiled = lowered.compile()
    flops, byts = _cost(compiled)
    out = jfn(*args)
    float(jax.tree.leaves(out)[0].sum())          # warm
    times = []
    for _ in range(passes):
        t0 = time.perf_counter()
        outs = [jfn(*perturb(args, i)) for i in range(reps)]
        float(sum(jax.tree.leaves(o)[0].sum() for o in outs))
        times.append((time.perf_counter() - t0) / reps)
    dt = float(np.median(times)) / unit_calls
    return {"name": name, "ms": round(1e3 * dt, 3),
            "gflop": round(flops / unit_calls / 1e9, 2),
            "gb": round(byts / unit_calls / 1e9, 3),
            "tflops": round(flops / unit_calls / dt / 1e12, 2),
            "gbps": round(byts / unit_calls / dt / 1e9, 1),
            "intensity": round(flops / max(byts, 1.0), 1),
            "mfu_mxu_pct": round(100 * flops / unit_calls / dt
                                 / MXU_PEAK, 1),
            "mfu_vpu_pct": round(100 * flops / unit_calls / dt
                                 / VPU_PEAK, 1),
            "hbm_pct": round(100 * byts / unit_calls / dt
                             / HBM_PEAK, 1)}


def dataclasses_replace_preprocess(cfg, src_hw):
    import dataclasses
    return dataclasses.replace(cfg, preprocess=dataclasses.replace(
        cfg.preprocess, src_hw=src_hw))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-1080p", action="store_true",
                    help="skip the ~6min fresh TV-L1 1080p compile")
    ap.add_argument("--reps", type=int, default=8,
                    help="dispatches per timed group for the cheap "
                    "(ms-scale) programs; the ~25ms tunnel fetch RTT "
                    "rides once per GROUP, so residue/call ~ RTT/reps "
                    "(slow programs use reps/2, 1080p stays at 2)")
    args = ap.parse_args()
    R = max(2, args.reps)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import make_frames, FLOW_STACK, N_FRAMES, SRC_H, SRC_W
    from video_analytics_tpu.config import PipelineConfig, TVL1Config
    from video_analytics_tpu.models.two_stream import TwoStreamModel
    from video_analytics_tpu.ops import preprocess as pp
    from video_analytics_tpu.runtime.pipeline import (
        classify_batch, compute_flow_sequence)
    from video_analytics_tpu.flow.tvl1 import tvl1_jit

    cfg = PipelineConfig(flow_algo="farneback")
    model = TwoStreamModel.create(num_classes=101, flow_stack=FLOW_STACK,
                                  dtype=jnp.bfloat16)
    variables = model.init_variables(jax.random.PRNGKey(0))
    frames = jnp.asarray(make_frames(N_FRAMES, SRC_H, SRC_W))

    def pert_first(a, i):
        return (a[0].at[(0,) * a[0].ndim].add(i),) + tuple(a[1:])

    rows = []

    # 1. The headline program (bench.measure_tpu's `features`).
    def features(frames_u8):
        x = pp.resize_short_center_crop(
            frames_u8, cfg.preprocess.resize_short, cfg.preprocess.crop)
        gray = pp.rgb_to_gray(x)
        flow = compute_flow_sequence(gray, cfg, bounded=True)
        stacks = pp.stacked_flow_input(flow, FLOW_STACK,
                                       dtype=jnp.bfloat16)
        f_feats = model.temporal.apply(variables["temporal"], stacks,
                                       return_features=True)
        rgb = pp.normalize(x, cfg.preprocess.mean, cfg.preprocess.std)
        r_feats = model.spatial.apply(variables["spatial"], rgb,
                                      return_features=True)
        return f_feats, r_feats
    rows.append(measure("headline_64f", features, (frames,),
                        pert_first, reps=R))

    # 2. Stage split (compiled separately; co-fusion across stage
    # boundaries is lost, so the parts can sum slightly above the
    # whole — stated in STATUS).
    x224 = pp.resize_short_center_crop(frames, 256, 224)
    gray = pp.rgb_to_gray(x224)
    gray = jax.block_until_ready(gray)

    def preproc(f):
        x = pp.resize_short_center_crop(f, 256, 224)
        return (pp.normalize(x, cfg.preprocess.mean, cfg.preprocess.std)
                .astype(jnp.bfloat16), pp.rgb_to_gray(x))
    rows.append(measure("preproc_resize_crop", preproc, (frames,),
                        pert_first, reps=R))

    def flow_seq(g):
        return compute_flow_sequence(g, cfg, bounded=True)
    rows.append(measure("farneback_seq_64p", flow_seq, (gray,),
                        pert_first, reps=R))

    flow = jax.block_until_ready(flow_seq(gray))

    def flow_stack_cnn(fl):
        stacks = pp.stacked_flow_input(fl, FLOW_STACK,
                                       dtype=jnp.bfloat16)
        return model.temporal.apply(variables["temporal"], stacks,
                                    return_features=True)
    rows.append(measure("flow_cnn_55x224", flow_stack_cnn, (flow,),
                        pert_first, reps=R))

    rgb_in = jax.block_until_ready(
        pp.normalize(x224, cfg.preprocess.mean, cfg.preprocess.std))

    def rgb_cnn(x):
        return model.spatial.apply(variables["spatial"], x,
                                   return_features=True)
    rows.append(measure("rgb_cnn_65x224", rgb_cnn, (rgb_in,),
                        pert_first, reps=R))

    # 3. TV-L1 224² (the shipped default flow).
    tcfg = TVL1Config()
    prev, nxt = gray[:-1], gray[1:]

    def tvl1_224(a, b):
        return tvl1_jit(a, b, tcfg)
    rows.append(measure("tvl1_64p_224", tvl1_224, (prev, nxt),
                        pert_first, reps=max(2, R // 2)))

    # 3b. The batched-eval executable (the clips/sec device program —
    # VERDICT r4 task 3: the one metric exercising the whole system had
    # no roofline row).  Same batch geometry as bench's clips leg:
    # 8 clips × 1 window × 16 frames, transport-cropped 240×320 source.
    from video_analytics_tpu.runtime.evaluate import (
        _batch_clip_metrics, _place_batch)
    ecfg = PipelineConfig(flow_algo="farneback", window=16)
    from video_analytics_tpu.ingest import slice_crop_source
    wins8 = np.stack([make_frames(16, SRC_H, SRC_W, seed=10 + i)
                      for i in range(8)])[:, None]   # (8, 1, 16, H, W, 3)
    wins8c, hw8 = slice_crop_source(
        wins8.reshape(8, 16, SRC_H, SRC_W, 3), 256, 224)
    wins8c = wins8c[:, None]
    ecfg_t = dataclasses_replace_preprocess(ecfg, hw8)
    labels8 = np.zeros(8, np.int32)
    valid8 = np.ones(8, bool)
    arr_d, labels_d, valid_d = _place_batch(wins8c, labels8, valid8,
                                            None)

    def eval_batch(a):
        c, _ = _batch_clip_metrics(a, labels_d, valid_d, variables,
                                   model, ecfg_t)
        return c

    rows.append(measure("eval_batch_8clips", eval_batch, (arr_d,),
                        pert_first, reps=R))

    # 4. Sustained-1080p classify (transport-cropped shape).
    import dataclasses
    from video_analytics_tpu.ingest import (host_resize_short,
                                            slice_crop_source)
    scfg = PipelineConfig(flow_algo="farneback", window=16)
    stream = make_frames(16 * 4, 1080, 1920, seed=3)
    wins = np.stack([stream[i * 16:(i + 1) * 16] for i in range(4)])
    small = np.stack([host_resize_short(w, 256) for w in wins])
    small, hw = slice_crop_source(small, 256, 224)
    cfg_t = dataclasses.replace(scfg, preprocess=dataclasses.replace(
        scfg.preprocess, src_hw=hw))
    sj = jnp.asarray(small)

    def sustained(wb):
        return classify_batch(wb, variables, model, cfg_t)
    rows.append(measure("sustained_1080p_b4x16", sustained, (sj,),
                        pert_first, reps=max(2, R // 2)))

    # 5. Native-1080p TV-L1 (the banded Pallas solver), B=4.
    if not args.skip_1080p:
        import cv2
        rng = np.random.default_rng(1)
        big = cv2.GaussianBlur(
            rng.uniform(0, 255, (1080 + 64, 1920 + 64))
            .astype(np.float32), (15, 15), 0)
        p1 = jnp.asarray(np.stack(
            [big[16 + i:16 + i + 1080, 16:16 + 1920] for i in range(4)]))
        n1 = jnp.asarray(np.stack(
            [big[14 + i:14 + i + 1080, 18:18 + 1920] for i in range(4)]))

        def tvl1_1080(a, b):
            return tvl1_jit(a, b, tcfg)
        for attempt in range(3):      # remote-compile helper retries
            try:
                rows.append(measure("tvl1_1080p_b4", tvl1_1080,
                                    (p1, n1), pert_first, reps=2,
                                    passes=2))
                break
            except Exception as e:
                if attempt == 2:
                    print(f"tvl1_1080p failed: {e!r}", file=sys.stderr)

    print(json.dumps({"rows": rows, "peaks": {
        "mxu_bf16_tflops": MXU_PEAK / 1e12,
        "vpu_f32_tflops_est": VPU_PEAK / 1e12,
        "hbm_gbps": HBM_PEAK / 1e9}}))
    print("\n| program | ms/call | GFLOP | GB | TFLOP/s | GB/s | "
          "FLOP/B | MFU(MXU)% | of VPU-peak% | of HBM% |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['name']} | {r['ms']} | {r['gflop']} | {r['gb']} | "
              f"{r['tflops']} | {r['gbps']} | {r['intensity']} | "
              f"{r['mfu_mxu_pct']} | {r['mfu_vpu_pct']} | "
              f"{r['hbm_pct']} |")


if __name__ == "__main__":
    main()
