"""Flow quality/throughput shoot-out: SpyNet vs TV-L1 vs Farneback on
shared synthetic content (VERDICT r2 weak #7: 'learned flow at N
pairs/s cannot be weighed against TV-L1 without a quality table').

Measures, per algorithm, on the SAME ground-truth pairs:
  - EPE on pure-affine motion (global translation + linear term)
  - EPE on moving-object motion (local_blobs=2 — the action-video regime)
  - pairs/s at 224x224 batch 16 (wall, grouped dispatch)

Run on the TPU: `python tools/flow_quality.py [--spynet-checkpoint P]`
Prints a JSON line + a markdown table for STATUS.md.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuva_jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spynet-checkpoint", default=None)
    ap.add_argument("--hw", type=int, default=224)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--val-batches", type=int, default=4)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from video_analytics_tpu.config import FarnebackConfig, TVL1Config
    from video_analytics_tpu.flow.farneback import farneback_jit
    from video_analytics_tpu.flow.tvl1 import tvl1_jit
    from video_analytics_tpu.models.spynet import (
        SpyNet, default_spynet_checkpoint, init_spynet, synthetic_pair)
    from video_analytics_tpu.runtime.checkpoint import load_variables

    hw = (args.hw, args.hw)
    model = SpyNet(levels=4)
    ckpt = args.spynet_checkpoint or default_spynet_checkpoint()
    params = load_variables(
        ckpt, {"params": init_spynet(model, jax.random.PRNGKey(0))
               ["params"]})["params"]
    spynet_fn = jax.jit(lambda a, b: model.apply({"params": params},
                                                 a, b))
    fb_fn = jax.jit(lambda a, b: farneback_jit(a, b, FarnebackConfig()))
    tv_fn = jax.jit(lambda a, b: tvl1_jit(a, b, TVL1Config()))
    algos = {"spynet": spynet_fn, "tvl1": tv_fn, "farneback": fb_fn}

    results = {}
    for name, fn in algos.items():
        res = {}
        for regime, blobs in (("affine", 0), ("blobs", 2)):
            epes = []
            for i in range(args.val_batches):
                key = jax.random.fold_in(
                    jax.random.PRNGKey(777 + blobs), i)
                prev, nxt, gt = synthetic_pair(key, args.batch, *hw,
                                               local_blobs=blobs)
                flow = fn(prev, nxt)
                epe = jnp.mean(jnp.sqrt(
                    jnp.sum((flow - gt) ** 2, -1) + 1e-12))
                epes.append(float(epe))
            res[f"epe_{regime}"] = round(float(np.mean(epes)), 4)
        # Throughput: grouped dispatch, perturbed inputs (see bench.py).
        key = jax.random.PRNGKey(5)
        prev, nxt, _ = synthetic_pair(key, args.batch, *hw,
                                      local_blobs=2)
        float(fn(prev, nxt).sum())                    # compile
        float(fn(prev.at[0, 0, 0].add(1.0), nxt).sum())
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [fn(prev.at[0, 0, 0].add(float(i)), nxt)
                    for i in range(args.reps)]
            float(sum(o.sum() for o in outs))
            best = min(best, (time.perf_counter() - t0) / args.reps)
        res["pairs_per_sec"] = round(args.batch / best, 1)
        results[name] = res
        print(f"{name}: {res}", flush=True)

    print(json.dumps({"hw": args.hw, "batch": args.batch,
                      "spynet_checkpoint": ckpt, **results}))
    print("\n| algo | EPE affine | EPE blobs | pairs/s @224² |")
    print("|---|---|---|---|")
    for name, r in results.items():
        print(f"| {name} | {r['epe_affine']} | {r['epe_blobs']} | "
              f"{r['pairs_per_sec']} |")


if __name__ == "__main__":
    main()
