"""Flow quality/throughput shoot-out: SpyNet vs TV-L1 vs Farneback on
shared synthetic content (VERDICT r2 weak #7: 'learned flow at N
pairs/s cannot be weighed against TV-L1 without a quality table').

Measures, per algorithm, on the SAME ground-truth pairs:
  - EPE on pure-affine motion (global translation + linear term)
  - EPE on moving-object motion (local_blobs=2 — the action-video regime)
  - **held-out families the SpyNet training generator CANNOT produce**
    (VERDICT r3 weak #4 — the affine/blobs rows are within SpyNet's
    training distribution, so they alone would be circular):
      * rotzoom — rotation+zoom with analytic ground truth (the
        tests/test_tvl1.py anchor rig); the generator emits only
        translation+linear-term affine and smooth Gaussian-blob fields.
      * squares — occlusion-heavy textured squares translating over a
        differently-textured static background: hard flow
        discontinuities + genuinely occluded/disoccluded pixels.
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


def _rotzoom_batch(rng, batch, h, w):
    """Rotation+zoom pairs with analytic GT: next(q) = prev(M q) →
    flow(p) = M⁻¹p − p (tests/test_tvl1.py anchor convention).  Border
    pixels rotate out of frame, so EPE is evaluated 12 px inside."""
    import cv2
    import numpy as np
    from tests.fixtures import smooth_image

    prevs, nxts, gts = [], [], []
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    for _ in range(batch):
        img = smooth_image(rng, h, w, pad=0)
        theta = np.deg2rad(rng.uniform(-2.5, 2.5))
        s = rng.uniform(0.96, 1.06)
        cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
        R = s * np.array([[np.cos(theta), -np.sin(theta)],
                          [np.sin(theta), np.cos(theta)]])
        t = np.array([cx, cy]) - R @ np.array([cx, cy])
        M = np.float32(np.hstack([R, t[:, None]]))
        nxt = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_CUBIC
                             | cv2.WARP_INVERSE_MAP)
        Minv = np.linalg.inv(np.vstack([M, [0, 0, 1]]))
        gt_x = Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2] - xs
        gt_y = Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2] - ys
        prevs.append(img)
        nxts.append(nxt)
        gts.append(np.stack([gt_x, gt_y], -1).astype(np.float32))
    return (np.stack(prevs), np.stack(nxts), np.stack(gts))


def _squares_batch(rng, batch, h, w, size=40):
    """Occlusion-heavy pairs: a textured square translating (dx, dy)
    over a DIFFERENTLY-textured static background.  GT flow is (dx, dy)
    inside the prev-frame square and 0 elsewhere — including the
    newly-occluded/disoccluded strips, where no algorithm can be exact;
    that ambiguity is the point of the regime."""
    import numpy as np
    from tests.fixtures import smooth_image

    prevs, nxts, gts = [], [], []
    for _ in range(batch):
        bg = smooth_image(rng, h, w, pad=0) * 0.55
        tex = smooth_image(rng, size, size, blur=7, pad=0) * 0.5 + 120
        dx = int(rng.choice([-6, -4, -3, 3, 4, 6]))
        dy = int(rng.choice([-6, -4, -3, 3, 4, 6]))
        x = int(rng.integers(12, w - size - 12 - abs(dx)))
        y = int(rng.integers(12, h - size - 12 - abs(dy)))
        prev = bg.copy()
        prev[y:y + size, x:x + size] = tex
        nxt = bg.copy()
        nxt[y + dy:y + dy + size, x + dx:x + dx + size] = tex
        gt = np.zeros((h, w, 2), np.float32)
        gt[y:y + size, x:x + size] = (dx, dy)
        prevs.append(prev.astype(np.float32))
        nxts.append(nxt.astype(np.float32))
        gts.append(gt)
    return (np.stack(prevs), np.stack(nxts), np.stack(gts))


def _largedisp_batch(rng, batch, h, w):
    """Large-displacement pairs (NEW held-out family, r5): global
    translations of 8-16 px — far beyond the training generator's
    ±3 px translation + small linear/object terms.  GT analytic."""
    import numpy as np
    from tests.fixtures import smooth_image

    prevs, nxts, gts = [], [], []
    for _ in range(batch):
        pad = 20
        big = smooth_image(rng, h + 2 * pad, w + 2 * pad, pad=0)
        dx = int(rng.choice([-16, -12, -9, 9, 12, 16]))
        dy = int(rng.choice([-14, -10, -8, 8, 10, 14]))
        prev = big[pad:pad + h, pad:pad + w]
        # prev(p) = nxt(p + d)  →  nxt(q) = prev(q - d) = big[... - d]
        nxt = big[pad - dy:pad - dy + h, pad - dx:pad - dx + w]
        gt = np.full((h, w, 2), (dx, dy), np.float32)
        prevs.append(prev.astype(np.float32))
        nxts.append(nxt.astype(np.float32))
        gts.append(gt)
    return np.stack(prevs), np.stack(nxts), np.stack(gts)


def _brightness_batch(rng, batch, h, w):
    """Brightness-change pairs (NEW held-out family, r5): small global
    translation + a gain/offset change between the frames — violates
    the brightness-constancy assumption every method here leans on,
    and the training generator never perturbs intensity."""
    import numpy as np
    from tests.fixtures import smooth_image

    prevs, nxts, gts = [], [], []
    for _ in range(batch):
        pad = 8
        big = smooth_image(rng, h + 2 * pad, w + 2 * pad, pad=0)
        dx = int(rng.choice([-3, -2, 2, 3]))
        dy = int(rng.choice([-3, -2, 2, 3]))
        gain = float(rng.uniform(0.8, 1.2))
        off = float(rng.uniform(-15, 15))
        prev = big[pad:pad + h, pad:pad + w]
        nxt = big[pad - dy:pad - dy + h, pad - dx:pad - dx + w]
        nxt = np.clip(nxt * gain + off, 0, 255)
        gts.append(np.full((h, w, 2), (dx, dy), np.float32))
        prevs.append(prev.astype(np.float32))
        nxts.append(nxt.astype(np.float32))
    return np.stack(prevs), np.stack(nxts), np.stack(gts)


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
        # Held-out (out-of-training-distribution) families.  r5: the
        # r4 hard families (rotzoom, squares) entered the TRAINING
        # generator (synthetic_pair full_affine/hard_objects), so two
        # NEW families keep the evaluation honest: large-displacement
        # and brightness-change (VERDICT r4 task 6).
        for regime, gen, crop in (("rotzoom", _rotzoom_batch, 12),
                                  ("squares", _squares_batch, 0),
                                  ("largedisp", _largedisp_batch, 18),
                                  ("brightness", _brightness_batch, 6)):
            rng = np.random.default_rng(123)
            epes = []
            for _ in range(max(1, args.val_batches // 2)):
                prev, nxt, gt = gen(rng, args.batch, *hw)
                flow = np.asarray(fn(jnp.asarray(prev),
                                     jnp.asarray(nxt)))
                e = np.sqrt(((flow - gt) ** 2).sum(-1) + 1e-12)
                if crop:
                    e = e[:, crop:-crop, crop:-crop]
                epes.append(float(e.mean()))
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
    print("\n| algo | EPE affine | EPE blobs | EPE rotzoom | "
          "EPE squares | EPE largedisp† | EPE brightness† | "
          "pairs/s @224² |")
    print("|---|---|---|---|---|---|---|---|")
    for name, r in results.items():
        print(f"| {name} | {r['epe_affine']} | {r['epe_blobs']} | "
              f"{r['epe_rotzoom']} | {r['epe_squares']} | "
              f"{r['epe_largedisp']} | {r['epe_brightness']} | "
              f"{r['pairs_per_sec']} |")
    print("\n† held-out from the r5 training generator (rotzoom/"
          "squares are now IN-distribution via synthetic_pair "
          "full_affine/hard_objects; largedisp and brightness-change "
          "remain families it cannot produce).")


if __name__ == "__main__":
    main()
