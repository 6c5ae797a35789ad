"""Train the SpyNet-style learned flow on synthetic motion (VERDICT r2
next #9: include the `local_blobs` moving-object regime, then compare
against TV-L1/Farneback on shared content — see tools/flow_quality.py).

Run on the TPU (plain `python`, no pytest env):
    nohup python tools/train_spynet.py --steps 4000 --local-blobs 2 \
        --out /tmp/spynet_blobs.msgpack > /tmp/spynet_train.log 2>&1 &

The shipped checkpoint is video_analytics_tpu/checkpoints_data/
spynet_synthetic.msgpack; replace it only if blob-motion val EPE beats
the incumbent (the script prints both).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuva_jax_cache")


def val_epe(model, params, key, batches: int = 8, batch: int = 8,
            hw=(64, 64), local_blobs: int = 0) -> float:
    """Mean EPE over held-out synthetic pairs of a given regime."""
    import jax
    import jax.numpy as jnp
    from video_analytics_tpu.models.spynet import synthetic_pair

    @jax.jit
    def epe_batch(params, key):
        prev, nxt, gt = synthetic_pair(key, batch, *hw,
                                       local_blobs=local_blobs)
        flow = model.apply({"params": params}, prev, nxt)
        return jnp.mean(jnp.sqrt(jnp.sum((flow - gt) ** 2, -1) + 1e-8))

    total = 0.0
    for i in range(batches):
        total += float(epe_batch(params, jax.random.fold_in(key, i)))
    return total / batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=64)
    ap.add_argument("--hw-mix", default=None,
                    help="comma list of extra square sizes to round-robin"
                         " (e.g. 128,224) — resolution-robust training; "
                         "batch is scaled down to hold pixels/step "
                         "roughly constant")
    ap.add_argument("--local-blobs", type=int, default=2,
                    help="moving-object translations per synthetic pair")
    ap.add_argument("--mix-affine", type=float, default=0.5,
                    help="fraction of steps trained on pure-affine "
                         "pairs (keeps the global-motion regime sharp)")
    ap.add_argument("--full-affine", action="store_true",
                    help="rotation+zoom similarity fields instead of "
                         "the diagonal linear term (r5: the regime the "
                         "r4 held-out eval showed the ckpt losing on)")
    ap.add_argument("--hard-objects", type=int, default=0,
                    help="sharp-edged occluding squares per pair on a "
                         "third of the non-affine steps (r5)")
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--out", required=True)
    ap.add_argument("--init", default=None,
                    help="warm-start checkpoint (e.g. the shipped one)")
    args = ap.parse_args()

    import jax
    import optax
    from video_analytics_tpu.models.spynet import (
        SpyNet, init_spynet, make_spynet_train_step)
    from video_analytics_tpu.runtime.checkpoint import (
        load_variables, save_variables)

    model = SpyNet(levels=args.levels)
    key = jax.random.PRNGKey(args.seed)
    params = init_spynet(model, key)["params"]
    if args.init:
        params = load_variables(args.init, {"params": params})["params"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    hw = (args.hw, args.hw)
    sizes = [args.hw] + ([int(s) for s in args.hw_mix.split(",")]
                         if args.hw_mix else [])
    steps_by_size = {}
    for s in sizes:
        # Hold pixels/step ~constant across sizes so large sizes don't
        # dominate wall time (min batch 2).
        b = max(2, int(round(args.batch * (args.hw / s) ** 2)))
        fa = args.full_affine
        step_list = [
            make_spynet_train_step(model, tx, batch=b, hw=(s, s),
                                   local_blobs=args.local_blobs,
                                   full_affine=fa),
            # Affine steps alternate similarity (rotation+zoom) and
            # diagonal (anisotropic-scale) fields when --full-affine is
            # set, so neither global regime is forgotten.
            make_spynet_train_step(model, tx, batch=b, hw=(s, s),
                                   local_blobs=0, full_affine=fa),
            make_spynet_train_step(model, tx, batch=b, hw=(s, s),
                                   local_blobs=0, full_affine=False)]
        step_list.append(make_spynet_train_step(
            model, tx, batch=b, hw=(s, s), local_blobs=1,
            full_affine=fa, hard_objects=args.hard_objects)
            if args.hard_objects else None)
        steps_by_size[s] = step_list

    t0 = time.time()
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        step_list = steps_by_size[sizes[i % len(sizes)]]
        step_blobs, step_affine, step_diag, step_hard = step_list
        if (i % 100) < args.mix_affine * 100:
            step = step_diag if (args.full_affine and i % 2) \
                else step_affine
        elif step_hard is not None and i % 2:
            step = step_hard             # occluding hard squares
        else:
            step = step_blobs
        params, opt_state, loss, epe = step(params, opt_state, sub)
        if (i + 1) % 200 == 0:
            print(f"step {i + 1}: loss {float(loss):.4f} "
                  f"epe {float(epe):.4f} "
                  f"({(time.time() - t0) / (i + 1):.3f}s/step)",
                  flush=True)

    vkey = jax.random.PRNGKey(args.seed + 1234)

    def report(tag, p):
        for s in sizes:
            vb = max(2, int(round(8 * (64 / s) ** 2)))
            aff = val_epe(model, p, vkey, hw=(s, s), batch=vb,
                          local_blobs=0)
            blb = val_epe(model, p, vkey, hw=(s, s), batch=vb,
                          local_blobs=max(1, args.local_blobs))
            print(f"{tag} EPE @{s}: affine {aff:.4f}  blobs {blb:.4f}",
                  flush=True)

    report("val", params)
    save_variables(args.out, {"params": params})
    print(f"saved {args.out}")

    # Incumbent comparison on the same val draws.
    try:
        from video_analytics_tpu.models.spynet import \
            default_spynet_checkpoint
        inc = load_variables(default_spynet_checkpoint(),
                             {"params": init_spynet(
                                 SpyNet(levels=args.levels),
                                 jax.random.PRNGKey(0))["params"]})
        report("incumbent", inc["params"])
    except FileNotFoundError:
        print("no incumbent checkpoint to compare")


if __name__ == "__main__":
    main()
