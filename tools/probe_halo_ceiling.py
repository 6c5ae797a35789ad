"""Ceiling probe for halo-elimination schemes in the banded 1080p
TV-L1 solver (VERDICT r3 next #5): time one _run_chunk dispatch at the
production geometry (band=?, chunk=20, halo=24) vs the same chunk with
halo forced to the 8-row DMA-alignment minimum.  The halo-8 variant is
numerically WRONG (interior invalidated) but timing-valid — it is the
upper bound on what ANY boundary-exchange scheme could recover, since
exchange still pays >= the 8-aligned window DMA and all interior
compute.  Run alone on the TPU."""
import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuva_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from video_analytics_tpu.config import TVL1Config
from video_analytics_tpu.ops.pallas import tvl1_solve as ts

B, H, W = 4, 1080, 1920
cfg = TVL1Config()
band, chunk = ts.banded_params(H, W, cfg)
print(f"banded_params -> band={band} chunk={chunk}", file=sys.stderr)

results = {}
rng = np.random.default_rng(0)


def time_chunk(halo, iters, do_median):
    NB = -(-H // band)
    Hpad = NB * band + 2 * halo
    Wp = W
    mk = lambda: jnp.asarray(
        rng.normal(0, 0.5, (B, Hpad, Wp)).astype(np.float32))
    state6 = [mk() for _ in range(6)]
    grad = jnp.asarray(
        rng.uniform(0.1, 4.0, (B, Hpad, Wp)).astype(np.float32))
    consts4 = [mk(), mk(), grad, mk()]
    act = jnp.ones((B * NB,), jnp.int32)

    @jax.jit
    def run(s6):
        out, err = ts._run_chunk(list(s6), consts4, act, cfg, iters,
                                 H, W, band, halo, NB, do_median)
        return out[0], err

    o, e = run(state6)
    float(o.sum())
    times = []
    for i in range(3):
        s6 = [state6[0].at[0, 0, 0].add(float(i))] + state6[1:]
        t0 = time.perf_counter()
        outs = [run([s6[0].at[0, 0, 0].add(float(j))] + s6[1:])
                for j in range(3)]
        float(sum(o[0].sum() for o in outs))
        times.append((time.perf_counter() - t0) / 3)
    return float(np.median(times))


for name, halo, iters, med in (
        ("halo24_med", 24, chunk, True),      # production first chunk
        ("halo24", 24, chunk, False),         # production later chunk
        ("halo8", 8, chunk, False),           # exchange-scheme ceiling
        ("halo16", 16, chunk, False)):        # mid-point
    try:
        dt = time_chunk(halo, iters, med)
        results[name] = round(1e3 * dt, 2)
        print(f"{name}: {results[name]} ms", file=sys.stderr, flush=True)
    except Exception as e:
        results[name] = f"FAILED: {e!r}"[:200]
        print(f"{name} failed: {e!r}", file=sys.stderr, flush=True)

print(json.dumps({"band": band, "chunk": chunk, "B": B, **results}))
