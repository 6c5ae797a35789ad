"""TV-L1 tests: agreement with the independent numpy oracle, known
ground-truth motion recovery, and median filter parity vs cv2
(BASELINE.json config #3)."""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from tests.fixtures import smooth_pair
from tests.np_tvl1 import tvl1_np
from video_analytics_tpu.config import TVL1Config
from video_analytics_tpu.flow import tvl1, tvl1_jit
from video_analytics_tpu.ops.median import median_filter2d


# Small config keeps the CPU oracle fast; same spec as the defaults.
FAST = TVL1Config(nscales=3, warps=2, outer_iterations=4,
                  inner_iterations=10, median_filtering=5)


def test_matches_numpy_oracle(rng):
    f1, f2 = smooth_pair(rng, 64, 80, dx=1.4, dy=-0.8)
    ref = tvl1_np(f1, f2, FAST)
    ours = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                           FAST))[0]
    epe = np.linalg.norm(ours - ref, axis=-1)
    assert epe.mean() < 5e-3, epe.mean()
    assert epe.max() < 0.1, epe.max()


def test_matches_numpy_oracle_no_median(rng):
    cfg = TVL1Config(nscales=2, warps=2, outer_iterations=3,
                     inner_iterations=8, median_filtering=0)
    f1, f2 = smooth_pair(rng, 48, 64, dx=0.9, dy=0.6)
    ref = tvl1_np(f1, f2, cfg)
    ours = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                           cfg))[0]
    epe = np.linalg.norm(ours - ref, axis=-1)
    assert epe.mean() < 5e-3, epe.mean()


def test_ground_truth_translation(rng):
    f1, f2 = smooth_pair(rng, 96, 128, dx=2.3, dy=-1.1)
    out = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                          TVL1Config()))[0]
    inner = out[10:-10, 10:-10]
    np.testing.assert_allclose(inner.reshape(-1, 2).mean(0),
                               [2.3, -1.1], atol=0.15)
    epe = np.linalg.norm(inner - np.array([2.3, -1.1]), axis=-1)
    assert epe.mean() < 0.12, epe.mean()


def test_batched_jit(rng):
    f1, f2 = smooth_pair(rng, 48, 64, dx=1.0, dy=0.5)
    prev = jnp.stack([jnp.asarray(f1)] * 2)
    nxt = jnp.stack([jnp.asarray(f2)] * 2)
    out = tvl1_jit(prev, nxt, FAST)
    assert out.shape == (2, 48, 64, 2)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]),
                               atol=1e-6)


def test_rotation_zoom_ground_truth(rng):
    """Oracle de-correlation anchor (VERDICT r1 #9): np_tvl1 is the
    builder's own port of the IPOL spec, so TV-L1 is additionally
    checked against ANALYTIC ground truth on non-translational motion
    (rotation + zoom), which neither implementation was tuned on.
    Farneback is held to the same anchor as a cross-check."""
    from video_analytics_tpu.config import FarnebackConfig
    from video_analytics_tpu.flow import farneback
    from tests.fixtures import smooth_image

    h, w = 96, 128
    img = smooth_image(rng, h, w, pad=0)
    # next(q) = prev(M q): rotation 1.2° + zoom 1.03 about the center.
    theta = np.deg2rad(1.2)
    s = 1.03
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    R = s * np.array([[np.cos(theta), -np.sin(theta)],
                      [np.sin(theta), np.cos(theta)]])
    t = np.array([cx, cy]) - R @ np.array([cx, cy])
    M = np.float32(np.hstack([R, t[:, None]]))
    nxt = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_CUBIC
                         | cv2.WARP_INVERSE_MAP)
    # prev(p) = next(p + f(p)) with next(q) = prev(Mq) → f = M⁻¹p − p.
    Minv = np.linalg.inv(np.vstack([M, [0, 0, 1]]))
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    gt_x = Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2] - xs
    gt_y = Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2] - ys
    gt = np.stack([gt_x, gt_y], axis=-1).astype(np.float32)

    prev_j = jnp.asarray(img[None])
    nxt_j = jnp.asarray(nxt[None])
    for name, flow, gate in [
            ("tvl1", np.asarray(tvl1(prev_j, nxt_j, TVL1Config()))[0],
             0.08),
            ("farneback", np.asarray(farneback(
                prev_j, nxt_j, FarnebackConfig()))[0], 0.12)]:
        epe = np.linalg.norm((flow - gt)[12:-12, 12:-12], axis=-1)
        assert epe.mean() < gate, (name, epe.mean())
        assert epe.max() < 0.6, (name, epe.max())


def test_banded_solver_bitexact_vs_monolithic(rng):
    """The row-banded chunked solver (large-plane path, VERDICT r1 #2)
    must match the whole-plane VMEM kernel to within compiler fp
    contraction — the halos are sized so banding never changes a
    single interior value mathematically, including with the median
    filter and the ε convergence gate engaged.  (The two programs have
    different op graphs since the err-on-last-step-only optimisation,
    so XLA's fma contraction under --xla_allow_excess_precision may
    round single ops differently: observed ulp-level 9e-9, gated at
    1e-6 absolute on O(0.1) values.)"""
    from video_analytics_tpu.ops.pallas.tvl1_solve import (
        tvl1_solve_warp, tvl1_solve_warp_banded)

    B, H, W = 2, 61, 96
    I1wx = jnp.asarray(rng.normal(0, 1, (B, H, W)).astype(np.float32))
    I1wy = jnp.asarray(rng.normal(0, 1, (B, H, W)).astype(np.float32))
    grad = I1wx ** 2 + I1wy ** 2
    rho = jnp.asarray(rng.normal(0, 1, (B, H, W)).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 0.5, (B, H, W)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (B, H, W)).astype(np.float32))

    for cfg, band, chunk in [
            # no early exit, ragged last band, chunk not dividing K
            (TVL1Config(inner_iterations=7, outer_iterations=3,
                        epsilon=1e-6, median_filtering=0), 16, 3),
            # median + convergence gate engaged mid-run
            (TVL1Config(inner_iterations=5, outer_iterations=4,
                        epsilon=0.05, median_filtering=5), 24, 2),
            # chunk == K: the whole round (median + all inner
            # iterations) in ONE kernel dispatch (banded_params picks
            # 2-dispatch rounds at 1080p since the r3 sweep recalibration
            # — the first case above covers chunk < K with a remainder)
            (TVL1Config(inner_iterations=6, outer_iterations=2,
                        epsilon=1e-6, median_filtering=5), 24, 6),
    ]:
        u1, v1 = tvl1_solve_warp(I1wx, I1wy, grad, rho, u, v, cfg)
        u2, v2 = tvl1_solve_warp_banded(I1wx, I1wy, grad, rho, u, v,
                                        cfg, band=band, chunk=chunk,
                                        adaptive=False)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                                   atol=1e-6, rtol=0)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=1e-6, rtol=0)


def test_banded_params_vmem_envelope():
    """Every (band, chunk) the cost model picks must fit the measured
    scoped-VMEM envelope: modeled rows × the worst-case calibration
    factor ≤ the 100MB scoped limit (r3: a pick modeled at 88.4MB
    compiled to a 100.61MiB Mosaic stack and OOMed — this pins the
    invariant so future cost-model retunes can't reintroduce it)."""
    from video_analytics_tpu.ops.pallas.tvl1_solve import (
        banded_params, _BANDED_SCOPED_BYTES, _BANDED_TEMP_PLANES,
        _BANDED_VMEM_FACTOR)
    cfg = TVL1Config()
    shapes = [(1080, 1920), (864, 1536), (691, 1229), (553, 983),
              (442, 786), (512, 512), (720, 1280), (2160, 3840),
              (601, 333), (1080, 607)]
    picked = 0
    for h, w in shapes:
        bp = banded_params(h, w, cfg)
        if bp is None:
            continue
        picked += 1
        band, chunk = bp
        halo = -(-(chunk + 4) // 8) * 8
        assert band >= halo and band % 8 == 0
        wp = -(-w // 128) * 128
        rows = (10 + _BANDED_TEMP_PLANES) * (band + 2 * halo) + 6 * band
        assert (rows * 4 * wp * _BANDED_VMEM_FACTOR
                <= _BANDED_SCOPED_BYTES), (h, w, bp)
    assert picked >= 8    # the model must band all the big shapes


def test_banded_solver_adaptive(rng):
    """Convergence-adaptive banding (VERDICT r2 next #5).

    (a) While no band meets the ε criterion the adaptive path takes no
    skips, so it is BIT-IDENTICAL to the non-adaptive solver.
    (b) With the gate engaged mid-run, skipped bands only forgo updates
    whose band mean-square is already < ε² — cv2's own stop criterion —
    so the deviation from the monolithic kernel must stay of order ε."""
    from video_analytics_tpu.ops.pallas.tvl1_solve import (
        tvl1_solve_warp, tvl1_solve_warp_banded)

    B, H, W = 2, 61, 96
    I1wx = jnp.asarray(rng.normal(0, 1, (B, H, W)).astype(np.float32))
    I1wy = jnp.asarray(rng.normal(0, 1, (B, H, W)).astype(np.float32))
    grad = I1wx ** 2 + I1wy ** 2
    rho = jnp.asarray(rng.normal(0, 1, (B, H, W)).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 0.5, (B, H, W)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (B, H, W)).astype(np.float32))

    # (a) gate never fires → adaptive == non-adaptive exactly.
    cfg = TVL1Config(inner_iterations=7, outer_iterations=3,
                     epsilon=1e-6, median_filtering=0)
    ua, va = tvl1_solve_warp_banded(I1wx, I1wy, grad, rho, u, v, cfg,
                                    band=16, chunk=3, adaptive=True)
    un, vn = tvl1_solve_warp_banded(I1wx, I1wy, grad, rho, u, v, cfg,
                                    band=16, chunk=3, adaptive=False)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(un))
    np.testing.assert_array_equal(np.asarray(va), np.asarray(vn))

    # (b) gate engaged: deviation from the monolithic kernel bounded
    # by the declared-converged update scale.
    cfg = TVL1Config(inner_iterations=5, outer_iterations=6,
                     epsilon=0.05, median_filtering=5)
    um, vm = tvl1_solve_warp(I1wx, I1wy, grad, rho, u, v, cfg)
    ua, va = tvl1_solve_warp_banded(I1wx, I1wy, grad, rho, u, v, cfg,
                                    band=16, chunk=5, adaptive=True)
    du = np.abs(np.asarray(ua) - np.asarray(um)).max()
    dv = np.abs(np.asarray(va) - np.asarray(vm)).max()
    assert du < 10 * cfg.epsilon, du
    assert dv < 10 * cfg.epsilon, dv


def test_banded_solver_in_driver(rng):
    """Full tvl1 driver with the banded path forced must match the XLA
    reference driver closely (same algorithm, SOLVER kernel path
    swapped; the warp is pinned to the exact gather in both runs so
    only the solver differs — use_pallas=True otherwise swaps the
    Pallas warp in too).

    Two gates: with adaptive banding OFF the banded chain is exact
    (≤1e-4); with the default ADAPTIVE banding the skipped band
    updates are each below cv2's own ε stop criterion, so the driver
    deviation is bounded at the 10·ε scale (same bound as
    test_banded_solver_adaptive (b) — on some inputs bands do skip
    while the reference keeps iterating, and ~ε-scale deviation is the
    designed trade)."""
    import functools as ft
    import video_analytics_tpu.ops.pallas.tvl1_solve as ts
    import video_analytics_tpu.ops.pallas.warp as pw

    cfg = TVL1Config(nscales=2, warps=2, outer_iterations=3,
                     inner_iterations=6, median_filtering=5)
    f1, f2 = smooth_pair(rng, 48, 64, dx=1.0, dy=0.5)
    ref = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                          cfg, use_pallas=False))
    orig_fits, orig_params = ts.solver_fits_vmem, ts.banded_params
    orig_warp_fits = pw.warp_fits_vmem
    orig_banded = ts.tvl1_solve_warp_banded
    ts.solver_fits_vmem = lambda *a: False
    ts.banded_params = lambda h, w, c: (16, 4)
    pw.warp_fits_vmem = lambda *a, **k: False
    try:
        out_adaptive = np.asarray(tvl1(jnp.asarray(f1[None]),
                                       jnp.asarray(f2[None]), cfg,
                                       use_pallas=True))
        ts.tvl1_solve_warp_banded = ft.partial(orig_banded,
                                               adaptive=False)
        out_exact = np.asarray(tvl1(jnp.asarray(f1[None]),
                                    jnp.asarray(f2[None]), cfg,
                                    use_pallas=True))
    finally:
        ts.solver_fits_vmem, ts.banded_params = orig_fits, orig_params
        pw.warp_fits_vmem = orig_warp_fits
        ts.tvl1_solve_warp_banded = orig_banded
    epe = np.linalg.norm(out_exact - ref, axis=-1)
    assert epe.max() < 1e-4, epe.max()
    epe_a = np.linalg.norm(out_adaptive - ref, axis=-1)
    assert epe_a.max() < 10 * cfg.epsilon, epe_a.max()


def test_median_filter_matches_cv2(rng):
    x = rng.uniform(-5, 5, (40, 56)).astype(np.float32)
    ours = np.asarray(median_filter2d(jnp.asarray(x[None]), 5))[0]
    ref = cv2.medianBlur(x, 5)
    # cv2.medianBlur uses BORDER_REPLICATE for float input too;
    # interiors must match exactly.
    np.testing.assert_allclose(ours[2:-2, 2:-2], ref[2:-2, 2:-2], atol=1e-6)


def test_median_filter_3x3_full(rng):
    x = rng.uniform(-5, 5, (20, 24)).astype(np.float32)
    ours = np.asarray(median_filter2d(jnp.asarray(x[None]), 3))[0]
    ref = cv2.medianBlur(x, 3)
    np.testing.assert_allclose(ours[1:-1, 1:-1], ref[1:-1, 1:-1], atol=1e-6)


def test_median_selection_network(rng):
    """The pruned Batcher selection network (ops/median) returns the
    exact median for random and heavily-tied inputs, for both filter
    sizes, and is materially smaller than a full sort network."""
    from video_analytics_tpu.ops.median import (_median_network,
                                                _median_select)
    for k2, max_ces in ((9, 25), (25, 120)):
        network, wire = _median_network(k2)
        ces = sum(1 for i, j in network if j >= 0)
        assert ces <= max_ces, (k2, ces)
        x = rng.standard_normal((3000, k2)).astype(np.float32)
        got = np.asarray(_median_select(jnp.asarray(x)))
        np.testing.assert_array_equal(got, np.median(x, axis=-1))
        t = rng.integers(0, 3, (3000, k2)).astype(np.float32)
        got_t = np.asarray(_median_select(jnp.asarray(t)))
        np.testing.assert_array_equal(got_t, np.median(t, axis=-1))


def test_packed_solver_matches_single(rng):
    """The lane-packed solver (r5: n images side by side along the
    lane axis, amortising Mosaic's 128-lane padding) must match n
    independent whole-plane solves.  With the ε exit disabled the two
    programs run identical round counts and identical per-pixel f32
    ops (the seam rolls are discarded by the same border selects), so
    the comparison is gated at fp-contraction level like the banded
    test; a second case engages the per-image ε gates + freeze path."""
    from video_analytics_tpu.ops.pallas.tvl1_solve import (
        tvl1_solve_warp, tvl1_solve_warp_packed)

    B, H, W = 4, 40, 48
    I1wx = jnp.asarray(rng.normal(0, 1, (B, H, W)).astype(np.float32))
    I1wy = jnp.asarray(rng.normal(0, 1, (B, H, W)).astype(np.float32))
    grad = I1wx ** 2 + I1wy ** 2
    rho = jnp.asarray(rng.normal(0, 1, (B, H, W)).astype(np.float32))
    u = jnp.asarray(rng.normal(0, 0.5, (B, H, W)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 0.5, (B, H, W)).astype(np.float32))
    from video_analytics_tpu.flow.tvl1 import _pack_lanes, _unpack_lanes

    for cfg, n in [
            (TVL1Config(inner_iterations=6, outer_iterations=3,
                        epsilon=1e-12, median_filtering=5), 2),
            (TVL1Config(inner_iterations=6, outer_iterations=3,
                        epsilon=1e-12, median_filtering=0), 4),
            # per-image ε gates engage at different rounds
            (TVL1Config(inner_iterations=4, outer_iterations=5,
                        epsilon=0.05, median_filtering=5), 2),
    ]:
        u1, v1 = tvl1_solve_warp(I1wx, I1wy, grad, rho, u, v, cfg)
        args = [_pack_lanes(x, n)
                for x in (I1wx, I1wy, grad, rho, u, v)]
        u2, v2 = tvl1_solve_warp_packed(*args, cfg, n_img=n, w_img=W)
        u2 = _unpack_lanes(u2, n)
        v2 = _unpack_lanes(v2, n)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                                   atol=1e-6, rtol=0)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=1e-6, rtol=0)


def test_packed_warp_bitexact(rng):
    """pallas_warp_cf with w_img set (lane-packed planes) must equal
    the per-image unpacked warp bit-exactly — only the offset planes
    change, and every sample stays inside its own image."""
    from video_analytics_tpu.flow.tvl1 import _pack_lanes, _unpack_lanes
    from video_analytics_tpu.ops.pallas.warp import pallas_warp_cf

    B, C, H, W, r = 4, 3, 40, 48, 9
    img = jnp.asarray(rng.uniform(0, 255, (B, C, H, W))
                      .astype(np.float32))
    dx = jnp.asarray(rng.normal(0, 3, (B, H, W)).astype(np.float32))
    dy = jnp.asarray(rng.normal(0, 3, (B, H, W)).astype(np.float32))
    ref = pallas_warp_cf(img, dx, dy, r=r)
    for n in (2, 4):
        pk = lambda x: jnp.stack(
            [_pack_lanes(x[:, c], n) for c in range(C)], axis=1)
        out = pallas_warp_cf(pk(img), _pack_lanes(dx, n),
                             _pack_lanes(dy, n), r=r, w_img=W)
        out = jnp.stack([_unpack_lanes(out[:, c], n)
                         for c in range(C)], axis=1)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_packed_in_driver(rng):
    """Full tvl1() with lane packing engaged (B=4, small plane: strict
    lane gain at every level) vs the same content with packing forced
    off — per-image results equal up to the ε-sum reduction order."""
    import video_analytics_tpu.ops.pallas.tvl1_solve as ts

    pairs = [smooth_pair(rng, 48, 56, dx=1.0 + 0.2 * i, dy=-0.5)
             for i in range(4)]
    f1 = np.stack([p[0] for p in pairs])
    f2 = np.stack([p[1] for p in pairs])
    cfg = TVL1Config(nscales=2, warps=2, outer_iterations=3,
                     inner_iterations=6, median_filtering=5)
    assert ts.pack_choice(48, 56, 4, 5) > 1
    # scale_fused=False in BOTH arms: this test pins the per-warp
    # chain's lane packing; the whole-scale kernel has its own tests.
    packed = np.asarray(tvl1(jnp.asarray(f1), jnp.asarray(f2), cfg,
                             use_pallas=True, scale_fused=False))
    orig = ts.pack_choice
    ts.pack_choice = lambda *a, **k: 1
    try:
        single = np.asarray(tvl1(jnp.asarray(f1), jnp.asarray(f2), cfg,
                                 use_pallas=True, scale_fused=False))
    finally:
        ts.pack_choice = orig
    np.testing.assert_allclose(packed, single, atol=1e-4, rtol=0)


@pytest.mark.parametrize("batch", [2, 1])
def test_scale_fused_matches_perwarp_chain(rng, batch):
    """Full tvl1() with the whole-scale fused kernel
    (tvl1_solve.tvl1_scale_pallas, r5b: warp + grad/rho prep + all
    primal-dual rounds + scale-end median in ONE pallas_call per scale)
    vs the shipped per-warp chain — the same f32 op chain up to FMA
    contraction in the grad/rho prep (in-kernel in the fused path,
    XLA-fused in the chain), which compounds through the scale loop to
    ~2e-5; bit-identical on the real TPU (STATUS A/B).  batch=2
    exercises the lane-packed arm (n_scale=2), batch=1 the unpacked
    arm (n_scale=1; 1 is also below the batch-rounding threshold)."""
    import video_analytics_tpu.ops.pallas.tvl1_solve as ts

    pairs = [smooth_pair(rng, 96, 120, dx=1.2 + 0.3 * i, dy=-0.7)
             for i in range(batch)]
    f1 = jnp.asarray(np.stack([p[0] for p in pairs]))
    f2 = jnp.asarray(np.stack([p[1] for p in pairs]))
    cfg = TVL1Config(nscales=3, warps=3, outer_iterations=4,
                     inner_iterations=2, median_filtering=3)
    expected_pack = 2 if batch % 2 == 0 else 1
    assert ts.scale_pack_choice(96, 120, batch, 3, 32) == expected_pack
    fused = np.asarray(tvl1(f1, f2, cfg, use_pallas=True,
                            scale_fused=True))
    chain = np.asarray(tvl1(f1, f2, cfg, use_pallas=True,
                            scale_fused=False))
    np.testing.assert_allclose(fused, chain, atol=1e-4, rtol=0)


def test_batch_rounding_exact(rng):
    """Batch rounding (r5c: odd Pallas batches are padded with dummy
    dup pairs to a multiple of 4 so the lane-packed kernels can
    engage, then sliced back) must be exact for the real pairs: B=3
    auto-pads to 4 and packs n=4 — compare per image against the
    unpadded B=1 path (n=1, below the rounding threshold)."""
    pairs = [smooth_pair(rng, 64, 80, dx=0.8 + 0.3 * i, dy=0.4 - 0.2 * i)
             for i in range(3)]
    f1 = jnp.asarray(np.stack([p[0] for p in pairs]))
    f2 = jnp.asarray(np.stack([p[1] for p in pairs]))
    cfg = TVL1Config(nscales=2, warps=2, outer_iterations=3,
                     inner_iterations=4, median_filtering=3)
    batched = np.asarray(tvl1(f1, f2, cfg, use_pallas=True))
    for i in range(3):
        single = np.asarray(tvl1(f1[i:i + 1], f2[i:i + 1], cfg,
                                 use_pallas=True))[0]
        np.testing.assert_allclose(batched[i], single, atol=1e-4,
                                   rtol=0)


def test_scale_fused_gate_raises(rng):
    """scale_fused=True must fail loudly when the whole-scale kernel's
    VMEM gate rejects a level instead of silently falling back."""
    import video_analytics_tpu.ops.pallas.tvl1_solve as ts

    f1, f2 = smooth_pair(rng, 48, 64, dx=1.0, dy=0.5)
    cfg = TVL1Config(nscales=2, warps=2, outer_iterations=3,
                     inner_iterations=4, median_filtering=3)
    orig = ts.scale_pack_choice
    ts.scale_pack_choice = lambda *a, **k: 0
    try:
        with pytest.raises(ValueError, match="whole-scale"):
            tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]), cfg,
                 use_pallas=True, scale_fused=True)
    finally:
        ts.scale_pack_choice = orig


def test_scale_fused_no_median(rng):
    """median_filtering=0 skips the in-kernel scale-end median on both
    paths; the fused kernel must honour it (final_median branch)."""
    f1, f2 = smooth_pair(rng, 64, 80, dx=0.8, dy=0.4)
    cfg = TVL1Config(nscales=2, warps=2, outer_iterations=3,
                     inner_iterations=4, median_filtering=0)
    fused = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                            cfg, use_pallas=True, scale_fused=True))
    chain = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                            cfg, use_pallas=True, scale_fused=False))
    np.testing.assert_allclose(fused, chain, atol=1e-5, rtol=0)
