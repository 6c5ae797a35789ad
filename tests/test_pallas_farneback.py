"""Fused Farneback Pallas kernels vs the XLA reference stages
(interpret mode; compiled path exercised by the TPU bench)."""

import cv2
import numpy as np
import jax.numpy as jnp

from tests.fixtures import smooth_pair
from video_analytics_tpu.config import FarnebackConfig
from video_analytics_tpu.flow.farneback import (
    farneback, poly_expansion, update_matrices, _blur_M, _solve_flow)
from video_analytics_tpu.ops.pallas.farneback_kernels import (
    farneback_stage_fits_vmem, poly_expansion_pallas, update_flow_pallas)


def test_poly_expansion_matches(rng):
    img = jnp.asarray(rng.uniform(0, 255, (2, 48, 64)).astype(np.float32))
    a = np.asarray(poly_expansion(img, 5, 1.2))
    b = np.asarray(poly_expansion_pallas(img, 5, 1.2))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_poly_expansion_n7(rng):
    img = jnp.asarray(rng.uniform(0, 255, (1, 40, 48)).astype(np.float32))
    a = np.asarray(poly_expansion(img, 7, 1.5))
    b = np.asarray(poly_expansion_pallas(img, 7, 1.5))
    np.testing.assert_allclose(a, b, atol=1e-4)


def _realistic_M(rng, h=48, w=64):
    f1, f2 = smooth_pair(rng, h, w, dx=1.0, dy=0.5)
    R0 = poly_expansion(jnp.asarray(f1[None]), 5, 1.2)
    R1 = poly_expansion(jnp.asarray(f2[None]), 5, 1.2)
    return update_matrices(R0, R1, jnp.zeros((1, h, w, 2)),
                           use_pallas=False)


def test_update_flow_matches(rng):
    M = _realistic_M(rng)
    cfg = FarnebackConfig()
    a = np.asarray(_solve_flow(_blur_M(M, cfg)))
    b = np.asarray(update_flow_pallas(M, cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_update_flow_gaussian_window(rng):
    M = _realistic_M(rng)
    cfg = FarnebackConfig(gaussian_window=True)
    a = np.asarray(_solve_flow(_blur_M(M, cfg)))
    b = np.asarray(update_flow_pallas(M, cfg))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_all_pallas_cv2_parity(rng):
    """End-to-end farneback with every Pallas kernel forced on keeps
    cv2 parity (same gate as the XLA path)."""
    f1, f2 = smooth_pair(rng, 96, 128, dx=2.3, dy=-1.1)
    u1, u2 = f1.astype(np.uint8), f2.astype(np.uint8)
    ref = cv2.calcOpticalFlowFarneback(u1, u2, None, 0.5, 3, 15, 3, 5,
                                       1.2, 0)
    ours = np.asarray(farneback(
        jnp.asarray(u1[None].astype(np.float32)),
        jnp.asarray(u2[None].astype(np.float32)),
        FarnebackConfig(), use_pallas=True))[0]
    epe = np.linalg.norm(ours - ref, axis=-1)
    rel = np.linalg.norm(ours - ref) / np.linalg.norm(ref)
    assert rel < 0.03, rel
    assert epe[8:-8, 8:-8].mean() < 0.01


def test_sep_corr_mixed_uniform_windows(rng):
    """One input channel correlated with TWO different uniform (box)
    window lengths, smaller first: the binary-doubling window-sum
    cache must grow for the later, larger window instead of silently
    decomposing it over too-small partial sums."""
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        sep_corr2d_pallas)
    x = jnp.asarray(rng.uniform(0, 1, (1, 1, 40, 256))
                    .astype(np.float32))
    k_small, k_big = 9, 21
    plan = ((0, tuple([1.0 / k_small] * k_small)),
            (0, tuple([1.0 / k_big] * k_big)))
    out = np.asarray(sep_corr2d_pallas(x, plan, ((0, (1.0,)),
                                                 (1, (1.0,)))))
    xn = np.asarray(x)[0, 0]
    # The kernel pads by the plan-global radius r = max(k)//2 and
    # applies EVERY output's taps at pad[row : row + k] — mirror that.
    rg = k_big // 2
    padded = np.pad(xn, ((rg, rg), (0, 0)), mode="edge")
    for o, k in [(0, k_small), (1, k_big)]:
        ref = np.stack([padded[i:i + k].mean(0) for i in
                        range(xn.shape[0])])  # box corr along rows
        np.testing.assert_allclose(out[0, o], ref, atol=1e-5)


def test_fits_vmem():
    # Row-banding makes all realistic sizes fit.
    assert farneback_stage_fits_vmem(224, 224)
    assert farneback_stage_fits_vmem(240, 320)
    assert farneback_stage_fits_vmem(1080, 1920)


def test_update_flow_fused_matches_composition():
    """The fused [normal-eq + v-avg] → [h-avg + solve] kernel pair
    (update_flow_fused_pallas) must equal the unfused composition
    (_normal_equations in XLA → update_flow_pallas) — same f32
    formulas, two tracers."""
    import jax
    import jax.numpy as jnp
    from video_analytics_tpu.config import FarnebackConfig
    from video_analytics_tpu.flow.farneback import (
        _border_attenuation, _normal_equations, _oob_mask)
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        update_flow_fused_pallas, update_flow_pallas)

    rng = np.random.default_rng(11)
    B, H, W = 2, 48, 64
    R0 = jnp.asarray(rng.normal(0, 2, (B, 5, H, W)).astype(np.float32))
    R1w = jnp.asarray(rng.normal(0, 2, (B, 5, H, W)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 3, (B, 2, H, W)).astype(np.float32))
    for gaussian in (False, True):
        cfg = FarnebackConfig(gaussian_window=gaussian, winsize=13)
        dx, dy = flow[:, 0], flow[:, 1]
        inb = _oob_mask(dx, dy, H, W)
        M = jnp.stack(_normal_equations(
            tuple(R0[:, i] for i in range(5)),
            tuple(R1w[:, i] for i in range(5)), dx, dy, inb,
            _border_attenuation(H, W)[None]), axis=1)
        ref = np.asarray(update_flow_pallas(M, cfg, cf=True))
        out = np.asarray(update_flow_fused_pallas(R0, R1w, flow, cfg))
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5,
                                   err_msg=f"gaussian={gaussian}")


def test_wspace_iteration_matches_fused():
    """The W-space fused iteration (warp col-pass + normal equations +
    h-window-avg in one kernel, then v-avg + solve) must equal the r3
    fused iteration — same per-pixel f32 ops, horizontal-first window
    averaging is a pure accumulation reorder."""
    import jax.numpy as jnp
    from video_analytics_tpu.config import FarnebackConfig
    from video_analytics_tpu.flow.farneback import (
        _fused_iteration, _fused_iteration_wspace, _wspace_ok)
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        poly_expansion_pallas)

    rng = np.random.default_rng(7)
    B, H, W = 2, 48, 64
    I0 = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))
    I1 = jnp.asarray(rng.uniform(0, 255, (B, H, W)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 3, (B, 2, H, W)).astype(np.float32))
    band = 16
    for gaussian, poly_n, sigma in ((False, 5, 1.2), (True, 5, 1.2),
                                    (False, 7, 1.5)):
        cfg = FarnebackConfig(gaussian_window=gaussian, poly_n=poly_n,
                              poly_sigma=sigma, winsize=13)
        assert _wspace_ok(H, W, band, cfg)
        R0 = poly_expansion_pallas(I0, poly_n, sigma, cf=True)
        R1 = poly_expansion_pallas(I1, poly_n, sigma, cf=True)
        R0T = poly_expansion_pallas(I0, poly_n, sigma, layout="cf_t")
        old = np.asarray(_fused_iteration(R0, R1, flow, cfg, band))
        new = np.asarray(_fused_iteration_wspace(R0T, R1, flow, cfg,
                                                 band))
        np.testing.assert_allclose(
            new, old, atol=2e-5, rtol=1e-5,
            err_msg=f"gaussian={gaussian} poly_n={poly_n}")


def test_poly_expansion_layouts(rng):
    """cf_t is the transpose of cf; cf_both returns both consistently."""
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        poly_expansion_pallas)
    img = jnp.asarray(rng.uniform(0, 255, (2, 40, 56)).astype(np.float32))
    R = np.asarray(poly_expansion_pallas(img, 5, 1.2, cf=True))
    RT = np.asarray(poly_expansion_pallas(img, 5, 1.2, layout="cf_t"))
    np.testing.assert_array_equal(RT, R.transpose(0, 1, 3, 2))
    Rb, RTb = poly_expansion_pallas(img, 5, 1.2, layout="cf_both")
    np.testing.assert_array_equal(np.asarray(Rb), R)
    np.testing.assert_array_equal(np.asarray(RTb), RT)


def test_warp_v_cf_is_row_pass():
    """pallas_warp_v_cf with dx=0 completes to the same result as the
    full separable warp (the column pass is then the identity)."""
    from video_analytics_tpu.ops.pallas.warp import (
        pallas_warp_cf, pallas_warp_v_cf)
    rng = np.random.default_rng(3)
    B, C, H, W = 1, 3, 40, 48
    img = jnp.asarray(rng.uniform(0, 255, (B, C, H, W)).astype(np.float32))
    dy = jnp.asarray(rng.normal(0, 2, (B, H, W)).astype(np.float32))
    zero = jnp.zeros((B, H, W), jnp.float32)
    full = np.asarray(pallas_warp_cf(img, zero, dy, r=8))
    vonly = np.asarray(pallas_warp_v_cf(img, dy, r=8))
    np.testing.assert_allclose(vonly, full, atol=1e-6)


def test_wspace_gate_rejects_1080p():
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        warp_neq_corr_fits)
    assert not warp_neq_corr_fits(1080, 1920, 24, 15)
    assert warp_neq_corr_fits(224, 224, 24, 15)
