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


def test_tsolve_kernel_bitexact():
    """corr_solve_from_T (in-kernel transpose + v-avg + solve) must be
    BIT-exact to [XLA transpose → sep-corr solve2x2] — same f32 ops,
    only the layout restore moves in-kernel."""
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        _sep_corr_axis_any, corr_solve_from_T_pallas)
    rng = np.random.default_rng(11)
    g = np.exp(-0.5 * (np.arange(-7, 8) / 2.1) ** 2)
    for taps in (tuple([1.0 / 15] * 15),
                 tuple(float(t) for t in g / g.sum())):
        for (B, W, H) in ((2, 64, 48), (1, 96, 120)):
            hT = jnp.asarray(
                rng.normal(0, 2, (B, 5, W, H)).astype(np.float32))
            new = np.asarray(corr_solve_from_T_pallas(hT, taps))
            plan = tuple((c, taps) for c in range(5))
            old = np.asarray(_sep_corr_axis_any(
                hT.transpose(0, 1, 3, 2), plan, epilogue="solve2x2"))
            np.testing.assert_array_equal(new, old)


def test_tsolve_warp_kernel_matches():
    """corr_solve_warp_from_T must emit flow ≡ corr_solve_from_T,
    flowT ≡ flow.T, and midT ≡ pallas_warp_v_cf(R1, flow_y).T.  flow
    and flowT compare EXACTLY.  midT gets a tolerance: in interpret
    mode XLA-CPU duplicates the solve expression into its two
    consumers (the flow store and the warp's offset chain) with
    different FMA-contraction choices, and g11·h2 − g12·h1 cancels —
    so the dy the in-kernel warp consumes can differ from the WRITTEN
    dy by ~1e-5, amplified by the ~255 image magnitude in the lerp to
    ~1e-3 on this random (worst-case-cancellation) data.  On real
    hardware Mosaic computes the value once (end-to-end checksums
    verified identical on the TPU), so the tolerance is an
    interpret-mode artifact bound, not a kernel accuracy bound."""
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        corr_solve_from_T_pallas, corr_solve_warp_from_T_pallas)
    from video_analytics_tpu.ops.pallas.warp import pallas_warp_v_cf
    rng = np.random.default_rng(12)
    taps = tuple([1.0 / 15] * 15)
    for (B, W, H, r) in ((2, 120, 96, 24), (1, 56, 40, 8)):
        hT = jnp.asarray(
            rng.normal(0, 2, (B, 5, W, H)).astype(np.float32))
        R1 = jnp.asarray(
            rng.uniform(0, 255, (B, 5, H, W)).astype(np.float32))
        flow, flowT, midT = corr_solve_warp_from_T_pallas(hT, R1, taps, r)
        ref = corr_solve_from_T_pallas(hT, taps)
        np.testing.assert_array_equal(np.asarray(flow), np.asarray(ref))
        np.testing.assert_array_equal(np.asarray(flowT),
                                      np.asarray(ref.transpose(0, 1, 3, 2)))
        mid_ref = pallas_warp_v_cf(R1, ref[:, 1], r=r)
        np.testing.assert_allclose(
            np.asarray(midT), np.asarray(mid_ref.transpose(0, 1, 3, 2)),
            rtol=1e-5, atol=5e-3)


def test_wspace_level_matches_per_iteration():
    """The restructured level loop (_wspace_level: two kernels per
    middle iteration) must equal iterating _fused_iteration_wspace
    across levels/iterations/window types — same f32 formulas; only
    interpret-mode FMA-contraction differences (see
    test_tsolve_warp_kernel_matches) may show, bounded well below the
    suite's cv2-parity gates."""
    import importlib
    fk = importlib.import_module(
        "video_analytics_tpu.ops.pallas.farneback_kernels")
    fb = importlib.import_module("video_analytics_tpu.flow.farneback")
    from video_analytics_tpu.config import FarnebackConfig

    rng = np.random.default_rng(13)
    prev = jnp.asarray(rng.uniform(0, 255, (2, 96, 120)).astype(np.float32))
    nxt = jnp.asarray(rng.uniform(0, 255, (2, 96, 120)).astype(np.float32))
    # level_kernel_fits is forced off in BOTH arms (it would otherwise
    # route both through farneback_level_pallas at this size, making
    # the comparison vacuous — ADVICE r4): 'new' is the two-kernel
    # chain, 'old' the iterated _fused_iteration_wspace fallback.
    orig_level = fk.level_kernel_fits
    orig_tsolve = fk.tsolve_warp_fits
    for cfg in (FarnebackConfig(levels=2, iterations=3),
                FarnebackConfig(levels=1, iterations=2,
                                gaussian_window=True)):
        try:
            fk.level_kernel_fits = lambda *a, **k: False
            new = np.asarray(fb.farneback(prev, nxt, cfg,
                                          use_pallas=True))
            fk.tsolve_warp_fits = lambda *a, **k: False
            old = np.asarray(fb.farneback(prev, nxt, cfg,
                                          use_pallas=True))
        finally:
            fk.level_kernel_fits = orig_level
            fk.tsolve_warp_fits = orig_tsolve
        np.testing.assert_allclose(new, old, rtol=1e-5, atol=1e-3)


def test_tsolve_banded_matches_whole(monkeypatch):
    """The W-banded tsolve grid (wb < W, 128-multiple lane blocks) must
    equal the whole-axis block bit-exactly — forced here by shrinking
    the VMEM band model (real shapes band only at large W, e.g. the
    512×640 CLI path)."""
    import video_analytics_tpu.ops.pallas.farneback_kernels as fk
    rng = np.random.default_rng(21)
    taps = tuple([1.0 / 15] * 15)
    hT = jnp.asarray(rng.normal(0, 2, (1, 5, 256, 48)).astype(np.float32))
    whole = np.asarray(fk.corr_solve_from_T_pallas(hT, taps))
    monkeypatch.setattr(fk, "_tsolve_wband", lambda *a: 128)
    banded = np.asarray(fk.corr_solve_from_T_pallas(hT, taps))
    np.testing.assert_array_equal(banded, whole)

    R1 = jnp.asarray(rng.uniform(0, 255, (1, 5, 48, 256)).astype(np.float32))
    monkeypatch.undo()
    fw, fTw, mw = fk.corr_solve_warp_from_T_pallas(hT, R1, taps, 8)
    monkeypatch.setattr(fk, "_tsolve_warp_wband", lambda *a: 128)
    fb_, fTb, mb = fk.corr_solve_warp_from_T_pallas(hT, R1, taps, 8)
    np.testing.assert_array_equal(np.asarray(fb_), np.asarray(fw))
    np.testing.assert_array_equal(np.asarray(fTb), np.asarray(fTw))
    np.testing.assert_array_equal(np.asarray(mb), np.asarray(mw))


def test_warp_emit_prologue_matches():
    """warp_emit_T (level prologue: row warp + in-register transposes)
    must emit flowT ≡ flow.T exactly and midT ≡ pallas_warp_v_cf(R1,
    flow_y).T within interpret-mode FMA-contraction ulps."""
    import video_analytics_tpu.ops.pallas.farneback_kernels as fk
    from video_analytics_tpu.ops.pallas.warp import pallas_warp_v_cf
    rng = np.random.default_rng(3)
    B, H, W, r = 2, 96, 120, 24
    R1 = jnp.asarray(rng.uniform(0, 255, (B, 5, H, W)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 3, (B, 2, H, W)).astype(np.float32))
    flowT, midT = fk.warp_emit_T_pallas(R1, flow, r)
    np.testing.assert_array_equal(np.asarray(flowT),
                                  np.asarray(flow.transpose(0, 1, 3, 2)))
    mid_ref = pallas_warp_v_cf(R1, flow[:, 1], r=r)
    np.testing.assert_allclose(np.asarray(midT),
                               np.asarray(mid_ref.transpose(0, 1, 3, 2)),
                               rtol=1e-5, atol=5e-3)


def test_level_kernel_matches_chain():
    """The whole-level kernel (all iterations in one pallas_call) must
    equal the two-kernel W-space chain — identical per-pixel f32
    stages, so interpret mode compares bit-exactly here."""
    import importlib
    fk = importlib.import_module(
        "video_analytics_tpu.ops.pallas.farneback_kernels")
    fb = importlib.import_module("video_analytics_tpu.flow.farneback")
    from video_analytics_tpu.config import FarnebackConfig

    rng = np.random.default_rng(5)
    prev = jnp.asarray(rng.uniform(0, 255, (2, 96, 120)).astype(np.float32))
    nxt = jnp.asarray(rng.uniform(0, 255, (2, 96, 120)).astype(np.float32))
    for cfg in (FarnebackConfig(levels=2, iterations=3),
                FarnebackConfig(levels=1, iterations=2,
                                gaussian_window=True)):
        assert fk.level_kernel_fits(96, 120, 24, cfg.winsize)
        new = np.asarray(fb.farneback(prev, nxt, cfg, use_pallas=True))
        orig = fk.level_kernel_fits
        fk.level_kernel_fits = lambda *a, **k: False
        try:
            old = np.asarray(fb.farneback(prev, nxt, cfg,
                                          use_pallas=True))
        finally:
            fk.level_kernel_fits = orig
        np.testing.assert_allclose(new, old, rtol=1e-5, atol=1e-3)


def test_level_kernel_gates():
    """The level kernel engages at the headline/CLI shapes and stays
    off past VMEM."""
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        level_kernel_fits)
    assert level_kernel_fits(224, 224, 24, 15)
    assert level_kernel_fits(240, 320, 24, 15)
    assert not level_kernel_fits(512, 640, 24, 15)
    assert not level_kernel_fits(1080, 1920, 24, 15)


def test_poly_prologue_matches_chain():
    """The fused per-level prologue (blur + resize + poly in one
    kernel) vs the unfused chain (_smooth_and_resize +
    poly_expansion_pallas): ~1-ulp equivalence across dec/poly/layout
    variants (see the in-test comment for the two rounding-order
    sources)."""
    import importlib
    fb = importlib.import_module("video_analytics_tpu.flow.farneback")
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        poly_expansion_pallas, poly_prologue_pallas, prologue_fits)

    rng = np.random.default_rng(11)
    T, H, W = 3, 96, 128
    frames = jnp.asarray(rng.uniform(0, 255, (T, H, W))
                         .astype(np.float32))
    for scale, (lh, lw), n, sigma in (
            (1.0, (96, 128), 5, 1.2),      # dec=1: bit-exact
            (0.5, (48, 64), 5, 1.2),       # dec=2
            (0.25, (24, 32), 7, 1.5)):     # dec=4, poly 7
        btaps = fb._smooth_taps(scale)
        assert prologue_fits(H, W, lh, lw, len(btaps), n)
        I = fb._smooth_and_resize(frames, scale, (lh, lw))
        R_ref, RT_ref = poly_expansion_pallas(I, n, sigma,
                                              layout="cf_both")
        R, RT = poly_prologue_pallas(frames, btaps, n, sigma, (lh, lw),
                                     layout="cf_both")
        Rc = poly_prologue_pallas(frames, btaps, n, sigma, (lh, lw),
                                  layout="cf")
        Rt = poly_prologue_pallas(frames, btaps, n, sigma, (lh, lw),
                                  layout="cf_t")
        # Same per-element ops as the chain; the only diffs are (a) the
        # x-first/y-first resize reorder at dec>1 and (b) FMA
        # contraction of the two-term Gramian combine (the chain's XLA
        # epilogue may fuse a·c1 + b·c2 where the in-kernel combine
        # does not) — both ~1-ulp classes, same as the documented
        # solve-expression artifact above.
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_ref),
                                   rtol=1e-5, atol=5e-5)
        np.testing.assert_allclose(np.asarray(RT), np.asarray(RT_ref),
                                   rtol=1e-5, atol=5e-5)
        np.testing.assert_array_equal(np.asarray(Rc), np.asarray(R))
        np.testing.assert_array_equal(np.asarray(Rt), np.asarray(RT))


def test_poly_prologue_driver_equivalence():
    """farneback / farneback_sequence with the fused prologue engaged
    vs forced off: the resize reorder must stay in the noise at the
    flow level (same tolerance class as the W-space reorder gates)."""
    import importlib
    fk = importlib.import_module(
        "video_analytics_tpu.ops.pallas.farneback_kernels")
    fb = importlib.import_module("video_analytics_tpu.flow.farneback")
    from video_analytics_tpu.config import FarnebackConfig

    rng = np.random.default_rng(12)
    base = rng.uniform(0, 255, (160, 200)).astype(np.float32)
    k = np.ones(7) / 7
    base = np.apply_along_axis(
        lambda r: np.convolve(r, k, 'same'), 1, base)
    base = np.apply_along_axis(
        lambda r: np.convolve(r, k, 'same'), 0, base)
    frames = jnp.asarray(np.stack(
        [base[8 + 2 * t:136 + 2 * t, 8 + t:136 + t] for t in range(4)]))
    cfg = FarnebackConfig()

    seq_on = np.asarray(fb.farneback_sequence(frames, cfg,
                                              use_pallas=True))
    pair_on = np.asarray(fb.farneback(frames[:-1], frames[1:], cfg,
                                      use_pallas=True))
    orig = fk.prologue_fits
    fk.prologue_fits = lambda *a, **kw: False
    try:
        seq_off = np.asarray(fb.farneback_sequence(frames, cfg,
                                                   use_pallas=True))
        pair_off = np.asarray(fb.farneback(frames[:-1], frames[1:],
                                           cfg, use_pallas=True))
    finally:
        fk.prologue_fits = orig
    np.testing.assert_allclose(seq_on, seq_off, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(pair_on, pair_off, rtol=1e-4, atol=1e-4)


def test_poly_prologue_gates():
    """The prologue engages at every shipped level geometry and
    refuses non-power-of-two pyramids and oversized planes."""
    from video_analytics_tpu.ops.pallas.farneback_kernels import (
        prologue_fits)
    # headline 224² levels and CLI 240×320 levels
    for (h, w), levels in (((224, 224), [(224, 224), (112, 112),
                                         (56, 56)]),
                           ((240, 320), [(240, 320), (120, 160),
                                         (60, 80)])):
        for lh, lw in levels:
            assert prologue_fits(h, w, lh, lw, 9, 5), (h, w, lh, lw)
    # rounded (non-exact) pyramid sizes fall back
    assert not prologue_fits(225, 225, 112, 112, 3, 5)
    assert not prologue_fits(224, 224, 112, 56, 3, 5)   # mixed dec
    # oversized planes fall back
    assert not prologue_fits(1080, 1920, 1080, 1920, 3, 5)
