"""Farneback parity vs the cv2 oracle (BASELINE.json config #2:
flow-field L2 parity).

Since r2 the implementation reproduces cv2's exact numerics — the
regularised 2x2 solve (1/(det+1e-3)) and the out-of-bounds warp branch
(A:=A0, Δb:=b0/2 outside cv2's floor-based interior test) — so parity
is gated at near-bitwise tolerances ACROSS THE WHOLE FIELD, borders
included, for every config (box + Gaussian window, poly 5/7, win 9/15,
pyr_scale 0.5/0.8, multi-level pyramids).
"""

import cv2
import numpy as np
import jax.numpy as jnp
import pytest

from tests.fixtures import smooth_pair
from video_analytics_tpu.config import FarnebackConfig
from video_analytics_tpu.flow import farneback, farneback_jit

# f32 accumulation-order noise bound: cv2 and XLA sum in different
# orders; observed max EPE ~1e-5 on 96x128, gate with 30x headroom.
EXACT = 3e-4


def _compare(u1, u2, cfg: FarnebackConfig, cv_args, cv_flags=0,
             **kw):
    ref = cv2.calcOpticalFlowFarneback(u1, u2, None, *cv_args, cv_flags)
    ours = np.asarray(farneback(
        jnp.asarray(u1[None].astype(np.float32)),
        jnp.asarray(u2[None].astype(np.float32)), cfg, **kw))[0]
    epe = np.linalg.norm(ours - ref, axis=-1)
    rel_l2 = np.linalg.norm(ours - ref) / max(np.linalg.norm(ref), 1e-9)
    return ref, ours, epe, rel_l2


@pytest.fixture(scope="module")
def pair():
    f1, f2 = smooth_pair(np.random.default_rng(0), 96, 128,
                         dx=2.3, dy=-1.1)
    return f1.astype(np.uint8), f2.astype(np.uint8)


def test_default_config_parity(pair):
    u1, u2 = pair
    ref, ours, epe, rel = _compare(
        u1, u2, FarnebackConfig(), (0.5, 3, 15, 3, 5, 1.2))
    assert epe.max() < EXACT, epe.max()
    assert rel < 1e-4, rel
    # Flow direction/magnitude sanity: known translation (2.3, -1.1).
    mean_flow = ours.reshape(-1, 2).mean(0)
    np.testing.assert_allclose(mean_flow, [2.3, -1.1], atol=0.25)


def test_poly7_parity(pair):
    u1, u2 = pair
    _, _, epe, rel = _compare(
        u1, u2, FarnebackConfig(poly_n=7, poly_sigma=1.5),
        (0.5, 3, 15, 3, 7, 1.5))
    assert epe.max() < EXACT, epe.max()


def test_small_window_parity(pair):
    u1, u2 = pair
    _, _, epe, rel = _compare(
        u1, u2, FarnebackConfig(winsize=9), (0.5, 3, 9, 3, 5, 1.2))
    assert epe.max() < EXACT, epe.max()


def test_gaussian_window_parity(pair):
    """OPTFLOW_FARNEBACK_GAUSSIAN, exact to the border (was the r1
    known gap: interior-only at rel<0.15)."""
    u1, u2 = pair
    _, _, epe, rel = _compare(
        u1, u2, FarnebackConfig(gaussian_window=True),
        (0.5, 3, 15, 3, 5, 1.2), cv2.OPTFLOW_FARNEBACK_GAUSSIAN)
    assert epe.max() < EXACT, epe.max()
    assert rel < 1e-4, rel


def test_single_iteration_parity(pair):
    """One iteration exposes the raw update+blur+solve chain with no
    fixed-point contraction hiding differences."""
    u1, u2 = pair
    _, _, epe, rel = _compare(
        u1, u2, FarnebackConfig(iterations=1), (0.5, 3, 15, 1, 5, 1.2))
    assert epe.max() < EXACT, epe.max()


def test_large_motion_pyramid(rng):
    f1, f2 = smooth_pair(rng, 192, 256, dx=9.0, dy=-6.0)
    u1, u2 = f1.astype(np.uint8), f2.astype(np.uint8)
    ref, ours, epe, rel = _compare(
        u1, u2, FarnebackConfig(), (0.5, 3, 15, 3, 5, 1.2))
    assert epe.max() < 1e-3, epe.max()
    # Interior recovers the 9px translation despite exceeding winsize.
    inner = ours[16:-16, 16:-16].reshape(-1, 2).mean(0)
    np.testing.assert_allclose(inner, [9.0, -6.0], atol=0.5)


def test_nondefault_pyr_scale(rng):
    f1, f2 = smooth_pair(rng, 96, 128, dx=1.7, dy=2.2)
    u1, u2 = f1.astype(np.uint8), f2.astype(np.uint8)
    _, _, epe, rel = _compare(
        u1, u2, FarnebackConfig(pyr_scale=0.8, levels=5),
        (0.8, 5, 15, 3, 5, 1.2))
    assert epe.max() < EXACT, epe.max()


def test_batched_and_jit(pair):
    u1, u2 = pair
    prev = jnp.stack([jnp.asarray(u1, jnp.float32)] * 3)
    nxt = jnp.stack([jnp.asarray(u2, jnp.float32)] * 3)
    out = farneback_jit(prev, nxt, FarnebackConfig(levels=1))
    assert out.shape == (3, 96, 128, 2)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[2]),
                               atol=1e-6)


def test_use_initial_flow(pair):
    u1, u2 = pair
    J1 = jnp.asarray(u1[None].astype(np.float32))
    J2 = jnp.asarray(u2[None].astype(np.float32))
    cfg = FarnebackConfig(levels=0, iterations=1, use_initial_flow=True)
    seed = jnp.full((1, 96, 128, 2), jnp.asarray([2.3, -1.1]))
    out = np.asarray(farneback(J1, J2, cfg, initial_flow=seed))[0]
    inner = out[10:-10, 10:-10].reshape(-1, 2).mean(0)
    np.testing.assert_allclose(inner, [2.3, -1.1], atol=0.3)


def test_pallas_warp_pipeline_parity(pair):
    """The Pallas banded warp (forced on) must not change cv2 parity —
    this is the gate that licenses the separable approximation.

    The Pallas warp is exact per-axis but approximate where vertical
    flow varies within a band, so this keeps the looser r1 gate rather
    than the EXACT one."""
    u1, u2 = pair
    ref = cv2.calcOpticalFlowFarneback(u1, u2, None, 0.5, 3, 15, 3, 5,
                                       1.2, 0)
    ours = np.asarray(farneback(
        jnp.asarray(u1[None].astype(np.float32)),
        jnp.asarray(u2[None].astype(np.float32)),
        FarnebackConfig(), use_pallas=True))[0]
    epe = np.linalg.norm(ours - ref, axis=-1)
    rel = np.linalg.norm(ours - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel
    assert epe[8:-8, 8:-8].mean() < 0.003


def _affine_pair(rng, h, w, theta_deg, zoom):
    """(prev, next) where next(q) = prev(M q): rotation + zoom about
    the centre (the analytic rig from tests/test_tvl1.py)."""
    from tests.fixtures import smooth_image
    img = smooth_image(rng, h, w, pad=0)
    theta = np.deg2rad(theta_deg)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    R = zoom * np.array([[np.cos(theta), -np.sin(theta)],
                         [np.sin(theta), np.cos(theta)]])
    t = np.array([cx, cy]) - R @ np.array([cx, cy])
    M = np.float32(np.hstack([R, t[:, None]]))
    nxt = cv2.warpAffine(img, M, (w, h), flags=cv2.INTER_CUBIC
                         | cv2.WARP_INVERSE_MAP)
    return img, nxt


def _pallas_vs_exact(prev, nxt, cfg=FarnebackConfig()):
    """(EPE field, rel L2) of the Pallas separable warp pipeline vs the
    exact XLA gather pipeline — the approximation error alone."""
    pj = jnp.asarray(prev[None].astype(np.float32))
    nj = jnp.asarray(nxt[None].astype(np.float32))
    exact = np.asarray(farneback(pj, nj, cfg, use_pallas=False))[0]
    pal = np.asarray(farneback(pj, nj, cfg, use_pallas=True))[0]
    epe = np.linalg.norm(pal - exact, axis=-1)
    rel = np.linalg.norm(pal - exact) / max(np.linalg.norm(exact), 1e-9)
    return epe, rel


def test_pallas_warp_rotation_zoom(rng):
    """Separable-warp approximation bound on rotation+zoom — the motion
    family where vertical flow varies within a horizontal band, i.e.
    exactly where the per-axis-exact kernel is approximate (VERDICT r2
    weak #3).  Measured: mild (1.2°, 1.03x) max EPE 0.164 / rel 1.3%;
    hard (4°, 1.08x) max EPE 0.86 / rel 4.2%.  Gated at ~1.7x headroom;
    users needing bitwise cv2 warp semantics use `compute-flow
    --exact`."""
    epe, rel = _pallas_vs_exact(*_affine_pair(rng, 96, 128, 1.2, 1.03))
    assert epe.max() < 0.3, epe.max()
    assert rel < 0.025, rel
    epe, rel = _pallas_vs_exact(*_affine_pair(rng, 96, 128, 4.0, 1.08))
    assert epe.max() < 1.5, epe.max()
    assert rel < 0.07, rel


def test_pallas_warp_discontinuous(rng):
    """Separable-warp approximation bound on discontinuous flow (a
    textured square moving (6, 4) px/frame over a static background) —
    band-varying vertical flow at the object boundary.  Measured: max
    EPE 0.75 at the discontinuity, field mean 0.011, rel 1.9%.  Gated
    at ~2x headroom."""
    from tests.fixtures import moving_square_frames
    fr = moving_square_frames(num=2, h=96, w=128, step=(6, 4))
    g0 = cv2.cvtColor(fr[0], cv2.COLOR_RGB2GRAY).astype(np.float32)
    g1 = cv2.cvtColor(fr[1], cv2.COLOR_RGB2GRAY).astype(np.float32)
    epe, rel = _pallas_vs_exact(g0, g1)
    assert epe.max() < 1.5, epe.max()
    assert epe.mean() < 0.03, epe.mean()
    assert rel < 0.04, rel


def test_sequence_equivalence(rng):
    """farneback_sequence(frames) is the same computation as
    farneback(frames[:-1], frames[1:]) with shared per-frame work —
    results must match to f32 accumulation noise."""
    from tests.fixtures import smooth_pair
    from video_analytics_tpu.flow.farneback import farneback_sequence
    f1, f2 = smooth_pair(rng, 64, 96, dx=1.7, dy=0.6)
    f3 = np.roll(f2, (2, -1), axis=(0, 1))
    frames = jnp.asarray(np.stack([f1, f2, f3]).astype(np.float32))
    seq = np.asarray(farneback_sequence(frames, FarnebackConfig()))
    pair_form = np.asarray(farneback(frames[:-1], frames[1:],
                                     FarnebackConfig()))
    np.testing.assert_allclose(seq, pair_form, atol=1e-5)


def test_bounded_envelope_equivalence(rng):
    """The bounded-envelope pipeline path (flow destined for a
    ±flow_bound clip) matches the full-envelope sequence flow exactly
    for displacements inside the envelope."""
    from tests.fixtures import smooth_pair
    from video_analytics_tpu.flow.farneback import farneback_sequence
    f1, f2 = smooth_pair(rng, 64, 96, dx=3.0, dy=-2.0)
    frames = jnp.asarray(np.stack([f1, f2]).astype(np.float32))
    full = np.asarray(farneback_sequence(frames, FarnebackConfig()))
    bounded = np.asarray(farneback_sequence(frames, FarnebackConfig(),
                                            envelope=24))
    np.testing.assert_allclose(bounded, full, atol=1e-6)
