"""Fused Pallas TV-L1 solver vs the XLA reference solver, with the
warp held to the exact XLA gather on both sides (exact_warp=True) so
the comparison isolates the solver — the separable Pallas warp's own
approximation bounds are gated in tests/test_pallas_warp.py (interpret
mode on CPU; compiled path exercised by the TPU bench)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tests.fixtures import smooth_pair
from video_analytics_tpu.config import TVL1Config
from video_analytics_tpu.flow.tvl1 import tvl1
from video_analytics_tpu.ops.pallas.tvl1_solve import solver_fits_vmem

SMALL = TVL1Config(nscales=2, warps=2, outer_iterations=3,
                   inner_iterations=6, median_filtering=5)


def test_full_pipeline_pallas_equals_xla(rng):
    f1, f2 = smooth_pair(rng, 48, 64, dx=1.2, dy=-0.6)
    a = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                        SMALL, use_pallas=False))
    b = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                        SMALL, use_pallas=True, exact_warp=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_pallas_no_median_matches(rng):
    cfg = TVL1Config(nscales=1, warps=1, outer_iterations=2,
                     inner_iterations=5, median_filtering=0)
    f1, f2 = smooth_pair(rng, 32, 48, dx=0.7, dy=0.4)
    a = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                        cfg, use_pallas=False))
    b = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                        cfg, use_pallas=True, exact_warp=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_median3_config(rng):
    cfg = TVL1Config(nscales=1, warps=1, outer_iterations=2,
                     inner_iterations=4, median_filtering=3)
    f1, f2 = smooth_pair(rng, 32, 40, dx=0.5, dy=-0.3)
    a = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                        cfg, use_pallas=False))
    b = np.asarray(tvl1(jnp.asarray(f1[None]), jnp.asarray(f2[None]),
                        cfg, use_pallas=True, exact_warp=True))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_solver_fits_vmem():
    assert solver_fits_vmem(224, 224, 5)
    assert solver_fits_vmem(240, 320, 3)
    assert not solver_fits_vmem(1080, 1920, 5)
