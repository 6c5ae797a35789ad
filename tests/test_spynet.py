"""Learned-flow (SpyNet-style) model family tests: shapes, synthetic
ground truth, and that a brief synthetic-motion training run actually
reduces endpoint error (the learning loop works end-to-end)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from video_analytics_tpu.models.spynet import (
    SpyNet, init_spynet, make_spynet_train_step, synthetic_pair)


def test_forward_shapes():
    model = SpyNet(levels=3)
    variables = init_spynet(model, jax.random.PRNGKey(0), (64, 64))
    prev = jnp.zeros((2, 64, 64))
    out = model.apply(variables, prev, prev)
    assert out.shape == (2, 64, 64, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_synthetic_pair_consistency():
    prev, nxt, gt = synthetic_pair(jax.random.PRNGKey(1), 2, 48, 48)
    assert prev.shape == (2, 48, 48) and gt.shape == (2, 48, 48, 2)
    # Convention check: backward-warping nxt by gt reconstructs prev.
    from video_analytics_tpu.ops.kernels import warp_by_flow
    rec = warp_by_flow(jnp.asarray(nxt)[..., None], jnp.asarray(gt))[..., 0]
    err = np.abs(np.asarray(rec) - np.asarray(prev))[:, 8:-8, 8:-8]
    assert err.mean() < 3.5, err.mean()  # scales with texture contrast


def test_training_machinery_learns():
    """End-to-end trainability gate: gradients flow through all levels
    (including the warp) and optimisation reduces EPE.  Uses a batch
    with one shared translation — learnable at CPU-test scale; real
    flow generalisation needs long TPU training (out of test scope,
    see models/spynet.py docstring)."""
    from video_analytics_tpu.ops.kernels import gaussian_blur, warp_by_flow

    model = SpyNet(levels=2)
    variables = init_spynet(model, jax.random.PRNGKey(0), (32, 32))
    params = variables["params"]

    key = jax.random.PRNGKey(5)
    base = gaussian_blur(jax.random.uniform(
        key, (4, 48, 48), minval=0.0, maxval=255.0), 1.0)
    gt = jnp.broadcast_to(jnp.asarray([1.5, -1.0]), (4, 32, 32, 2))
    gt_pad = jnp.pad(gt, [(0, 0), (8, 8), (8, 8), (0, 0)], mode="edge")
    nxt = warp_by_flow(base[..., None], -gt_pad)[:, 8:40, 8:40, 0]
    prev = base[:, 8:40, 8:40]

    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    def loss_fn(p):
        flow = model.apply({"params": p}, prev, nxt)
        return jnp.mean(jnp.sqrt(jnp.sum((flow - gt) ** 2, -1) + 1e-8))

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    init_epe = float(loss_fn(params))
    # Gradients must reach every level's parameters.
    grads = jax.grad(loss_fn)(params)
    for name, g in grads.items():
        total = sum(float(jnp.abs(x).sum())
                    for x in jax.tree.leaves(g))
        assert total > 0, f"no gradient for {name}"
    for _ in range(150):
        params, opt_state, l = step(params, opt_state)
    final_epe = float(loss_fn(params))
    assert final_epe < init_epe * 0.5, (init_epe, final_epe)


def test_bundled_checkpoint_recovers_motion():
    """The shipped synthetic-trained weights must recover a known
    translation on held-out synthetic content (val EPE at save time
    was 0.034)."""
    from video_analytics_tpu.models.spynet import default_spynet_checkpoint
    try:
        ckpt = default_spynet_checkpoint()
    except FileNotFoundError:
        pytest.skip("no bundled spynet checkpoint")
    from video_analytics_tpu.runtime.checkpoint import load_variables
    model = SpyNet(levels=4)
    template = {"params": init_spynet(model, jax.random.PRNGKey(0),
                                      (96, 96))["params"]}
    weights = load_variables(ckpt, template)
    prev, nxt, gt = synthetic_pair(jax.random.PRNGKey(123), 4, 96, 96)
    flow = model.apply({"params": weights["params"]}, prev, nxt)
    epe = np.sqrt(np.sum((np.asarray(flow) - np.asarray(gt)) ** 2, -1))
    assert epe.mean() < 0.3, epe.mean()


def test_synthetic_pair_hard_regimes(rng):
    """r5 generator extensions: full_affine emits true rotation+zoom
    fields (nonzero curl) and hard_objects emits discontinuous flow
    with consistent photometry (warp(nxt, gt) ≈ prev away from
    occlusions)."""
    import jax
    import jax.numpy as jnp
    from video_analytics_tpu.models.spynet import synthetic_pair
    from video_analytics_tpu.ops.kernels import warp_by_flow

    k = jax.random.PRNGKey(3)
    prev, nxt, gt = synthetic_pair(k, 2, 48, 64, full_affine=True)
    g = np.asarray(gt)
    # curl of a rotation field is nonzero: du/dy - dv/dx
    curl = np.abs(np.gradient(g[..., 0], axis=1)
                  - np.gradient(g[..., 1], axis=2)).mean()
    assert curl > 1e-3, curl
    rec = warp_by_flow(nxt[..., None], gt)[..., 0]
    err = np.abs(np.asarray(rec) - np.asarray(prev))
    assert np.median(err) < 6.0

    prev, nxt, gt = synthetic_pair(k, 2, 48, 64, hard_objects=2)
    g = np.asarray(gt)
    # hard squares: spatial flow jumps >= 1 px between neighbours
    jump = np.abs(np.diff(g[..., 0], axis=2)).max()
    assert jump > 1.0, jump
    rec = warp_by_flow(nxt[..., None], gt)[..., 0]
    err = np.abs(np.asarray(rec) - np.asarray(prev))
    assert np.median(err) < 6.0
