"""ResNet-18 parity: flax (NHWC) vs the torch oracle, weight-converted.

This is the feature-parity gate of BASELINE.json ("bitwise-comparable
features within tolerance"): identical weights must give identical
features/logits across frameworks.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from tests.torch_resnet import random_torch_resnet18
from video_analytics_tpu.models.resnet import (
    resnet18, flow_stream_resnet18, init_resnet)
from video_analytics_tpu.models.convert import (
    torch_resnet_to_flax, inflate_stem_for_flow)


@pytest.fixture(scope="module")
def torch_model():
    return random_torch_resnet18(seed=0)


@pytest.fixture(scope="module")
def flax_variables(torch_model):
    return torch_resnet_to_flax(torch_model.state_dict())


def test_logits_parity(torch_model, flax_variables, rng):
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    model = resnet18()
    ours = np.asarray(model.apply(flax_variables, jnp.asarray(x)))
    assert ours.shape == ref.shape == (2, 1000)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_feature_parity(torch_model, flax_variables, rng):
    x = rng.normal(0, 1, (2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          return_features=True).numpy()
    model = resnet18()
    ours = np.asarray(model.apply(flax_variables, jnp.asarray(x),
                                  return_features=True))
    assert ours.shape == ref.shape == (2, 512)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_resnet50_parity(rng):
    """Bottleneck family: flax ResNet-50 vs the torch oracle with
    converted weights (conv3/bn3 + expansion-4 downsample mapping)."""
    from tests.torch_resnet import random_torch_resnet50
    from video_analytics_tpu.models.resnet import resnet50

    tm = random_torch_resnet50(seed=3)
    variables = torch_resnet_to_flax(tm.state_dict(),
                                     stage_sizes=(3, 4, 6, 3))
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ref_f = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   return_features=True).numpy()
    model = resnet50()
    assert model.feature_dim == 2048
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-4)
    ours_f = np.asarray(model.apply(variables, jnp.asarray(x),
                                    return_features=True))
    assert ours_f.shape == ref_f.shape == (2, 2048)
    np.testing.assert_allclose(ours_f, ref_f, atol=5e-4, rtol=1e-4)


def test_flow_stream_shapes(rng):
    model = flow_stream_resnet18(stack=10, num_classes=101)
    variables = init_resnet(model, jax.random.PRNGKey(0), input_hw=(64, 64))
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 20)).astype(np.float32))
    out = model.apply(variables, x)
    assert out.shape == (2, 101)
    feats = model.apply(variables, x, return_features=True)
    assert feats.shape == (2, 512)


def test_stem_inflation(torch_model, flax_variables):
    inflated = inflate_stem_for_flow(flax_variables, stack=10)
    k = np.asarray(inflated["params"]["conv1"]["kernel"])
    assert k.shape == (7, 7, 20, 64)
    orig = np.asarray(flax_variables["params"]["conv1"]["kernel"])
    np.testing.assert_allclose(k[:, :, 0], orig.mean(axis=2), atol=1e-6)
    # All duplicated channels identical.
    np.testing.assert_allclose(k[:, :, 0], k[:, :, 19], atol=0)


def test_train_mode_updates_batch_stats(rng):
    model = resnet18(num_classes=10)
    variables = init_resnet(model, jax.random.PRNGKey(0), input_hw=(64, 64))
    x = jnp.asarray(rng.normal(0, 1, (4, 64, 64, 3)).astype(np.float32))
    out, mutated = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    assert out.shape == (4, 10)
    before = variables["batch_stats"]["bn1"]["mean"]
    after = mutated["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_wrong_channels_raises():
    model = resnet18()
    variables = init_resnet(model, jax.random.PRNGKey(0), input_hw=(32, 32))
    with pytest.raises(ValueError):
        model.apply(variables, jnp.zeros((1, 32, 32, 5)))


def test_fold_bn_parity(torch_model, flax_variables, rng):
    """The folded-BN inference form (fold_bn=True model +
    fold_batchnorm'd torch-converted weights) must match BOTH the
    unfolded flax model and the torch oracle at the feature-parity
    gate — the fold is an exact f32 affine composition, so the only
    deviation is conv-epilogue rounding order."""
    from video_analytics_tpu.models.convert import fold_batchnorm

    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    folded_vars = fold_batchnorm(flax_variables)
    assert "batch_stats" not in folded_vars
    flat = jax.tree_util.tree_leaves(folded_vars)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    model = resnet18().clone(fold_bn=True)
    ours = np.asarray(model.apply(folded_vars, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=4e-4, rtol=1e-4)
    unfolded = np.asarray(resnet18().apply(flax_variables,
                                           jnp.asarray(x)))
    np.testing.assert_allclose(ours, unfolded, atol=4e-4, rtol=1e-4)


def test_fold_bn_two_stream_classify(rng):
    """TwoStreamModel.folded() + fold_variables: fused classify output
    must match the unfolded model on random init variables with
    non-trivial batch_stats injected."""
    from video_analytics_tpu.models.two_stream import TwoStreamModel

    model = TwoStreamModel.create(num_classes=7, flow_stack=3)
    variables = model.init_variables(jax.random.PRNGKey(1),
                                     input_hw=(64, 64))
    # Random running stats so the fold is non-trivial.
    def randomize(v):
        stats = jax.tree_util.tree_map(
            lambda a: jnp.asarray(
                rng.uniform(0.5, 2.0, a.shape).astype(np.float32)),
            v["batch_stats"])
        params = jax.tree_util.tree_map(
            lambda a: jnp.asarray(
                rng.normal(0, 0.5, a.shape).astype(np.float32))
            if a.ndim == 1 else a, v["params"])
        return {"params": params, "batch_stats": stats}

    variables = {k: randomize(v) for k, v in variables.items()}
    frames = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3))
                         .astype(np.float32))
    stacks = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 6))
                         .astype(np.float32))
    ref = np.asarray(model.classify(variables, frames, stacks))
    fm = model.folded()
    fv = TwoStreamModel.fold_variables(variables)
    out = np.asarray(fm.classify(fv, frames, stacks))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
