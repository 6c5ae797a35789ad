"""Learned flow through the fused two-stream pipelines
(flow_algo="spynet"): the SpyNet params ride as variables["flow"] and
the classify/features programs stay single-XLA-program."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_analytics_tpu.config import PipelineConfig, PreprocessConfig
from video_analytics_tpu.models.spynet import SpyNet, init_spynet
from video_analytics_tpu.models.two_stream import TwoStreamModel
from video_analytics_tpu.runtime.pipeline import (
    classify_window, compute_flow_sequence, flow_features)


def _cfg():
    return PipelineConfig(
        flow_algo="spynet",
        preprocess=PreprocessConfig(resize_short=64, crop=56,
                                    flow_stack=3),
        window=6, num_classes=5)


@pytest.fixture(scope="module")
def spynet_vars():
    return init_spynet(SpyNet(levels=4), jax.random.PRNGKey(3),
                       input_hw=(56, 56))


def test_compute_flow_sequence_spynet(spynet_vars):
    gray = jnp.asarray(np.random.default_rng(0).uniform(
        0, 255, (4, 56, 56)).astype(np.float32))
    flow = compute_flow_sequence(gray, _cfg(),
                                 flow_variables=spynet_vars)
    assert flow.shape == (3, 56, 56, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_spynet_needs_params():
    gray = jnp.zeros((3, 56, 56), jnp.float32)
    with pytest.raises(ValueError, match="spynet"):
        compute_flow_sequence(gray, _cfg())


def test_classify_window_spynet(spynet_vars):
    cfg = _cfg()
    model = TwoStreamModel.create(num_classes=5, flow_stack=3)
    variables = model.init_variables(jax.random.PRNGKey(0),
                                     input_hw=(56, 56))
    variables["flow"] = spynet_vars
    frames = np.random.default_rng(1).integers(
        0, 255, (6, 64, 80, 3), dtype=np.uint8)
    probs = np.asarray(classify_window(jnp.asarray(frames), variables,
                                       model, cfg))
    assert probs.shape == (5,)
    assert abs(probs.sum() - 1.0) < 1e-4 and (probs >= 0).all()


def test_flow_features_spynet(spynet_vars):
    cfg = _cfg()
    model = TwoStreamModel.create(num_classes=5, flow_stack=3)
    variables = model.init_variables(jax.random.PRNGKey(0),
                                     input_hw=(56, 56))
    frames = np.random.default_rng(2).integers(
        0, 255, (6, 64, 80, 3), dtype=np.uint8)
    feats = np.asarray(flow_features(
        jnp.asarray(frames), variables["temporal"], model.temporal,
        cfg, flow_variables=spynet_vars))
    # 6 frames → 5 flows → 3 stacks of L=3; 512-d features
    assert feats.shape == (3, 512)
    assert np.isfinite(feats).all()


def test_classify_clip_cli_spynet(tiny_clip, capsys):
    """End-to-end: the bundled trained SpyNet weights drive the
    temporal stream of classify-clip."""
    from video_analytics_tpu.cli.main import main

    rc = main(["classify-clip", tiny_clip, "--algo", "spynet",
               "--num-classes", "5", "--resize-short", "64",
               "--crop", "56", "--flow-stack", "3", "--window", "6",
               "--topk", "2"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 <= res["top1"] < 5 and len(res["topk"]) == 2


def test_evaluate_batched_spynet(tmp_path, spynet_vars):
    """Learned flow through the THROUGHPUT eval path (threaded decode →
    prefetch → batched fused classify), sharded over the fake mesh:
    the spynet params replicate with the rest of the variables and the
    batched result matches the serial driver exactly."""
    from tests.fixtures import moving_square_frames
    from video_analytics_tpu.io.dataset import ClipRecord
    from video_analytics_tpu.io.video import synthesize_video
    from video_analytics_tpu.parallel.mesh import make_mesh
    from video_analytics_tpu.runtime.evaluate import (
        evaluate, evaluate_batched)

    cfg = _cfg()
    model = TwoStreamModel.create(num_classes=5, flow_stack=3)
    variables = model.init_variables(jax.random.PRNGKey(0),
                                     input_hw=(56, 56))
    variables["flow"] = spynet_vars
    records = []
    for i in range(4):
        p = str(tmp_path / f"c{i}.mp4")
        synthesize_video(
            p, moving_square_frames(10, 64, 80, step=(2 - i % 3, 1)),
            fps=10)
        records.append(ClipRecord(path=p, label=i % 3, class_name=str(i)))

    serial = evaluate(records, variables, model, cfg, num_windows=2)
    batched = evaluate_batched(records, variables, model, cfg,
                               batch_clips=4, num_windows=2,
                               mesh=make_mesh())
    assert batched.total == serial.total == 4
    assert batched.correct == serial.correct and batched.failed == 0


def test_build_examples_spynet(spynet_vars):
    from video_analytics_tpu.runtime.train_two_stream import (
        build_examples)

    cfg = _cfg()
    windows = jnp.asarray(np.random.default_rng(4).integers(
        0, 255, (2, 4, 64, 80, 3), dtype=np.uint8))
    out = build_examples(windows, jax.random.PRNGKey(0), cfg, "flow",
                         flow_variables=spynet_vars)
    assert out["flow"].shape == (2, 56, 56, 6)
    assert np.isfinite(np.asarray(out["flow"])).all()
