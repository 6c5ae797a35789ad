"""End-to-end learning test (VERDICT round 1 #3): a small two-stream
model trained on a 3-class synthetic-motion dataset must reach
above-chance held-out accuracy through the fused train pipeline
(decode-free: in-memory windows → on-device flow → stacked input →
gradient step), checkpoint, and reload through classify-clip.

Classes are motion directions (right / down / left) of a textured
square — distinguishable by the flow stream, while start positions vary
so the RGB stream can't shortcut on static appearance alone.
"""

import json

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tests.fixtures import moving_square_frames
from video_analytics_tpu.config import (
    FarnebackConfig, PipelineConfig, PreprocessConfig)
from video_analytics_tpu.models.two_stream import TwoStreamModel
from video_analytics_tpu.runtime.checkpoint import (
    load_variables, save_variables)
from video_analytics_tpu.runtime.pipeline import classify_window
from video_analytics_tpu.runtime.train_two_stream import (
    build_examples, create_two_stream_states, make_two_stream_train_steps,
    train_window_len, two_stream_variables)

H, W, SQ = 48, 64, 12
STEPS = {0: (2, 0), 1: (0, 2), 2: (-2, 0)}          # right / down / left
CFG = PipelineConfig(
    preprocess=PreprocessConfig(resize_short=40, crop=32, flow_stack=5),
    farneback=FarnebackConfig(levels=2, iterations=2, winsize=9),
    flow_algo="farneback",
    window=6,
)
NUM_CLASSES = 3
WIDTH = 16


def _clip(label: int, start, seed: int) -> np.ndarray:
    step = STEPS[label]
    # Start so the square can travel its full path inside the frame.
    return np.stack(moving_square_frames(
        num=6, h=H, w=W, step=step, size=SQ, start=start, seed=seed))


def _dataset(rng: np.random.Generator, per_class: int):
    clips, labels = [], []
    for label in range(NUM_CLASSES):
        for _ in range(per_class):
            start = (int(rng.integers(12, W - SQ - 12)),
                     int(rng.integers(12, H - SQ - 12)))
            clips.append(_clip(label, start, seed=int(rng.integers(1e6))))
            labels.append(label)
    return np.stack(clips), np.asarray(labels, np.int32)


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(7)
    train_x, train_y = _dataset(rng, per_class=8)
    model = TwoStreamModel.create(num_classes=NUM_CLASSES,
                                  flow_stack=CFG.preprocess.flow_stack,
                                  width=WIDTH)
    variables = model.init_variables(
        jax.random.PRNGKey(0), input_hw=(CFG.preprocess.crop,) * 2)
    # Cosine-decayed lr: a fixed hot lr oscillates near the end of the
    # short run (held-out acc bounced 0.83→0.50→0.67 across late steps)
    # while decay converges it; exposed after the r2 exact-cv2 Farneback
    # numerics slightly changed the flow inputs.
    tx = optax.sgd(optax.cosine_decay_schedule(0.05, 80), momentum=0.9)
    states = create_two_stream_states(model, variables, tx, "both")
    steps = make_two_stream_train_steps(model, tx, "both")

    key = jax.random.PRNGKey(1)
    batch = 9
    assert train_window_len(CFG) == 6
    for it in range(80):
        idx = rng.choice(len(train_x), size=batch, replace=False)
        key, sub = jax.random.split(key)
        ex = build_examples(jnp.asarray(train_x[idx]), sub, CFG, "both")
        y = jnp.asarray(train_y[idx])
        for name, step_fn in steps.items():
            states[name], _ = step_fn(states[name], ex[name], y)
    return model, two_stream_variables(variables, states)


def _heldout_accuracy(model, variables, n_per_class: int = 4) -> float:
    rng = np.random.default_rng(99)
    test_x, test_y = _dataset(rng, per_class=n_per_class)
    correct = 0
    for clip, label in zip(test_x, test_y):
        probs = np.asarray(classify_window(jnp.asarray(clip), variables,
                                           model, CFG))
        correct += int(probs.argmax() == label)
    return correct / len(test_y)


def test_two_stream_learns_held_out_motion(trained):
    model, variables = trained
    acc = _heldout_accuracy(model, variables)
    assert acc >= 0.66, f"held-out fused accuracy {acc} (chance 0.33)"


def test_checkpoint_roundtrip_through_classify_clip(trained, tmp_path,
                                                    capsys):
    """learn → checkpoint → reload through the classify-clip CLI."""
    from video_analytics_tpu.cli.main import main
    from video_analytics_tpu.io.video import synthesize_video

    model, variables = trained
    ckpt = str(tmp_path / "two_stream.msgpack")
    save_variables(ckpt, variables)

    rng = np.random.default_rng(5)
    correct = 0
    n = 3
    for label in range(n):
        frames = _clip(label, (20, 14), seed=int(rng.integers(1e6)))
        path = str(tmp_path / f"clip{label}.mp4")
        synthesize_video(path, list(frames), fps=6.0)
        rc = main(["classify-clip", path, "--checkpoint", ckpt,
                   "--num-classes", str(NUM_CLASSES),
                   "--flow-stack", str(CFG.preprocess.flow_stack),
                   "--crop", str(CFG.preprocess.crop),
                   "--resize-short", str(CFG.preprocess.resize_short),
                   "--width", str(WIDTH), "--window", str(CFG.window),
                   "--algo", "farneback",
                   # match the training-time flow params through the
                   # CLI's cv2 parameter surface (--fb-*)
                   "--fb-levels", str(CFG.farneback.levels),
                   "--fb-iterations", str(CFG.farneback.iterations),
                   "--fb-winsize", str(CFG.farneback.winsize)])
        assert rc == 0
        res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        correct += int(res["top1"] == label)
    # mp4 encode adds noise; require strictly above chance on the 3
    # probes.
    assert correct >= 2, f"classify-clip got {correct}/3"
