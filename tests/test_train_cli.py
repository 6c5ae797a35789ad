"""Train driver test: a tiny fine-tune run over a synthetic 2-class
dataset through the real CLI path (sharded over the fake 8-device
mesh), checkpoint written and loadable."""

import json
import os

import numpy as np
import pytest

from tests.fixtures import moving_square_frames
from video_analytics_tpu.cli.main import main
from video_analytics_tpu.io.video import synthesize_video


@pytest.fixture(scope="module")
def mini_ucf(tmp_path_factory):
    root = tmp_path_factory.mktemp("miniucf")
    videos = root / "videos"
    ann = root / "ann"
    ann.mkdir()
    (ann / "classInd.txt").write_text("1 Left\n2 Right\n")
    lines = []
    for ci, cname in enumerate(["Left", "Right"]):
        d = videos / cname
        d.mkdir(parents=True)
        for j in range(2):
            step = (2, 0) if cname == "Right" else (-2, 0)
            frames = moving_square_frames(num=6, h=120, w=160, step=(abs(step[0]), 0))
            p = d / f"v_{cname}_g0{j}_c01.avi"
            synthesize_video(str(p), frames, fps=6)
            lines.append(f"{cname}/{p.name} {ci + 1}")
    (ann / "trainlist01.txt").write_text("\n".join(lines) + "\n")
    (ann / "testlist01.txt").write_text(
        "\n".join(line.split()[0] for line in lines) + "\n")
    return str(videos), str(ann)


def test_train_two_steps_writes_checkpoint(tmp_path, mini_ucf, capsys):
    videos, ann = mini_ucf
    out = str(tmp_path / "ckpt.msgpack")
    rc = main(["train", "--videos", videos, "--annotations", ann,
               "--out", out, "--num-classes", "2", "--batch", "4",
               "--steps", "2", "--log-every", "1", "--stream", "rgb"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["steps"] == 2 and os.path.exists(out)
    assert np.isfinite(res["final_loss_rgb"])

    # The checkpoint is a full two-stream variables dict, loadable by
    # classify-clip/eval-ucf101 directly.
    import jax
    from video_analytics_tpu.models.two_stream import TwoStreamModel
    from video_analytics_tpu.runtime.checkpoint import load_variables
    model = TwoStreamModel.create(num_classes=2, flow_stack=10)
    template = model.init_variables(jax.random.PRNGKey(9))
    restored = load_variables(out, template)
    assert "spatial" in restored and "temporal" in restored
    assert "params" in restored["spatial"]


def test_train_flow_stream_smoke(tmp_path, mini_ucf, capsys):
    """One step through the flow-stream training path: decode → window
    → on-device flow → stacked input → temporal-net gradient step."""
    videos, ann = mini_ucf
    out = str(tmp_path / "flow_ckpt.msgpack")
    rc = main(["train", "--videos", videos, "--annotations", ann,
               "--out", out, "--num-classes", "2", "--batch", "2",
               "--steps", "1", "--stream", "flow", "--algo", "farneback",
               "--flow-stack", "3", "--crop", "64", "--resize-short", "72",
               "--width", "16"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["steps"] == 1 and res["stream"] == "flow"
    assert np.isfinite(res["final_loss_flow"])
    assert os.path.exists(out)


def test_eval_ucf101_cli_runs(tmp_path, mini_ucf, capsys):
    videos, ann = mini_ucf
    rc = main(["eval-ucf101", "--videos", videos, "--annotations", ann,
               "--num-classes", "2", "--algo", "farneback",
               "--limit", "2",
               "--predictions", str(tmp_path / "preds.jsonl")])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["total"] == 2 and 0.0 <= res["top1"] <= 1.0
    preds = [json.loads(l) for l in open(tmp_path / "preds.jsonl")]
    assert len(preds) == 2


def test_eval_ucf101_cli_batched(mini_ucf, capsys):
    """The throughput path: prefetched decode, batched launches over
    the fake 8-device mesh, device-side accuracy reduction."""
    videos, ann = mini_ucf
    rc = main(["eval-ucf101", "--videos", videos, "--annotations", ann,
               "--num-classes", "2", "--algo", "farneback",
               "--batched", "--batch-clips", "4", "--windows", "2"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["total"] == 4 and res["failed"] == 0
    assert 0.0 <= res["top1"] <= 1.0
