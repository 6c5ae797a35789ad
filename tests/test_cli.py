"""CLI surface tests: the four reference-matching entry points driven
end-to-end on a synthetic clip (SURVEY.md §4.3)."""

import json
import os

import numpy as np
import pytest

from video_analytics_tpu.cli.main import main
from video_analytics_tpu.io.flowio import read_flo


def run_cli(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()
    return rc, json.loads(out[-1]) if out else None


def test_extract_frames(tmp_path, tiny_clip, capsys):
    out_dir = str(tmp_path / "frames")
    rc, res = run_cli(capsys, ["extract-frames", tiny_clip, out_dir])
    assert rc == 0
    assert res["frames"] == 12 and res["height"] == 120
    files = sorted(os.listdir(out_dir))
    assert files[0] == "frame_000001.jpg" and len(files) == 12


def test_compute_flow_flo(tmp_path, tiny_clip, capsys):
    out_dir = str(tmp_path / "flow")
    rc, res = run_cli(capsys, [
        "compute-flow", tiny_clip, out_dir, "--algo", "farneback",
        "--max-frames", "6", "--batch", "4"])
    assert rc == 0 and res["flows"] == 5
    flow = read_flo(os.path.join(out_dir, "flow_000001.flo"))
    assert flow.shape == (120, 160, 2)
    # Square moves (2, 1) px/frame.
    sq = flow[12:30, 12:30]
    assert abs(np.median(sq[..., 0]) - 2.0) < 0.6
    assert abs(np.median(sq[..., 1]) - 1.0) < 0.6


def test_compute_flow_jpg_quantized(tmp_path, tiny_clip, capsys):
    out_dir = str(tmp_path / "flowq")
    rc, res = run_cli(capsys, [
        "compute-flow", tiny_clip, out_dir, "--algo", "farneback",
        "--format", "jpg", "--max-frames", "3"])
    assert rc == 0 and res["flows"] == 2
    assert os.path.exists(os.path.join(out_dir, "flow_x_000001.jpg"))
    assert os.path.exists(os.path.join(out_dir, "flow_y_000002.jpg"))


def test_compute_flow_viz(tmp_path, tiny_clip, capsys):
    """--format viz renders HSV color-wheel PNGs; the moving square
    (known rightward-dominant motion) must stand out from the static
    background as saturated, non-black pixels."""
    import cv2
    out_dir = str(tmp_path / "flowviz")
    rc, res = run_cli(capsys, [
        "compute-flow", tiny_clip, out_dir, "--algo", "farneback",
        "--format", "viz", "--max-frames", "3", "--bound", "4"])
    assert rc == 0 and res["flows"] == 2
    img = cv2.imread(os.path.join(out_dir, "flow_viz_000001.png"))
    assert img is not None and img.shape == (120, 160, 3)
    sq = img[12:30, 12:30].astype(np.float32)
    bg = img[60:100, 80:140].astype(np.float32)
    # magnitude (HSV value) is much brighter on the moving square
    assert sq.max(axis=-1).mean() > bg.max(axis=-1).mean() + 50


def test_compute_flow_single_frame_error(tmp_path, tiny_clip, capsys):
    rc = main(["compute-flow", tiny_clip, str(tmp_path / "x"),
               "--max-frames", "1"])
    assert rc == 2


def test_extract_features_rgb_from_frames_dir(tmp_path, tiny_clip, capsys):
    frames_dir = str(tmp_path / "frames")
    main(["extract-frames", tiny_clip, frames_dir])
    capsys.readouterr()
    out = str(tmp_path / "feats.npz")
    rc, res = run_cli(capsys, [
        "extract-features", frames_dir, out, "--stream", "rgb",
        "--num-classes", "7", "--max-frames", "4"])
    assert rc == 0 and res["rgb"] == [4, 512]
    data = np.load(out)
    assert data["rgb"].shape == (4, 512)
    assert np.isfinite(data["rgb"]).all()


def test_extract_features_flow_too_short(tmp_path, tiny_clip, capsys):
    rc = main(["extract-features", tiny_clip, str(tmp_path / "f.npz"),
               "--stream", "flow", "--max-frames", "5"])
    assert rc == 2


def test_extract_features_fold_bn_matches(tmp_path, tiny_clip, capsys):
    """--fold-bn (r5, VERDICT r4 task 4): the folded-BN inference form
    must reproduce the unfolded features through the real CLI surface.
    The fold is an exact f32 affine composition
    (models/convert.fold_batchnorm); under bf16 compute the only
    difference is rounding-point movement, so compare at a bf16-scale
    relative tolerance."""
    frames_dir = str(tmp_path / "frames")
    main(["extract-frames", tiny_clip, frames_dir])
    capsys.readouterr()
    out_a = str(tmp_path / "a.npz")
    out_b = str(tmp_path / "b.npz")
    base = ["extract-features", frames_dir, "--stream", "rgb",
            "--num-classes", "7", "--max-frames", "2"]
    rc, _ = run_cli(capsys, base[:2] + [out_a] + base[2:])
    assert rc == 0
    rc, _ = run_cli(capsys, base[:2] + [out_b] + base[2:] + ["--fold-bn"])
    assert rc == 0
    a = np.load(out_a)["rgb"]
    b = np.load(out_b)["rgb"]
    assert a.shape == b.shape
    assert np.abs(a - b).max() <= 2e-2 * np.abs(a).max() + 1e-3


def test_classify_clip(tmp_path, tiny_clip, capsys):
    rc, res = run_cli(capsys, [
        "classify-clip", tiny_clip, "--algo", "farneback",
        "--num-classes", "7", "--topk", "3"])
    assert rc == 0
    assert 0 <= res["top1"] < 7
    assert len(res["topk"]) == 3
    probs = [t["prob"] for t in res["topk"]]
    assert probs == sorted(probs, reverse=True)


def test_checkpoint_roundtrip(tmp_path):
    import jax
    from video_analytics_tpu.models.two_stream import TwoStreamModel
    from video_analytics_tpu.runtime.checkpoint import (
        save_variables, load_variables)
    model = TwoStreamModel.create(num_classes=5)
    v = model.init_variables(jax.random.PRNGKey(1))
    path = str(tmp_path / "ckpt.msgpack")
    save_variables(path, v)
    model2 = TwoStreamModel.create(num_classes=5)
    v2 = model2.init_variables(jax.random.PRNGKey(2))
    restored = load_variables(path, v2)
    a = np.asarray(v["spatial"]["params"]["conv1"]["kernel"])
    b = np.asarray(restored["spatial"]["params"]["conv1"]["kernel"])
    np.testing.assert_array_equal(a, b)


def test_orbax_async_checkpoint_roundtrip(tmp_path):
    """The optional orbax backend: async save (overlaps compute),
    restore into a template — including direct restore-to-sharding on
    a mesh, each leaf landing with the template's placement."""
    import jax
    import pytest
    from video_analytics_tpu.models.two_stream import TwoStreamModel
    from video_analytics_tpu.parallel.mesh import make_mesh, replicated
    from video_analytics_tpu.runtime.checkpoint import (
        AsyncCheckpointer, have_orbax)
    if not have_orbax():
        pytest.skip("orbax not installed")
    model = TwoStreamModel.create(num_classes=5)
    v = model.init_variables(jax.random.PRNGKey(1))
    path = str(tmp_path / "ck1")
    with AsyncCheckpointer() as ck:
        ck.save(path, v)           # returns before the write commits
        ck.wait()
        v2 = model.init_variables(jax.random.PRNGKey(2))
        restored = ck.restore(path, v2)
        np.testing.assert_array_equal(
            np.asarray(v["spatial"]["params"]["conv1"]["kernel"]),
            np.asarray(restored["spatial"]["params"]["conv1"]["kernel"]))
        # Restore-to-sharding: template leaves carry mesh placements.
        mesh = make_mesh()
        placed = jax.device_put(v2, replicated(mesh))
        resharded = ck.restore(path, placed)
        leaf = resharded["spatial"]["params"]["conv1"]["kernel"]
        assert leaf.sharding == replicated(mesh)
        np.testing.assert_array_equal(
            np.asarray(v["spatial"]["params"]["conv1"]["kernel"]),
            np.asarray(leaf))


def test_orbax_rotation_preserves_previous(tmp_path):
    """Repeated saves to one path must never leave a window where a
    crash loses the last good checkpoint: the committed previous
    checkpoint is rotated to <path>.prev before the new async write,
    and restore falls back to it when the primary is missing/torn."""
    import os
    import shutil
    import pytest
    from video_analytics_tpu.runtime.checkpoint import (
        AsyncCheckpointer, have_orbax)
    if not have_orbax():
        pytest.skip("orbax not installed")
    path = str(tmp_path / "ck")
    t1 = {"w": np.arange(4.0)}
    t2 = {"w": np.arange(4.0) + 10.0}
    template = {"w": np.zeros(4)}
    with AsyncCheckpointer() as ck:
        ck.save(path, t1)
        ck.save(path, t2)          # rotates t1 → ck.prev
        ck.wait()
        assert os.path.isdir(path + ".prev")
        np.testing.assert_array_equal(ck.restore(path, template)["w"],
                                      t2["w"])
        # Primary lost (crash between rotate and commit): restore
        # falls back to the rotated previous checkpoint.
        shutil.rmtree(path)
        np.testing.assert_array_equal(ck.restore(path, template)["w"],
                                      t1["w"])


def test_full_stage_chain(tmp_path, tiny_clip, capsys):
    """The reference's filesystem stage handoff end-to-end:
    extract-frames → compute-flow (quantized jpg) → extract-features
    from BOTH the frames dir (rgb) and the stored-flow dir (flow) →
    classify-clip.  This is the workflow a reference user ports."""
    frames_dir = str(tmp_path / "frames")
    flow_dir = str(tmp_path / "flow")

    rc, _ = run_cli(capsys, ["extract-frames", tiny_clip, frames_dir])
    assert rc == 0
    rc, res = run_cli(capsys, [
        "compute-flow", frames_dir, flow_dir, "--algo", "farneback",
        "--format", "jpg"])
    assert rc == 0 and res["flows"] == 11

    rc, res = run_cli(capsys, [
        "extract-features", frames_dir, str(tmp_path / "rgb.npz"),
        "--stream", "rgb", "--num-classes", "5", "--max-frames", "3"])
    assert rc == 0 and res["rgb"] == [3, 512]

    rc, res = run_cli(capsys, [
        "extract-features", flow_dir, str(tmp_path / "flow.npz"),
        "--stream", "flow", "--num-classes", "5"])
    assert rc == 0 and res["source"] == "flow_dir"
    feats = np.load(str(tmp_path / "flow.npz"))["flow"]
    assert feats.shape == (2, 512) and np.isfinite(feats).all()

    rc, res = run_cli(capsys, [
        "classify-clip", tiny_clip, "--algo", "farneback",
        "--num-classes", "5"])
    assert rc == 0 and 0 <= res["top1"] < 5


def test_extract_features_rgb_from_flow_dir_errors(tmp_path, capsys):
    d = tmp_path / "flowdir"
    d.mkdir()
    (d / "flow_x_000001.jpg").write_bytes(b"x")
    rc = main(["extract-features", str(d), str(tmp_path / "o.npz"),
               "--stream", "rgb"])
    assert rc == 2


def test_warmup_cli(capsys):
    """`tpuva warmup` compiles the bucketed compute-flow program for
    each requested size (tiny config here; the default ladder is for
    deliberate first-touch payment on TPU)."""
    rc, res = run_cli(capsys, [
        "warmup", "--sizes", "48x64,60x64", "--algos", "farneback",
        "--batch", "1", "--fb-levels", "1", "--fb-iterations", "1"])
    assert rc == 0
    # Both sizes share the one 64x64 bucket → exactly one compile.
    assert [c["bucket"] for c in res["compiled"]] == [[64, 64]]
    assert res["cache_dir"]


def test_convert_weights_roundtrip(tmp_path, capsys):
    """`tpuva convert-weights` (VERDICT r2 missing #5): a torch
    checkpoint saved to disk converts to a two-stream msgpack in one
    command, and the restored RGB stream is feature-parity-exact with
    the torch oracle while the flow stream carries the inflated stem."""
    import jax
    import jax.numpy as jnp
    import torch
    from tests.torch_resnet import random_torch_resnet18
    from video_analytics_tpu.cli.main import _load_two_stream

    tm = random_torch_resnet18(seed=5)
    pth = str(tmp_path / "rn18.pth")
    torch.save(tm.state_dict(), pth)
    out = str(tmp_path / "two_stream.msgpack")
    rc, res = run_cli(capsys, ["convert-weights", pth, out,
                               "--num-classes", "11"])
    assert rc == 0
    # torch fc is 1000-class, target 11 → fc must NOT be converted.
    assert res["fc_converted"] is False
    assert res["fc_classes_in_state_dict"] == 1000
    # resnet18 backbone: 20 convs + 20 BNs x4 arrays = 100 leaves.
    assert res["spatial_leaves_converted"] == 100
    assert res["temporal_leaves_converted"] == 100

    model, variables = _load_two_stream(out, num_classes=11,
                                        flow_stack=10)
    # RGB stream: torch-oracle feature parity with converted weights.
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                 return_features=True).numpy()
    ours = np.asarray(model.spatial.apply(
        variables["spatial"], jnp.asarray(x), return_features=True))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)
    # Flow stream: stem is the channel-mean inflated RGB stem.
    k = np.asarray(variables["temporal"]["params"]["conv1"]["kernel"])
    assert k.shape == (7, 7, 20, 64)
    rgb_k = np.asarray(variables["spatial"]["params"]["conv1"]["kernel"])
    np.testing.assert_allclose(k[:, :, 0], rgb_k.mean(axis=2),
                               atol=1e-6)
    # Backbone (non-stem) weights shared; fc heads are fresh init.
    np.testing.assert_array_equal(
        np.asarray(variables["temporal"]["params"]["layer1_0"]["conv1"]
                   ["kernel"]),
        np.asarray(variables["spatial"]["params"]["layer1_0"]["conv1"]
                   ["kernel"]))
    assert variables["spatial"]["params"]["fc"]["kernel"].shape == \
        (512, 11)


def test_convert_weights_shape_mismatch(tmp_path, capsys):
    """Wrong --arch for the state_dict fails loudly, not silently."""
    import torch
    from tests.torch_resnet import random_torch_resnet18
    tm = random_torch_resnet18(seed=1)
    pth = str(tmp_path / "rn18.pth")
    torch.save(tm.state_dict(), pth)
    with pytest.raises((ValueError, KeyError)):
        main(["convert-weights", pth, str(tmp_path / "o.msgpack"),
              "--arch", "resnet50"])


def test_compute_flow_cv2_param_surface(tmp_path, tiny_clip, capsys):
    """The full cv2 parameter surface is CLI-exposed (--fb-*) and
    actually reaches the algorithm: a gaussian-window smaller-winsize
    run differs from the default-params run.  (Numeric parity at these
    params is gated on controlled inputs in test_farneback.py — the CLI
    feeds float32 gray while the cv2 binding only takes uint8, so an
    oracle comparison here would measure input rounding, not flags.)"""
    d1, d2 = str(tmp_path / "fp1"), str(tmp_path / "fp2")
    rc1, _ = run_cli(capsys, [
        "compute-flow", tiny_clip, d1, "--algo", "farneback",
        "--max-frames", "3", "--batch", "2", "--no-bucket"])
    rc2, res = run_cli(capsys, [
        "compute-flow", tiny_clip, d2, "--algo", "farneback",
        "--max-frames", "3", "--batch", "2", "--no-bucket",
        "--fb-winsize", "9", "--fb-gaussian", "--fb-iterations", "2"])
    assert rc1 == 0 and rc2 == 0 and res["flows"] == 2
    a = read_flo(os.path.join(d1, "flow_000001.flo"))
    b = read_flo(os.path.join(d2, "flow_000001.flo"))
    assert np.abs(a - b).max() > 1e-6


def test_tvl1_params_reach_algorithm(tmp_path, tiny_clip, capsys):
    """--tv-* args change the output (cheap config vs default)."""
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    rc1, _ = run_cli(capsys, [
        "compute-flow", tiny_clip, d1, "--algo", "tvl1",
        "--max-frames", "2", "--batch", "1", "--no-bucket",
        "--tv-nscales", "1", "--tv-warps", "1", "--tv-inner", "2",
        "--tv-outer", "1", "--tv-median", "0"])
    rc2, _ = run_cli(capsys, [
        "compute-flow", tiny_clip, d2, "--algo", "tvl1",
        "--max-frames", "2", "--batch", "1", "--no-bucket",
        "--tv-nscales", "2", "--tv-warps", "2", "--tv-inner", "4",
        "--tv-outer", "2", "--tv-median", "3"])
    assert rc1 == 0 and rc2 == 0
    a = read_flo(os.path.join(d1, "flow_000001.flo"))
    b = read_flo(os.path.join(d2, "flow_000001.flo"))
    assert np.abs(a - b).max() > 1e-6


def test_warmup_classify_precompiles_eval_executable(tmp_path, capsys):
    """`tpuva warmup --surface classify` must compile the EXACT
    executable `eval-ucf101 --batched` dispatches (VERDICT r3 weak #7):
    after a warmup at matching geometry, the eval run adds no new entry
    to the _batch_clip_metrics jit cache."""
    from video_analytics_tpu.cli.main import main
    from video_analytics_tpu.io.synthetic import build_synthetic_ucf101
    from video_analytics_tpu.runtime.evaluate import _batch_clip_metrics

    root = str(tmp_path / "ds")
    build_synthetic_ucf101(root, num_classes=2, clips_per_class=2,
                           num_frames=14, h=96, w=128)
    common = ["--num-classes", "2", "--flow-stack", "3",
              "--window", "6", "--crop", "56", "--resize-short", "64",
              "--fb-levels", "0", "--fb-iterations", "1"]
    rc = main(["warmup", "--surface", "classify",
               "--algos", "farneback", "--src", "96x128",
               "--batch-clips", "2", "--windows", "1"] + common)
    assert rc == 0
    capsys.readouterr()
    n0 = _batch_clip_metrics._cache_size()
    assert n0 >= 1
    rc = main(["eval-ucf101", "--videos", f"{root}/videos",
               "--annotations", f"{root}/annotations",
               "--algo", "farneback", "--batched",
               "--batch-clips", "2", "--windows", "1"] + common)
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["total"] == 2 and out["failed"] == 0
    assert _batch_clip_metrics._cache_size() == n0, \
        "eval-ucf101 --batched compiled a new executable after warmup"


def test_accuracy_parity_runbook_composition(tmp_path, capsys):
    """The UCF101 accuracy-parity runbook (STATUS.md; VERDICT r3 next
    #10) stays runnable end-to-end: the two commands for the day real
    weights/data arrive are `convert-weights` then `eval-ucf101
    --batched`, and this test wires exactly that composition on the
    synthetic dataset — a torch state_dict on disk converts, loads as
    the eval checkpoint, and the batched eval completes cleanly."""
    import torch
    from tests.torch_resnet import random_torch_resnet18
    from video_analytics_tpu.io.synthetic import build_synthetic_ucf101

    tm = random_torch_resnet18(seed=5)
    pth = str(tmp_path / "rn18.pth")
    torch.save(tm.state_dict(), pth)
    ckpt = str(tmp_path / "two_stream.msgpack")
    rc, res = run_cli(capsys, ["convert-weights", pth, ckpt,
                               "--num-classes", "2"])
    assert rc == 0 and res["spatial_leaves_converted"] == 100

    root = str(tmp_path / "ds")
    build_synthetic_ucf101(root, num_classes=2, clips_per_class=2,
                           num_frames=14, h=96, w=128)
    rc, out = run_cli(capsys, [
        "eval-ucf101", "--videos", f"{root}/videos",
        "--annotations", f"{root}/annotations",
        "--checkpoint", ckpt, "--num-classes", "2",
        "--algo", "farneback", "--batched", "--batch-clips", "2",
        "--crop", "56", "--resize-short", "64", "--window", "6",
        "--fb-levels", "0", "--fb-iterations", "1"])
    assert rc == 0
    assert out["total"] == 2 and out["failed"] == 0
    assert 0.0 <= out["top1"] <= 1.0
