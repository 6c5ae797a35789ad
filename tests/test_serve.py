"""Serving surface tests: the long-running classify server
(runtime/serve.py + `tpuva serve`) — shape normalisation parity, the
line protocol incl. failure containment, and the CLI glue."""

import io
import json
import sys

import jax
import numpy as np
import pytest

from video_analytics_tpu.config import PipelineConfig, PreprocessConfig
from video_analytics_tpu.ingest import host_normalize_square
from video_analytics_tpu.models.two_stream import TwoStreamModel
from video_analytics_tpu.runtime.serve import ClipServer


def test_host_normalize_square_shapes():
    for h, w in [(120, 160), (160, 120), (64, 64), (40, 300), (480, 640)]:
        frames = np.random.default_rng(0).integers(
            0, 255, (3, h, w, 3), dtype=np.uint8)
        out = host_normalize_square(frames, 64)
        assert out.shape == (3, 64, 64, 3), (h, w, out.shape)
        assert out.dtype == np.uint8


def test_host_normalize_square_crop_parity():
    """crop(normalized) must select the same pixel region as the device
    resize_short_center_crop of the raw frames — uint8 rounding at the
    intermediate is the only permitted delta.  Geometries include the
    rounding-parity traps (long−short odd, (short−crop)/2 odd) where a
    naive centred host offset lands 1px off the direct path."""
    import jax.numpy as jnp
    from video_analytics_tpu.ops.preprocess import resize_short_center_crop

    rng = np.random.default_rng(3)
    # Sharp noise content: the normalised path's second device resize
    # is an identity, so the only legitimate delta is the <=0.5 uint8
    # rounding at the intermediate — while a 1px region shift shows up
    # as O(100) deltas (the naive centred offset fails exactly the
    # (64, 58) / (64, 55) parity cases below at max delta >200).
    for short, crop in [(64, 56), (64, 58), (64, 55)]:
        for h, w in [(120, 161), (90, 73), (64, 200), (64, 157)]:
            raw = rng.integers(0, 255, (1, h, w, 3), dtype=np.uint8)
            direct = np.asarray(resize_short_center_crop(
                jnp.asarray(raw), short, crop))
            via_norm = np.asarray(resize_short_center_crop(
                jnp.asarray(host_normalize_square(raw, short, crop=crop)),
                short, crop))
            assert np.abs(direct - via_norm).max() < 1.0, (short, crop,
                                                           h, w)


@pytest.fixture(scope="module")
def server(tiny_clip):
    cfg = PipelineConfig(
        flow_algo="farneback",
        preprocess=PreprocessConfig(resize_short=64, crop=56,
                                    flow_stack=3),
        window=6, num_classes=7)
    model = TwoStreamModel.create(num_classes=7, flow_stack=3)
    variables = model.init_variables(jax.random.PRNGKey(0))
    return ClipServer(model, variables, cfg, num_windows=1, topk=3)


def test_serve_classify_and_protocol(server, tiny_clip):
    # warmup compiles the same executable real requests use
    assert server.warmup() > 0.0
    served_before = server.served

    resp = server.handle_line(json.dumps({"path": tiny_clip, "id": 42}))
    assert resp["id"] == 42 and resp["path"] == tiny_clip
    assert 0 <= resp["top1"] < 7 and len(resp["topk"]) == 3
    probs = [t["prob"] for t in resp["topk"]]
    assert probs == sorted(probs, reverse=True)
    assert resp["ms"] > 0

    # per-request topk override
    resp = server.handle_line(json.dumps({"path": tiny_clip, "topk": 1}))
    assert len(resp["topk"]) == 1

    # ping reports liveness + served count (delta, not absolute: the
    # module-scoped server accumulates across tests in any order)
    resp = server.handle_line(json.dumps({"cmd": "ping"}))
    assert resp["ok"] and resp["served"] == served_before + 2


def test_serve_failure_containment(server, tiny_clip):
    # a missing clip answers an error WITHOUT killing the server
    resp = server.handle_line(json.dumps({"path": "/nope/missing.mp4"}))
    assert "error" in resp and resp["path"] == "/nope/missing.mp4"
    # bad JSON answers an error line too
    resp = server.handle_line("{not json")
    assert "error" in resp
    # a request with neither path nor cmd
    resp = server.handle_line(json.dumps({"id": 1}))
    assert "error" in resp and resp["id"] == 1
    # ...and the server still serves afterwards
    resp = server.handle_line(json.dumps({"path": tiny_clip}))
    assert "top1" in resp


def test_serve_batch_request(server, tiny_clip):
    """{"paths": [...]}: one fused batch dispatch, request-order
    results, per-entry failure containment, probs identical to the
    single-path protocol (same preprocessing, same executable ladder)."""
    single = server.handle_line(json.dumps({"path": tiny_clip}))
    resp = server.handle_line(json.dumps(
        {"paths": [tiny_clip, "/nope/missing.mp4", tiny_clip],
         "id": 9, "topk": 2}))
    assert resp["id"] == 9 and resp["ms"] > 0
    rs = resp["results"]
    assert [r["path"] for r in rs] == [tiny_clip, "/nope/missing.mp4",
                                       tiny_clip]
    assert "error" in rs[1] and "top1" not in rs[1]
    for r in (rs[0], rs[2]):
        assert r["top1"] == single["top1"]
        assert len(r["topk"]) == 2
        np.testing.assert_allclose(r["topk"][0]["prob"],
                                   single["topk"][0]["prob"], atol=1e-6)
    # malformed batch requests answer an error, not a crash
    assert "error" in server.handle_line(json.dumps({"paths": []}))
    assert "error" in server.handle_line(json.dumps({"paths": [1, 2]}))


def test_serve_batch_mixed_lengths_and_dedup(tiny_clip, tmp_path):
    """A batch request mixing clips shorter and longer than the window
    (num_windows>1) must still stack into one fused dispatch — short
    clips tile their single window to the static (N, ...) shape — and
    duplicate paths are decoded/classified once with results fanned
    back out per entry."""
    from tests.fixtures import moving_square_frames
    from video_analytics_tpu.io.video import synthesize_video

    short_clip = str(tmp_path / "short.mp4")
    synthesize_video(short_clip,
                     moving_square_frames(num=4, h=90, w=130), fps=8.0)
    cfg = PipelineConfig(
        flow_algo="farneback",
        preprocess=PreprocessConfig(resize_short=64, crop=56,
                                    flow_stack=3),
        window=6, num_classes=7)
    model = TwoStreamModel.create(num_classes=7, flow_stack=3)
    variables = model.init_variables(jax.random.PRNGKey(0))
    srv = ClipServer(model, variables, cfg, num_windows=2, topk=2)

    single_long = srv.handle_line(json.dumps({"path": tiny_clip}))
    single_short = srv.handle_line(json.dumps({"path": short_clip}))
    resp = srv.handle_line(json.dumps(
        {"paths": [tiny_clip, short_clip, tiny_clip]}))
    rs = resp["results"]
    assert [r["path"] for r in rs] == [tiny_clip, short_clip, tiny_clip]
    for r in rs:
        assert "top1" in r, rs
    for r, ref in ((rs[0], single_long), (rs[1], single_short),
                   (rs[2], single_long)):
        assert r["top1"] == ref["top1"]
        np.testing.assert_allclose(r["topk"][0]["prob"],
                                   ref["topk"][0]["prob"], atol=1e-6)


def test_serve_loop_shutdown(server, tiny_clip):
    stdin = io.StringIO("\n".join([
        json.dumps({"path": tiny_clip, "id": 1}),
        "",                                      # blank lines skipped
        json.dumps({"cmd": "shutdown"}),
        json.dumps({"path": tiny_clip, "id": 2}),   # never reached
    ]) + "\n")
    stdout = io.StringIO()
    server.serve_forever(stdin=stdin, stdout=stdout)
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert len(lines) == 2
    assert lines[0]["id"] == 1 and "top1" in lines[0]
    assert lines[1]["ok"] is True


def test_serve_cli(monkeypatch, capsys, tiny_clip):
    """The `tpuva serve` glue end-to-end: --warmup prints a ready line,
    then requests stream through stdin."""
    from video_analytics_tpu.cli.main import main

    stdin = io.StringIO(json.dumps({"path": tiny_clip}) + "\n"
                        + json.dumps({"cmd": "shutdown"}) + "\n")
    monkeypatch.setattr(sys, "stdin", stdin)
    rc = main(["serve", "--algo", "farneback", "--num-classes", "5",
               "--resize-short", "64", "--crop", "56",
               "--flow-stack", "3", "--window", "6",
               "--topk", "2", "--warmup"])
    assert rc == 0
    lines = [json.loads(l)
             for l in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["ready"] is True
    assert "top1" in lines[1] and len(lines[1]["topk"]) == 2
    assert lines[2]["ok"] is True


def test_serve_stream_pipelined_order(server, tiny_clip):
    """Steady-stream single requests go through the decode-ahead
    pipeline (VERDICT r3 weak #5: decode of request k+1 overlaps the
    device round trip of request k); responses must keep strict
    request order, match the unpipelined handler's answers, and the
    stream must interleave cleanly with error and cmd lines."""
    reqs = [json.dumps({"path": tiny_clip, "id": i}) for i in range(4)]
    stdin = io.StringIO("\n".join(
        reqs[:2]
        + [json.dumps({"path": "/nope/missing.mp4", "id": 98})]
        + reqs[2:]
        + [json.dumps({"cmd": "ping", "id": 99}),
           json.dumps({"cmd": "shutdown"})]) + "\n")
    stdout = io.StringIO()
    server.serve_forever(stdin=stdin, stdout=stdout)
    lines = [json.loads(l) for l in stdout.getvalue().splitlines()]
    assert [l.get("id") for l in lines] == [0, 1, 98, 2, 3, 99, None]
    ref = server.handle_line(json.dumps({"path": tiny_clip}))
    for l in (lines[0], lines[1], lines[3], lines[4]):
        assert l["top1"] == ref["top1"]
        np.testing.assert_allclose(l["topk"][0]["prob"],
                                   ref["topk"][0]["prob"], atol=1e-6)
    assert "error" in lines[2]
    assert lines[5]["ok"] is True and lines[6]["ok"] is True
