"""Worker for the multi-process distributed test (not a pytest file).

Launched N times by tests/test_parallel.py::test_multiprocess_distributed
— each instance is one "host" of a multi-host deployment: it calls
``jax.distributed.initialize`` (the launch path documented in
parallel/mesh.py), provisions 4 local virtual CPU devices, builds the
GLOBAL ('data', 'model') mesh spanning every process, and runs sharded
computations whose collectives cross the process boundary:

  1. data-axis: global mean of a batch assembled from process-local
     shards (``jax.make_array_from_process_local_data``) — the same
     reduction shape as the eval accuracy psum.
  2. model-axis: an fc Dense placed by ``shard_dense_over_model``
     applied under jit — XLA partitions the matmul over 'model'.

Prints one "RESULT <mean> <fc_sum>" line for the parent to check
against the single-process values.
"""

import os
import sys


def bootstrap(process_id: int, num_processes: int, port: str,
              local_devices: int):
    """Shared multi-process test bootstrap: force CPU with
    `local_devices` virtual devices, a private compilation cache, the
    gloo collectives backend, and join the global runtime via
    jax.distributed.initialize.  Returns the jax module."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    # Each worker is its own process: a private compilation cache dir
    # avoids write races on the shared default.
    os.environ["JAX_COMPILATION_CACHE_DIR"] = (
        f"/tmp/tpuva_dist_cache_{process_id}")

    import jax

    jax.config.update("jax_platforms", "cpu")
    # Cross-process CPU collectives need a real backend (gloo); flag
    # name has drifted across jax versions, so try both spellings.
    for flag in ("jax_cpu_collectives_implementation",):
        try:
            jax.config.update(flag, "gloo")
        except Exception:
            pass
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return jax


def main() -> int:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]
    local_devices = int(sys.argv[4])

    jax = bootstrap(process_id, num_processes, port, local_devices)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from video_analytics_tpu.parallel.mesh import (
        data_sharding, make_mesh, shard_dense_over_model)

    n_global = num_processes * local_devices
    assert len(jax.devices()) == n_global, jax.devices()
    assert len(jax.local_devices()) == local_devices
    mesh = make_mesh(model_parallel=2)
    assert mesh.devices.size == n_global

    # --- data-axis collective across processes ------------------------
    batch = n_global * 2
    full = (np.arange(batch * 3, dtype=np.float32)
            .reshape(batch, 3) * 0.25)
    per_proc = batch // num_processes
    local = full[process_id * per_proc:(process_id + 1) * per_proc]
    garr = jax.make_array_from_process_local_data(
        data_sharding(mesh, 2), local, full.shape)
    mean = jax.jit(
        lambda x: jnp.mean(x * x),
        out_shardings=NamedSharding(mesh, P()))(garr)
    got_mean = float(mean)
    want_mean = float(np.mean(full * full))
    assert abs(got_mean - want_mean) < 1e-5, (got_mean, want_mean)

    # --- model-axis sharding across the global mesh -------------------
    import flax.linen as nn

    class Head(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(16, name="fc")(x)

    head = Head()
    variables = head.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8), jnp.float32))
    placed = shard_dense_over_model(variables, mesh)
    x = jax.device_put(
        jnp.asarray(full[:, :1].repeat(8, axis=1)),
        data_sharding(mesh, 2))
    out = jax.jit(lambda v, x: head.apply(v, x))(placed, x)
    out = jax.jit(lambda o: jnp.sum(o),
                  out_shardings=NamedSharding(mesh, P()))(out)
    got_fc = float(out)

    ref = float(np.asarray(
        jax.jit(head.apply)(variables, jnp.asarray(
            full[:, :1].repeat(8, axis=1))).sum()))
    assert abs(got_fc - ref) < 1e-3 * max(1.0, abs(ref)), (got_fc, ref)

    print(f"RESULT {got_mean:.6f} {got_fc:.4f}", flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
