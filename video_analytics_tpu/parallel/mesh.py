"""Device mesh + sharding layout — the framework's communication layer.

TPU-native design (SURVEY.md §2b #13-14): parallelism is expressed as a
``jax.sharding.Mesh`` with a ``data`` axis (clip/batch parallel; the
dominant axis for this CNN-scale workload) and an optional ``model``
axis declared up front so tensor-parallel shardings can be added
without API change.  XLA inserts the collectives (psum for gradient
and metric reductions) and routes them over ICI within a slice / DCN
across slices — there is no hand-written transport layer, by design:
on TPU the runtime is the backend and our job is layout.

Multi-host launch: call ``jax.distributed.initialize()`` before
``make_mesh()`` (no-op single-host).  This path is exercised for real
by tests/test_parallel.py::test_multiprocess_distributed — two OS
processes × 4 virtual devices joined into one global mesh, with data-
and model-axis collectives crossing the process boundary over gloo.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              model_parallel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a ('data', 'model') mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"make_mesh(n_devices={n_devices}): only {len(devices)} "
                f"device(s) available ({devices!r}). Under-provisioning a "
                "mesh silently would mask deployment errors; provision more "
                "devices (e.g. XLA_FLAGS=--xla_force_host_platform_device_"
                "count=N with JAX_PLATFORMS=cpu for virtual testing).")
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch/clip) axis over 'data', replicate rest."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def model_sharding(mesh: Mesh, ndim: int, dim: int = -1) -> NamedSharding:
    """Shard tensor dimension `dim` over the 'model' axis (tensor
    parallelism), replicating the rest."""
    spec = [None] * ndim
    spec[dim] = "model"
    return NamedSharding(mesh, P(*spec))


def shard_dense_over_model(variables, mesh: Mesh):
    """Tensor-parallel placement without any model-code change: every
    ``fc`` Dense kernel/bias is sharded column-wise over the 'model'
    axis; everything else is replicated.  jit consumes the placed
    variables unchanged and XLA partitions the matmul + inserts the
    collectives (SURVEY.md §2b #13: the mesh declares 'model' up front
    exactly so TP is a placement decision, not an API change)."""

    mp = int(mesh.shape["model"])

    def place(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", None))
                 for p in path]
        # kernel (in, out) / bias (out,): shard the output dim — unless
        # it doesn't divide the model axis (e.g. an odd class count), in
        # which case that leaf stays replicated (correct either way; XLA
        # just keeps its matmul whole).
        if "fc" in names and leaf.shape[-1] % mp == 0:
            return jax.device_put(leaf, model_sharding(mesh, leaf.ndim))
        return jax.device_put(leaf, replicated(mesh))

    return jax.tree_util.tree_map_with_path(place, variables)


def process_local_records(records, process_index: Optional[int] = None,
                          process_count: Optional[int] = None):
    """This process's shard of a global record list (round-robin, so
    shard sizes differ by at most one).  The pod-scale driver contract
    (SURVEY §1b ingest): each process decodes ONLY its own records and
    contributes them to global batches via assemble_global_batch."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    return list(records)[process_index::process_count]


def global_batch_size(requested: int, mesh: Mesh,
                      process_count: Optional[int] = None) -> int:
    """Round a requested global batch up so it (a) shards evenly over
    the mesh 'data' axis and (b) splits evenly across processes — the
    two divisibility constraints of a pod-scale global batch."""
    import math
    if process_count is None:
        process_count = jax.process_count()
    ddim = int(mesh.devices.shape[0])
    mult = ddim * process_count // math.gcd(ddim, process_count)
    return ((requested + mult - 1) // mult) * mult


def assemble_global_batch(mesh: Mesh, local: np.ndarray,
                          global_rows: int) -> jax.Array:
    """This process's (q, ...) host rows → the global (global_rows, ...)
    array sharded over 'data' (each process contributes only the rows
    its addressable devices hold — the multi-host ingest primitive;
    single-process it degenerates to a plain sharded device_put)."""
    local = np.asarray(local)
    shape = (int(global_rows),) + tuple(local.shape[1:])
    return jax.make_array_from_process_local_data(
        data_sharding(mesh, local.ndim), local, shape)


def pad_to_multiple(x: np.ndarray, multiple: int) -> Tuple[np.ndarray, int]:
    """Pad the leading axis up to a multiple (uneven final batches must
    still shard evenly); returns (padded, original_length)."""
    n = x.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = np.repeat(x[-1:], rem, axis=0)
    return np.concatenate([x, pad], axis=0), n


def shard_batch(x, mesh: Mesh):
    """Place a host array onto the mesh sharded over 'data'."""
    import jax.numpy as jnp
    arr = jnp.asarray(x)
    return jax.device_put(arr, data_sharding(mesh, arr.ndim))
