"""Checkpoint/resume (SURVEY.md §5).

Two backends:

- **flax msgpack** (default, the CLI checkpoint format): one portable
  file, atomic replace, host-gathered — right for the two-stream model
  scale and for handing checkpoints between machines.
- **orbax** (optional, `AsyncCheckpointer`): asynchronous saves that
  overlap training compute, and restore-to-sharding — each host writes/
  reads only its shards, which is the TPU-native story once train state
  is sharded over a multi-host mesh.  Import-gated so environments
  without orbax keep working.

The CLI stage artifacts (frames / flow / feature files on disk) remain
the coarse-grained pipeline checkpoints, for reference-layout
compatibility."""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import flax.serialization
import jax


def save_variables(path: str, variables: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = flax.serialization.to_bytes(
        jax.tree.map(lambda x: jax.device_get(x), variables))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: no torn checkpoints on crash


def load_variables(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the structure of `template` (e.g. freshly-inited
    variables) — shapes/dtypes validated by flax."""
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.from_bytes(template, data)


def have_orbax() -> bool:
    import importlib.util
    try:
        # find_spec("orbax.checkpoint") imports the parent package
        # first and RAISES ModuleNotFoundError when orbax itself is
        # absent — exactly the environment this gate must answer False
        # in, not crash.
        return importlib.util.find_spec("orbax.checkpoint") is not None
    except ModuleNotFoundError:
        return False


class AsyncCheckpointer:
    """Orbax-backed async checkpointing for long training runs.

    ``save`` returns as soon as the train state is staged to host
    memory; the serialization + write happen on a background thread, so
    checkpointing overlaps the next training steps instead of stalling
    the device (the production cadence: save every N steps without
    paying the write each time).  ``restore(path, template)`` restores
    into the template's structure; when the template's leaves carry
    shardings (e.g. a device_put train state on a mesh), orbax restores
    each shard directly to its device — no host-gather round trip.

    Directory-per-checkpoint layout (orbax's), unlike the msgpack
    single file; `wait()` (or context-manager exit) must run before the
    process ends or the last save may be torn — orbax keeps a tmp
    marker until the write commits, so a torn save is detected at
    restore, never silently loaded.

    Durability across repeated saves to ONE path: the previous
    committed checkpoint is rotated to ``<path>.prev`` before the new
    asynchronous write starts (orbax's force=True would delete it
    outright, so a crash mid-save would otherwise lose the last good
    state — the msgpack backend's tmp+os.replace never has that
    window).  ``restore`` falls back to ``<path>.prev`` when the
    primary is missing or torn.
    """

    def __init__(self):
        import orbax.checkpoint as ocp
        self._ocp = ocp
        self._ck = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())

    def save(self, path: str, tree: Any,
             keep_previous: bool = True) -> None:
        import shutil
        path = os.path.abspath(path)
        # One in-flight save per path: wait for the previous async write
        # before rotating/overwriting its destination.
        self.wait()
        if keep_previous and os.path.isdir(path):
            prev = path + ".prev"
            if os.path.isdir(prev):
                shutil.rmtree(prev)
            os.replace(path, prev)
        self._ck.save(path, args=self._ocp.args.StandardSave(tree),
                      force=True)

    def restore(self, path: str, template: Any) -> Any:
        path = os.path.abspath(path)
        try:
            return self._ck.restore(
                path, args=self._ocp.args.StandardRestore(template))
        except Exception as e:
            prev = path + ".prev"
            if not os.path.isdir(prev):
                raise
            # Only fall back for the cases the rotation protocol is
            # designed for — primary missing, or torn (crash between
            # rotate and commit leaves orbax's uncommitted-tmp marker).
            # Any OTHER failure (transient FS error, template mismatch)
            # must surface, not silently hand back stale weights
            # (ADVICE r3, low).
            torn = (not os.path.isdir(path)
                    or any(".orbax-checkpoint-tmp" in n or
                           n == "NOT_FINALIZED"
                           for n in os.listdir(path))
                    or "checkpoint" in repr(e).lower()
                    and ("tmp" in repr(e).lower()
                         or "not found" in repr(e).lower()
                         or "finali" in repr(e).lower()))
            if not torn:
                raise
            import warnings
            warnings.warn(
                f"primary checkpoint {path} missing or torn "
                f"({e!r}); restoring rotated previous checkpoint "
                f"{prev}", RuntimeWarning)
            return self._ck.restore(
                prev, args=self._ocp.args.StandardRestore(template))

    def wait(self) -> None:
        self._ck.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ck.close()

    def __enter__(self) -> "AsyncCheckpointer":
        return self

    def __exit__(self, *exc) -> Optional[bool]:
        self.close()
        return None
