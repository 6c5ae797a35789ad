"""Checkpoint/resume: flax msgpack serialization for model variables
and training state (SURVEY.md §5).  The CLI stage artifacts (frames /
flow / feature files on disk) remain the coarse-grained pipeline
checkpoints, for reference-layout compatibility."""

from __future__ import annotations

import os
from typing import Any, Dict

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
