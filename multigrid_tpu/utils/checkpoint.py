"""Solver-state checkpoint/resume.

The reference carries NO solver-state persistence (SURVEY.md §5:
"Checkpoint/resume: none"); production deployments need it, so this
framework adds a minimal portable format: a compressed npz of named device
arrays plus a metadata dict.  ``state`` may be any pytree of arrays; nested
containers are flattened with path-joined keys ("outer/cg/x") and restored
to a flat dict keyed the same way.
"""

from __future__ import annotations

import json

import jax
import numpy as np

_META_KEY = "__metadata__"


def _flatten(state: dict) -> dict:
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    flat = {}
    for path, leaf in leaves:
        key = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        if key == _META_KEY:
            raise ValueError(f"state key {_META_KEY!r} is reserved")
        flat[key] = np.asarray(leaf)
    return flat


def save_state(path: str, state: dict, metadata: dict | None = None):
    arrays = _flatten(state)
    arrays[_META_KEY] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_state(path: str):
    data = np.load(path)
    meta = json.loads(bytes(data[_META_KEY]).decode()) if _META_KEY in data else {}
    state = {k: data[k] for k in data.files if k != _META_KEY}
    return state, meta
