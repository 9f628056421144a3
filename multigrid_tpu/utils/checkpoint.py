"""Solver-state checkpoint/resume.

The reference carries NO solver-state persistence (SURVEY.md §5:
"Checkpoint/resume: none"); production deployments need it, so this
framework adds a minimal portable format: a compressed npz of named device
arrays plus a metadata dict.  Works for any pytree of jnp arrays (outer CG
state, Newton iterates, per-level solutions).
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save_state(path: str, state: dict, metadata: dict | None = None):
    arrays = {}
    for k, v in state.items():
        arrays[k] = np.asarray(v)
    arrays["__metadata__"] = np.frombuffer(
        json.dumps(metadata or {}).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_state(path: str):
    data = np.load(path)
    meta = json.loads(bytes(data["__metadata__"]).decode()) if "__metadata__" in data else {}
    state = {k: data[k] for k in data.files if k != "__metadata__"}
    return state, meta
