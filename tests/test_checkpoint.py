"""Checkpoint/resume round trip (a capability the reference lacks)."""

import os

import jax.numpy as jnp
import numpy as np

from multigrid_tpu.utils.checkpoint import load_state, save_state


def test_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "state.npz")
    state = {
        "x": jnp.asarray(np.random.default_rng(0).standard_normal((7, 5))),
        "r": jnp.asarray(np.float32([1, 2, 3])),
    }
    save_state(path, state, {"iteration": 4, "rtol": 1e-9})
    loaded, meta = load_state(path)
    assert meta["iteration"] == 4
    assert np.allclose(loaded["x"], np.asarray(state["x"]))
    assert loaded["r"].dtype == np.float32
