"""multigrid_tpu: TPU-native matrix-free geometric-multigrid FEM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
kronbichler/multigrid (matrix-free FE_Q / SIP-DG Poisson solvers with
full-multigrid and CG-preconditioned-by-V-cycle, Chebyshev smoothing, mixed
precision) designed TPU-first: structured node-grid dof layouts, batched
MXU contractions for sum factorization, conflict-free window scatter, and
device-mesh sharding via jax.sharding for multi-chip runs.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: flagship-size programs cost 30-130 s of
# (remote) compile each; caching them on disk makes repeat solver setups and
# benchmark reruns near-instant.  Harmless where the backend can't serialize
# executables (jax logs and skips).  Opt out with MGT_NO_COMPILE_CACHE=1.
import os as _os

if not _os.environ.get("MGT_NO_COMPILE_CACHE"):
    import jax as _jax

    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("MGT_COMPILE_CACHE_DIR",
                            _os.path.expanduser("~/.cache/multigrid_tpu_xla")))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # jit-executable cache only: embedded XLA:CPU AOT kernel caches pin
        # exact host machine features and warn/SIGILL when reloaded under a
        # different feature detection (observed across processes on one box)
        _jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
    except Exception:  # pragma: no cover - older jax without these flags
        pass
