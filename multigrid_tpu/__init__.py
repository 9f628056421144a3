"""multigrid_tpu: TPU-native matrix-free geometric-multigrid FEM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
kronbichler/multigrid (matrix-free FE_Q / SIP-DG Poisson solvers with
full-multigrid and CG-preconditioned-by-V-cycle, Chebyshev smoothing, mixed
precision) designed TPU-first: structured node-grid dof layouts, batched
MXU contractions for sum factorization, conflict-free window scatter, and
device-mesh sharding via jax.sharding for multi-chip runs.
"""

__version__ = "0.1.0"
