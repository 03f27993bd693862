"""metapde_tpu: a TPU-native amortized PDE-solver framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of sunnytqin/meta-pde
("Learning to Solve PDEs Quickly Without a Mesh", arXiv 2211.01604):

- Neural-field PINNs (SIREN coordinate MLPs) fit to PDE residual + boundary
  losses at sampled collocation points.
- Meta-learning (MAML with learned per-step per-parameter inner LRs; first-order
  LEAP) of initializations across distributions of PDE tasks.
- PDE task families: nonlinear Poisson on star-shaped domains, time-dependent
  1-D viscous Burgers, 2-D neo-Hookean hyperelasticity on porous sheets.
- Fully on-device ground-truth solvers (FEM Newton-Krylov / finite-volume),
  replacing the reference's FEniCS/mshr/PETSc CPU stack.
- Multi-chip scaling via jax.sharding.Mesh + shard_map (task-batch data
  parallelism and collocation-point sharding) with psum over ICI.

Design stance: pure functions + explicit pytrees, frozen dataclass configs
(no global mutable flags), optax optimizers, lax.scan inner loops with
rematerialization, static shapes everywhere.
"""

__version__ = "0.1.0"
