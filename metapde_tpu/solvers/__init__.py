"""JAX-native ground-truth solvers.

These replace the reference's entire native solver stack — DOLFIN C++ FEM
assembly, mshr/CGAL meshing, PETSc/MUMPS linear solves (SURVEY.md section
2.4) — with jit-compiled, TPU-resident equivalents:

- fem_poisson: P1 FEM on a polar-mapped structured star-domain mesh,
  matrix-free Newton-Krylov (replaces poisson_fenics.py + mshr + PETSc).
- fv_burgers: finite-volume Godunov + SSP-RK3 viscous Burgers solver
  (replaces td_burgers_fenics.py implicit-Euler FEM; same role as the
  reference's own JAX FV baseline td_burgers_jax_new.py).
- fem_elasticity: neo-Hookean energy-minimization FEM on a pore-masked
  structured mesh with Newton-CG + load stepping (replaces
  hyper_elasticity_fenics.py + PETSc Newton).

Ground-truth solutions are returned as plain pytrees with jit-compatible
point-evaluation functions, so validation runs entirely on device (the
reference evaluates FEM solutions point-by-point on the host CPU,
trainer_util.py:71).
"""

from . import fem_poisson  # noqa: F401
from . import fem_elasticity  # noqa: F401
from . import fem_steady_burgers  # noqa: F401
from . import fem_td_burgers  # noqa: F401
from . import fv_burgers  # noqa: F401
from . import interpolation  # noqa: F401
