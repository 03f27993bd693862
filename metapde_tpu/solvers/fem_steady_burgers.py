"""JAX FEM solver for steady 2-D viscous Burgers flow past random pores.

Ground truth for the steady_burgers task family. The reference's version of
this solver is src/burgers/burgers_fenics.py:54-166 (mshr
rectangle-minus-holes meshing, P2 vector FEM, PETSc Newton with 0.2x
relaxation retry); its task module was broken/unregistered
(src/burgers/burgers_def.py:6 imports a nonexistent symbol), so this build
supplies a working replacement on the boundary-snapped structured-mesh
machinery shared with fem_elasticity (solvers/mesh2d.py — no-slip is imposed
at nodes projected ONTO the pore boundaries, not at a staircase
approximation of them):

    u . grad u = (1/Re) lap u      in Omega \\ pores
    u = inlet profile              on x = xmin
    u = outlet profile             on x = xmax
    u = 0                          on walls and pore boundaries (no-slip)

Galerkin residual on P1 triangles (edge-midpoint quadrature, exact for the
quadratic advection integrand), matrix-free Newton-BiCGStab.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .mesh2d import evaluate_p1, mesh_topology, node_coords, snapped_geometry
from .newton import newton_krylov

_MIDPT = np.array(
    [[0.5, 0.5, 0.0], [0.0, 0.5, 0.5], [0.5, 0.0, 0.5]], dtype=np.float32
)


class SteadyBurgersGroundTruth(NamedTuple):
    u_grid: jnp.ndarray      # [m, m, 2] velocity at snapped nodes
    coords_grid: jnp.ndarray  # [m, m, 2] snapped node positions
    alive_grid: jnp.ndarray  # [m, m]
    elem_alive: jnp.ndarray  # [2*res^2]
    bounds: jnp.ndarray      # [4]
    residual_norm: jnp.ndarray


@partial(jax.jit, static_argnames=("resolution", "xmin", "xmax", "ymin",
                                   "ymax", "max_newton_steps", "precond"))
def solve(params, resolution: int = 32, xmin: float = -1.0, xmax: float = 1.0,
          ymin: float = -1.0, ymax: float = 1.0, max_newton_steps: int = 20,
          precond: str = "auto"):
    """precond: "jacobi", "mg" (rect-lattice geometric multigrid on the
    snapped pore meshes, multigrid.make_rect_mg_preconditioner), or "auto".

    auto = jacobi at every resolution: measured at res 64/128 (CPU), the
    V-cycle reaches the same residual but costs 1.8x/1.0x the wall time —
    the rect chart at Re <= 10 is isotropic and mildly conditioned, so
    Jacobi-BiCGStab does not stagnate the way the polar star chart does
    (fem_poisson). mg stays available for stiffer regimes."""
    with jax.default_matmul_precision("highest"):
        return _solve_impl(params, resolution, xmin, xmax, ymin, ymax,
                           max_newton_steps, precond)


def _solve_impl(params, resolution, xmin, xmax, ymin, ymax, max_newton_steps,
                precond="auto"):
    source_params, bc_params, per_hole_params, n_holes = params
    re = source_params[0]
    nu = 1.0 / re

    tris = jnp.asarray(mesh_topology(resolution))
    # dtype follows the task params (f64 under solve_x64)
    dtype = jnp.result_type(bc_params)
    coords0 = jnp.asarray(
        node_coords(resolution, xmin, xmax, ymin, ymax), dtype
    )
    n_nodes = coords0.shape[0]

    on_inlet = jnp.isclose(coords0[:, 0], xmin)
    on_outlet = jnp.isclose(coords0[:, 0], xmax)
    on_walls = (jnp.isclose(coords0[:, 1], ymin)
                | jnp.isclose(coords0[:, 1], ymax))
    on_rect = on_inlet | on_outlet | on_walls

    cell_h = min((xmax - xmin), (ymax - ymin)) / resolution
    geom = snapped_geometry(tris, coords0, per_hole_params, n_holes,
                            cell_h, boundary_fixed=on_rect)
    coords = geom.coords
    area, gradphi = geom.area, geom.gradphi
    elem_alive, node_alive = geom.elem_alive, geom.node_alive
    mq = jnp.asarray(_MIDPT)

    node_dead_adjacent = 1.0 - jax.ops.segment_min(
        jnp.repeat(elem_alive, 3), tris.reshape(-1), num_segments=n_nodes
    )

    # no-slip: outer walls, pore-boundary nodes (alive nodes touching dead
    # elements — with snapping these sit exactly ON the pore boundary), and
    # fully dead nodes
    noslip = on_walls | (node_dead_adjacent > 0.5) | (node_alive < 0.5)
    constrained = on_inlet | on_outlet | noslip

    # inlet/outlet profiles (burgers_common.py:55-77): bc_params[i] * sin(pi
    # * (y - ymin)/(ymax - ymin)) per velocity component
    s = jnp.sin(jnp.pi * (coords[:, 1] - ymin) / (ymax - ymin))
    bc_val = jnp.zeros((n_nodes, 2))
    bc_val = jnp.where(on_inlet[:, None], bc_params[0][None, :] * s[:, None],
                       bc_val)
    bc_val = jnp.where(on_outlet[:, None], bc_params[1][None, :] * s[:, None],
                       bc_val)
    bc_val = jnp.where(noslip[:, None] & ~on_inlet[:, None]
                       & ~on_outlet[:, None], 0.0, bc_val)

    def residual(z):
        u = jnp.where(constrained[:, None], bc_val, z.reshape(n_nodes, 2))
        ue = u[tris]                                      # [E,3,2]
        grad_u = jnp.einsum("ekd,ekg->edg", ue, gradphi)  # [E,2,2]
        uq = jnp.einsum("qk,ekd->eqd", mq, ue)            # [E,3q,2]
        # advection: (u . grad) u at quad points, tested against phi_k(m_q)
        adv_q = jnp.einsum("eqg,edg->eqd", uq, grad_u)    # [E,3q,2]
        adv = jnp.einsum("e,eqd,qk->ekd", area / 3.0, adv_q, mq)
        visc = nu * jnp.einsum("e,edg,ekg->ekd", area, grad_u, gradphi)
        r_elem = (adv + visc) * elem_alive[:, None, None]
        r = jax.ops.segment_sum(
            r_elem.reshape(-1, 2).reshape(-1),
            jnp.repeat(tris.reshape(-1), 2) * 2
            + jnp.tile(jnp.arange(2), tris.size),
            num_segments=n_nodes * 2,
        ).reshape(n_nodes, 2)
        r = jnp.where(constrained[:, None], u - bc_val,
                      r)
        # dead nodes not on any constraint: pin z
        free_dead = (node_alive < 0.5) & ~constrained
        r = jnp.where(free_dead[:, None], z.reshape(n_nodes, 2), r)
        return r.reshape(-1)

    # Jacobi preconditioner from the viscous diagonal
    diag_elem = nu * area[:, None] * jnp.sum(gradphi ** 2, axis=2) \
        * elem_alive[:, None]
    diag = jax.ops.segment_sum(
        diag_elem.reshape(-1), tris.reshape(-1), num_segments=n_nodes
    )
    diag = jnp.maximum(diag, 1e-6)
    diag2 = jnp.stack([diag, diag], axis=1)
    diag2 = jnp.where(constrained[:, None], 1.0, diag2).reshape(-1)

    if precond == "auto":
        precond = "jacobi"
    precond_apply = None
    if precond == "mg":
        from .multigrid import make_rect_mg_preconditioner

        precond_apply = make_rect_mg_preconditioner(
            per_hole_params, n_holes, resolution,
            xmin, xmax, ymin, ymax, coeff=nu, vector_dim=2,
        )

    # tighter tolerances in f64 (the f32 Newton stalls below ~2e-5)
    f64 = dtype == jnp.float64
    z0 = jnp.zeros(n_nodes * 2, dtype)
    result = newton_krylov(
        residual, z0, max_steps=max_newton_steps,
        rel_tol=1e-9 if f64 else 2e-5,
        krylov_tol=1e-10 if f64 else 1e-6,
        krylov_max_iters=max(300, 20 * resolution),
        precond_diag=diag2,
        precond_apply=precond_apply,
    )

    u = jnp.where(constrained[:, None], bc_val,
                  result.u.reshape(n_nodes, 2))
    m = resolution + 1
    return SteadyBurgersGroundTruth(
        u_grid=u.reshape(m, m, 2),
        coords_grid=coords.reshape(m, m, 2),
        alive_grid=node_alive.reshape(m, m),
        elem_alive=elem_alive,
        bounds=jnp.asarray([xmin, xmax, ymin, ymax], dtype),
        residual_norm=result.residual_norm,
    )


def solve_x64(params, resolution: int = 64, xmin: float = -1.0,
              xmax: float = 1.0, ymin: float = -1.0, ymax: float = 1.0,
              max_newton_steps: int = 30):
    """Double-precision solve for accuracy sweeps (the reference's
    Newton/MUMPS path, burgers_fenics.py:54-166, is f64 throughout).
    Eager wrapper — do not call inside an outer jit."""
    with jax.enable_x64(True):
        params64 = jax.tree_util.tree_map(
            lambda a: (jnp.asarray(a, jnp.float64)
                       if jnp.issubdtype(jnp.result_type(a), jnp.floating)
                       else jnp.asarray(a)),
            params,
        )
        with jax.default_matmul_precision("highest"):
            return _solve_impl(params64, resolution, xmin, xmax, ymin, ymax,
                               max_newton_steps)


def evaluate(gt: SteadyBurgersGroundTruth, x):
    """P1 interpolation on the snapped conforming mesh."""
    return evaluate_p1(gt.u_grid, gt.coords_grid, gt.elem_alive, gt.bounds, x)
