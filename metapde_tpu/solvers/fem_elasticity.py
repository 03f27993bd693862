"""JAX-native neo-Hookean FEM solver for the porous-sheet compression task.

Replaces the reference's FEniCS oracle (src/elasticity/
hyper_elasticity_fenics.py:53-195: mshr rectangle-minus-pores meshing, P1
vector FEM, PETSc Newton with relaxation 0.01 and retry back-off) with a
fully jit-compiled energy-minimization pipeline:

- Mesh: static structured triangulation of the rectangle; pore geometry is
  applied by TRACED element masking (element dead if its centroid falls in a
  pore), so one compiled solver serves every pore configuration. Nodes with
  no live element are pinned to zero through a quadratic tether.
- Energy (hyper_elasticity_fenics.py:123, identical on the NN side at
  hyper_elasticity_common.py:34-56): compressible neo-Hookean
  psi(F) = (mu/2)(J^{-2/d} Ic - d) + (kappa/2)(J - 1)^2, d = 2,
  with young's modulus bc_params[0], poisson ratio 0.49.
- BCs (hyper_elasticity_fenics.py:160-168): bottom row pinned (0,0), top row
  displaced (0, -0.12); left/right/pore boundaries traction-free (natural).
- Solve: damped Newton on the reduced energy with matrix-free CG (Hessian
  vector products via jvp-of-grad), candidate-step line search that rejects
  element inversion (psi set to a large barrier when J <= Jmin), and load
  stepping of the top displacement — the robustness the reference buys from
  PETSc relaxation back-off.

Evaluation is alive-weighted bilinear interpolation on the structured grid.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1e8
_JMIN = 0.05


def mesh_topology(resolution: int):
    """Static uniform triangulation of the unit square: (res+1)^2 nodes,
    2 res^2 triangles."""
    n = resolution

    def node(i, j):
        return i * (n + 1) + j

    tris = []
    for i in range(n):
        for j in range(n):
            a, b = node(i, j), node(i, j + 1)
            c, d = node(i + 1, j), node(i + 1, j + 1)
            tris.append([a, c, d])
            tris.append([a, d, b])
    return np.asarray(tris, dtype=np.int32)


def node_coords(resolution, xmin, xmax, ymin, ymax):
    n = resolution
    xs = np.linspace(xmin, xmax, n + 1)
    ys = np.linspace(ymin, ymax, n + 1)
    # index (i, j): i over x rows, j over y columns (node = i*(n+1)+j)
    xx, yy = np.meshgrid(xs, ys, indexing="ij")
    return np.stack([xx.reshape(-1), yy.reshape(-1)], axis=1)


def _is_in_hole(xy, per_hole_params, n_holes, tol=1e-7):
    """Vectorized hole membership over all pores
    (hyper_elasticity_common.py:190-196 with index masking :232-235)."""
    c1 = per_hole_params[:, 0]
    c2 = per_hole_params[:, 1]
    x0 = per_hole_params[:, 2]
    y0 = per_hole_params[:, 3]
    size = per_hole_params[:, 4]
    vx = xy[0] - x0
    vy = xy[1] - y0
    theta = jnp.arctan2(vx, vy)
    length = jnp.sqrt(vx ** 2 + vy ** 2)
    r0 = size * (1.0 + c1 * jnp.cos(4 * theta) + c2 * jnp.cos(8 * theta))
    inside = r0 > length + tol
    idx_mask = jnp.arange(per_hole_params.shape[0]) < n_holes
    return jnp.any(inside & idx_mask)


class ElasticityGroundTruth(NamedTuple):
    """Displacement on the structured (res+1)x(res+1) grid."""

    u_grid: jnp.ndarray       # [res+1, res+1, 2] (x-major indexing)
    alive_grid: jnp.ndarray   # [res+1, res+1] node liveness (float 0/1)
    bounds: jnp.ndarray       # [4] xmin, xmax, ymin, ymax
    final_energy: jnp.ndarray


@partial(
    jax.jit,
    static_argnames=("resolution", "xmin", "xmax", "ymin", "ymax",
                     "load_steps", "newton_steps", "top_displacement"),
)
def solve(
    params,
    resolution: int = 32,
    xmin: float = 0.0,
    xmax: float = 1.0,
    ymin: float = 0.0,
    ymax: float = 1.0,
    load_steps: int = 4,
    newton_steps: int = 25,
    top_displacement: float = -0.12,
):
    # HIGHEST matmul precision: TPU bf16-pass f32 matmuls destabilize CG
    # (see fem_poisson.solve)
    with jax.default_matmul_precision("highest"):
        return _solve_impl(params, resolution, xmin, xmax, ymin, ymax,
                           load_steps, newton_steps, top_displacement)


def _solve_impl(params, resolution, xmin, xmax, ymin, ymax, load_steps,
                newton_steps, top_displacement):
    source_params, bc_params, per_hole_params, n_holes = params

    tris = jnp.asarray(mesh_topology(resolution))
    coords = jnp.asarray(
        node_coords(resolution, xmin, xmax, ymin, ymax), jnp.float32
    )
    n_nodes = coords.shape[0]

    verts = coords[tris]                       # [E,3,2]
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    det = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    area = 0.5 * jnp.abs(det)
    inv_det = 1.0 / det
    g1 = jnp.stack([e2[:, 1] * inv_det, -e2[:, 0] * inv_det], axis=1)
    g2 = jnp.stack([-e1[:, 1] * inv_det, e1[:, 0] * inv_det], axis=1)
    g0 = -(g1 + g2)
    gradphi = jnp.stack([g0, g1, g2], axis=1)  # [E,3,2]

    # binary centroid masking: an element is dead iff its centroid is inside
    # a pore. This staircases the pore boundary (O(h) interface error, the
    # main gt accuracy limiter vs the reference's conforming mshr meshes) —
    # cut-cell area fractions were tried and destabilize the energy
    # minimization without ghost-penalty stabilization, so the robust
    # binary scheme stays.
    centroids = verts.mean(axis=1)
    elem_dead = jax.vmap(
        lambda c: _is_in_hole(c, per_hole_params, n_holes)
    )(centroids)
    elem_alive = 1.0 - elem_dead.astype(jnp.float32)

    node_alive = jax.ops.segment_max(
        jnp.repeat(elem_alive, 3), tris.reshape(-1), num_segments=n_nodes
    )

    young_mod = bc_params[0]
    poisson_ratio = 0.49
    shear_mod = young_mod / (2.0 * (1.0 + poisson_ratio))
    bulk_mod = young_mod / (3.0 * (1.0 - 2.0 * poisson_ratio))

    on_bottom = jnp.isclose(coords[:, 1], ymin)
    on_top = jnp.isclose(coords[:, 1], ymax)
    constrained = on_bottom | on_top

    def energy(z, top_disp):
        bc_val = jnp.where(
            on_top[:, None],
            jnp.stack([jnp.zeros(n_nodes), jnp.full(n_nodes, top_disp)], 1),
            jnp.zeros((n_nodes, 2)),
        )
        u = jnp.where(constrained[:, None], bc_val, z.reshape(n_nodes, 2))
        ue = u[tris]                                        # [E,3,2]
        grad_u = jnp.einsum("ekd,ekg->edg", ue, gradphi)    # [E,2(dof),2(x)]
        F = jnp.eye(2)[None] + grad_u
        J = F[:, 0, 0] * F[:, 1, 1] - F[:, 0, 1] * F[:, 1, 0]
        Ic = jnp.sum(F * F, axis=(1, 2))
        # d = 2: J^{-2/d} = 1/J. Near-inversion handling: clamp J inside the
        # neo-Hookean term and add a smooth quadratic penalty below _JMIN —
        # unlike a hard +inf barrier this keeps a restoring gradient on
        # crushed elements so Newton can pull them back out.
        psi = (shear_mod / 2.0) * (Ic / jnp.maximum(J, _JMIN) - 2.0) \
            + (bulk_mod / 2.0) * (J - 1.0) ** 2 \
            + (1e4 * shear_mod) * jnp.maximum(_JMIN - J, 0.0) ** 2
        elastic = jnp.sum(elem_alive * area * psi)
        # tethers: dead (in-pore) nodes relax to zero displacement, and the
        # unused z entries at constrained nodes relax to zero (keeps the
        # Hessian nonsingular on those rows)
        dead_w = (1.0 - node_alive) * (1.0 - constrained.astype(jnp.float32))
        tether = 0.5 * jnp.sum(dead_w[:, None] * u ** 2) + 0.5 * jnp.sum(
            constrained.astype(jnp.float32)[:, None] * z.reshape(n_nodes, 2) ** 2
        )
        return elastic + tether

    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.03, 0.01])

    def newton_solve(z, top_disp):
        e_fn = lambda zz: energy(zz, top_disp)
        g_fn = jax.grad(e_fn)

        def step(z, _):
            g = g_fn(z)
            hvp = lambda v: jax.jvp(g_fn, (z,), (v,))[1]
            dz, _ = jax.scipy.sparse.linalg.cg(hvp, -g, tol=1e-5, maxiter=200)
            dz = jnp.where(jnp.isfinite(dz), dz, 0.0)
            # candidate-step line search on the true energy
            cand = jax.vmap(lambda a: e_fn(z + a * dz))(alphas)
            cand = jnp.where(jnp.isfinite(cand), cand, jnp.inf)
            best = jnp.argmin(cand)
            improved = cand[best] < e_fn(z)
            z = jnp.where(improved, z + alphas[best] * dz, z)
            return z, None

        z, _ = jax.lax.scan(step, z, None, length=newton_steps)
        return z

    # warm start each load increment with the affine compression profile
    # u_y += ddisp * (y - ymin)/(ymax - ymin): keeps J = 1 + ddisp > 0
    # uniformly, so no element starts a load step inverted.
    frac = (coords[:, 1] - ymin) / (ymax - ymin)
    affine = jnp.stack([jnp.zeros(n_nodes), frac], axis=1).reshape(-1)
    ddisp = top_displacement / load_steps

    z = jnp.zeros(n_nodes * 2)
    for k in range(1, load_steps + 1):
        z = z + ddisp * affine
        z = newton_solve(z, top_displacement * k / load_steps)

    final_e = energy(z, top_displacement)
    bc_val = jnp.where(
        on_top[:, None],
        jnp.stack([jnp.zeros(n_nodes), jnp.full(n_nodes, top_displacement)], 1),
        jnp.zeros((n_nodes, 2)),
    )
    u = jnp.where(constrained[:, None], bc_val, z.reshape(n_nodes, 2))

    m = resolution + 1
    return ElasticityGroundTruth(
        u_grid=u.reshape(m, m, 2),
        alive_grid=node_alive.reshape(m, m),
        bounds=jnp.asarray([xmin, xmax, ymin, ymax], jnp.float32),
        final_energy=final_e,
    )


def evaluate(gt: ElasticityGroundTruth, x):
    """Displacement at physical point x [2]: alive-weighted bilinear interp."""
    m = gt.u_grid.shape[0]
    xmin, xmax, ymin, ymax = gt.bounds[0], gt.bounds[1], gt.bounds[2], gt.bounds[3]

    fx = jnp.clip((x[0] - xmin) / (xmax - xmin), 0.0, 1.0) * (m - 1)
    fy = jnp.clip((x[1] - ymin) / (ymax - ymin), 0.0, 1.0) * (m - 1)
    i0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, m - 2)
    j0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, m - 2)
    wx = fx - i0
    wy = fy - j0

    w = jnp.asarray([
        (1 - wx) * (1 - wy), (1 - wx) * wy, wx * (1 - wy), wx * wy,
    ])
    idx_i = jnp.asarray([i0, i0, i0 + 1, i0 + 1])
    idx_j = jnp.asarray([j0, j0 + 1, j0, j0 + 1])
    vals = gt.u_grid[idx_i, idx_j]       # [4,2]
    alive = gt.alive_grid[idx_i, idx_j]  # [4]

    w_alive = w * alive
    denom = jnp.sum(w_alive)
    plain = jnp.einsum("k,kd->d", w, vals)
    weighted = jnp.einsum("k,kd->d", w_alive, vals) / jnp.maximum(denom, 1e-8)
    return jnp.where(denom > 1e-6, weighted, plain)
