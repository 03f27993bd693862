"""JAX-native P1 FEM solver for the nonlinear Poisson star-domain problem.

Replaces the reference's FEniCS oracle (src/poisson/poisson_fenics.py:40-91:
mshr polygon meshing + P2 FEM + PETSc Newton) with a fully jit-compiled,
TPU-resident pipeline:

- Mesh: structured polar triangulation of the unit disk (center fan + ring
  quads split into triangles), mapped onto the star domain
  r(theta) = 1 + c1 cos 4theta + c2 cos 8theta. Connectivity is static
  (depends only on resolution); node coordinates are traced functions of the
  geometry parameters, so one compiled solver serves every task geometry.
- Weak form (poisson_fenics.py:85-89): find u with u=g on the boundary s.t.
  int (1 + 0.1 u^2) grad u . grad v dx + int f v dx = 0 for all v.
- Assembly: vectorized per-element residuals (edge-midpoint quadrature,
  exact for quadratics) scattered with segment_sum — no sparse matrices.
- Newton with matrix-free BiCGStab (Jacobian-vector products via jax.jvp)
  and Jacobi preconditioning, replacing PETSc/MUMPS.

Evaluation at arbitrary points is bilinear interpolation in the logical
(rho, theta) chart — jit/vmap friendly, so validation stays on device.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .newton import newton_krylov

# Edge-midpoint quadrature barycentric weights: row q = barycentric coords of
# midpoint q; exact for degree-2 integrands on triangles.
_MIDPT = np.array(
    [[0.5, 0.5, 0.0], [0.0, 0.5, 0.5], [0.5, 0.0, 0.5]], dtype=np.float32
)


def mesh_topology(resolution: int):
    """Static triangulation of the polar (rho, theta) grid.

    Returns (tris [E,3] int32, nr, nt). Node 0 is the disk center; node
    1 + (i-1)*nt + j is ring i (1..nr), angle j (0..nt-1).
    """
    nr = max(8, 4 * resolution)
    nt = max(32, 16 * resolution)

    def node(i, j):
        return 1 + (i - 1) * nt + (j % nt)

    tris = []
    for j in range(nt):  # center fan
        tris.append([0, node(1, j), node(1, j + 1)])
    for i in range(1, nr):  # ring quads -> 2 triangles
        for j in range(nt):
            a, b = node(i, j), node(i, j + 1)
            c, d = node(i + 1, j), node(i + 1, j + 1)
            tris.append([a, c, d])
            tris.append([a, d, b])
    return np.asarray(tris, dtype=np.int32), nr, nt


def node_coords(geo_params, nr: int, nt: int):
    """Physical coordinates of mesh nodes for a star geometry (traced)."""
    c1, c2 = geo_params
    thetas = jnp.arange(nt) * (2.0 * jnp.pi / nt)
    rhos = jnp.arange(1, nr + 1) / nr
    r_theta = 1.0 + c1 * jnp.cos(4.0 * thetas) + c2 * jnp.cos(8.0 * thetas)
    r = rhos[:, None] * r_theta[None, :]
    x = r * jnp.cos(thetas)[None, :]
    y = r * jnp.sin(thetas)[None, :]
    ring_pts = jnp.stack([x.reshape(-1), y.reshape(-1)], axis=1)
    return jnp.concatenate([jnp.zeros((1, 2)), ring_pts], axis=0)


def _element_geometry(coords, tris):
    """Per-element P1 geometry: barycentric-basis gradients and areas."""
    verts = coords[tris]  # [E,3,2]
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    det = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]  # 2*signed area
    area = 0.5 * jnp.abs(det)
    inv_det = 1.0 / det
    # inv(M) rows give grad lambda1, grad lambda2 (M = [e1 e2] columns)
    g1 = jnp.stack([e2[:, 1] * inv_det, -e2[:, 0] * inv_det], axis=1)
    g2 = jnp.stack([-e1[:, 1] * inv_det, e1[:, 0] * inv_det], axis=1)
    g0 = -(g1 + g2)
    gradphi = jnp.stack([g0, g1, g2], axis=1)  # [E,3,2]
    midpts = jnp.einsum("qk,ekd->eqd", jnp.asarray(_MIDPT), verts)  # [E,3,2]
    return gradphi, area, midpts


def _auto_precond(resolution: int) -> str:
    """One home for the "auto" rule (solve and solve_x64 share it): mg for
    resolution >= 32, where f32 Jacobi-BiCGStab stagnates on the stiffness
    condition number; jacobi below (mg needs an even resolution chain)."""
    return "mg" if resolution >= 32 and resolution % 2 == 0 else "jacobi"


class PoissonGroundTruth(NamedTuple):
    """FEM solution on the (rho, theta) chart; u_grid[0] is the center value."""

    u_grid: jnp.ndarray  # [nr+1, nt]
    geo_params: jnp.ndarray  # [2] (c1, c2)
    residual_norm: jnp.ndarray


@partial(jax.jit, static_argnames=("resolution", "max_newton_steps",
                                   "precond", "rel_tol", "krylov_tol"))
def solve(params, resolution: int = 16, max_newton_steps: int = 12,
          precond: str = "auto", rel_tol: float = None,
          krylov_tol: float = 1e-6):
    """Solve one Poisson task; returns a PoissonGroundTruth pytree.

    The whole solve runs under HIGHEST matmul precision: TPUs execute f32
    matmuls as bf16 passes by default, which is enough to stall/explode
    BiCGStab on the mapped star meshes (observed: diverged ground truths on
    TPU while CPU converged; fixed by this pin).

    precond: "jacobi", "mg" (geometric multigrid V-cycle, multigrid.py), or
    "auto" (= mg for resolution >= 32, where f32 Jacobi-BiCGStab stagnates
    on the stiffness condition number; jacobi below).
    """
    if precond == "auto":
        precond = _auto_precond(resolution)
    if rel_tol is None:
        # the Newton residual tolerance must shrink with the discretization
        # error (~h^2) for refinement to pay off; floor near f32 noise
        rel_tol = max(2e-5 * (16.0 / resolution) ** 2, 1e-6)
    with jax.default_matmul_precision("highest"):
        return _solve_impl(params, resolution, max_newton_steps, precond,
                           rel_tol, krylov_tol)


def _solve_impl(params, resolution, max_newton_steps, precond="jacobi",
                rel_tol=2e-5, krylov_tol=1e-6):
    source_params, bc_params, geo_params = params
    tris_np, nr, nt = mesh_topology(resolution)
    tris = jnp.asarray(tris_np)
    n_nodes = 1 + nr * nt

    coords = node_coords(geo_params, nr, nt)
    gradphi, area, midpts = _element_geometry(coords, tris)

    # Source term at quadrature points (poisson_common.py:142-146)
    def source_fn(x):
        d2 = (x[0] - source_params[:, 0]) ** 2 + (x[1] - source_params[:, 1]) ** 2
        return jnp.sum(source_params[:, 2] * jnp.exp(-d2))

    f_q = jax.vmap(jax.vmap(source_fn))(midpts)  # [E,3]

    # Dirichlet data on the outer ring (poisson_common.py:122-134)
    bdry_idx = jnp.arange(1 + (nr - 1) * nt, n_nodes)
    bdry_mask = jnp.zeros((n_nodes,), bool).at[bdry_idx].set(True)

    def bc_fn(x):
        theta = jnp.arctan2(x[1], x[0])
        return (
            bc_params[0]
            + bc_params[1] / 4.0 * jnp.cos(theta)
            + bc_params[2] / 4.0 * jnp.sin(theta)
            + bc_params[3] / 4.0 * jnp.cos(2.0 * theta)
            + bc_params[4] / 4.0 * jnp.sin(2.0 * theta)
        )

    g_full = jnp.where(bdry_mask, jax.vmap(bc_fn)(coords), 0.0)

    mq = jnp.asarray(_MIDPT)  # [q, k]

    def residual(u):
        ue = u[tris]  # [E,3]
        grad_u = jnp.einsum("ek,ekd->ed", ue, gradphi)  # [E,2]
        uq = ue @ mq.T  # [E,3] values at midpoints
        c_bar = jnp.mean(1.0 + 0.1 * uq ** 2, axis=1)  # [E]
        flux = jnp.einsum("e,ed,ekd->ek", area * c_bar, grad_u, gradphi)
        load = (area[:, None] / 3.0) * jnp.einsum("eq,qk->ek", f_q, mq)
        r_elem = flux + load
        r = jax.ops.segment_sum(
            r_elem.reshape(-1), tris.reshape(-1), num_segments=n_nodes
        )
        return jnp.where(bdry_mask, u - g_full, r)

    # Jacobi preconditioner from the linear (c=1) stiffness diagonal
    diag_elem = area[:, None] * jnp.sum(gradphi ** 2, axis=2)
    diag = jax.ops.segment_sum(
        diag_elem.reshape(-1), tris.reshape(-1), num_segments=n_nodes
    )
    diag = jnp.where(bdry_mask, 1.0, jnp.maximum(diag, 1e-12))

    if precond == "mg":
        from .multigrid import make_polar_mg_preconditioner

        precond_apply = make_polar_mg_preconditioner(
            geo_params, resolution, pre_sweeps=3, post_sweeps=3,
        )
        krylov_iters = 150
    else:
        precond_apply = None
        krylov_iters = max(200, 20 * resolution)

    u0 = g_full
    result = newton_krylov(
        residual,
        u0,
        max_steps=max_newton_steps,
        rel_tol=rel_tol,
        krylov_tol=krylov_tol,
        krylov_max_iters=krylov_iters,
        precond_diag=diag,
        precond_apply=precond_apply,
    )

    u = result.u
    center = u[0]
    rings = u[1:].reshape(nr, nt)
    u_grid = jnp.concatenate([jnp.full((1, nt), center), rings], axis=0)
    return PoissonGroundTruth(
        u_grid=u_grid,
        geo_params=jnp.asarray(geo_params),
        residual_norm=result.residual_norm,
    )


@partial(jax.jit, static_argnames=("resolution", "max_newton_steps",
                                   "precond", "rel_tol", "krylov_tol"))
def _solve_impl_x64(params, resolution, max_newton_steps, precond, rel_tol,
                    krylov_tol):
    return _solve_impl(params, resolution, max_newton_steps, precond,
                       rel_tol, krylov_tol)


def solve_x64(params, resolution: int = 32, max_newton_steps: int = 20,
              rel_tol: float = None, krylov_tol: float = 1e-9):
    """Double-precision oracle solve: breaks the f32 refinement ceiling.

    The f32 pipeline bottoms out around rel_mse ~1e-6 at res 16-32 (residual
    round-off amplified by the stiffness condition number); the reference's
    PETSc path is f64 throughout and reaches ~1e-7 at res 32
    (BASELINE.md, resultAnalysis cell 3). This variant retraces the same
    `_solve_impl` under `jax.enable_x64` with h^2-scaled Newton tolerances
    un-floored, for the accuracy-sweep baseline (cli/solver_baseline) and
    high-accuracy cached ground truths. Eager wrapper — do not call inside
    an outer jit (the x64 context must be active during tracing)."""
    if rel_tol is None:
        rel_tol = max(2e-5 * (16.0 / resolution) ** 2, 1e-10)
    # the multigrid builder is dtype-generic (levels inherit geo_params'
    # dtype), so the f32 "auto" rule carries over
    precond = _auto_precond(resolution)
    with jax.enable_x64(True):
        params64 = jax.tree_util.tree_map(
            lambda a: (jnp.asarray(a, jnp.float64)
                       if jnp.issubdtype(jnp.result_type(a), jnp.floating)
                       else jnp.asarray(a)),
            params,
        )
        with jax.default_matmul_precision("highest"):
            return _solve_impl_x64(params64, resolution, max_newton_steps,
                                   precond, rel_tol, krylov_tol)


def _cubic_weights(t):
    """Lagrange cubic basis through nodes {-1, 0, 1, 2} evaluated at t —
    exact for cubics (O(h^4) interpolation), unlike Catmull-Rom whose
    finite-difference slopes are only quadratic-exact."""
    wm1 = -t * (t - 1.0) * (t - 2.0) / 6.0
    w0 = (t + 1.0) * (t - 1.0) * (t - 2.0) / 2.0
    w1 = -(t + 1.0) * t * (t - 2.0) / 2.0
    w2 = (t + 1.0) * t * (t - 1.0) / 6.0
    return jnp.stack([wm1, w0, w1, w2])


def _pad_rows_for_cubic(u_grid):
    """[nr+3, nt] grid padded for 4-row cubic stencils: row 0 is ring 1
    reflected through the center (u(-h, th) = u(h, th + pi) — smooth polar
    charts of smooth fields satisfy this identity exactly), top row is the
    cubic extrapolation past the Dirichlet boundary (exact for cubics, so
    it does not degrade the interpolation order in the last cell)."""
    nt = u_grid.shape[1]
    below = jnp.roll(u_grid[1], -(nt // 2))[None, :]
    top = (4.0 * u_grid[-1] - 6.0 * u_grid[-2] + 4.0 * u_grid[-3]
           - u_grid[-4])[None, :]
    return jnp.concatenate([below, u_grid, top], axis=0)


def _chart_cubic(padded, nr: int, nt: int, fi, fj):
    """Bicubic Lagrange interpolation at logical grid coords (fi in [0, nr]
    radial, fj periodic angular), given a _pad_rows_for_cubic grid."""
    i0 = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, nr - 1)
    ti = fi - i0
    j0 = jnp.floor(fj).astype(jnp.int32)
    tj = fj - j0
    wi = _cubic_weights(ti)
    wj = _cubic_weights(tj)
    rows = i0 + jnp.arange(4)  # grid rows i0-1..i0+2 -> padded i0..i0+3
    cols = (j0 - 1 + jnp.arange(4)) % nt
    patch = padded[rows[:, None], cols[None, :]]  # [4, 4]
    return wi @ patch @ wj


def evaluate_cubic(gt: PoissonGroundTruth, x):
    """Bicubic chart evaluation (jit/vmap friendly): O(h^4) interpolation
    between nodes, vs `evaluate`'s O(h^2) bilinear. Required to realize the
    order of `solve_richardson` solutions (bilinear interpolation error
    would dominate the extrapolated nodal accuracy); also valid, and
    harmless, on plain P1 solutions."""
    nr = gt.u_grid.shape[0] - 1
    nt = gt.u_grid.shape[1]
    c1, c2 = gt.geo_params[0], gt.geo_params[1]
    theta = jnp.arctan2(x[1], x[0]) % (2.0 * jnp.pi)
    r_theta = 1.0 + c1 * jnp.cos(4.0 * theta) + c2 * jnp.cos(8.0 * theta)
    rho = jnp.clip(jnp.linalg.norm(x) / r_theta, 0.0, 1.0)
    padded = _pad_rows_for_cubic(gt.u_grid)  # hoisted out of vmapped loops
    return _chart_cubic(padded, nr, nt, rho * nr,
                        theta / (2.0 * jnp.pi) * nt)


def solve_richardson(params, resolution: int = 16, rel_tol: float = 1e-8,
                     krylov_tol: float = 1e-10, max_newton_steps: int = 30):
    """Higher-order Poisson oracle: Richardson extrapolation of nested x64
    P1 solves, closing the convergence-order gap to the reference's
    quadratic FEM (src/poisson/poisson_fenics.py:58, P2 elements).

    P1 nodal values on the smoothly-mapped polar chart carry an h^2 error
    with a smooth leading term, so solving at `resolution` and
    2*`resolution` (whose lattices nest: nr and nt both double) and
    combining u* = u_f + (u_f - P u_c)/3 cancels it, leaving O(h^3+). The
    prolongation P is bicubic in the chart (O(h^4), so it does not pollute
    the cancellation), and evaluation of the result must use
    `evaluate_cubic` — bilinear would reintroduce an O(h^2) floor between
    nodes. Inner Newton tolerances are pinned well below the h^4 target so
    algebraic error never masks the extrapolation (the default x64
    schedule only tracks h^2).

    Cost: one extra solve at 2x resolution (~4x the coarse solve), for
    roughly squared accuracy — a strictly better accuracy-per-second
    Pareto than refining P1 (measured: cli/gt_convergence --oracle=richardson).
    """
    if resolution < 2:
        raise ValueError("solve_richardson needs resolution >= 2 so the "
                         "mesh_topology lattices nest (nr/nt minimums)")
    gt_c = solve_x64(params, resolution=resolution, rel_tol=rel_tol,
                     krylov_tol=krylov_tol, max_newton_steps=max_newton_steps)
    gt_f = solve_x64(params, resolution=2 * resolution, rel_tol=rel_tol,
                     krylov_tol=krylov_tol, max_newton_steps=max_newton_steps)
    u_c, u_f = gt_c.u_grid, gt_f.u_grid
    nr_c, nt_c = u_c.shape[0] - 1, u_c.shape[1]
    nr_f, nt_f = u_f.shape[0] - 1, u_f.shape[1]
    assert nr_f == 2 * nr_c and nt_f == 2 * nt_c, "lattices must nest"
    with jax.enable_x64(True):  # keep the h^2-cancellation in f64
        padded = _pad_rows_for_cubic(u_c)
        fi = jnp.arange(nr_f + 1) / 2.0
        fj = jnp.arange(nt_f) / 2.0
        prolonged = jax.vmap(
            lambda a: jax.vmap(
                lambda b: _chart_cubic(padded, nr_c, nt_c, a, b)
            )(fj)
        )(fi)
        u_star = u_f + (u_f - prolonged) / 3.0
        # Dirichlet row is exact on the fine lattice; never extrapolate it
        u_star = u_star.at[-1].set(u_f[-1])
    return PoissonGroundTruth(
        u_grid=u_star,
        geo_params=gt_f.geo_params,
        residual_norm=gt_f.residual_norm,
    )


def evaluate(gt: PoissonGroundTruth, x):
    """Evaluate the FEM solution at physical point x [2] (jit/vmap friendly).

    Bilinear interpolation in the logical (rho, theta) chart; points outside
    the star are clamped to the boundary (the analog of FEniCS
    set_allow_extrapolation(True), trainer_util.py:70).
    """
    nr = gt.u_grid.shape[0] - 1
    nt = gt.u_grid.shape[1]
    c1, c2 = gt.geo_params[0], gt.geo_params[1]

    theta = jnp.arctan2(x[1], x[0]) % (2.0 * jnp.pi)
    r_theta = 1.0 + c1 * jnp.cos(4.0 * theta) + c2 * jnp.cos(8.0 * theta)
    rho = jnp.clip(jnp.linalg.norm(x) / r_theta, 0.0, 1.0)

    fi = rho * nr
    i0 = jnp.clip(jnp.floor(fi).astype(jnp.int32), 0, nr - 1)
    wi = fi - i0

    fj = theta / (2.0 * jnp.pi) * nt
    j0 = jnp.clip(jnp.floor(fj).astype(jnp.int32), 0, nt - 1)
    wj = fj - j0
    j1 = (j0 + 1) % nt

    u00 = gt.u_grid[i0, j0]
    u01 = gt.u_grid[i0, j1]
    u10 = gt.u_grid[i0 + 1, j0]
    u11 = gt.u_grid[i0 + 1, j1]
    return (
        (1 - wi) * ((1 - wj) * u00 + wj * u01) + wi * ((1 - wj) * u10 + wj * u11)
    )
