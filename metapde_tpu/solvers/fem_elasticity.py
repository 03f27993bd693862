"""JAX-native neo-Hookean FEM solver for the porous-sheet compression task.

Replaces the reference's FEniCS oracle (src/elasticity/
hyper_elasticity_fenics.py:53-195: mshr rectangle-minus-pores meshing, P1
vector FEM, PETSc Newton with relaxation 0.01 and retry back-off) with a
fully jit-compiled energy-minimization pipeline:

- Mesh: static structured triangulation of the rectangle, made conforming to
  the (traced) pore boundaries by node snapping (solvers/mesh2d.py): nodes
  just inside a pore are projected radially onto its boundary, so cut
  elements have their interior vertices ON the pore boundary (O(h^2)
  interface error instead of the O(h) staircase of binary masking). Topology
  stays static, so one compiled solver serves every pore configuration.
  Elements inside a pore (or degenerated to slivers by snapping) are dead;
  nodes with no live element are pinned to zero through a quadratic tether.
- Energy (hyper_elasticity_fenics.py:123, identical on the NN side at
  hyper_elasticity_common.py:34-56): compressible neo-Hookean
  psi(F) = (mu/2)(J^{-2/d} Ic - d) + (kappa/2)(J - 1)^2, d = 2,
  with young's modulus bc_params[0], poisson ratio 0.49.
- BCs (hyper_elasticity_fenics.py:160-168): bottom row pinned (0,0), top row
  displaced (0, -0.12); left/right/pore boundaries traction-free (natural).
- Solve: CASCADIC — the coarsest level runs damped Newton with load stepping
  of the top displacement from an affine warm start (the robustness the
  reference buys from PETSc relaxation back-off); each finer level is
  warm-started by P1 interpolation of the coarser solution and Newton-refined
  at full load. The compressed porous sheet has competing buckling branches
  (the reference's validation mirrors solutions for the same reason,
  trainer_util.py:525-549); the cascade keeps every resolution on ONE branch,
  which a fresh fine-level solve does not (observed: res-96 fresh Newton
  lands at energy 0.0133 where the cascade reaches <= 0.0088).
  Inner linear solves are matrix-free CG on Hessian-vector products with a
  candidate-step line search that rejects element inversion.

Evaluation is P1 barycentric interpolation on the snapped mesh
(mesh2d.evaluate_p1).
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .mesh2d import (
    evaluate_p1,
    is_in_hole,
    mesh_topology,
    node_coords,
    snapped_geometry,
)

# compatibility aliases (older call sites / tests)
_is_in_hole = is_in_hole

_JMIN = 0.05


class ElasticityGroundTruth(NamedTuple):
    """Displacement on the snapped (res+1)x(res+1) structured mesh."""

    u_grid: jnp.ndarray       # [res+1, res+1, 2] (x-major indexing)
    coords_grid: jnp.ndarray  # [res+1, res+1, 2] snapped node positions
    alive_grid: jnp.ndarray   # [res+1, res+1] node liveness (float 0/1)
    elem_alive: jnp.ndarray   # [2*res^2] element liveness (float 0/1)
    bounds: jnp.ndarray       # [4] xmin, xmax, ymin, ymax
    final_energy: jnp.ndarray
    # oracle health: norm of the energy gradient at the returned solution
    # (~1e-9 when Newton fully converged; large values flag tasks where the
    # post-buckling continuation had to accept a best-effort state)
    # default is a Python scalar, NOT jnp.zeros(()): a device-array default
    # would be materialized at module import, initializing the JAX backend
    # (and claiming the TPU through the axon relay) as an import side effect
    final_gnorm: jnp.ndarray = 0.0


def _build_problem(params, resolution, xmin, xmax, ymin, ymax):
    """Geometry, masks, and the reduced energy functional for one task."""
    source_params, bc_params, per_hole_params, n_holes = params

    tris = jnp.asarray(mesh_topology(resolution))
    # dtype follows the task params so the same build serves the f32
    # training oracle and the f64 accuracy-sweep path (solve_x64)
    dtype = jnp.result_type(bc_params)
    coords0 = jnp.asarray(
        node_coords(resolution, xmin, xmax, ymin, ymax), dtype
    )
    n_nodes = coords0.shape[0]

    # outer-rectangle nodes never move (BC rows must stay exact)
    on_rect = (
        jnp.isclose(coords0[:, 0], xmin) | jnp.isclose(coords0[:, 0], xmax)
        | jnp.isclose(coords0[:, 1], ymin) | jnp.isclose(coords0[:, 1], ymax)
    )
    cell_h = min((xmax - xmin), (ymax - ymin)) / resolution
    geom = snapped_geometry(tris, coords0, per_hole_params, n_holes,
                            cell_h, boundary_fixed=on_rect)

    young_mod = bc_params[0]
    poisson_ratio = 0.49
    shear_mod = young_mod / (2.0 * (1.0 + poisson_ratio))
    bulk_mod = young_mod / (3.0 * (1.0 - 2.0 * poisson_ratio))

    on_bottom = jnp.isclose(coords0[:, 1], ymin)
    on_top = jnp.isclose(coords0[:, 1], ymax)
    constrained = on_bottom | on_top

    area, gradphi = geom.area, geom.gradphi
    elem_alive, node_alive = geom.elem_alive, geom.node_alive

    def u_of(z, top_disp):
        bc_val = jnp.where(
            on_top[:, None],
            jnp.stack([jnp.zeros(n_nodes), jnp.full(n_nodes, top_disp)], 1),
            jnp.zeros((n_nodes, 2)),
        )
        return jnp.where(constrained[:, None], bc_val, z.reshape(n_nodes, 2))

    def energy(z, top_disp):
        u = u_of(z, top_disp)
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
            constrained.astype(jnp.float32)[:, None]
            * z.reshape(n_nodes, 2) ** 2
        )
        return elastic + tether

    def newton_solve(z, top_disp, newton_steps):
        e_fn = lambda zz: energy(zz, top_disp)
        g_fn = jax.grad(e_fn)
        alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1, 0.03, 0.01])

        # dtype is static at trace time: the f64 path earns a tighter
        # Krylov tolerance (f32 stalls below ~1e-5 relative residual)
        cg_tol = 1e-5 if jnp.result_type(z) == jnp.float32 else 1e-9

        def step(z, _):
            g = g_fn(z)
            hvp = lambda v: jax.jvp(g_fn, (z,), (v,))[1]
            dz, _ = jax.scipy.sparse.linalg.cg(
                hvp, -g, tol=cg_tol, maxiter=max(200, 8 * resolution)
            )
            dz = jnp.where(jnp.isfinite(dz), dz, 0.0)
            # candidate-step line search on the true energy
            e0 = e_fn(z)
            cand = jax.vmap(lambda a: e_fn(z + a * dz))(alphas)
            cand = jnp.where(jnp.isfinite(cand), cand, jnp.inf)
            best = jnp.argmin(cand)
            improved = cand[best] < e0
            z = jnp.where(improved, z + alphas[best] * dz, z)
            return z, None

        z, _ = jax.lax.scan(step, z, None, length=newton_steps)
        return z

    return {
        "geom": geom, "n_nodes": n_nodes, "energy": energy, "u_of": u_of,
        "newton_solve": newton_solve, "constrained": constrained,
        "shear_mod": shear_mod, "bulk_mod": bulk_mod,
        "on_top": on_top, "coords0": coords0,
    }


def _pack(prob, z, resolution, xmin, xmax, ymin, ymax, top_displacement):
    u = prob["u_of"](z, top_displacement)
    m = resolution + 1
    geom = prob["geom"]
    return ElasticityGroundTruth(
        u_grid=u.reshape(m, m, 2),
        coords_grid=geom.coords.reshape(m, m, 2),
        alive_grid=geom.node_alive.reshape(m, m),
        elem_alive=geom.elem_alive,
        bounds=jnp.asarray([xmin, xmax, ymin, ymax],
                           prob["coords0"].dtype),
        final_energy=prob["energy"](z, top_displacement),
        final_gnorm=jnp.linalg.norm(
            jax.grad(prob["energy"])(z, top_displacement)
        ),
    )


@partial(
    jax.jit,
    static_argnames=("resolution", "xmin", "xmax", "ymin", "ymax",
                     "load_steps", "newton_steps", "top_displacement"),
)
def _solve_base(params, resolution, xmin, xmax, ymin, ymax, load_steps,
                newton_steps, top_displacement):
    """Coarsest-level solve: affine warm start + load stepping."""
    with jax.default_matmul_precision("highest"):
        prob = _build_problem(params, resolution, xmin, xmax, ymin, ymax)
        n_nodes = prob["n_nodes"]
        coords = prob["geom"].coords

        # warm start each load increment with the affine compression profile
        # u_y += ddisp * (y - ymin)/(ymax - ymin): keeps J = 1 + ddisp > 0
        # uniformly, so no element starts a load step inverted. Uses SNAPPED
        # node y so the profile is continuous across the pore boundaries.
        # Masked to free dofs: seeding constrained rows would feed the z^2
        # tether in energy() until the damped line search pulls them back
        # (solve_direct masks its affine the same way).
        frac = (coords[:, 1] - ymin) / (ymax - ymin)
        free = ~jnp.repeat(prob["constrained"], 2)
        affine = jnp.stack([jnp.zeros(n_nodes), frac], axis=1).reshape(-1) * free
        ddisp = top_displacement / load_steps

        z = jnp.zeros(n_nodes * 2)
        for k in range(1, load_steps + 1):
            z = z + ddisp * affine
            z = prob["newton_solve"](
                z, top_displacement * k / load_steps, newton_steps
            )
        return _pack(prob, z, resolution, xmin, xmax, ymin, ymax,
                     top_displacement)


@partial(
    jax.jit,
    static_argnames=("resolution", "xmin", "xmax", "ymin", "ymax",
                     "newton_steps", "top_displacement"),
)
def _refine_stage(params, coarse_gt, resolution, xmin, xmax, ymin, ymax,
                  newton_steps, top_displacement):
    """One cascade level: P1-prolong the coarser solution onto this level's
    snapped mesh and Newton-refine at full load."""
    with jax.default_matmul_precision("highest"):
        prob = _build_problem(params, resolution, xmin, xmax, ymin, ymax)
        z0 = jax.vmap(
            lambda x: evaluate_p1(
                coarse_gt.u_grid, coarse_gt.coords_grid,
                coarse_gt.elem_alive, coarse_gt.bounds, x,
            )
        )(prob["geom"].coords).reshape(-1)
        # dead nodes start at their tether target; constrained nodes' unused
        # z entries likewise (the BC value lives in u_of, not in z — seeding
        # them with the interpolated BC would leave a spurious tether-energy
        # tail that the damped Newton decays only geometrically)
        keep = (jnp.repeat(prob["geom"].node_alive, 2) > 0.5) \
            & ~jnp.repeat(prob["constrained"], 2)
        z0 = jnp.where(keep, z0, 0.0)
        z = prob["newton_solve"](z0, top_displacement, newton_steps)
        return _pack(prob, z, resolution, xmin, xmax, ymin, ymax,
                     top_displacement)


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
    """Cascadic solve at `resolution`: base level (<= 16) with load stepping,
    then successive 2x refinements warm-started from the previous level.
    Eager Python driver over jitted stages (one compile per level size)."""
    chain = [resolution]
    while chain[-1] % 2 == 0 and chain[-1] // 2 >= 12:
        chain.append(chain[-1] // 2)
    chain.reverse()

    gt = _solve_base(params, chain[0], xmin, xmax, ymin, ymax,
                     load_steps, newton_steps, top_displacement)
    for res in chain[1:]:
        gt = _refine_stage(params, gt, res, xmin, xmax, ymin, ymax,
                           newton_steps, top_displacement)
    return gt


def solve_x64(
    params,
    resolution: int = 48,
    xmin: float = 0.0,
    xmax: float = 1.0,
    ymin: float = 0.0,
    ymax: float = 1.0,
    load_steps: int = 4,
    newton_steps: int = 40,
    top_displacement: float = -0.12,
):
    """Double-precision cascadic solve for accuracy sweeps (the reference's
    PETSc oracle, hyper_elasticity_fenics.py:141-157, is f64 throughout).
    Casts float leaves of params to f64 and retraces the cascade under
    `jax.enable_x64`; the Krylov tolerance tightens automatically
    (dtype-dispatched in `newton_solve`). Eager wrapper — do not call
    inside an outer jit."""
    with jax.enable_x64(True):
        params64 = jax.tree_util.tree_map(
            lambda a: (jnp.asarray(a, jnp.float64)
                       if jnp.issubdtype(jnp.result_type(a), jnp.floating)
                       else jnp.asarray(a)),
            params,
        )
        return solve(params64, resolution, xmin, xmax, ymin, ymax,
                     load_steps, newton_steps, top_displacement)


def evaluate(gt: ElasticityGroundTruth, x):
    """Displacement at physical point x [2]: P1 interpolation on the
    snapped conforming mesh."""
    return evaluate_p1(gt.u_grid, gt.coords_grid, gt.elem_alive, gt.bounds, x)


# ---------------------------------------------------------------------------
# Sparse-direct host solver (the reference's PETSc/MUMPS role)
# ---------------------------------------------------------------------------
#
# The matrix-free CG cascade above is TPU-resident but stalls on hard pore
# geometries: near the porosity feasibility limit (sampler t_bar = 0.05,
# hyper_elasticity_common.py:177-183) the inter-pore ligaments are ~0.014
# wide, the bending stiffness ratio conditions the Hessian like (L/t)^3, and
# Krylov iterations stop making progress — observed stuck states with final
# energies 10-100x above the converged branch. The reference never sees this
# because FEniCS hands the Newton systems to MUMPS, a DIRECT solver
# (td_burgers_fenics.py:87 / hyper_elasticity_fenics.py:143 "petsc").
# `solve_direct` restores that robustness: per-element 6x6 energy Hessian
# blocks from jax.hessian (vmapped), scipy sparse assembly + splu
# factorization, Levenberg-Marquardt diagonal damping when the factorized
# direction fails to descend (post-buckling indefiniteness), line search on
# the true energy, load-stepped from the affine warm start, f64 throughout.
# It runs on the host — which is where the ground-truth path already lives
# operationally (gt solves are CPU-pre-warmed into the content-addressed
# cache and only *evaluated* on the TPU; see train/gt_cache.py).


def _elem_fns(dtype):
    """Jitted per-element energy value / gradient / Hessian (6 local dofs)."""

    def psi_e(ue_flat, gphi, mods):
        shear_mod, bulk_mod = mods[0], mods[1]
        ue = ue_flat.reshape(3, 2)
        grad_u = jnp.einsum("kd,kg->dg", ue, gphi)
        F = jnp.eye(2, dtype=dtype) + grad_u
        J = F[0, 0] * F[1, 1] - F[0, 1] * F[1, 0]
        Ic = jnp.sum(F * F)
        return (
            (shear_mod / 2.0) * (Ic / jnp.maximum(J, _JMIN) - 2.0)
            + (bulk_mod / 2.0) * (J - 1.0) ** 2
            + (1e4 * shear_mod) * jnp.maximum(_JMIN - J, 0.0) ** 2
        )

    val = jax.jit(jax.vmap(psi_e, in_axes=(0, 0, None)))
    grad = jax.jit(jax.vmap(jax.grad(psi_e), in_axes=(0, 0, None)))
    hess = jax.jit(jax.vmap(jax.hessian(psi_e), in_axes=(0, 0, None)))
    return val, grad, hess


def solve_direct(
    params,
    resolution: int = 32,
    xmin: float = 0.0,
    xmax: float = 1.0,
    ymin: float = 0.0,
    ymax: float = 1.0,
    load_steps: int = 8,
    newton_steps: int = 40,
    top_displacement: float = -0.12,
    grad_tol: float = 1e-8,
    out_dtype=jnp.float32,
    verbose: bool = False,
    warm_start: ElasticityGroundTruth = None,
):
    """Damped-Newton solve with sparse-direct linear algebra (host, f64).

    warm_start: optional solution from another resolution of the SAME task.
    When given, the solve starts from its P1 interpolation at full load
    (branch-tracking continuation: the refined solve stays on the warm
    start's energy branch, which load stepping from scratch does not
    guarantee — near-limit pore lattices have several pore-collapse
    patterns at nearly equal energy). Falls back to the from-scratch load
    continuation if the warm-started Newton fails to converge.

    Eager only — do not call inside jit. Returns the same
    ElasticityGroundTruth pytree as `solve` (cast to `out_dtype`), so the
    jitted evaluation path is unchanged.

    Precision/device: runs f64 pinned to the host CPU device when one is
    visible (always true operationally — gt solves are CPU-pre-warmed into
    the cache). Under a TPU-only platform list (JAX_PLATFORMS=axon) it
    degrades to f32 element assembly with f64 sparse factorization, which
    still beats the Krylov cascade on hard geometries."""
    import contextlib

    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    try:
        cpu_dev = jax.devices("cpu")[0]
    except RuntimeError:
        cpu_dev = None
    dev_ctx = (jax.default_device(cpu_dev) if cpu_dev is not None
               else contextlib.nullcontext())
    x64_ctx = (jax.enable_x64(True) if cpu_dev is not None
               else contextlib.nullcontext())
    if cpu_dev is None:
        grad_tol = max(grad_tol, 1e-5)

    with dev_ctx, x64_ctx:
        f64 = jnp.float64 if cpu_dev is not None else jnp.float32
        params = jax.tree_util.tree_map(
            lambda a: (jnp.asarray(a, f64)
                       if jnp.issubdtype(jnp.result_type(a), jnp.floating)
                       else jnp.asarray(a)),
            params,
        )
        prob = _build_problem(params, resolution, xmin, xmax, ymin, ymax)
        geom = prob["geom"]
        n_nodes = prob["n_nodes"]
        tris = np.asarray(mesh_topology(resolution))
        # same material constants the energy functional uses (a drift here
        # would make Newton directions stop descending the accepted energy)
        mods = jnp.asarray([prob["shear_mod"], prob["bulk_mod"]], f64)

        area = np.asarray(geom.area, np.float64)
        gradphi = jnp.asarray(geom.gradphi, f64)
        w_e = np.asarray(geom.elem_alive, np.float64) * area      # [E]
        coords = np.asarray(geom.coords, np.float64)
        constrained = np.asarray(prob["constrained"])             # [N] bool
        node_alive = np.asarray(geom.node_alive, np.float64)

        # dof bookkeeping (static topology -> static sparsity pattern)
        edofs = np.stack(
            [2 * tris[:, k // 2] + k % 2 for k in range(6)], axis=1
        )                                                          # [E,6]
        rows = np.repeat(edofs, 6, axis=1).reshape(-1)
        cols = np.tile(edofs, (1, 6)).reshape(-1)
        ndof = 2 * n_nodes
        free = ~np.repeat(constrained, 2)                          # [ndof]
        # tether diagonal: dead free nodes -> 1 (relax to zero displacement),
        # constrained rows -> 1 (z entries pinned to zero); mirrors energy()
        dead_w = np.repeat((1.0 - node_alive), 2) * free
        diag_tether = dead_w + (~free).astype(np.float64)

        val_f, grad_f, hess_f = _elem_fns(f64)
        energy_j = jax.jit(prob["energy"])

        bc_val = np.zeros((n_nodes, 2))
        bc_val[np.asarray(prob["on_top"]), 1] = top_displacement

        def u_of_np(z, scale):
            u = z.reshape(n_nodes, 2).copy()
            u[constrained] = bc_val[constrained] * scale
            return u

        def grad_np(z, scale):
            ue = u_of_np(z, scale)[tris].reshape(-1, 6)
            ge = np.asarray(grad_f(jnp.asarray(ue), gradphi, mods))
            g = np.zeros(ndof)
            np.add.at(g, edofs.reshape(-1), (w_e[:, None] * ge).reshape(-1))
            return g * free + diag_tether * z

        def hess_np(z, scale):
            ue = u_of_np(z, scale)[tris].reshape(-1, 6)
            He = np.asarray(hess_f(jnp.asarray(ue), gradphi, mods))
            data = (w_e[:, None, None] * He).reshape(-1)
            # project onto free dofs (constrained rows/cols replaced by the
            # tether identity below)
            data = data * free[rows] * free[cols]
            H = sp.coo_matrix((data, (rows, cols)), shape=(ndof, ndof))
            return (H + sp.diags(diag_tether)).tocsc()

        def energy_np(z, top_disp):
            return float(energy_j(jnp.asarray(z), f64(top_disp)))

        frac = (coords[:, 1] - ymin) / (ymax - ymin)
        affine = np.stack([np.zeros(n_nodes), frac], axis=1).reshape(-1) * free
        alphas = (1.0, 0.5, 0.25, 0.1, 0.03, 0.01)

        def newton(z, scale, max_iters):
            """Damped Newton at load fraction `scale`; returns (z, |g|)."""
            top_s = top_displacement * scale
            lam = 0.0
            gnorm = float(np.linalg.norm(grad_np(z, scale)))
            for _ in range(max_iters):
                g = grad_np(z, scale)
                gnorm = float(np.linalg.norm(g))
                if gnorm < grad_tol:
                    break
                H = hess_np(z, scale)
                e0 = energy_np(z, top_s)
                improved = False
                for _try in range(6):
                    Hd = H if lam == 0.0 else (H + lam * sp.diags(
                        np.maximum(H.diagonal(), 1e-12))).tocsc()
                    try:
                        dz = spla.splu(Hd).solve(-g)
                    except RuntimeError:
                        lam = max(1e-8, lam * 10.0) if lam else 1e-6
                        continue
                    if not np.all(np.isfinite(dz)):
                        lam = max(1e-8, lam * 10.0) if lam else 1e-6
                        continue
                    for a in alphas:
                        e1 = energy_np(z + a * dz, top_s)
                        if np.isfinite(e1) and e1 < e0:
                            z = z + a * dz
                            improved = True
                            break
                    if improved:
                        # relax damping once a step succeeds
                        lam = 0.0 if lam < 1e-8 else lam * 0.1
                        break
                    # factorized direction failed to descend: damp harder
                    # (indefinite Hessian near buckling bifurcations)
                    lam = max(1e-6, lam * 10.0) if lam else 1e-6
                if not improved:
                    break  # line-search-converged at this damping ladder
            return z, float(np.linalg.norm(grad_np(z, scale)))

        accept_tol = max(grad_tol, 1e-5)

        if warm_start is not None:
            ws = jax.tree_util.tree_map(
                lambda a: (jnp.asarray(a, f64)
                           if jnp.issubdtype(jnp.result_type(a),
                                             jnp.floating)
                           else jnp.asarray(a)),
                warm_start,
            )
            z0 = np.asarray(jax.vmap(
                lambda x: evaluate_p1(ws.u_grid, ws.coords_grid,
                                      ws.elem_alive, ws.bounds, x)
            )(jnp.asarray(coords))).reshape(-1)
            keep = np.repeat(node_alive > 0.5, 2) & free
            z0 = np.where(keep, z0, 0.0)
            z, gnorm = newton(z0, 1.0, newton_steps)
            if gnorm <= accept_tol:
                if verbose:
                    print(f"  warm-start: |g| {gnorm:.3e}, "
                          f"E {energy_np(z, top_displacement):.6f}",
                          flush=True)
                gt = _pack(prob, jnp.asarray(z), resolution,
                           xmin, xmax, ymin, ymax, top_displacement)

                def _cast_ws(a):
                    a = jnp.asarray(a)
                    return a.astype(out_dtype) if jnp.issubdtype(
                        a.dtype, jnp.floating) else a

                return jax.tree_util.tree_map(_cast_ws, gt)
            if verbose:
                print(f"  warm-start failed (|g| {gnorm:.3e}); falling "
                      f"back to load continuation", flush=True)

        # Adaptive load continuation (the role of the reference's
        # relaxation back-off retry, hyper_elasticity_fenics.py:172-183):
        # advance the top displacement by ds, and when Newton fails to
        # converge — the post-buckling regime of near-limit pore lattices —
        # halve ds and retry from the last accepted state.
        ds0 = 1.0 / load_steps
        ds_min = ds0 / 8.0
        z, s, ds = np.zeros(ndof), 0.0, ds0
        while s < 1.0 - 1e-12:
            ds_eff = min(ds, 1.0 - s)
            s_try = s + ds_eff
            z_try = z + (ds_eff * top_displacement) * affine
            z_try, gnorm = newton(z_try, s_try, newton_steps)
            if gnorm <= accept_tol or ds_eff <= ds_min * (1 + 1e-9):
                z, s = z_try, s_try
                if gnorm <= accept_tol:
                    ds = min(ds * 1.5, ds0)
                if verbose:
                    print(f"  load s={s:.4f} (ds {ds_eff:.4f}): |g| "
                          f"{gnorm:.3e}, E {energy_np(z, top_displacement * s):.6f}",
                          flush=True)
            else:
                ds = max(ds_eff / 2.0, ds_min)
                if verbose:
                    print(f"  load s={s_try:.4f} rejected (|g| {gnorm:.3e})"
                          f" -> ds {ds:.4f}", flush=True)
        # final polish at full load
        z, gnorm = newton(z, 1.0, newton_steps)
        if verbose:
            print(f"  polish: |g| {gnorm:.3e}, "
                  f"E {energy_np(z, top_displacement):.6f}", flush=True)

        gt = _pack(prob, jnp.asarray(z), resolution, xmin, xmax, ymin, ymax,
                   top_displacement)

        def _cast(a):
            a = jnp.asarray(a)
            return a.astype(out_dtype) if jnp.issubdtype(
                a.dtype, jnp.floating) else a

        # cast inside the x64 context: astype(float64) outside it would be
        # silently truncated back to f32
        return jax.tree_util.tree_map(_cast, gt)
