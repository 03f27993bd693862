"""Boundary-snapped structured triangulations for pore-perforated domains.

The reference meshes rectangle-minus-pores domains with conforming
unstructured meshes (mshr/CGAL: src/elasticity/hyper_elasticity_fenics.py:
56-73, src/burgers/burgers_fenics.py:57-72), which is what gives its FEM
oracles clean O(h^2) convergence at the pore interfaces. A dynamically
re-meshed unstructured grid cannot be jit-compiled (topology would be
data-dependent), so this build keeps a STATIC structured triangulation and
makes it conform to the (traced) pore geometry by r-adaptivity:

- every node strictly inside a pore but within `snap_band` grid spacings of
  its boundary is projected radially onto the boundary r0(theta) =
  size * (1 + c1 cos 4 theta + c2 cos 8 theta);
- elements are then classified dead iff their (snapped) centroid is inside a
  pore, or they degenerated to slivers under snapping.

Cut elements thus have their interior vertices ON the pore boundary: the
interface error drops from the O(h) staircase of binary masking to the
O(h^2) chord error of a polygonal boundary, with topology (and therefore
the XLA computation) fully static. Node positions are traced functions of
the pore parameters, so one compiled solver still serves every pore
configuration of a task family.

Shared by fem_elasticity and fem_steady_burgers.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# elements whose area shrinks below this fraction of the uniform element
# area are treated as dead (sliver guard)
_QUALITY_MIN = 0.05


def mesh_topology(resolution: int):
    """Static uniform triangulation of the unit square: (res+1)^2 nodes,
    2 res^2 triangles. Cell (i, j) owns triangles [a,c,d] and [a,d,b] at
    element ids 2*(i*res+j) and 2*(i*res+j)+1, with a=(i,j), b=(i,j+1),
    c=(i+1,j), d=(i+1,j+1)."""
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


def _hole_fields(xy, per_hole_params, n_holes):
    """Per-pore radial excess phi = |x - c| - r0(theta) (negative inside),
    plus the radial projection of xy onto each pore boundary.

    Pore parametrization matches the reference
    (src/elasticity/hyper_elasticity_common.py:190-196 — note the swapped
    atan2(vx, vy) angle convention)."""
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
    valid = jnp.arange(per_hole_params.shape[0]) < n_holes
    phi = jnp.where(valid, length - r0, jnp.inf)
    safe_len = jnp.maximum(length, 1e-8)
    proj = jnp.stack(
        [x0 + vx * r0 / safe_len, y0 + vy * r0 / safe_len], axis=-1
    )
    return phi, proj


def is_in_hole(xy, per_hole_params, n_holes, tol=1e-7):
    """Pore membership (hyper_elasticity_common.py:190-196 with index
    masking :232-235)."""
    phi, _ = _hole_fields(xy, per_hole_params, n_holes)
    return jnp.any(phi < -tol)


class Geometry(NamedTuple):
    """Snapped-mesh geometry, all per-element quantities traced."""

    coords: jnp.ndarray      # [N, 2] snapped node positions
    area: jnp.ndarray        # [E]
    gradphi: jnp.ndarray     # [E, 3, 2] P1 basis gradients
    elem_alive: jnp.ndarray  # [E] float 0/1
    node_alive: jnp.ndarray  # [N] float 0/1 (max over adjacent elements)


def snapped_geometry(tris, coords0, per_hole_params, n_holes,
                     cell_h, boundary_fixed=None):
    """Build traced conforming geometry from the static lattice.

    Snap rule (adjacency, not distance): every pore-interior node that
    shares an element with an exterior node is projected radially onto the
    pore boundary. The alive/dead interface then consists of edges whose
    endpoints all lie ON the pore boundary — the alive region is exactly the
    complement of the polygon inscribed through the snapped nodes, giving
    the O(h^2) conforming interface error. Interior nodes deeper than the
    interface layer stay put (their elements are dead).

    tris: [E,3] static topology; coords0: [N,2] static lattice positions;
    cell_h: lattice spacing; boundary_fixed: [N] bool, nodes that must not
    move (outer rectangle)."""
    n_nodes = coords0.shape[0]
    movable = jnp.ones(n_nodes, bool) if boundary_fixed is None \
        else ~boundary_fixed

    tol = 1e-4 * cell_h
    phi_all, proj_all = jax.vmap(
        lambda xy: _hole_fields(xy, per_hole_params, n_holes)
    )(coords0)                                  # [N,H], [N,H,2]
    pore = jnp.argmin(phi_all, axis=1)          # governing pore per node
    phi = jnp.take_along_axis(phi_all, pore[:, None], axis=1)[:, 0]
    proj = jnp.take_along_axis(
        proj_all, pore[:, None, None], axis=1
    )[:, 0, :]
    phi = jnp.where(jnp.isfinite(phi), phi, 1.0)  # n_holes == 0: all outside

    inside = phi < -tol                          # [N] strictly interior
    # interface: inside node in an element that also has an outside node
    elem_has_outside = jnp.any(~inside[tris], axis=1)        # [E]
    node_touches_outside = jax.ops.segment_max(
        jnp.repeat(elem_has_outside, 3).astype(jnp.float32),
        tris.reshape(-1), num_segments=n_nodes,
    ) > 0.5
    snap = inside & node_touches_outside & movable
    coords = jnp.where(snap[:, None], proj, coords0)

    verts = coords[tris]                       # [E,3,2]
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    det = e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]
    area = 0.5 * jnp.abs(det)
    # clamp the reciprocal so dead slivers contribute finite (masked) terms
    # instead of NaNs (NaN * 0 = NaN would poison segment sums)
    safe_det = jnp.where(
        jnp.abs(det) < 1e-12, jnp.where(det < 0, -1e-12, 1e-12), det
    )
    inv_det = 1.0 / safe_det
    g1 = jnp.stack([e2[:, 1] * inv_det, -e2[:, 0] * inv_det], axis=1)
    g2 = jnp.stack([-e1[:, 1] * inv_det, e1[:, 0] * inv_det], axis=1)
    gradphi = jnp.stack([-(g1 + g2), g1, g2], axis=1)  # [E,3,2]

    # Element classification on the SNAPPED mesh:
    # - any vertex still strictly inside -> dead (pore-interior side);
    # - all vertices on the boundary (snapped ring) -> wedge between chords:
    #   dead iff its centroid is inside the pore;
    # - inverted (det flipped) or sliver -> dead (quality guard; the lattice
    #   orientation makes every unsnapped det positive).
    still_inside = inside & ~snap
    elem_inside = jnp.any(still_inside[tris], axis=1)
    on_bdry = snap | (jnp.abs(phi) <= tol)
    all_bdry = jnp.all(on_bdry[tris], axis=1)
    centroids = verts.mean(axis=1)
    cent_in = jax.vmap(
        lambda c: is_in_hole(c, per_hole_params, n_holes)
    )(centroids)
    uniform_area = 0.5 * cell_h * cell_h
    degenerate = (area < _QUALITY_MIN * uniform_area) | (det <= 0)
    elem_alive = 1.0 - (elem_inside | (all_bdry & cent_in)
                        | degenerate).astype(jnp.float32)

    node_alive = jax.ops.segment_max(
        jnp.repeat(elem_alive, 3), tris.reshape(-1), num_segments=n_nodes
    )
    return Geometry(coords=coords, area=area, gradphi=gradphi,
                    elem_alive=elem_alive, node_alive=node_alive)


def evaluate_p1(u_grid, coords_grid, elem_alive, bounds, x):
    """P1 interpolation of nodal values on the snapped mesh at point x [2].

    Finds the containing triangle by lattice-cell search over the 3x3
    neighborhood of x's lattice cell (snapped nodes move < 1 spacing, so the
    containing triangle lives there), preferring alive elements, then
    interpolates with barycentric weights. Points marginally outside every
    alive triangle (e.g. exactly on a pore chord) extrapolate from the
    best-scoring one — the reference sets allow_extrapolation=True on its
    FEM functions for the same reason (src/util/trainer_util.py:60)."""
    m = u_grid.shape[0]
    res = m - 1
    xmin, xmax, ymin, ymax = bounds[0], bounds[1], bounds[2], bounds[3]

    fx = jnp.clip((x[0] - xmin) / (xmax - xmin), 0.0, 1.0) * res
    fy = jnp.clip((x[1] - ymin) / (ymax - ymin), 0.0, 1.0) * res
    i0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, res - 1)
    j0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, res - 1)

    offs = jnp.asarray([-1, 0, 1])
    ci = jnp.clip(i0 + offs, 0, res - 1)          # [3]
    cj = jnp.clip(j0 + offs, 0, res - 1)          # [3]
    ii = jnp.repeat(ci, 3)                        # [9]
    jj = jnp.tile(cj, 3)                          # [9]

    # cell (i,j) triangles: t0 = (a,c,d), t1 = (a,d,b)
    a_i, a_j = ii, jj
    b_i, b_j = ii, jj + 1
    c_i, c_j = ii + 1, jj
    d_i, d_j = ii + 1, jj + 1

    def gather(gi, gj):
        return coords_grid[gi, gj], u_grid[gi, gj]

    (pa, ua), (pb, ub), (pc, uc), (pd, ud) = (
        gather(a_i, a_j), gather(b_i, b_j), gather(c_i, c_j),
        gather(d_i, d_j),
    )
    # [18, 3, 2] vertex positions / values; [18] element ids
    v0 = jnp.concatenate([pa, pa], axis=0)
    v1 = jnp.concatenate([pc, pd], axis=0)
    v2 = jnp.concatenate([pd, pb], axis=0)
    u0 = jnp.concatenate([ua, ua], axis=0)
    u1 = jnp.concatenate([uc, ud], axis=0)
    u2 = jnp.concatenate([ud, ub], axis=0)
    eid = jnp.concatenate(
        [2 * (ii * res + jj), 2 * (ii * res + jj) + 1], axis=0
    )
    alive = elem_alive[eid]                        # [18]

    d1 = v1 - v0
    d2 = v2 - v0
    det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    safe_det = jnp.where(
        jnp.abs(det) < 1e-12, jnp.where(det < 0, -1e-12, 1e-12), det
    )
    rx = x[0] - v0[:, 0]
    ry = x[1] - v0[:, 1]
    l1 = (rx * d2[:, 1] - ry * d2[:, 0]) / safe_det
    l2 = (ry * d1[:, 0] - rx * d1[:, 1]) / safe_det
    l0 = 1.0 - l1 - l2
    inside_score = jnp.minimum(jnp.minimum(l0, l1), l2)   # >= 0 iff inside
    score = inside_score - 10.0 * (1.0 - alive)
    k = jnp.argmax(score)
    w0, w1, w2 = l0[k], l1[k], l2[k]
    val = w0 * u0[k] + w1 * u1[k] + w2 * u2[k]
    # fall back to the best triangle even if slightly outside (chord gaps);
    # scores < -1 mean the point is deep in a dead region — average the
    # nearest alive triangle's nodal values instead of extrapolating far
    far = score[k] < -0.5
    near_avg = (u0[k] + u1[k] + u2[k]) / 3.0
    return jnp.where(far, near_avg, val)
