"""Snapped conforming-mesh tests (solvers/mesh2d.py).

The reference gets conforming pore interfaces from mshr/CGAL meshing
(hyper_elasticity_fenics.py:56-73); here a static lattice is snapped onto
the traced pore boundary. These tests pin the properties that scheme must
deliver: O(h^2) covered-area convergence, exact P1 reproduction of linear
fields, and no-op behavior without pores.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.solvers import mesh2d


def _geometry(res, php, nh):
    tris = jnp.asarray(mesh2d.mesh_topology(res))
    c0 = jnp.asarray(mesh2d.node_coords(res, 0, 1, 0, 1), jnp.float32)
    on_rect = (
        jnp.isclose(c0[:, 0], 0) | jnp.isclose(c0[:, 0], 1)
        | jnp.isclose(c0[:, 1], 0) | jnp.isclose(c0[:, 1], 1)
    )
    return mesh2d.snapped_geometry(tris, c0, php, nh, 1.0 / res,
                                   boundary_fixed=on_rect)


def _circle_pore(r=0.2):
    php = np.zeros((1, 5), np.float32)
    php[0] = [0, 0, 0.5, 0.5, r]
    return jnp.asarray(php), jnp.int32(1)


def test_no_pores_identity():
    g = _geometry(16, jnp.zeros((1, 5)), jnp.int32(0))
    assert np.allclose(float(jnp.sum(g.area * g.elem_alive)), 1.0, atol=1e-6)
    assert np.all(np.asarray(g.elem_alive) == 1.0)
    c0 = mesh2d.node_coords(16, 0, 1, 0, 1)
    assert np.allclose(np.asarray(g.coords), c0, atol=1e-7)


@pytest.mark.slow
def test_alive_area_second_order_convergence():
    php, nh = _circle_pore()
    exact = 1.0 - np.pi * 0.2 ** 2
    errs = []
    for res in (16, 32, 64):
        g = _geometry(res, php, nh)
        alive = float(jnp.sum(g.area * g.elem_alive))
        errs.append(abs(alive - exact) / exact)
    # roughly 4x reduction per refinement (allow slack for f32 + snapping
    # irregularity); binary masking plateaus near 1e-3 here
    assert errs[2] < errs[0] / 4.0
    assert errs[2] < 5e-4


def test_snapped_nodes_land_on_boundary():
    php, nh = _circle_pore()
    g = _geometry(32, php, nh)
    c0 = np.asarray(mesh2d.node_coords(32, 0, 1, 0, 1), np.float32)
    moved = np.linalg.norm(np.asarray(g.coords) - c0, axis=1) > 1e-9
    assert moved.sum() > 10
    r = np.linalg.norm(np.asarray(g.coords)[moved] - np.array([0.5, 0.5]),
                       axis=1)
    assert np.allclose(r, 0.2, atol=1e-5)


def test_evaluate_p1_exact_on_linear_fields():
    php, nh = _circle_pore()
    res = 32
    g = _geometry(res, php, nh)
    m = res + 1
    coords_grid = g.coords.reshape(m, m, 2)
    u = (3.0 * coords_grid[..., 0] - 2.0 * coords_grid[..., 1] + 1.0)[..., None]
    pts = jax.random.uniform(jax.random.PRNGKey(0), (256, 2))
    outside = ~np.asarray(
        jax.vmap(lambda p: mesh2d.is_in_hole(p, php, nh))(pts)
    )
    pts = pts[outside]
    vals = jax.vmap(
        lambda p: mesh2d.evaluate_p1(
            u, coords_grid, g.elem_alive, jnp.asarray([0.0, 1.0, 0.0, 1.0]), p
        )
    )(pts)
    truth = 3.0 * pts[:, 0] - 2.0 * pts[:, 1] + 1.0
    assert float(jnp.abs(vals[:, 0] - truth).max()) < 5e-6


def test_star_pore_snapping():
    """Star-shaped pore (c1, c2 != 0, the steady_burgers geometry family):
    snapped nodes satisfy the r0(theta) boundary equation."""
    php = np.zeros((1, 5), np.float32)
    php[0] = [0.15, 0.05, 0.5, 0.5, 0.2]
    php, nh = jnp.asarray(php), jnp.int32(1)
    g = _geometry(48, php, nh)
    c0 = np.asarray(mesh2d.node_coords(48, 0, 1, 0, 1), np.float32)
    coords = np.asarray(g.coords)
    moved = np.linalg.norm(coords - c0, axis=1) > 1e-9
    assert moved.sum() > 10
    v = coords[moved] - np.array([0.5, 0.5])
    theta = np.arctan2(v[:, 0], v[:, 1])
    r0 = 0.2 * (1 + 0.15 * np.cos(4 * theta) + 0.05 * np.cos(8 * theta))
    assert np.allclose(np.linalg.norm(v, axis=1), r0, atol=1e-5)


def test_alive_elements_not_inverted():
    php, nh = _circle_pore(0.23)
    g = _geometry(24, php, nh)
    alive = np.asarray(g.elem_alive) > 0.5
    assert np.all(np.asarray(g.area)[alive] > 0)
    # gradphi finite everywhere alive
    assert np.isfinite(np.asarray(g.gradphi)[alive]).all()
