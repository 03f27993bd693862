"""task.sample_with_replacement=True (sort-free iid draw from the masked
candidate pool) must target the same uniform-over-domain distribution as
the reference's no-duplicate subsample (choice(replace=False),
poisson_common.py:118) — same support (no out-of-domain points) and
matching spatial histograms."""

import jax
import jax.numpy as jnp
import numpy as np

from metapde_tpu.config import TaskConfig
from metapde_tpu.pdes import get_pde


def _draw(pde, n_batches=40, n=256, key0=7):
    params = pde.sample_params(jax.random.PRNGKey(3))
    keys = jax.random.split(jax.random.PRNGKey(key0), n_batches)
    pts = jax.vmap(
        lambda k: pde.sample_points_in_domain(k, n, params)
    )(keys)
    return params, np.asarray(pts).reshape(-1, 2)


def _hist2d(pts, bins=6, lo=-1.5, hi=1.5):
    h, _, _ = np.histogram2d(
        pts[:, 0], pts[:, 1], bins=bins, range=[[lo, hi], [lo, hi]]
    )
    return h.ravel() / len(pts)


def test_with_replacement_matches_reference_distribution():
    pde_ref = get_pde(TaskConfig(pde="poisson"))
    pde_fast = get_pde(TaskConfig(pde="poisson", sample_with_replacement=True))

    params, pts_ref = _draw(pde_ref)
    _, pts_fast = _draw(pde_fast, key0=11)

    # support: every fast-sampler point is inside the star domain
    from metapde_tpu.pdes.poisson import is_in_hole

    outside = jax.vmap(is_in_hole, in_axes=(0, None))(
        jnp.asarray(pts_fast), params[2]
    )
    assert float(jnp.mean(outside)) == 0.0

    # distribution: spatial histograms agree to Monte-Carlo tolerance
    h_ref = _hist2d(pts_ref)
    h_fast = _hist2d(pts_fast)
    # ~10k points per arm, 36 cells -> per-cell MC std ~ sqrt(p/N) <= 6e-3
    assert np.max(np.abs(h_ref - h_fast)) < 0.02, (
        np.max(np.abs(h_ref - h_fast))
    )
