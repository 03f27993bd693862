"""Fused Pallas SIREN inference kernel tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.config import FieldConfig
from metapde_tpu.models import make_field
from metapde_tpu.ops import pallas_siren

if not pallas_siren.HAVE_PALLAS:  # pragma: no cover
    pytest.skip("pallas unavailable", allow_module_level=True)


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(log_scale=False),
        dict(out_dim=2, squeeze_scalar=False),
        dict(num_layers=8),
    ],
)
def test_fused_matches_reference_apply(kw):
    cfg = FieldConfig(
        **{"num_layers": 3, "layer_size": 64, "in_dim": 2, **kw}
    )
    f = make_field(cfg)
    p = f.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1500, 2), minval=-1,
                           maxval=1)
    u = pallas_siren.siren_apply_fused(p, x, cfg)
    u_ref = f.apply(p, x)
    assert u.shape == u_ref.shape
    assert float(jnp.max(jnp.abs(u - u_ref))) < 1e-5


def test_fused_under_vmap_and_jit():
    cfg = FieldConfig(num_layers=3, layer_size=64, in_dim=2)
    f = make_field(cfg)
    p = f.init(jax.random.PRNGKey(0))
    xs = jax.random.uniform(jax.random.PRNGKey(1), (4, 700, 2))
    u = jax.jit(jax.vmap(lambda x: pallas_siren.siren_apply_fused(p, x, cfg)))(xs)
    u_ref = jax.vmap(lambda x: f.apply(p, x))(xs)
    assert float(jnp.max(jnp.abs(u - u_ref))) < 1e-5


def test_dispatcher_falls_back_for_fourier():
    cfg = FieldConfig(num_layers=3, layer_size=64, in_dim=2, n_fourier=3,
                      use_pallas_inference=True)
    f = make_field(cfg)
    p = f.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 2))
    # apply_inference must route around the kernel and agree with apply
    u = f.apply_inference(p, x)
    assert np.allclose(np.asarray(u), np.asarray(f.apply(p, x)), atol=1e-6)


def test_dispatcher_opt_in():
    """Kernel path is opt-in (XLA wins at these widths, RESULTS.md) but
    must agree with apply when enabled."""
    cfg_on = FieldConfig(num_layers=3, layer_size=64, in_dim=2,
                         use_pallas_inference=True)
    f = make_field(cfg_on)
    p = f.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 2))
    u = f.apply_inference(p, x)
    assert np.allclose(np.asarray(u), np.asarray(f.apply(p, x)), atol=1e-5)
