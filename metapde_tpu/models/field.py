"""Derived field constructions on top of the SIREN base field.

- Divergence-free velocity fields via stream functions (reference:
  src/nets/field.py:239-257 DivFreeVelocityField): the velocity is the
  perpendicular gradient of a scalar potential, v = (d phi/dy, -d phi/dx),
  which is exactly divergence-free by construction.
"""

import dataclasses

import jax
import jax.numpy as jnp

from ..config import FieldConfig
from .siren import FieldDef, field_apply, init_field_params


def make_div_free_field(cfg: FieldConfig) -> FieldDef:
    """2-D divergence-free velocity field from a scalar stream function."""
    base_cfg = dataclasses.replace(cfg, out_dim=1, squeeze_scalar=True, in_dim=2)

    def init(key):
        return init_field_params(key, base_cfg)

    def apply(params, x):
        single = x.ndim == 1
        pts = x.reshape(-1, 2)

        def phi_sum(y):
            return jnp.sum(field_apply(params, y, base_cfg))

        gradphi = jax.grad(phi_sum)(pts)
        vel = jnp.stack([gradphi[:, 1], -gradphi[:, 0]], axis=1)
        return vel[0] if single else vel.reshape(*x.shape[:-1], 2)

    return FieldDef(init=init, apply=apply, cfg=base_cfg)
