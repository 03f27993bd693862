"""SIREN neural fields as pure parameter pytrees.

Re-design of the reference's flax-0.3.3 neural fields
(src/nets/field.py:23-44,140-226: siren_init, first_layer_siren_init,
constant_init, nf_apply, NeuralField1d/2d, make_nf_ndim) as explicit
init/apply pure functions over a dict pytree — no module system in the hot
path. The apply is a chain of [N,d]@[d,H] matmuls + fused sin, which XLA maps
directly onto the MXU/VPU; all meta-learning transforms (vmap over tasks,
scan over inner steps, grad-of-grad) act on the raw pytree.

Semantics preserved from the reference:
- SIREN init: hidden kernels ~ U(-sqrt(6/fan_in)/omega, +), first-layer
  kernel ~ (omega0/omega) * U(-1/fan_in, +1/fan_in)  (field.py:23-44).
- Every layer computes sin(omega * (x W + b)); the first-layer init rescale
  makes the effective first-layer frequency omega0 (field.py:184-188).
- Optional learnable log input/output scales initialized to
  log(1/io_scale_lr_factor) (field.py:160-164,193-197).
- Scalar fields (out_dim=1) reduce the last axis with sum, giving shape [N]
  (NeuralField1d, field.py:212-216).
- Optional octave Fourier features before the first layer (field.py:179-180).
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import FieldConfig
from ..ops.fourier import fourier_feature_dim, fourier_features


class FieldDef(NamedTuple):
    """A neural-field family: init produces a params pytree, apply evaluates it."""

    init: Callable  # (key) -> params pytree
    apply: Callable  # (params, x) -> field values
    cfg: FieldConfig


def _siren_uniform(key, shape, omega, dtype):
    fan_in = shape[0]
    bound = jnp.sqrt(6.0 / fan_in) / omega
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _first_layer_siren(key, shape, omega, omega0, dtype):
    fan_in = shape[0]
    return (omega0 / omega) * jax.random.uniform(
        key, shape, dtype, -1.0 / fan_in, 1.0 / fan_in
    )


def _variance_scaling(key, shape, dtype):
    # fan-in truncated-normal, matching flax.nn.initializers.variance_scaling(
    #   1.0, "fan_in", "truncated_normal") used for non-SIREN nets (field.py:173-176)
    fan_in = shape[0]
    std = jnp.sqrt(1.0 / fan_in) / 0.87962566103423978
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def init_field_params(key, cfg: FieldConfig):
    """Build the parameter pytree for a field with config `cfg`."""
    dtype = jnp.dtype(cfg.dtype)
    sizes = [cfg.layer_size] * cfg.num_layers
    d_in = fourier_feature_dim(cfg.in_dim, cfg.n_fourier)

    keys = jax.random.split(key, cfg.num_layers + 1)
    layers = []
    prev = d_in
    for i, size in enumerate(sizes):
        shape = (prev, size)
        if cfg.siren:
            if i == 0:
                w = _first_layer_siren(keys[i], shape, cfg.omega, cfg.omega0, dtype)
            else:
                w = _siren_uniform(keys[i], shape, cfg.omega, dtype)
        else:
            w = _variance_scaling(keys[i], shape, dtype)
        layers.append({"w": w, "b": jnp.zeros((size,), dtype)})
        prev = size

    if cfg.siren:
        w_out = _siren_uniform(keys[-1], (prev, cfg.out_dim), cfg.omega, dtype)
    else:
        w_out = _variance_scaling(keys[-1], (prev, cfg.out_dim), dtype)
    layers.append({"w": w_out, "b": jnp.zeros((cfg.out_dim,), dtype)})

    params = {"layers": layers}
    if cfg.log_scale:
        init_log = jnp.log(1.0 / cfg.io_scale_lr_factor)
        params["log_in_scale"] = jnp.full((cfg.in_dim,), init_log, dtype)
        params["log_out_scale"] = jnp.full((cfg.out_dim,), init_log, dtype)
    return params


def field_apply(params, x, cfg: FieldConfig):
    """Evaluate the field at coordinates x of shape [..., in_dim].

    Returns [...] for scalar fields (out_dim=1, squeeze_scalar) else
    [..., out_dim].
    """
    single = x.ndim == 1
    batch_shape = x.shape[:-1]
    h = x.reshape(-1, x.shape[-1])

    if cfg.log_scale:
        h = h * jnp.exp(params["log_in_scale"]).reshape(1, -1)
    if cfg.n_fourier is not None:
        h = fourier_features(h, cfg.n_fourier)

    layers = params["layers"]
    for layer in layers[:-1]:
        a = h @ layer["w"] + layer["b"]
        if cfg.siren:
            h = jnp.sin(cfg.omega * a)
        else:
            h = jax.nn.swish(a)
    out_layer = layers[-1]
    out = h @ out_layer["w"] + out_layer["b"]

    if cfg.log_scale:
        out = out * jnp.exp(params["log_out_scale"]).reshape(1, -1)

    out = out.reshape(*batch_shape, cfg.out_dim)
    if cfg.out_dim == 1 and cfg.squeeze_scalar:
        out = out.sum(axis=-1)
    if single and out.ndim > 0 and not (cfg.out_dim == 1 and cfg.squeeze_scalar):
        pass
    return out


def make_field(cfg: FieldConfig) -> FieldDef:
    return FieldDef(
        init=lambda key: init_field_params(key, cfg),
        apply=lambda params, x: field_apply(params, x, cfg),
        cfg=cfg,
    )
