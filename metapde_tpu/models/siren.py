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


class BoundField:
    """A field with params bound: a plain callable for the PdeDef loss
    contract, additionally exposing the fused (value, grad, Hessian-diag)
    path as `.vhd` when the family supports it — PDE losses sniff the
    attribute and take the one-pass Taylor-mode route instead of
    forward-over-reverse AD."""

    __slots__ = ("params", "_apply", "vhd", "vjac")

    def __init__(self, field_def, params):
        self.params = params
        self._apply = field_def.apply
        if field_def.apply_vhd is not None:
            self.vhd = lambda x: field_def.apply_vhd(params, x)
        if field_def.apply_vjac is not None:
            self.vjac = lambda x: field_def.apply_vjac(params, x)

    def __call__(self, x):
        return self._apply(self.params, x)


class FieldDef(NamedTuple):
    """A neural-field family: init produces a params pytree, apply evaluates it."""

    init: Callable  # (key) -> params pytree
    apply: Callable  # (params, x) -> field values
    cfg: FieldConfig
    apply_vhd: Callable = None  # (params, x[N,d]) -> (u, grad, hess_diag)
    apply_vjac: Callable = None  # (params, x[N,d]) -> (u, jacobian)
    apply_inference: Callable = None  # forward-only fused serving path

    def bind(self, params) -> BoundField:
        return BoundField(self, params)


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


def _mixed_dots(cfg: FieldConfig, acc_dtype):
    """(dot, ein, store) helpers implementing cfg.compute_dtype.

    dot/ein cast both matmul operands to the compute dtype and force the
    accumulator back to acc_dtype (f32) via preferred_element_type — the
    MXU accumulates bf16 x bf16 products in f32 natively, so this is the
    fast path with no precision loss in the reduction. store() casts a
    carried inter-layer tensor down so the materialized buffer (the HBM
    traffic the roofline shows the step is bound by) is half-width.
    Elementwise activation math stays in acc_dtype throughout."""
    cd = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
    if cd is None:
        return (
            lambda a, w: a @ w,
            lambda t, w: jnp.einsum("nif,fg->nig", t, w),
            lambda t: t,
        )
    return (
        lambda a, w: jnp.matmul(
            a.astype(cd), w.astype(cd), preferred_element_type=acc_dtype),
        lambda t, w: jnp.einsum(
            "nif,fg->nig", t.astype(cd), w.astype(cd),
            preferred_element_type=acc_dtype),
        lambda t: t.astype(cd),
    )


def field_apply(params, x, cfg: FieldConfig):
    """Evaluate the field at coordinates x of shape [..., in_dim].

    Returns [...] for scalar fields (out_dim=1, squeeze_scalar) else
    [..., out_dim].
    """
    single = x.ndim == 1
    batch_shape = x.shape[:-1]
    h = x.reshape(-1, x.shape[-1])
    dot, _, store = _mixed_dots(cfg, x.dtype)

    if cfg.log_scale:
        h = h * jnp.exp(params["log_in_scale"]).reshape(1, -1)
    if cfg.n_fourier is not None:
        h = fourier_features(h, cfg.n_fourier)

    layers = params["layers"]
    for layer in layers[:-1]:
        a = dot(h, layer["w"]) + layer["b"]
        if cfg.siren:
            h = jnp.sin(cfg.omega * a)
        else:
            h = jax.nn.swish(a)
        h = store(h)
    out_layer = layers[-1]
    out = dot(h, out_layer["w"]) + out_layer["b"]

    if cfg.log_scale:
        out = out * jnp.exp(params["log_out_scale"]).reshape(1, -1)

    out = out.reshape(*batch_shape, cfg.out_dim)
    if cfg.out_dim == 1 and cfg.squeeze_scalar:
        out = out.sum(axis=-1)
    if single and out.ndim > 0 and not (cfg.out_dim == 1 and cfg.squeeze_scalar):
        pass
    return out


def field_apply_vhd(params, x, cfg: FieldConfig):
    """Fused forward pass computing (value, gradient, Hessian diagonal).

    The TPU replacement for per-point forward-over-reverse AD in PDE
    residuals: instead of grad + d JVP-of-grad passes per point (the
    reference's jacfwd(jacrev) laplace_operator, field.py:54-72), one
    Taylor-mode chain propagates (h, dh/dx_i, d2h/dx_i^2) through every
    layer. All heavy work is [N*(2d+1), H] @ [H, H'] matmuls on the MXU;
    the sin-activation rules are closed-form VPU elementwise:

        affine  W,b:  h' = hW+b        J' = JW          D' = DW
        sin(omega a): h = sin(omega a) J = omega cos(omega a) J'
                      D = -omega^2 sin(omega a) J'^2 + omega cos(omega a) D'

    The program is plain jnp, so inner grads and the second-order MAML
    meta-gradient differentiate straight through it.

    Args: x [N, in_dim]. Returns (u, g, hd):
      scalar fields (out_dim=1, squeeze_scalar): u [N], g [N,d], hd [N,d]
      vector fields: u [N,o], g [N,o,d], hd [N,o,d]  with hd_i = d2u/dx_i^2.
    """
    n, d = x.shape
    h = x
    dot, ein, store = _mixed_dots(cfg, x.dtype)
    # J [N, d, F]: J[n, i, f] = d h_f / d x_i ;  D likewise second derivative
    J = jnp.broadcast_to(jnp.eye(d, dtype=x.dtype)[None], (n, d, d))
    D = jnp.zeros_like(J)

    if cfg.log_scale:
        s = jnp.exp(params["log_in_scale"]).reshape(1, -1)
        h = h * s
        J = J * s[:, None, :]

    if cfg.n_fourier is not None:
        # octave features are elementwise in each coordinate j
        # (ops/fourier.py): phi(h_j) in {h_j, sin(c h_j)/c, cos(c h_j)/c}
        nf = cfg.n_fourier
        scale = (2.0 ** jnp.arange(nf, dtype=x.dtype)).reshape(1, 1, -1)
        he = h[:, :, None]
        val = jnp.concatenate(
            [he, jnp.sin(scale * he) / scale, jnp.cos(scale * he) / scale],
            axis=-1,
        )  # [N, d, 1+2nf]
        one = jnp.ones_like(he)
        dphi = jnp.concatenate(
            [one, jnp.cos(scale * he), -jnp.sin(scale * he)], axis=-1
        )
        d2phi = jnp.concatenate(
            [jnp.zeros_like(he), -scale * jnp.sin(scale * he),
             -scale * jnp.cos(scale * he)], axis=-1,
        )
        # chain rule per parent coordinate j (J[:, :, j] is its tangent)
        Jp, Dp = J[:, :, :, None], D[:, :, :, None]
        J = (dphi[:, None] * Jp).reshape(n, d, -1)
        D = (d2phi[:, None] * Jp ** 2 + dphi[:, None] * Dp).reshape(n, d, -1)
        h = val.reshape(n, -1)

    layers = params["layers"]
    for layer in layers[:-1]:
        w, b = layer["w"], layer["b"]
        a = dot(h, w) + b
        Ja = ein(J, w)
        Da = ein(D, w)
        if cfg.siren:
            sa = jnp.sin(cfg.omega * a)
            ca = jnp.cos(cfg.omega * a)
            h = sa
            J = cfg.omega * ca[:, None, :] * Ja
            D = (
                -(cfg.omega ** 2) * sa[:, None, :] * Ja ** 2
                + cfg.omega * ca[:, None, :] * Da
            )
        else:
            sig = jax.nn.sigmoid(a)
            sw = a * sig
            d1 = sig * (1.0 + a * (1.0 - sig))
            d2 = sig * (1.0 - sig) * (2.0 + a * (1.0 - 2.0 * sig))
            h = sw
            J = d1[:, None, :] * Ja
            D = d2[:, None, :] * Ja ** 2 + d1[:, None, :] * Da
        h, J, D = store(h), store(J), store(D)

    out_layer = layers[-1]
    w, b = out_layer["w"], out_layer["b"]
    u = dot(h, w) + b                          # [N, o]
    J = ein(J, w)                              # [N, d, o]
    D = ein(D, w)

    if cfg.log_scale:
        so = jnp.exp(params["log_out_scale"]).reshape(1, 1, -1)
        u = u * so[0]
        J = J * so
        D = D * so

    if cfg.out_dim == 1 and cfg.squeeze_scalar:
        return u.sum(-1), J.sum(-1), D.sum(-1)  # [N], [N,d], [N,d]
    return u, jnp.swapaxes(J, 1, 2), jnp.swapaxes(D, 1, 2)


def field_apply_vjac(params, x, cfg: FieldConfig):
    """Fused forward pass computing (value, Jacobian) — the first-order
    slice of field_apply_vhd for losses that need only grad u (the
    hyperelastic energy's deformation gradient F = I + grad u,
    hyper_elasticity_common.py:23-27).

    Args: x [N, in_dim]. Returns (u, g):
      scalar fields: u [N], g [N,d]; vector fields: u [N,o], g [N,o,d].
    """
    n, d = x.shape
    h = x
    dot, ein, store = _mixed_dots(cfg, x.dtype)
    J = jnp.broadcast_to(jnp.eye(d, dtype=x.dtype)[None], (n, d, d))

    if cfg.log_scale:
        s = jnp.exp(params["log_in_scale"]).reshape(1, -1)
        h = h * s
        J = J * s[:, None, :]

    if cfg.n_fourier is not None:
        nf = cfg.n_fourier
        scale = (2.0 ** jnp.arange(nf, dtype=x.dtype)).reshape(1, 1, -1)
        he = h[:, :, None]
        val = jnp.concatenate(
            [he, jnp.sin(scale * he) / scale, jnp.cos(scale * he) / scale],
            axis=-1,
        )
        dphi = jnp.concatenate(
            [jnp.ones_like(he), jnp.cos(scale * he), -jnp.sin(scale * he)],
            axis=-1,
        )
        J = (dphi[:, None] * J[:, :, :, None]).reshape(n, d, -1)
        h = val.reshape(n, -1)

    layers = params["layers"]
    for layer in layers[:-1]:
        w, b = layer["w"], layer["b"]
        a = dot(h, w) + b
        Ja = ein(J, w)
        if cfg.siren:
            h = jnp.sin(cfg.omega * a)
            J = cfg.omega * jnp.cos(cfg.omega * a)[:, None, :] * Ja
        else:
            sig = jax.nn.sigmoid(a)
            h = a * sig
            J = (sig * (1.0 + a * (1.0 - sig)))[:, None, :] * Ja
        h, J = store(h), store(J)

    out_layer = layers[-1]
    w, b = out_layer["w"], out_layer["b"]
    u = dot(h, w) + b
    J = ein(J, w)

    if cfg.log_scale:
        so = jnp.exp(params["log_out_scale"]).reshape(1, 1, -1)
        u = u * so[0]
        J = J * so

    if cfg.out_dim == 1 and cfg.squeeze_scalar:
        return u.sum(-1), J.sum(-1)
    return u, jnp.swapaxes(J, 1, 2)


def _make_apply_inference(cfg: FieldConfig):
    """Forward-only evaluation at [N, d] query points, dispatching to the
    fused Pallas SIREN kernel (ops/pallas_siren.py) when the config
    supports it — the deployment/serving hot path. NOT differentiable;
    training paths use apply/apply_vhd."""
    from ..ops import pallas_siren

    fits = (
        getattr(cfg, "use_pallas_inference", False)
        and pallas_siren.HAVE_PALLAS
        and cfg.siren
        and cfg.n_fourier is None
        and cfg.layer_size <= pallas_siren.LANES
        and cfg.out_dim <= pallas_siren.LANES
        and cfg.in_dim <= pallas_siren.LANES
    )

    def apply_inference(params, x):
        if fits and x.ndim == 2:
            return pallas_siren.siren_apply_fused(params, x, cfg)
        return field_apply(params, x, cfg)

    return apply_inference


def make_field(cfg: FieldConfig) -> FieldDef:
    return FieldDef(
        init=lambda key: init_field_params(key, cfg),
        apply=lambda params, x: field_apply(params, x, cfg),
        cfg=cfg,
        apply_vhd=lambda params, x: field_apply_vhd(params, x, cfg),
        apply_vjac=lambda params, x: field_apply_vjac(params, x, cfg),
        apply_inference=_make_apply_inference(cfg),
    )
