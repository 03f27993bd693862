"""Pallas TPU kernel: fused SIREN field inference.

The deployment path evaluates u_theta at large query-point batches
(validation grids, dense plotting meshes, downstream consumers of the
solved field — reference trainer_util.py:501-577 evaluates point-by-point
on host). As plain jnp, each layer is a separate [N, 64] matmul with an HBM
round trip between layers. This kernel runs the ENTIRE layer chain in VMEM
per point-block: weights are zero-padded once to 128-lane tiles (a 3x64
SIREN is ~100 KB — VMEM holds the whole network), each grid step loads one
block of points, applies every matmul (MXU) + sin (VPU) back to back, and
writes only the final output to HBM.

Zero-padding is exact for SIREN: padded bias lanes stay 0 and
sin(omega * 0) = 0, so padded lanes carry 0 through every layer; padded
weight rows then ignore them.

Falls back transparently to models.siren.field_apply off-TPU (interpret
mode is used in tests). Supports log_scale; Fourier-feature configs fall
back (they change the first-layer width).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

LANES = 128
BLOCK_N = 1024


def _pad2(w, rows, cols):
    return jnp.zeros((rows, cols), w.dtype).at[: w.shape[0], : w.shape[1]].set(w)


def _pad1(b, cols):
    return jnp.zeros((cols,), b.dtype).at[: b.shape[0]].set(b)


def _kernel(x_ref, ws_ref, bs_ref, wout_ref, bout_ref, scales_ref, out_ref,
            *, n_hidden, omega):
    h = x_ref[:] * scales_ref[0, :][None, :]  # input log-scale (padded 1s)
    for li in range(n_hidden):
        a = jnp.dot(h, ws_ref[li], preferred_element_type=jnp.float32)
        h = jnp.sin(omega * (a + bs_ref[li][None, :]))
    out = jnp.dot(h, wout_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = (out + bout_ref[0, :][None, :]) * scales_ref[1, :][None, :]


def siren_apply_fused(params, x, cfg):
    """Fused inference for a SIREN pytree (init_field_params layout).

    x: [N, in_dim] -> [N] (scalar fields) or [N, out_dim]. Requires
    cfg.siren and no Fourier features; callers should fall back to
    models.siren.field_apply otherwise.
    """
    layers = params["layers"]
    n_hidden = len(layers) - 1
    n, d = x.shape
    out_dim = layers[-1]["w"].shape[1]
    dtype = x.dtype

    n_pad = (-n) % BLOCK_N
    xp = jnp.zeros((n + n_pad, LANES), dtype).at[:n, :d].set(x)

    ws = jnp.stack(
        [_pad2(l["w"], LANES, LANES) for l in layers[:-1]]
    )  # [L, 128, 128]
    bs = jnp.stack([_pad1(l["b"], LANES) for l in layers[:-1]])  # [L, 128]
    wout = _pad2(layers[-1]["w"], LANES, LANES)
    bout = _pad1(layers[-1]["b"], LANES).reshape(1, LANES)

    in_scale = jnp.ones((LANES,), dtype)
    out_scale = jnp.ones((LANES,), dtype)
    if cfg.log_scale:
        in_scale = in_scale.at[:d].set(jnp.exp(params["log_in_scale"]))
        out_scale = out_scale.at[:out_dim].set(
            jnp.exp(params["log_out_scale"])
        )
    scales = jnp.stack([in_scale, out_scale])  # [2, 128]

    grid = (xp.shape[0] // BLOCK_N,)
    out = pl.pallas_call(
        partial(_kernel, n_hidden=n_hidden, omega=cfg.omega),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], LANES), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_N, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ws.shape[0], LANES, LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bs.shape[0], LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_N, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(xp, ws, bs, wout, bout, scales)

    out = out[:n, :out_dim]
    if out_dim == 1 and cfg.squeeze_scalar:
        return out.sum(axis=-1)
    return out


def supported(params, cfg) -> bool:
    """Whether the fused kernel applies to this field configuration."""
    if not HAVE_PALLAS or not cfg.siren or cfg.n_fourier is not None:
        return False
    return all(
        l["w"].shape[0] <= LANES and l["w"].shape[1] <= LANES
        for l in params["layers"]
    )
