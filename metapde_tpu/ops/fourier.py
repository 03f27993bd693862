"""Fourier positional features (reference: src/nets/field.py:111-121).

Octave-scaled sin/cos features: for each input coordinate x_j and octave p,
emit sin(2^p x_j)/2^p and cos(2^p x_j)/2^p alongside the raw coordinate.
"""

import jax.numpy as jnp


def fourier_features(x, n_features: int):
    if x.ndim == 1:
        x = x.reshape(1, -1)
    n, d = x.shape
    xe = x[:, :, None]
    pows = jnp.arange(n_features, dtype=x.dtype).reshape(1, 1, -1)
    scale = 2.0 ** pows
    sins = jnp.sin(scale * xe) / scale
    coss = jnp.cos(scale * xe) / scale
    return jnp.concatenate([xe, sins, coss], axis=-1).reshape(n, -1)


def fourier_feature_dim(in_dim: int, n_features) -> int:
    if n_features is None:
        return in_dim
    return in_dim * (1 + 2 * n_features)


def whiten(x, mean=None, std=None):
    """Standardize coordinates/values (reference: src/nets/field.py:124-130)."""
    if mean is not None:
        x = x - jnp.reshape(mean, (1, -1))
    if std is not None:
        x = x / jnp.reshape(std, (1, -1))
    return x


def dewhiten(y, mean=None, std=None):
    """Inverse of whiten (reference: src/nets/field.py:133-137)."""
    if std is not None:
        y = y * jnp.reshape(std, (1, -1))
    if mean is not None:
        y = y + jnp.reshape(mean, (1, -1))
    return y
