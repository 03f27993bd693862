from .operators import (  # noqa: F401
    divergence,
    divergence_tensor,
    hessian_diag,
    laplacian,
    vmap_divergence,
    vmap_divergence_tensor,
    vmap_laplacian,
    weighted_laplacian,
    vmap_weighted_laplacian,
)
from .fourier import dewhiten, fourier_features, whiten  # noqa: F401
