"""PDE task registry (reference: src/get_pde.py:10-24).

Unlike the reference, `get_pde` has no side effects (the reference mutates
FLAGS.domain_loss); each PDE module is built from an immutable TaskConfig and
returns a PdeDef bundle of pure functions.

The PdeDef contract mirrors the reference pde_def module contract
(src/poisson/poisson_def.py:1-21): sample_params / sample_points /
sample_points_in_domain / loss_fn / dim, plus the JAX-native ground-truth
solver pair (solve, evaluate_gt) that replaces solve_fenics.
"""

from typing import Callable, NamedTuple

from ..config import TaskConfig


class PdeDef(NamedTuple):
    name: str
    in_dim: int        # coordinate dimension fed to the field (incl. time)
    out_dim: int       # field output dimension
    scalar: bool       # scalar field (out squeezed to [N])
    sample_params: Callable          # key -> task params pytree
    sample_points: Callable          # (key, n, params) -> tuple of point sets
    sample_points_in_domain: Callable  # (key, n, params) -> [n, in_dim]
    loss_fn: Callable  # (field_fn, points, params) -> (boundary_losses, domain_losses)
    solve: Callable    # (params, resolution, boundary_points) -> ground-truth pytree
    evaluate_gt: Callable  # (gt, x) -> value(s) at coordinate x
    sample_validation_points: Callable  # (key, n, params, gt) -> [n, in_dim]
    symmetry_reflect: Callable = None  # optional (coords, vals) mirror for validation
    gt_version: int = 1  # bump when the ground-truth scheme changes (cache key)
    solve_ref: Callable = None  # optional high-accuracy reference solve
    #   (e.g. f64 path) used by accuracy sweeps; falls back to `solve`
    effective_resolution: Callable = None  # optional (params, res) -> int:
    #   the resolution `solve` will actually use (e.g. hyper_elasticity's
    #   ligament-aware floor), so sweeps can report honest per-task grids
    solve_warm: Callable = None  # optional (params, resolution, warm_start,
    #   ref=False) -> gt: re-solve warm-started from another resolution's
    #   solution of the same task (branch-tracking continuation for
    #   convergence sweeps on PDEs with non-unique minimizers)
    solve_hi: Callable = None  # optional higher-ORDER oracle (not just
    #   higher precision): e.g. poisson's Richardson-extrapolated nested
    #   P1 solves matching the reference's P2-element convergence order
    #   (src/poisson/poisson_fenics.py:58). Pair with evaluate_gt_hi.
    evaluate_gt_hi: Callable = None  # evaluation matching solve_hi's order
    #   (e.g. bicubic chart interpolation; bilinear would floor it at h^2)


def get_pde(cfg: TaskConfig) -> PdeDef:
    """Build the PdeDef for cfg.pde in {poisson, td_burgers,
    hyper_elasticity, steady_burgers, poisson3d}."""
    if cfg.pde == "poisson":
        from . import poisson

        return poisson.make_pde(cfg)
    if cfg.pde == "td_burgers":
        from . import td_burgers

        return td_burgers.make_pde(cfg)
    if cfg.pde == "hyper_elasticity":
        from . import hyper_elasticity

        return hyper_elasticity.make_pde(cfg)
    if cfg.pde == "steady_burgers":
        from . import steady_burgers

        return steady_burgers.make_pde(cfg)
    if cfg.pde == "poisson3d":
        from . import poisson3d

        return poisson3d.make_pde(cfg)
    raise ValueError(f"unrecognized pde: {cfg.pde!r}")
