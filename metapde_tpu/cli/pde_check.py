"""Per-PDE sampler/oracle visual check (reference: every *_common.py and
*_fenics.py exposes an app.run(main) that samples params, scatter-plots the
sampled point sets, and plots the FEM solution — e.g.
td_burgers_common.py:232-266, hyper_elasticity_common.py:389-431,
poisson_fenics.py:94-99). One CLI covers all families:

    python -m metapde_tpu.cli.pde_check --task.pde=poisson --out=/tmp/check

Writes {out}/{pde}_points.png (point sets colored by set) and
{out}/{pde}_solution.png (ground-truth field at the task geometry), plus a
JSON line of sanity stats to stdout (so it doubles as a headless smoke
check when matplotlib is unavailable).
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, parse_overrides
from ..pdes import get_pde

try:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MPL = True
except Exception:  # pragma: no cover
    HAVE_MPL = False


def run(cfg: Config, out: str = "/tmp/pde_check", seed: int = 0, n: int = 256,
        resolution=None):
    pde = get_pde(cfg.task)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    params = pde.sample_params(k1)
    point_sets = pde.sample_points(k2, n, params)

    os.makedirs(out, exist_ok=True)
    stats = {"pde": pde.name, "n_point_sets": len(point_sets)}

    if HAVE_MPL:
        fig, ax = plt.subplots(figsize=(5, 5))
        for i, pts in enumerate(point_sets):
            p = np.asarray(pts)
            ax.scatter(p[:, 0], p[:, 1], s=4, label=f"set {i}")
        ax.legend(fontsize=6)
        ax.set_title(f"{pde.name} sampled point sets")
        fname = os.path.join(out, f"{pde.name}_points.png")
        fig.savefig(fname, dpi=140, bbox_inches="tight")
        plt.close(fig)
        stats["points_png"] = fname

    gt = pde.solve(params, resolution=resolution)
    xs = pde.sample_validation_points(k3, 2048, params, gt)
    vals = jax.vmap(lambda x: pde.evaluate_gt(gt, x))(xs)
    vals = np.atleast_2d(np.asarray(vals).T).T
    stats["gt_finite"] = bool(np.isfinite(vals).all())
    stats["gt_norm"] = float(np.sqrt(np.mean(vals ** 2)))

    if HAVE_MPL:
        fig, ax = plt.subplots(figsize=(5.4, 5))
        c = np.linalg.norm(vals, axis=-1) if vals.shape[-1] > 1 else vals[:, 0]
        sc = ax.scatter(np.asarray(xs)[:, 0], np.asarray(xs)[:, 1], c=c, s=6)
        fig.colorbar(sc)
        ax.set_title(f"{pde.name} ground truth")
        fname = os.path.join(out, f"{pde.name}_solution.png")
        fig.savefig(fname, dpi=140, bbox_inches="tight")
        plt.close(fig)
        stats["solution_png"] = fname

    print(json.dumps(stats))
    return stats


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    out, resolution, rest = "/tmp/pde_check", None, []
    for a in argv:
        if a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif a.startswith("--resolution="):
            resolution = int(a.split("=", 1)[1])
        else:
            rest.append(a)
    cfg = parse_overrides(Config(), rest)
    run(cfg, out=out, resolution=resolution)


if __name__ == "__main__":
    main()
