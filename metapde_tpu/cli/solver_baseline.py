"""Classical-solver accuracy-vs-time baseline sweep entry point
(reference: python -m src.fenics_baseline, pipeline/pipeline_baseline.sh):

    python -m metapde_tpu.cli.solver_baseline --task.pde=poisson \
        --solver.ground_truth_resolution=64 --task.n_eval=16 \
        --resolutions=2,4,8,16,32

Optional second sweep axis (the reference sweeps spatial x time x boundary
grids, fenics_baseline.py:38-54,132-173):

    --axis2=num_tsteps:17,33,65      # td_burgers time resolution
    --axis2=boundary_cap:48,96,192   # hyper_elasticity boundary refinement
"""

import sys

from ..config import Config, parse_overrides
from ..train import baseline_driver


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    resolutions = (4, 8, 16, 32)
    axis2 = None
    oracle = "p1"
    rest = []
    for a in argv:
        if a.startswith("--resolutions="):
            resolutions = tuple(
                int(x) for x in a.split("=", 1)[1].split(",")
            )
        elif a.startswith("--axis2="):
            name, vals = a.split("=", 1)[1].split(":", 1)
            axis2 = (name, tuple(int(x) for x in vals.split(",")))
        elif a.startswith("--oracle="):
            oracle = a.split("=", 1)[1]
        else:
            rest.append(a)
    cfg = parse_overrides(Config(), rest)
    baseline_driver.run(cfg, spatial_resolutions=resolutions, axis2=axis2,
                        oracle=oracle)


if __name__ == "__main__":
    main()
