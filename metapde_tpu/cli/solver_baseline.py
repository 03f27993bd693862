"""Classical-solver accuracy-vs-time baseline sweep entry point
(reference: python -m src.fenics_baseline, pipeline/pipeline_baseline.sh):

    python -m metapde_tpu.cli.solver_baseline --task.pde=poisson \
        --solver.ground_truth_resolution=64 --task.n_eval=16 \
        --resolutions=2,4,8,16,32
"""

import sys

from ..config import Config, parse_overrides
from ..train import baseline_driver


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    resolutions = (4, 8, 16, 32)
    rest = []
    for a in argv:
        if a.startswith("--resolutions="):
            resolutions = tuple(
                int(x) for x in a.split("=", 1)[1].split(",")
            )
        else:
            rest.append(a)
    cfg = parse_overrides(Config(), rest)
    baseline_driver.run(cfg, spatial_resolutions=resolutions)


if __name__ == "__main__":
    main()
