"""LEAP meta-training entry point (reference: python -m src.leap_pde;
paper config pipeline/pipeline_leap_meta.sh):

    python -m metapde_tpu.cli.leap_pde --task.pde=poisson \
        --leap.bsize=8 --leap.inner_steps=60 --leap.inner_lr=2.5e-5 \
        --leap.outer_lr=5e-5 --task.inner_points=4096
"""

import sys

from ..config import Config, parse_overrides
from ..train import leap_driver


def main(argv=None):
    cfg = parse_overrides(Config(), argv if argv is not None else sys.argv[1:])
    leap_driver.run(cfg)


if __name__ == "__main__":
    main()
