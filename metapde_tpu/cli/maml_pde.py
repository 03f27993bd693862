"""MAML meta-training entry point.

Usage (mirrors the reference `python -m src.maml_pde --flags`,
reference maml_pde.py:471-472; paper config pipeline/pipleline_maml_meta.sh):

    python -m metapde_tpu.cli.maml_pde --task.pde=poisson \
        --maml.bsize=16 --maml.inner_steps=5 --maml.inner_lr=1e-4 \
        --maml.outer_lr=1e-5 --task.inner_points=1024 --task.outer_points=1024 \
        --train.expt_name=default

Overrides use dotted dataclass paths (see config.parse_overrides).
"""

import sys

from ..config import Config, parse_overrides
from ..train import maml_driver


def main(argv=None):
    cfg = parse_overrides(Config(), argv if argv is not None else sys.argv[1:])
    maml_driver.run(cfg)


if __name__ == "__main__":
    main()
