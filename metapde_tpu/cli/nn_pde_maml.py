"""Hybrid entry point: one MAML warm-up adaptation from a meta-learned
checkpoint (with its learned inner LRs), then plain PINN training
(reference: python -m src.nn_pde_maml, src/nn_pde_maml.py:178-241).
"""

import sys

from ..config import Config, parse_overrides
from ..train import nn_driver


def main(argv=None):
    cfg = parse_overrides(Config(), argv if argv is not None else sys.argv[1:])
    nn_driver.run(cfg, maml_warmup=True)


if __name__ == "__main__":
    main()
