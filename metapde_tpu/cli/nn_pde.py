"""Plain-PINN / deployment fine-tune entry point (reference:
python -m src.nn_pde; deployment sweeps pipeline/pipeline_poisson_maml.sh):

    python -m metapde_tpu.cli.nn_pde --task.pde=poisson \
        --train.load_model_from_expt=poisson_maml_results/default \
        --maml.outer_lr=2.5e-5 --train.outer_steps=200
"""

import sys

from ..config import Config, parse_overrides
from ..train import nn_driver


def main(argv=None):
    cfg = parse_overrides(Config(), argv if argv is not None else sys.argv[1:])
    nn_driver.run(cfg, maml_warmup=False)


if __name__ == "__main__":
    main()
