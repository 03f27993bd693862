"""Burgers formulation plugin registry.

The reference selects IC/BC loss formulations by dynamic import
(src/burgers/td_burgers_common.py:77:
importlib.import_module(f'.burgers_formulation.{FLAGS.burgers_pde}')).
Here formulations register in an explicit dict; each provides the loss
triple plus a JAX initial-condition function consumed by the FV solver
(replacing the reference's FEniCS expression strings,
src/burgers/burgers_formulation/default.py:35-41).
"""

from . import default

FORMULATIONS = {
    "default": default,
}


def get_formulation(name: str):
    try:
        return FORMULATIONS[name]
    except KeyError:
        raise ValueError(
            f"unknown burgers formulation {name!r}; have {sorted(FORMULATIONS)}"
        )
