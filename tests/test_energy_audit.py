"""deploy_bench --energy_audit + gt_convergence --chain_down plumbing.

The branch-mismatch diagnostics added after the seed-1 / task-7
multistability findings (RESULTS.md round-2): the oracle field must be
scoreable through the SAME MC loss estimator as the model, and the
downward warm chain must seed on the reference branch.
"""

import jax
import jax.numpy as jnp
import pytest

from metapde_tpu.config import Config, parse_overrides
from metapde_tpu.pdes import get_pde
from metapde_tpu.cli.deploy_bench import _domain_energy, _gt_field

ELAS_ARGS = [
    "--task.pde=hyper_elasticity",
    "--task.domain.xmin=0.0", "--task.domain.ymin=0.0",
    "--task.max_holes=2", "--task.max_hole_size=0.4",
    "--task.vary_source=false", "--task.vary_bc=false",
]


@pytest.mark.slow
def test_oracle_field_scores_through_mc_energy_estimator():
    cfg = parse_overrides(Config(), ELAS_ARGS)
    pde = get_pde(cfg.task)
    tp = pde.sample_params(jax.random.PRNGKey(0))
    gt = jax.block_until_ready(pde.solve(tp, resolution=8))
    pts = pde.sample_points(jax.random.PRNGKey(31), 128, tp)
    e = _domain_energy(pde, _gt_field(pde, gt), pts, tp)
    # MC estimate of the converged FEM solution's energy: positive, finite,
    # same order as the FEM functional value (P1-interpolation bias allows
    # a few x, never orders of magnitude)
    assert jnp.isfinite(e) and e > 0
    fem_e = float(gt.final_energy)
    assert fem_e / 10 < e < fem_e * 10


@pytest.mark.slow
def test_chain_down_rows_are_branch_seeded_and_flagged(capsys):
    from metapde_tpu.cli import gt_convergence

    cfg = parse_overrides(Config(), ELAS_ARGS)
    rows = gt_convergence.run(
        cfg, resolutions=[6], ref_resolution=8, n_tasks=1, n_points=64,
        per_task=True, warm_chain=True, chain_down=True,
    )
    assert rows[0]["chain_down"] is True
    # coarse solve warm-started from the fine reference: small task, one
    # branch — rel_mse must be genuine discretization error, not O(1)
    assert rows[0]["rel_mse"] < 0.2
