"""Domain-energy branch diagnostics (shared by deploy_bench and validation).

On branch-multistable families (hyperelasticity post-buckling: RESULTS.md
round-4 per-task diagnostic, eval task 3 flipping rel_err 0.03<->0.21
within 1k steps) a deployed model whose Monte-Carlo domain energy is AT OR
BELOW the oracle field's — scored through the SAME estimator on the SAME
points — is on a different legitimate solution branch, not
under-optimized. This generalizes the reference's x-mirror min-MSE
disambiguation (src/util/trainer_util.py:525-549), which handles only the
one branch family reachable by mirroring; the energy comparison flags ANY
equal-or-better-energy branch.

Regime caveat: the discriminator presumes the boundary terms are
essentially met (domain energy alone compares branches). An UNDER-TRAINED
model (u ~ 0, F ~ I) also has near-zero elastic energy and gets flagged on
every task — validation.make_validation_fn's all-flagged fallback then
reports the plain mean, so early-training curves stay meaningful; the gate
separates branches only once training satisfies the BCs (the em7 regime it
was built for).
"""

import jax
import jax.numpy as jnp


def domain_energy(pde, field_fn, points, task_params):
    """Sum of the domain loss terms as a traced scalar (for
    hyperelasticity: the MC neo-Hookean energy)."""
    _, dom = pde.loss_fn(field_fn, points, task_params)
    return sum(jnp.asarray(v) for v in dom.values())


def make_branch_kwargs(pde, bundle, deploy_final_model, field,
                       inner_steps: int, n_points: int):
    """Build the make_validation_fn branch-audit kwargs for a driver.

    Samples fixed audit points per pinned eval task (PRNGKey(31+i), the
    deploy_bench --energy_audit convention so numbers are comparable),
    scores each task's oracle field ONCE through the MC estimator, and
    returns dict(energy_fn, audit_points, oracle_energy). energy_fn adapts
    the model with the driver's deploy_final_model at the training
    inner-step budget, so the flagged/unflagged split refers to the same
    deployment protocol the rel_err metrics measure."""
    from ..utils.trees import tree_unstack

    gt_params_list = tree_unstack(bundle.gt_params)
    audit_pts_list = [
        pde.sample_points(jax.random.PRNGKey(31 + i), n_points, tp)
        for i, tp in enumerate(gt_params_list)
    ]
    oracle_E = jnp.asarray([
        domain_energy(pde, gt_field(pde, g), p, tp)
        for g, p, tp in zip(bundle.gts, audit_pts_list, gt_params_list)
    ])
    audit_pts = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *audit_pts_list
    )

    def energy_fn(e_key, model, task_params, pts):
        fp = deploy_final_model(e_key, model, task_params, inner_steps)
        return domain_energy(pde, field.bind(fp), pts, task_params)

    return dict(energy_fn=energy_fn, audit_points=audit_pts,
                oracle_energy=oracle_E)


def gt_field(pde, gt):
    """Wrap a ground-truth pytree as a batched field callable so it can be
    scored through the same MC loss estimator as the model
    (apples-to-apples; a P1-interpolated field carries estimator bias near
    kinks, so compare fields through ONE estimator, never
    MC-vs-FEM-quadrature)."""

    def f(x):
        x = jnp.asarray(x)
        if x.ndim == 1:
            return pde.evaluate_gt(gt, x)
        return jax.vmap(lambda xi: pde.evaluate_gt(gt, xi))(x)

    return f
