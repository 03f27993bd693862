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
"""

import jax
import jax.numpy as jnp


def domain_energy(pde, field_fn, points, task_params):
    """Sum of the domain loss terms as a traced scalar (for
    hyperelasticity: the MC neo-Hookean energy)."""
    _, dom = pde.loss_fn(field_fn, points, task_params)
    return sum(jnp.asarray(v) for v in dom.values())


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
