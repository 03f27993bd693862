"""shard_map-based distributed meta-gradient computation.

Shards the meta-train step over the (dp, pt) mesh (see mesh.py):

- dp: each device rolls out `bsize / n_dp` tasks with the SAME replicated
  initial params, then the task-mean meta-gradient is completed with a
  psum-mean over dp. Bitwise-equivalent to the reference's single-device
  vmap+mean (maml.py:226-231) because the task PRNG keys are identical
  regardless of which device owns them.
- pt: every inner/outer loss call samples `n / n_pt` collocation points per
  device (distinct subkeys via the pt axis index) and pmean's the loss over
  pt. shard_map's varying-manual-axes AD (check_vma, the default) makes
  jax.grad of the pmean'd loss the FULL point-batch gradient, including the
  cross-device second-order terms of the MAML meta-gradient (verified
  numerically in tests/test_sharding.py against an unsharded rollout).
  Monte-Carlo caveat: pt-sharded runs draw different point sets than
  unsharded runs (per-shard subkeys), so they are statistically — not
  bitwise — identical unless the point set is deterministic.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..meta import maml as maml_mod
from ..meta import leap as leap_mod
from .mesh import POINT_AXIS, TASK_AXIS


def _pvary(tree, axis):
    """Mark replicated leaves as varying along `axis` (no data movement)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pcast(x, (axis,), to="varying"), tree
    )


def shard_task_loss_points(make_loss_fn, n_points: int, n_pt: int):
    """Wrap a (key, n, ...) point-sampling loss so each pt-shard draws its own
    subset of points and the loss is pmean'd over the pt axis.

    make_loss_fn(n_local) must return loss_fn(key, params) -> (loss, aux);
    the returned fn folds the pt index into the key and averages.
    """
    n_local = n_points // n_pt
    base = make_loss_fn(n_local)

    def loss_fn(key, params):
        idx = jax.lax.axis_index(POINT_AXIS)
        key = jax.random.fold_in(key, idx)
        loss, aux = base(key, params)
        loss = jax.lax.pmean(loss, POINT_AXIS)
        aux = jax.tree_util.tree_map(lambda x: jax.lax.pmean(x, POINT_AXIS), aux)
        return loss, aux

    return loss_fn


def make_sharded_maml_grad_fn(maml_def, mesh, with_lrs: bool = True):
    """Return a jitted (key, params, lrs) -> (grads, losses, meta_losses)
    running the MAML task batch sharded over the mesh's dp axis.

    `maml_def.make_task_loss_fns` may itself use the pt axis (via
    shard_task_loss_points) when the mesh has pt > 1.
    """
    n_dp = mesh.shape[TASK_AXIS]
    assert maml_def.n_batch_tasks % n_dp == 0, (
        f"bsize {maml_def.n_batch_tasks} not divisible by dp={n_dp}"
    )
    local_def = maml_def._replace(n_batch_tasks=maml_def.n_batch_tasks // n_dp)

    def shard_fn(keys_local, params, lrs):
        # Cast replicated params/lrs to dp-varying before differentiating:
        # under check_vma, grad w.r.t. an INVARIANT input of a dp-varying
        # loss is auto-psummed across dp (the cotangent must stay invariant),
        # which would turn per-task gradients into cross-device sums.
        params, lrs = _pvary((params, lrs), TASK_AXIS)
        grads, losses, meta_losses = jax.vmap(
            lambda k: maml_mod.single_task_grad_and_losses(
                local_def, k, params, lrs if with_lrs else None
            )
        )(keys_local)
        grads = jax.tree_util.tree_map(lambda g: g.mean(axis=0), grads)
        grads = jax.lax.pmean(grads, TASK_AXIS)
        return grads, losses, meta_losses

    in_specs = (P(TASK_AXIS), P(), P())
    out_specs = (P(), P(TASK_AXIS), P(TASK_AXIS))
    sharded = shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs)

    @jax.jit
    def grad_fn(key, params, lrs):
        keys = jax.random.split(key, maml_def.n_batch_tasks)
        return sharded(keys, params, lrs)

    return grad_fn


def make_sharded_leap_grad_fn(leap_def, mesh):
    """LEAP counterpart of make_sharded_maml_grad_fn."""
    n_dp = mesh.shape[TASK_AXIS]
    assert leap_def.n_batch_tasks % n_dp == 0
    local_def = leap_def._replace(n_batch_tasks=leap_def.n_batch_tasks // n_dp)

    def shard_fn(keys_local, params):
        params = _pvary(params, TASK_AXIS)
        grads, losses = jax.vmap(
            lambda k: leap_mod.single_task_grad_and_losses(local_def, k, params)
        )(keys_local)
        grads = jax.tree_util.tree_map(lambda g: g.mean(axis=0), grads)
        grads = jax.lax.pmean(grads, TASK_AXIS)
        return grads, losses

    sharded = shard_map(shard_fn, mesh=mesh, in_specs=(P(TASK_AXIS), P()),
                        out_specs=(P(), P(TASK_AXIS)))

    @jax.jit
    def grad_fn(key, params):
        keys = jax.random.split(key, leap_def.n_batch_tasks)
        return sharded(keys, params)

    return grad_fn
