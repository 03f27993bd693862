"""Device-mesh construction for multi-chip meta-training.

The reference has no distributed layer (SURVEY.md sections 1, 2.3): task
parallelism is single-device vmap (maml.py:226-228) and multi-machine scale
is Ray farming whole experiments (ray_submit_experiments.py:55-65). Here the
device mesh is first-class, with two axes:

- TASK_AXIS ("dp"): the task batch is sharded across chips; meta-gradients
  are combined with a psum-mean over ICI (data parallelism where the "batch"
  is PDE tasks).
- POINT_AXIS ("pt"): the collocation-point batch inside each task is sharded
  across chips; per-step losses/gradients are pmean'd over ICI. This is the
  PINN analogue of sequence/context parallelism — the long axis is the
  residual point cloud, up to 4096 points x 64 time slices in the paper
  configs (pipeline/pipeline_leap_meta.sh).

The same rollout code runs unsharded (plain vmap) or sharded (shard_map over
this mesh); XLA inserts the collectives.
"""

import jax
import numpy as np
from jax.sharding import Mesh

TASK_AXIS = "dp"
POINT_AXIS = "pt"


def make_mesh(n_task_shards: int = None, n_point_shards: int = 1, devices=None):
    """Build a (dp, pt) Mesh. Defaults to all devices on the task axis."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_task_shards is None:
        n_task_shards = n // n_point_shards
    assert n_task_shards * n_point_shards <= n, (
        f"mesh {n_task_shards}x{n_point_shards} needs more than {n} devices"
    )
    devs = np.asarray(devices[: n_task_shards * n_point_shards]).reshape(
        n_task_shards, n_point_shards
    )
    return Mesh(devs, (TASK_AXIS, POINT_AXIS))


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host JAX bring-up (replaces the reference's Ray/AWS farm for
    scale-out; see SURVEY.md section 2.3). No-op for single-process runs."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
