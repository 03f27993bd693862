from .mesh import make_mesh, TASK_AXIS, POINT_AXIS  # noqa: F401
from .sharding import (  # noqa: F401
    make_sharded_maml_grad_fn,
    make_sharded_leap_grad_fn,
    shard_task_loss_points,
)
