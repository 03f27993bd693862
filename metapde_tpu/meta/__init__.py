from .maml import MamlDef, maml_inner_step, single_task_rollout as maml_single_task_rollout  # noqa: F401
from .maml import multi_task_grad_and_losses as maml_multi_task_grad_and_losses  # noqa: F401
from .leap import LeapDef, single_task_rollout as leap_single_task_rollout  # noqa: F401
from .leap import multi_task_grad_and_losses as leap_multi_task_grad_and_losses  # noqa: F401
