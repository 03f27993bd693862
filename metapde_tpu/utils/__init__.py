from .timer import Timer  # noqa: F401
from .trees import (  # noqa: F401
    clip_by_global_norm,
    dict_flatten,
    global_norm,
    match_vma,
    tree_stack,
    tree_unstack,
)
