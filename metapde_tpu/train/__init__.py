from .validation import get_ground_truth, make_validation_fn  # noqa: F401
from .metrics import MetricsLogger, prepare_logging  # noqa: F401
from .checkpoints import save_checkpoint, load_checkpoint, latest_checkpoint  # noqa: F401
