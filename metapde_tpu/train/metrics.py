"""Run directories, tee-logging, and machine-parseable metrics.

Replaces the reference's log.txt + TensorFlow summary writer
(src/util/trainer_util.py:473-498, src/util/tensorboard_logger.py:14-75)
with a dependency-free jsonl metrics stream plus the same human-readable
log lines. Metric names/semantics match the reference so downstream
analysis carries over (the reference's notebook regex-parses log.txt;
here metrics.jsonl is the structured source of truth).

Differences by design:
- existing experiment dirs are never rm -rf'd (the reference deletes them,
  trainer_util.py:478-479); we suffix instead.
"""

import json
import os
import time
from typing import Optional


def prepare_logging(out_dir: Optional[str], expt_name: Optional[str]):
    """Create the experiment dir and return (path, log_fn, metrics_logger)."""
    if expt_name is None or out_dir is None:
        def log(*args, **kwargs):
            print(*args, **kwargs, flush=True)

        return None, log, None

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, expt_name)
    if os.path.exists(path):
        suffix = 1
        while os.path.exists(f"{path}_{suffix}"):
            suffix += 1
        path = f"{path}_{suffix}"
    os.makedirs(path)

    outfile = open(os.path.join(path, "log.txt"), "w")

    def log(*args, **kwargs):
        print(*args, **kwargs, flush=True)
        print(*args, **kwargs, file=outfile, flush=True)

    return path, log, MetricsLogger(os.path.join(path, "metrics.jsonl"),
                                    tb_dir=os.path.join(path, "tb"))


class MetricsLogger:
    """Append-only jsonl metrics writer, mirrored to TensorBoard events.

    The jsonl stream is the structured source of truth; scalar metrics are
    additionally written as TB events (utils/tensorboard_logger.Logger, a
    TF-free writer with a native C++ record core) for parity with the
    reference's Logger (tensorboard_logger.py:14-75)."""

    def __init__(self, path: str, tb_dir: Optional[str] = None):
        self._f = open(path, "a")
        self._tb = None
        if tb_dir is not None:
            try:
                from ..utils.tensorboard_logger import Logger

                self._tb = Logger(tb_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, **metrics):
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            rec[k] = _to_py(v)
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in rec.items():
                if k in ("step", "time"):
                    continue
                if isinstance(v, (int, float)) and v == v:
                    self._tb.log_scalar(k, float(v), int(step))

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def _to_py(v):
    try:
        import numpy as np

        if hasattr(v, "shape") and getattr(v, "shape", None) not in ((), None):
            return np.asarray(v).tolist()
        if hasattr(v, "item"):
            return v.item()
    except Exception:
        pass
    if isinstance(v, (list, tuple)):
        return [_to_py(x) for x in v]
    return v
