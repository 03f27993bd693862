"""Checkpoint / resume.

Upgrades the reference's pickle-of-state-dict checkpoints
(src/maml_pde.py:436-439 saving [model, inner_lrs]; resume at
maml_pde.py:126-141 via highest-numbered model_step_*.pickle) to full train
state: params, learned inner-lr pytree, outer optimizer state, PRNG key, and
step — so resume continues the optimizer trajectory (the reference restarts
Adam from scratch on resume, SURVEY.md section 5).
"""

import os
import pickle
import re
from typing import Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, step: int, state: dict):
    """Write checkpoint_step_{step}.pickle under `path`."""
    fname = os.path.join(path, f"checkpoint_step_{step}.pickle")
    with open(fname, "wb") as f:
        pickle.dump({"step": step, **_to_host(state)}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    return fname


def latest_checkpoint(path: str) -> Optional[str]:
    """Highest-numbered checkpoint file in `path` (reference regex pick,
    maml_pde.py:128-136); also accepts the reference's model_step_ naming."""
    if not os.path.isdir(path):
        return None
    cands = [f for f in os.listdir(path)
             if "checkpoint_step" in f or "model_step" in f]
    if not cands:
        return None
    steps = [int(re.findall(r"[0-9]+", f)[-1]) for f in cands]
    return os.path.join(path, cands[int(np.argmax(steps))])


def load_checkpoint(fname: str) -> dict:
    with open(fname, "rb") as f:
        return pickle.load(f)


BEST_NAME = "checkpoint_best.pickle"

# per-path cache of the current best metric so tracking does not unpickle
# the full (~MB) best checkpoint on every validation hit
_BEST_METRIC_CACHE = {}


def save_best_checkpoint(path: str, step: int, metric: float, state: dict):
    """Write/overwrite checkpoint_best.pickle when `metric` improves.

    Meta-training quality is NOT monotone in steps (measured: the em5
    elasticity run's deployment error regressed 9.3e-3 -> 1.9e-2 between
    200k and 270k steps on identical eval tasks while training continued
    healthily — RESULTS.md round-2 'checkpoint selection'). The reference
    resolves this in post-hoc analysis (min-MSE per expt over the logged
    curve, resultAnalysis.ipynb cells 4-24); tracking the best-validation
    checkpoint during training makes that selection durable instead of
    post-hoc. Non-finite metrics are never tracked (a NaN first validation
    used to poison the file permanently: not (x < nan) is always True).
    Returns the filename when written, else None."""
    import math

    if not math.isfinite(metric):
        return None
    fname = os.path.join(path, BEST_NAME)
    prev = _BEST_METRIC_CACHE.get(fname)
    if prev is None and os.path.exists(fname):
        try:
            with open(fname, "rb") as f:
                prev = pickle.load(f).get("best_metric")
        except Exception:
            prev = None
        if prev is not None and not math.isfinite(prev):
            prev = None  # stored NaN/inf: treat as no best yet
    if prev is not None and not (metric < prev):
        _BEST_METRIC_CACHE[fname] = prev
        return None
    with open(fname, "wb") as f:
        pickle.dump({"step": step, "best_metric": float(metric),
                     **_to_host(state)}, f,
                    protocol=pickle.HIGHEST_PROTOCOL)
    _BEST_METRIC_CACHE[fname] = float(metric)
    return fname


def best_checkpoint(path: str) -> Optional[str]:
    """checkpoint_best.pickle if present (for deploy benches; resume must
    keep using latest_checkpoint or training would rewind)."""
    fname = os.path.join(path, BEST_NAME)
    return fname if os.path.exists(fname) else None


def config_drift(expt_dir: str, cfg, sections=("task", "model", "solver")):
    """Diff the current run's config against the loaded run's config.json.

    Returns a list of "section.field: old -> new" strings for fields that
    differ within `sections` (the ones that define the training objective,
    the model, and the ground-truth oracle). Motivated by a real incident:
    a supervised relaunch command omitted --task.bc_weight, silently
    flipping the loss weighting 100x mid-run — the training drivers now
    log each drifted field loudly on resume. Missing or unreadable
    config.json yields an empty list (reference-format checkpoints carry
    no config).
    """
    import dataclasses
    import json

    fname = os.path.join(expt_dir, "config.json")
    try:
        with open(fname) as f:
            old = json.load(f)
    except (OSError, ValueError):
        return []
    new = dataclasses.asdict(cfg)

    def flat(d, prefix=""):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out.update(flat(v, f"{prefix}{k}."))
            else:
                out[f"{prefix}{k}"] = v
        return out

    drifts = []
    for sec in sections:
        a, b = flat(old.get(sec, {}) or {}), flat(new.get(sec, {}) or {})
        # compare only fields present in BOTH configs: a field that exists
        # on one side only is schema growth/removal between code versions,
        # not a relaunch changing the experiment (the None -> default noise
        # every resume of a pre-growth run used to print)
        for k in sorted(set(a) & set(b)):
            if a[k] != b[k]:
                drifts.append(f"{sec}.{k}: {a[k]!r} -> {b[k]!r}")
    return drifts
