"""Content-addressed ground-truth solution cache.

Replaces the reference's dormant FEniCS XDMF solution cache
(src/util/trainer_util.py:78-158: master_info.pickle mapping index ->
(hparams, params), matched by np.isclose). Here ground truths are plain
pytrees, so caching is an npz per key; the key is a hash of the solver
hyperparameters and task parameters rounded to float32.
"""

import dataclasses
import hashlib
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


# TaskConfig fields that change what sample_params/solve produce for a given
# PRNG key. When cache entries are keyed on PRNG-key bytes (key_material),
# these MUST also enter the key or two runs differing only in such a field
# but sharing a seed + family gt_cache dir would silently reuse each other's
# ground truths (ADVICE r2, high).
_GT_TASK_FIELDS = (
    "vary_source", "vary_bc", "vary_geometry", "vary_ic", "bc_scale",
    "fixed_num_pdes", "num_tsteps", "max_reynolds", "burgers_formulation",
    "burgers_gt_solver", "max_holes", "max_hole_size", "domain",
)


def task_cache_extra(task_cfg) -> dict:
    """Curated gt-affecting TaskConfig fields for the cache key.

    Only fields that differ from the TaskConfig defaults are included, so
    (a) growing TaskConfig with new fields never invalidates existing caches
    (the round-14 incident) and (b) runs differing in a gt-affecting field
    never share an entry. Pass the result as get_or_solve(extra_hparams=...).
    """
    default = type(task_cfg)()
    out = {}
    for f in _GT_TASK_FIELDS:
        v, d = getattr(task_cfg, f), getattr(default, f)
        if dataclasses.is_dataclass(v):
            v, d = dataclasses.asdict(v), dataclasses.asdict(d)
        if v != d:
            out[f] = v
    return out


def _key(pde_name: str, hparams: dict, params, key_material=None) -> str:
    h = hashlib.sha256()
    h.update(pde_name.encode())
    h.update(repr(sorted(hparams.items())).encode())
    if key_material is not None:
        # Hash the task's PRNG key bytes instead of sampled param values:
        # threefry key derivation is exact integer math, identical on every
        # backend, whereas f32 param values diverge in the last bits between
        # CPU and TPU (transcendentals in the samplers) — so a CPU-prewarmed
        # cache would never hit from the TPU run if params were hashed.
        h.update(b"prngkey")
        h.update(np.asarray(key_material, np.uint32).tobytes())
    else:
        for leaf in jax.tree_util.tree_leaves(params):
            h.update(np.asarray(leaf, np.float32).tobytes())
    return h.hexdigest()[:24]


def _dump_atomic(path: str, obj) -> None:
    """Write a cache pickle atomically (temp file + os.replace).

    The CPU-fallback path exists precisely because the TPU worker crash can
    kill this process moments later (ADVICE r4, medium): a plain open/dump
    interrupted mid-write leaves a truncated pickle that would poison every
    later load. os.replace is atomic on the same filesystem, so readers see
    either nothing or a complete entry."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


class GroundTruthCache:
    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def get_or_solve(self, pde, params, resolution: int, extra_hparams=None,
                     key_material=None):
        hparams = {"resolution": resolution,
                   "gt_version": getattr(pde, "gt_version", 1),
                   **(extra_hparams or {})}
        key = _key(pde.name, hparams, params, key_material=key_material)
        path = os.path.join(self.cache_dir, f"{pde.name}_{key}.pickle")
        # Host-ify task params up front (they are a handful of scalars).
        # The CPU-fallback path below re-solves with these; if they stayed
        # device-committed, the retry's jit would try to copy them back to
        # the just-crashed TPU worker and die with the same UNAVAILABLE
        # error it is trying to recover from (observed: poisson res-32
        # kernel fault during a deploy bench, round 4).
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)), params)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    stored = pickle.load(f)
            except (EOFError, pickle.UnpicklingError, KeyError) as e:
                # Corrupt entry (e.g. written by a pre-atomic-write version
                # that died mid-dump): delete and fall through to re-solve
                # rather than failing every retry forever.
                print(f"gt_cache: corrupt entry {path} "
                      f"({type(e).__name__}); deleting and re-solving")
                os.remove(path)
            else:
                leaves, treedef = stored["leaves"], stored["treedef"]
                # re-wrap as device arrays: numpy leaves break traced
                # indexing (vmap'd evaluate_gt) downstream
                leaves = [jnp.asarray(l) for l in leaves]
                return jax.tree_util.tree_unflatten(treedef, leaves)
        try:
            gt = pde.solve(params, resolution=resolution)
            host = jax.tree_util.tree_map(lambda x: jax.device_get(x), gt)
        except Exception as e:
            # Observed failure mode: a gt solver program (poisson res-32
            # multigrid) reproducibly kernel-faults the TPU worker while
            # train-step programs run clean for hours (NEXT.md 8). Retry
            # the solve once pinned to the CPU backend — cache keys are
            # backend-independent (PRNG-key bytes), so the entry is valid
            # for every later process. Failures on the retry propagate.
            print(f"gt_cache: solve failed on {jax.default_backend()} "
                  f"({type(e).__name__}: {e}); retrying on CPU")
            with jax.default_device(jax.devices("cpu")[0]):
                gt = pde.solve(params, resolution=resolution)
                host = jax.tree_util.tree_map(
                    lambda x: np.asarray(jax.device_get(x)), gt)
            # Persist BEFORE re-uploading to the default device: when the
            # first attempt crashed the whole TPU worker, the jnp.asarray
            # below dies too (dead default device) — caching first means
            # the process-level retry skips the faulting solve entirely
            # (observed: round-4 lp2 bench, where the un-cached fallback
            # re-faulted on every attempt).
            leaves, treedef = jax.tree_util.tree_flatten(host)
            _dump_atomic(path, {"leaves": leaves, "treedef": treedef})
            # hand uncommitted host leaves downstream (a CPU-committed tree
            # would pin later vmap'd evaluate_gt to the CPU backend)
            return jax.tree_util.tree_map(jnp.asarray, host)
        leaves, treedef = jax.tree_util.tree_flatten(host)
        _dump_atomic(path, {"leaves": leaves, "treedef": treedef})
        return gt  # the device-resident tree, not the pickled host copy
