"""Content-addressed ground-truth solution cache.

Replaces the reference's dormant FEniCS XDMF solution cache
(src/util/trainer_util.py:78-158: master_info.pickle mapping index ->
(hparams, params), matched by np.isclose). Here ground truths are plain
pytrees, so caching is an npz per key; the key is a hash of the solver
hyperparameters and task parameters rounded to float32.
"""

import hashlib
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


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
        if os.path.exists(path):
            with open(path, "rb") as f:
                stored = pickle.load(f)
            leaves, treedef = stored["leaves"], stored["treedef"]
            # re-wrap as device arrays: numpy leaves break traced indexing
            # (vmap'd evaluate_gt) downstream
            leaves = [jnp.asarray(l) for l in leaves]
            return jax.tree_util.tree_unflatten(treedef, leaves)
        gt = pde.solve(params, resolution=resolution)
        host = jax.tree_util.tree_map(lambda x: jax.device_get(x), gt)
        leaves, treedef = jax.tree_util.tree_flatten(host)
        with open(path, "wb") as f:
            pickle.dump({"leaves": leaves, "treedef": treedef}, f,
                        protocol=pickle.HIGHEST_PROTOCOL)
        return gt  # the device-resident tree, not the pickled host copy
