"""Ground-truth cache keying + fault fallback (train/gt_cache.py).

Keying (ADVICE r2, high): with key_material set, the cache key hashes the
task's PRNG key bytes — which pin WHICH task was drawn but not what
sample_params/solve make of it. gt-affecting TaskConfig fields must
therefore also enter the key (task_cache_extra), or two runs differing only
in e.g. max_reynolds but sharing a seed + family gt_cache dir silently
reuse each other's ground truths.

Fallback (NEXT.md 8 / VERDICT r2 item 7): a gt solver program reproducibly
kernel-faulted the TPU worker (poisson res-32 multigrid); get_or_solve now
retries the solve once on the CPU backend instead of leaving the mitigation
as operator lore in a markdown file.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.config import DomainConfig, TaskConfig
from metapde_tpu.train.gt_cache import GroundTruthCache, task_cache_extra


class FakePde:
    name = "fake"
    gt_version = 1

    def __init__(self):
        self.solves = 0

    def solve(self, params, resolution):
        self.solves += 1
        return {"u": jnp.asarray(params, jnp.float32) * resolution}


def test_task_cache_extra_default_is_empty():
    # default config hashes nothing extra, so existing caches built before
    # task_cache_extra landed stay valid for default-config runs
    assert task_cache_extra(TaskConfig()) == {}


def test_task_cache_extra_distinguishes_gt_fields():
    a = task_cache_extra(TaskConfig(max_reynolds=50.0))
    b = task_cache_extra(TaskConfig(max_reynolds=100.0))  # the default
    assert a == {"max_reynolds": 50.0} and b == {}
    c = task_cache_extra(
        TaskConfig(domain=DomainConfig(xmin=0.0, ymin=0.0))
    )
    assert "domain" in c and c["domain"]["xmin"] == 0.0


def test_task_cache_extra_ignores_non_gt_fields():
    # sampling counts / bench-protocol switches do not change the solution
    t = TaskConfig(inner_points=9999, validation_points=7,
                   sample_with_replacement=True, n_eval=3)
    assert task_cache_extra(t) == {}


def test_same_seed_different_task_config_no_collision(tmp_path):
    """The ADVICE corruption scenario: same PRNG key, same family cache
    dir, different gt-affecting field -> must NOT share an entry."""
    cache = GroundTruthCache(str(tmp_path))
    pde = FakePde()
    km = np.asarray([0, 42], np.uint32)
    params = jnp.asarray([1.0, 2.0])

    g1 = cache.get_or_solve(pde, params, 4,
                            extra_hparams=task_cache_extra(
                                TaskConfig(max_reynolds=50.0)),
                            key_material=km)
    g2 = cache.get_or_solve(pde, params * 3, 4,
                            extra_hparams=task_cache_extra(
                                TaskConfig(max_reynolds=100.0)),
                            key_material=km)
    assert pde.solves == 2, "second config reused the first config's entry"
    assert not np.allclose(np.asarray(g1["u"]), np.asarray(g2["u"]))
    # and the same config DOES hit the cache
    g3 = cache.get_or_solve(pde, params, 4,
                            extra_hparams=task_cache_extra(
                                TaskConfig(max_reynolds=50.0)),
                            key_material=km)
    assert pde.solves == 2
    assert np.allclose(np.asarray(g1["u"]), np.asarray(g3["u"]))


class FaultingPde:
    """Raises on the first solve attempt (simulating the TPU worker fault),
    succeeds on the retry."""

    name = "faulting"
    gt_version = 1

    def __init__(self):
        self.attempts = 0

    def solve(self, params, resolution):
        self.attempts += 1
        # params must reach the solver as host numpy, not device arrays:
        # when the first attempt crashed the TPU worker, device-committed
        # params would make the CPU retry copy back to the dead device
        # (observed in the round-4 lp2 deploy bench)
        assert isinstance(params, np.ndarray)
        if self.attempts == 1:
            raise RuntimeError("TPU worker process crashed or restarted")
        return {"u": jnp.asarray(params, jnp.float32) + resolution}


def test_fault_fallback_retries_on_cpu_and_caches(tmp_path, capsys):
    cache = GroundTruthCache(str(tmp_path))
    pde = FaultingPde()
    params = jnp.asarray([1.0])
    gt = cache.get_or_solve(pde, params, 8,
                            key_material=np.asarray([0, 7], np.uint32))
    assert pde.attempts == 2
    assert np.allclose(np.asarray(gt["u"]), [9.0])
    assert "retrying on CPU" in capsys.readouterr().out
    # the retried solve is cached: a second call never touches solve
    gt2 = cache.get_or_solve(pde, params, 8,
                             key_material=np.asarray([0, 7], np.uint32))
    assert pde.attempts == 2
    assert np.allclose(np.asarray(gt2["u"]), [9.0])


def test_fault_fallback_propagates_double_failure(tmp_path):
    class DeadPde:
        name = "dead"
        gt_version = 1

        def solve(self, params, resolution):
            raise RuntimeError("still broken")

    cache = GroundTruthCache(str(tmp_path))
    with pytest.raises(RuntimeError, match="still broken"):
        cache.get_or_solve(DeadPde(), jnp.asarray([1.0]), 8,
                           key_material=np.asarray([0, 9], np.uint32))


def test_corrupt_entry_deleted_and_resolved(tmp_path, capsys):
    """ADVICE r4 (medium): a truncated pickle (process killed mid-dump by
    the very TPU-worker crash the fallback path handles) must not poison
    every later load — the corrupt file is deleted and the solve re-runs."""
    import os

    cache = GroundTruthCache(str(tmp_path))
    pde = FakePde()
    km = np.asarray([0, 11], np.uint32)
    params = jnp.asarray([2.0])
    g1 = cache.get_or_solve(pde, params, 4, key_material=km)
    assert pde.solves == 1
    (entry,) = [p for p in os.listdir(tmp_path) if p.endswith(".pickle")]
    path = os.path.join(str(tmp_path), entry)
    with open(path, "rb") as f:
        good = f.read()
    with open(path, "wb") as f:
        f.write(good[: len(good) // 2])  # truncate = interrupted dump
    g2 = cache.get_or_solve(pde, params, 4, key_material=km)
    assert pde.solves == 2, "corrupt entry was not re-solved"
    assert np.allclose(np.asarray(g1["u"]), np.asarray(g2["u"]))
    assert "corrupt entry" in capsys.readouterr().out
    # the re-solve rewrote a loadable entry
    g3 = cache.get_or_solve(pde, params, 4, key_material=km)
    assert pde.solves == 2


def test_cache_write_is_atomic_no_tmp_left(tmp_path):
    """_dump_atomic leaves no .tmp droppings and the entry round-trips."""
    import os

    cache = GroundTruthCache(str(tmp_path))
    pde = FakePde()
    cache.get_or_solve(pde, jnp.asarray([3.0]), 2,
                       key_material=np.asarray([1, 2], np.uint32))
    names = os.listdir(tmp_path)
    assert not [n for n in names if ".tmp." in n]
