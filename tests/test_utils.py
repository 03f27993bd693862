"""Tests for utilities: trees, config, checkpoints, TB writer, cache,
analysis, debugging."""

import dataclasses
import glob
import json
import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.config import Config, parse_overrides
from metapde_tpu.utils.trees import (
    clip_by_global_norm, dict_flatten, global_norm, tree_stack, tree_unstack,
)


def test_global_norm_and_clip():
    tree = {"a": jnp.ones((3,)) * 3.0, "b": jnp.ones((4,)) * 4.0}
    n = float(global_norm(tree))
    assert np.isclose(n, np.sqrt(9 * 3 + 16 * 4))
    clipped, norm = clip_by_global_norm(tree, 1.0)
    assert np.isclose(float(global_norm(clipped)), 1.0, rtol=1e-5)
    # below threshold: unchanged
    same, _ = clip_by_global_norm(tree, 100.0)
    assert np.allclose(same["a"], tree["a"])


def test_tree_stack_unstack_roundtrip():
    trees = [{"x": jnp.full((2,), i), "y": {"z": jnp.full((3,), -i)}}
             for i in range(4)]
    stacked = tree_stack(trees)
    assert stacked["x"].shape == (4, 2)
    back = tree_unstack(stacked)
    for a, b in zip(trees, back):
        assert np.allclose(a["x"], b["x"])
        assert np.allclose(a["y"]["z"], b["y"]["z"])


def test_dict_flatten():
    out = dict_flatten({"a": {"b": 1, "c": 2}, "d": 3})
    assert [k for k, _ in out] == ["a.b", "a.c", "d"]


def test_config_overrides():
    cfg = parse_overrides(Config(), [
        "--task.pde=td_burgers", "--maml.bsize=8", "--maml.outer_lr=3e-4",
        "--task.vary_source=false", "--task.domain.xmin=0.5",
        "--train.load_model_from_expt=/tmp/x", "--task.fixed_num_pdes=1",
    ])
    assert cfg.task.pde == "td_burgers"
    assert cfg.maml.bsize == 8
    assert np.isclose(cfg.maml.outer_lr, 3e-4)
    assert cfg.task.vary_source is False
    assert np.isclose(cfg.task.domain.xmin, 0.5)
    assert cfg.train.load_model_from_expt == "/tmp/x"
    assert cfg.task.fixed_num_pdes == 1
    with pytest.raises(KeyError):
        parse_overrides(Config(), ["--nope.x=1"])
    # serializes
    json.loads(cfg.to_json())


def test_config_from_run(tmp_path):
    """--from_run=DIR reconstructs a previous run's exact config from its
    serialized config.json (the anti-config-drift continuation path),
    with later CLI overrides still applying on top."""
    orig = parse_overrides(Config(), [
        "--task.pde=hyper_elasticity", "--task.bc_weight=100.0",
        "--leap.inner_steps=20", "--model.layer_size=128",
        "--task.domain.ymin=0.0", "--task.n_eval=8",
        "--model.n_fourier=None", "--train.expt_name=lde1",
    ])
    run_dir = tmp_path / "lde1"
    run_dir.mkdir()
    (run_dir / "config.json").write_text(orig.to_json())

    cfg = parse_overrides(Config(), [f"--from_run={run_dir}"])
    # exact reconstruction apart from the resume pointer
    assert cfg.train.load_model_from_expt == str(run_dir)
    assert dataclasses.replace(
        cfg.train, load_model_from_expt=orig.train.load_model_from_expt
    ) == orig.train
    assert cfg.task == orig.task and cfg.model == orig.model
    assert cfg.leap == orig.leap and cfg.maml == orig.maml

    # overrides on top win regardless of argv position
    cfg2 = parse_overrides(Config(), [
        "--train.outer_steps=120001", f"--from_run={run_dir}",
    ])
    assert cfg2.train.outer_steps == 120001
    assert cfg2.task.bc_weight == orig.task.bc_weight

    # unknown keys in a future config.json are ignored
    blob = json.loads(orig.to_json())
    blob["task"]["not_a_field"] = 1
    blob["brand_new_section"] = {"x": 2}
    (run_dir / "config.json").write_text(json.dumps(blob))
    cfg3 = parse_overrides(Config(), [f"--from_run={run_dir}"])
    assert cfg3.task == orig.task

    # config.json files from runs PREDATING a config section (e.g. the
    # em5-era files have no "deploy") load with that section's defaults,
    # and overrides into the new section still apply
    blob = json.loads(orig.to_json())
    del blob["deploy"]
    (run_dir / "config.json").write_text(json.dumps(blob))
    cfg4 = parse_overrides(Config(), [
        f"--from_run={run_dir}", "--deploy.n_starts=8",
    ])
    assert cfg4.deploy.n_starts == 8 and cfg4.deploy.jitter == 0.0
    assert cfg4.task == orig.task


def test_checkpoint_roundtrip(tmp_path):
    from metapde_tpu.train import checkpoints as ckpt

    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "inner_lrs": None, "prng_key": jax.random.PRNGKey(3)}
    ckpt.save_checkpoint(str(tmp_path), 120, state)
    ckpt.save_checkpoint(str(tmp_path), 400, state)
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert latest.endswith("checkpoint_step_400.pickle")
    loaded = ckpt.load_checkpoint(latest)
    assert loaded["step"] == 400
    assert np.allclose(loaded["params"]["w"], state["params"]["w"])


def _parse_tb_event_file(fname, _masked_crc):
    """Walk a TFRecord event file, asserting every CRC; returns count."""
    with open(fname, "rb") as f:
        n_records = 0
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            (ln,) = struct.unpack("<Q", hdr)
            (crc_h,) = struct.unpack("<I", f.read(4))
            assert crc_h == _masked_crc(hdr)
            payload = f.read(ln)
            (crc_d,) = struct.unpack("<I", f.read(4))
            assert crc_d == _masked_crc(payload)
            n_records += 1
    return n_records


def test_tb_writer_records_parse(tmp_path):
    from metapde_tpu.utils.tb_writer import EventWriter, _masked_crc

    w = EventWriter(str(tmp_path), prefer_native=False)
    w.scalar("val_loss", 0.5, 3)
    w.histogram("weights", np.random.randn(100), 3)
    w.close()
    fname = glob.glob(str(tmp_path) + "/events*")[0]
    assert _parse_tb_event_file(fname, _masked_crc) == 3
    # version + scalar + histogram


def test_tb_writer_native_core(tmp_path):
    """The C++ core (native/tb_writer.cpp via ctypes) emits the same
    CRC-valid TFRecord stream as the pure-Python fallback."""
    from metapde_tpu.utils import tb_writer as tbw

    w = tbw.EventWriter(str(tmp_path), prefer_native=True)
    if w._lib is None:
        pytest.skip("libtbwriter.so not built in this checkout")
    w.scalar("val_loss", 0.25, 7)
    w.histogram("weights", np.random.randn(64), 7)
    w.close()
    fname = glob.glob(str(tmp_path) + "/events*")[0]
    assert _parse_tb_event_file(fname, tbw._masked_crc) == 3


def test_gt_cache_roundtrip(tmp_path):
    from metapde_tpu.config import TaskConfig
    from metapde_tpu.pdes import get_pde
    from metapde_tpu.train.gt_cache import GroundTruthCache

    pde = get_pde(TaskConfig(pde="poisson"))
    params = pde.sample_params(jax.random.PRNGKey(0))
    cache = GroundTruthCache(str(tmp_path))
    gt1 = cache.get_or_solve(pde, params, resolution=2)
    files = os.listdir(str(tmp_path))
    assert len(files) == 1
    gt2 = cache.get_or_solve(pde, params, resolution=2)  # hits cache
    assert np.allclose(np.asarray(gt1.u_grid), np.asarray(gt2.u_grid))
    # different params -> different entry
    params2 = pde.sample_params(jax.random.PRNGKey(1))
    cache.get_or_solve(pde, params2, resolution=2)
    assert len(os.listdir(str(tmp_path))) == 2


def test_gt_cache_key_material(tmp_path):
    """Keyed on PRNG key bytes, the cache hits even when the param float
    values differ in the last bits (CPU-prewarmed cache for a TPU run)."""
    from metapde_tpu.config import TaskConfig
    from metapde_tpu.pdes import get_pde
    from metapde_tpu.train.gt_cache import GroundTruthCache

    pde = get_pde(TaskConfig(pde="poisson"))
    task_key = jax.random.PRNGKey(3)
    params = pde.sample_params(task_key)
    cache = GroundTruthCache(str(tmp_path))
    cache.get_or_solve(pde, params, resolution=2,
                       key_material=np.asarray(task_key))
    assert len(os.listdir(str(tmp_path))) == 1
    # perturb params below f32 sampling noise: still hits via key bytes
    perturbed = jax.tree_util.tree_map(lambda x: x * (1 + 1e-7), params)
    cache.get_or_solve(pde, perturbed, resolution=2,
                       key_material=np.asarray(task_key))
    assert len(os.listdir(str(tmp_path))) == 1
    # a different task key -> a different entry
    cache.get_or_solve(pde, params, resolution=2,
                       key_material=np.asarray(jax.random.PRNGKey(4)))
    assert len(os.listdir(str(tmp_path))) == 2


def test_analysis_summary(tmp_path):
    from metapde_tpu.train.analysis import load_run, summarize

    with open(tmp_path / "metrics.jsonl", "w") as f:
        for i, err in enumerate([0.9, 0.5, 0.7]):
            f.write(json.dumps({
                "step": i * 100, "val_rel_err": err, "step_time": 0.1,
            }) + "\n")
    s = summarize(str(tmp_path))
    assert s["best_step"] == 100
    assert np.isclose(s["best_val_rel_err"], 0.5)
    assert np.isclose(s["final_val_rel_err"], 0.7)


def test_gradient_conditioned_field():
    from metapde_tpu.config import FieldConfig
    from metapde_tpu.models.gradient_conditioned import (
        make_gradient_conditioned_field,
    )

    cfg = FieldConfig(num_layers=2, layer_size=16, siren=False,
                      log_scale=False, in_dim=1, out_dim=1)
    gc = make_gradient_conditioned_field(cfg, inner_steps=3, inner_lr=0.05,
                                         learned_lrs=True)
    params = gc.init(jax.random.PRNGKey(0))
    assert "log_lrs" in params

    x = jnp.linspace(0, 1, 16)[:, None]
    target = jnp.sin(3 * x[:, 0])
    inner_loss = lambda f: jnp.mean((f(x) - target) ** 2)

    out = gc.apply(params, inner_loss, x)
    assert out.shape == (16,)
    # adaptation inside forward should reduce the loss vs base field
    from metapde_tpu.models.siren import field_apply

    base_loss = float(inner_loss(lambda y: field_apply(params["base"], y, cfg)))
    adapted_loss = float(jnp.mean((out - target) ** 2))
    assert adapted_loss < base_loss
    # gradients flow through the adaptation to the base params
    g = jax.grad(
        lambda p: jnp.mean(gc.apply(p, inner_loss, x) ** 2)
    )(params)
    assert float(global_norm(g["base"])) > 0


def test_key_lineage_checker():
    from metapde_tpu.utils.debugging import KeyLineage

    kl = KeyLineage()
    key = jax.random.PRNGKey(0)
    k1, k2 = kl.split(key, where="a")
    with pytest.raises(RuntimeError):
        kl.split(key, where="b")  # reuse detected
    kl.use(k1)
    with pytest.raises(RuntimeError):
        kl.use(k1)


@pytest.mark.slow
def test_deploy_bench_runs(tmp_path):
    """End-to-end deployment benchmark on a synthesized checkpoint."""
    import jax
    import jax.numpy as jnp

    from metapde_tpu.cli import deploy_bench
    from metapde_tpu.config import Config, FieldConfig, MamlConfig, TaskConfig, TrainConfig
    from metapde_tpu.train import checkpoints as ckpt
    from metapde_tpu.train import maml_driver

    cfg = Config(
        task=TaskConfig(pde="poisson", inner_points=32, outer_points=32,
                        validation_points=32, n_eval=1),
        model=FieldConfig(num_layers=2, layer_size=16),
        maml=MamlConfig(bsize=1, inner_steps=2),
        solver=__import__("dataclasses").replace(
            Config().solver, ground_truth_resolution=4
        ),
        train=TrainConfig(load_model_from_expt=str(tmp_path)),
    )
    c = maml_driver.build(cfg)
    ckpt.save_checkpoint(str(tmp_path), 0, {
        "params": c["init_params"], "inner_lrs": c["inner_lrs"],
    })
    rows = deploy_bench.run(cfg, algo="maml", inner_steps_list=(0, 1),
                            repeats=1)
    assert len(rows) == 2
    assert all(v["time_per_task_s"] > 0 for v in rows)
    assert all(jnp.isfinite(v["val_rel_err"]) for v in rows)
    # the oracle-free quality column (multi-start selection objective)
    assert all(jnp.isfinite(v["self_loss_mean"]) for v in rows)
    assert all(v["self_loss_median"] <= v["self_loss_max"] for v in rows)


def test_metrics_logger_mirrors_tb(tmp_path):
    import os

    from metapde_tpu.train.metrics import MetricsLogger

    m = MetricsLogger(str(tmp_path / "metrics.jsonl"),
                      tb_dir=str(tmp_path / "tb"))
    m.log(0, loss=1.5, val_rel_err=0.1, vec=[1.0, 2.0])
    m.log(1, loss=1.2, val_rel_err=0.05)
    m.close()
    evts = [f for f in os.listdir(tmp_path / "tb") if "tfevents" in f]
    assert evts, "no TB event file written"
    assert os.path.getsize(tmp_path / "tb" / evts[0]) > 0


@pytest.mark.slow
def test_lookahead_ranger_semantics():
    """Lookahead wrapper: fast steps between syncs, slow-weight blend at
    sync_period; params pytree shape unchanged; converges on a quadratic."""
    import jax
    import jax.numpy as jnp
    import optax

    from metapde_tpu.train.optimizers import get_optimizer, lookahead

    # convergence on a quadratic
    opt = get_optimizer("ranger", 0.1)
    params = {"w": jnp.asarray([3.0, -2.0])}
    state = opt.init(params)
    for _ in range(400):
        grads = jax.tree_util.tree_map(lambda w: 2 * w, params)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert float(jnp.abs(params["w"]).max()) < 1e-2

    # exact sync semantics vs hand-rolled sgd-lookahead
    inner = optax.sgd(0.5)
    la = lookahead(inner, sync_period=2, slow_step=0.5)
    # after 2 steps fast == slow + 0.5*(fast_unsynced - slow)
    p2 = jnp.asarray(1.0)
    s2 = la.init(p2)
    up, s2 = la.update(jnp.asarray(1.0), s2, p2)
    p2 = p2 + up                      # fast step: 1.0 - 0.5 = 0.5
    assert float(p2) == 0.5
    up, s2 = la.update(jnp.asarray(1.0), s2, p2)
    p2 = p2 + up                      # sync: fast' = 0.0; slow: 1 + .5*(0-1)=0.5
    assert abs(float(p2) - 0.5) < 1e-6
    assert abs(float(s2.slow) - 0.5) < 1e-6


def test_bench_preempt_classifier():
    """bench._classify_tpu_pipeline_proc must match only genuine TPU
    pipeline members, never wrapper shells / greps / CPU jobs whose
    argument text mentions the same names (self-kill footgun)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    cls = bench._classify_tpu_pipeline_proc

    assert cls(["bash", "pipeline/queue_round7.sh", "6827"], "") == "queue"
    assert cls(["/bin/bash", "pipeline/supervise.sh", "out", "e", "60",
                "900", "--", "python"], "") == "supervisor"
    assert cls(["bash", "pipeline/supervise2.sh", "results_x", "bm6", "60",
                "900", "--", "python"], "") == "supervisor"
    assert cls(["python", "-m", "metapde_tpu.cli.maml_pde",
                "--task.pde=poisson"], "PYTHONPATH=/root/.axon_site") \
        == "trainer"
    assert cls(["/opt/venv/bin/python3", "-m", "metapde_tpu.cli.deploy_bench"],
               "") == "trainer"
    # CPU-pinned trainer: not a TPU pipeline member
    assert cls(["python", "-m", "metapde_tpu.cli.nn_pde"],
               "JAX_PLATFORMS=cpu\x00PYTHONPATH=") is None
    # cpu queue scripts don't hold the TPU
    assert cls(["bash", "pipeline/cpu_queue_round4.sh", "1"], "") is None
    # bash -c wrapper whose BLOB mentions the script: must not match
    assert cls(["/bin/bash", "-c",
                "nohup bash pipeline/queue_round7.sh 6827 &"], "") is None
    # grep with the name as an argument: must not match
    assert cls(["grep", "pipeline/queue_round", "/tmp/x"], "") is None
    # python running something else entirely
    assert cls(["python", "bench.py"], "") is None
    assert cls([], "") is None
    assert cls([""], "") is None


def test_ground_truth_bundle_mixed_resolutions(tmp_path):
    """Eval tasks may solve on different grids (hyper_elasticity's ligament
    floor raises the resolution per task); the bundle must not try to stack
    the raw gt pytrees (regression: v3 oracle crashed n_eval>1 validation
    with 'All input arrays must have the same shape')."""
    from types import SimpleNamespace

    from metapde_tpu.train.validation import get_ground_truth

    def solve(params, resolution=None):
        # per-task grid size driven by the param value
        n = int(params[0]) + 2
        return {"u_grid": jnp.full((n, n), float(params[0]))}

    pde = SimpleNamespace(
        solve=solve,
        sample_validation_points=lambda key, n, params, gt=None:
            jax.random.uniform(key, (n, 2)),
        evaluate_gt=lambda gt, x: gt["u_grid"][0, 0],
    )
    params_stacked = jnp.asarray([[1.0], [4.0], [9.0]])
    bundle = get_ground_truth(
        pde, params_stacked, jax.random.PRNGKey(0), n_points=5, resolution=8
    )
    assert isinstance(bundle.gts, list) and len(bundle.gts) == 3
    assert bundle.gts[0]["u_grid"].shape != bundle.gts[2]["u_grid"].shape
    assert bundle.gt_vals.shape == (3, 5, 1)
    assert np.allclose(np.asarray(bundle.gt_vals[:, 0, 0]), [1.0, 4.0, 9.0])
