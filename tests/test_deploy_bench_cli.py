"""deploy_bench CLI end-to-end: output-file routing semantics.

Locks the ADVICE r2 fixes: the '_best' suffix keys on the checkpoint
actually benched (a --checkpoint=best run that falls back to latest must
not mislabel its rows), and mixed-precision variants get their own file
instead of clobbering the default-precision rows.
"""

import dataclasses
import json
import os

import pytest

from metapde_tpu.config import (
    Config, FieldConfig, MamlConfig, TaskConfig, TrainConfig,
)
from metapde_tpu.train import checkpoints as ckpt


def _train_tiny(tmp_path, expt):
    from metapde_tpu.train import maml_driver

    cfg = Config(
        task=TaskConfig(pde="poisson", inner_points=32, outer_points=32,
                        validation_points=32, n_eval=1),
        model=FieldConfig(num_layers=2, layer_size=16),
        maml=MamlConfig(bsize=2, inner_steps=2),
        solver=dataclasses.replace(Config().solver, ground_truth_resolution=4),
        train=TrainConfig(outer_steps=2, log_every=1, viz_every=0,
                          checkpoint_every=2, out_dir=str(tmp_path),
                          expt_name=expt),
    )
    maml_driver.run(cfg)
    return cfg, str(tmp_path / expt)


def _bench_cfg(cfg, run_dir):
    return dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, load_model_from_expt=run_dir)
    )


@pytest.mark.slow
def test_output_file_routing(tmp_path):
    from metapde_tpu.cli import deploy_bench

    cfg, run_dir = _train_tiny(tmp_path, "db")
    bcfg = _bench_cfg(cfg, run_dir)

    # non-8-task sweeps are suffixed _n<k> (the committed history is 8-task
    # sweeps; a different task-draw size must not clobber those rows) and
    # rows are self-describing
    rows = deploy_bench.run(bcfg, inner_steps_list=(0, 1), repeats=1)
    assert os.path.exists(os.path.join(run_dir, "deploy_bench_n1.jsonl"))
    assert rows[0]["checkpoint"].startswith("checkpoint_step")
    assert rows[0]["n_eval"] == 1

    # --checkpoint=best with a best file -> _best suffix, best file benched
    assert ckpt.best_checkpoint(run_dir) is not None
    rows = deploy_bench.run(bcfg, inner_steps_list=(0,), repeats=1,
                            which="best")
    best_out = os.path.join(run_dir, "deploy_bench_n1_best.jsonl")
    assert os.path.exists(best_out)
    assert json.loads(open(best_out).read())["checkpoint"] == ckpt.BEST_NAME

    # bf16 variant -> its own file, rows self-describing
    b16 = dataclasses.replace(
        bcfg, model=dataclasses.replace(bcfg.model, compute_dtype="bfloat16")
    )
    rows = deploy_bench.run(b16, inner_steps_list=(0,), repeats=1)
    assert os.path.exists(
        os.path.join(run_dir, "deploy_bench_bfloat16_n1.jsonl"))
    assert rows[0]["compute_dtype"] == "bfloat16"
    # default-precision rows untouched by the variant run
    assert len(open(
        os.path.join(run_dir, "deploy_bench_n1.jsonl")).readlines()) == 2


@pytest.mark.slow
def test_best_fallback_never_mislabels(tmp_path):
    from metapde_tpu.cli import deploy_bench

    cfg, run_dir = _train_tiny(tmp_path, "db_fb")
    os.remove(os.path.join(run_dir, ckpt.BEST_NAME))
    bcfg = _bench_cfg(cfg, run_dir)
    rows = deploy_bench.run(bcfg, inner_steps_list=(0,), repeats=1,
                            which="best")
    # fell back to latest: rows land in the PLAIN file, never _best
    assert not os.path.exists(
        os.path.join(run_dir, "deploy_bench_n1_best.jsonl"))
    assert os.path.exists(os.path.join(run_dir, "deploy_bench_n1.jsonl"))
    assert rows[0]["checkpoint"].startswith("checkpoint_step")
