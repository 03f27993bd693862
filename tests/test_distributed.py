"""Multi-process jax.distributed validation (SURVEY.md section 2.3 /
VERDICT round-1 item 3): two localhost CPU processes, each hosting 4
virtual devices, run one sharded MAML train step over the combined
8-device mesh via parallel/mesh.initialize_distributed and must match the
identical single-process 8-device run."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_matches_single_process():
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    # the orchestrator builds clean per-worker envs itself
    out = subprocess.run(
        [sys.executable, "-m", "metapde_tpu.cli.distributed_smoke",
         "--num_processes=2", "--local_devices=4"],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, timeout=1500,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["ok"], result
    assert result["distributed"]["global_devices"] == 8
