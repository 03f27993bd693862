"""Two-process jax.distributed smoke test (multi-host bring-up validation).

Replaces-for-real the reference's Ray experiment farm
(src/ray/ray_submit_experiments.py:55-69): where Ray ran independent
single-GPU experiments, this framework scales ONE meta-training step across
processes via jax.distributed + the (dp, pt) device mesh. This smoke drives
parallel/mesh.initialize_distributed with N localhost CPU processes (a
coordinator and N-1 workers, each owning `local_devices` virtual CPU
devices), runs one full sharded MAML train step over the combined global
device set, and checks the result against the identical single-process run
on the same total device count.

Orchestrator (spawns everything, no jax import):
    python -m metapde_tpu.cli.distributed_smoke [--num_processes=2]
        [--local_devices=4] [--tol=2e-5]

Prints one JSON line: {"ok": true, ...} and exits 0 on agreement.
"""

import argparse
import json
import os
import socket
import subprocess
import sys


def _worker_env(local_devices: int) -> dict:
    env = dict(os.environ)
    # sitecustomize on this image registers the axon TPU backend at
    # interpreter start, which would override JAX_PLATFORMS=cpu — clear it
    # but keep the repo importable.
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env["PYTHONPATH"] = repo_root
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    return env


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def worker_main(args):
    """Runs inside each spawned process (and for the single-process
    reference run, with --num_processes=1)."""
    from metapde_tpu.parallel.mesh import initialize_distributed

    if args.num_processes > 1:
        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax
    import jax.numpy as jnp

    from metapde_tpu.config import (
        Config, FieldConfig, MamlConfig, MeshConfig, TaskConfig,
    )
    from metapde_tpu.train import maml_driver
    from metapde_tpu.utils import global_norm

    n_global = args.num_processes * args.local_devices
    assert jax.device_count() == n_global, (
        f"expected {n_global} global devices, got {jax.device_count()}"
    )
    assert jax.local_device_count() == args.local_devices

    cfg = Config(
        task=TaskConfig(pde="poisson", inner_points=128, outer_points=128,
                        validation_points=128, n_eval=2),
        model=FieldConfig(num_layers=3, layer_size=64),
        maml=MamlConfig(bsize=n_global, inner_steps=2),
        mesh=MeshConfig(n_task_shards=n_global // 2, n_point_shards=2),
    )
    c = maml_driver.build(cfg)
    params, lrs = c["init_params"], c["inner_lrs"]
    # plain numpy leaves: identical on every process, safely treated as
    # replicated inputs by the multi-process jit
    import numpy as np

    params, lrs = jax.tree_util.tree_map(np.asarray, (params, lrs))
    opt_state = c["outer_opt"].init(params)
    lr_opt_state = c["lr_opt"].init(lrs)

    out = c["train_step"](
        jax.random.PRNGKey(0), params, lrs, opt_state, lr_opt_state
    )
    new_params, meta_losses = out[0], out[5]
    # reduce to fully-replicated scalars so each process can fetch them
    stats = jax.jit(
        lambda p, ml: (global_norm(p), jnp.mean(ml[0]))
    )(new_params, meta_losses)
    pnorm, mloss = (float(x) for x in jax.device_get(stats))
    if args.process_id == 0:
        print(json.dumps({
            "role": "worker0" if args.num_processes > 1 else "reference",
            "num_processes": args.num_processes,
            "global_devices": n_global,
            "params_norm_after_step": pnorm,
            "mean_meta_loss": mloss,
        }), flush=True)


def orchestrate(args):
    env = _worker_env(args.local_devices)
    base = [sys.executable, "-m", "metapde_tpu.cli.distributed_smoke"]

    def run_ref():
        n_total = args.num_processes * args.local_devices
        cmd = base + [
            "--process_id=0", "--num_processes=1",
            f"--local_devices={n_total}",
        ]
        # the reference process hosts ALL virtual devices itself
        ref_env = _worker_env(n_total)
        out = subprocess.run(cmd, env=ref_env, stdout=subprocess.PIPE,
                             stderr=subprocess.PIPE, text=True, timeout=1200)
        if out.returncode != 0:
            sys.stderr.write(out.stderr)
            raise RuntimeError("single-process reference run failed")
        return json.loads(out.stdout.strip().splitlines()[-1])

    def run_distributed():
        port = _free_port()
        procs = []
        for pid in range(args.num_processes):
            cmd = base + [
                f"--process_id={pid}",
                f"--num_processes={args.num_processes}",
                f"--local_devices={args.local_devices}",
                f"--coordinator=127.0.0.1:{port}",
            ]
            procs.append(subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE,
                stderr=subprocess.PIPE, text=True,
            ))
        outs = [p.communicate(timeout=1200) for p in procs]
        for p, (so, se) in zip(procs, outs):
            if p.returncode != 0:
                sys.stderr.write(se)
                raise RuntimeError(
                    f"distributed worker rc={p.returncode}"
                )
        return json.loads(outs[0][0].strip().splitlines()[-1])

    ref = run_ref()
    dist = run_distributed()
    diffs = {
        k: abs(ref[k] - dist[k]) / max(abs(ref[k]), 1e-12)
        for k in ("params_norm_after_step", "mean_meta_loss")
    }
    ok = all(d <= args.tol for d in diffs.values())
    print(json.dumps({
        "ok": ok,
        "num_processes": args.num_processes,
        "local_devices": args.local_devices,
        "reference": ref,
        "distributed": dist,
        "rel_diffs": diffs,
        "tol": args.tol,
    }))
    sys.exit(0 if ok else 1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--num_processes", type=int, default=2)
    p.add_argument("--local_devices", type=int, default=4)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--tol", type=float, default=2e-5)
    args = p.parse_args(argv)
    if args.process_id is None:
        orchestrate(args)
    else:
        worker_main(args)


if __name__ == "__main__":
    main()
