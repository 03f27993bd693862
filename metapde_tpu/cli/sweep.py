"""Experiment sweep runner (replaces the reference's Ray/AWS farm,
src/ray/ray_submit_experiments.py:8-69, which shells out one experiment per
GPU via @ray.remote).

Runs a grid of experiment commands as local subprocesses with bounded
concurrency, or emits the command list for external schedulers. Multi-host
TPU bring-up uses parallel/mesh.initialize_distributed instead of Ray.

Usage:
    python -m metapde_tpu.cli.sweep --driver=nn_pde --seeds=1,2,3 \
        --concurrency=1 -- --task.pde=poisson --train.outer_steps=200 ...

Everything after `--` is passed to each job; each job gets --seed=<s> and a
seed-suffixed expt_name.
"""

import subprocess
import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if "--" in argv:
        split = argv.index("--")
        own, passthrough = argv[:split], argv[split + 1:]
    else:
        own, passthrough = argv, []

    driver = "nn_pde"
    seeds = [0]
    concurrency = 1
    dry_run = False
    for a in own:
        if a.startswith("--driver="):
            driver = a.split("=", 1)[1]
        elif a.startswith("--seeds="):
            seeds = [int(s) for s in a.split("=", 1)[1].split(",")]
        elif a.startswith("--concurrency="):
            concurrency = int(a.split("=", 1)[1])
        elif a == "--dry_run":
            dry_run = True

    expt_name = "sweep"
    for a in passthrough:
        if a.startswith("--train.expt_name="):
            expt_name = a.split("=", 1)[1]
    passthrough = [a for a in passthrough
                   if not a.startswith("--train.expt_name=")]

    cmds = []
    for s in seeds:
        cmd = [
            sys.executable, "-m", f"metapde_tpu.cli.{driver}",
            f"--seed={s}", f"--train.expt_name={expt_name}_seed_{s}",
        ] + passthrough
        cmds.append(cmd)

    if dry_run:
        for c in cmds:
            print(" ".join(c))
        return

    running = []
    failed = 0
    for cmd in cmds:
        while len(running) >= concurrency:
            done = [p for p in running if p.poll() is not None]
            for p in done:
                running.remove(p)
                failed += p.returncode != 0
            if not done:
                running[0].wait()
        print("launching:", " ".join(cmd), flush=True)
        running.append(subprocess.Popen(cmd))
    for p in running:
        p.wait()
        failed += p.returncode != 0
    print(f"sweep done: {len(cmds) - failed}/{len(cmds)} succeeded")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
