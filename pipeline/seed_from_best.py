"""Seed a new experiment dir from another run's checkpoint_best.pickle.

Motivation (round 4, VERDICT item 2): em6's validation regressed past
~230k steps (best 1.43e-2 @ 223999 -> 5.9e-2 @ 250k) exactly as em5 did
past 200k. The controlled continuation arm must restart from the BEST
state, not the regressed tip — but the resume machinery
(checkpoints.latest_checkpoint, maml_driver.run) intentionally resumes
from the newest checkpoint_step_*.pickle so training never rewinds. This
script materializes the best checkpoint as a checkpoint_step_{N}.pickle
in a fresh dir, so `--from_run=<new_dir>` continues the exact best state
(params + learned LRs + optimizer state + PRNG + pinned eval-task keys).

Usage: python pipeline/seed_from_best.py SRC_RUN_DIR DST_DIR
Idempotent: exits 0 without touching DST_DIR if it already exists.
"""
import os
import pickle
import shutil
import sys


def main(src: str, dst: str) -> None:
    if os.path.exists(dst):
        print(f"seed_from_best: {dst} already exists; skip")
        return
    best = os.path.join(src, "checkpoint_best.pickle")
    with open(best, "rb") as f:
        state = pickle.load(f)
    step = int(state["step"])
    os.makedirs(dst)
    out = os.path.join(dst, f"checkpoint_step_{step}.pickle")
    with open(out, "wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    shutil.copy(os.path.join(src, "config.json"),
                os.path.join(dst, "config.json"))
    print(f"seed_from_best: wrote {out} (best_metric="
          f"{state.get('best_metric')})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
