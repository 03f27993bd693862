"""Headline benchmark: Poisson + MAML meta-training outer-step throughput.

Runs the paper's flagship config (pipeline/pipleline_maml_meta.sh poisson:
bsize 16, 5 inner steps, 1024 inner/outer collocation points, 3x64 SIREN
omega=30) for a timed window and prints ONE JSON line.

Baseline: the reference's logged outer-step time on its T4 GPU is 3.21 s
(BASELINE.md: resultAnalysis.ipynb cell 8, step 11500 sample log line), i.e.
0.3115 outer-steps/sec. vs_baseline = our steps/sec divided by that.
"""

import json
import time

import jax
import jax.numpy as jnp

from metapde_tpu.config import Config, FieldConfig, MamlConfig, TaskConfig
from metapde_tpu.train import maml_driver

REF_STEP_TIME_S = 3.21  # reference T4 GPU seconds per outer step


def main():
    cfg = Config(
        task=TaskConfig(
            pde="poisson", inner_points=1024, outer_points=1024,
            validation_points=1024, n_eval=8, bc_weight=1.0,
        ),
        model=FieldConfig(num_layers=3, layer_size=64, omega=30.0, omega0=30.0),
        maml=MamlConfig(
            bsize=16, inner_steps=5, inner_lr=1e-4, outer_lr=1e-5,
            inner_grad_clip=100.0, grad_clip=100.0,
        ),
    )
    c = maml_driver.build(cfg)
    params, lrs = c["init_params"], c["inner_lrs"]
    opt_state = c["outer_opt"].init(params)
    lr_opt_state = c["lr_opt"].init(lrs)
    train_step = c["train_step"]
    key = jax.random.PRNGKey(0)

    # warmup / compile
    key, sk = jax.random.split(key)
    out = train_step(sk, params, lrs, opt_state, lr_opt_state)
    jax.block_until_ready(out[0])
    params, lrs, opt_state, lr_opt_state = out[:4]

    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, sk = jax.random.split(key)
        out = train_step(sk, params, lrs, opt_state, lr_opt_state)
        params, lrs, opt_state, lr_opt_state = out[:4]
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0

    steps_per_sec = n_steps / dt
    print(json.dumps({
        "metric": "poisson_maml_outer_steps_per_sec",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec * REF_STEP_TIME_S, 3),
    }))


if __name__ == "__main__":
    main()
