"""Roofline / MFU measurement of the flagship MAML train step.

The reference never measures hardware utilization (its perf evidence is
wall-clock per outer step on a T4, resultAnalysis.ipynb cell 8); this tool
establishes "fast vs the chip", not just "fast vs baseline": it lowers the
exact train_step_many computation, reads XLA's compiled cost analysis
(FLOPs + HBM bytes accessed), times executed blocks with a host-fetch
barrier, and reports sustained TFLOP/s, HBM GB/s, MFU vs peak, and the
arithmetic intensity relative to the device's roofline ridge point.

Usage (real TPU or CPU):
    python -m metapde_tpu.cli.roofline [--layer_size=64] [--bsize=16]
        [--points=1024] [--inner_steps=5] [--num_layers=3]
        [--block=100] [--blocks=5] [--trace_dir=DIR] [--bf16]

Prints one JSON line per run so results can be collected into tables.
"""

import argparse
import json
import sys
import time

import numpy as np

# Peak numbers (dense matmul peak, HBM BW) per device kind. bf16 peak is
# the MXU native rate; XLA runs f32 matmuls on the MXU via multi-pass at
# roughly 1/4-1/8 of bf16 rate depending on precision config, so MFU is
# reported against the bf16 peak (standard convention) and the f32-relative
# number is derivable. Sources: public TPU spec sheets.
PEAKS = {
    "TPU v5 lite": {"bf16_tflops": 197.0, "hbm_gbps": 819.0},
    "TPU v5": {"bf16_tflops": 459.0, "hbm_gbps": 2765.0},
    "TPU v4": {"bf16_tflops": 275.0, "hbm_gbps": 1228.0},
    "TPU v6 lite": {"bf16_tflops": 918.0, "hbm_gbps": 1640.0},
}


def build_step(args, unroll=None):
    import jax

    from metapde_tpu.config import (
        Config, FieldConfig, MamlConfig, TaskConfig, TrainConfig,
    )
    from metapde_tpu.train import maml_driver

    cfg = Config(
        task=TaskConfig(
            pde=args.pde, inner_points=args.points, outer_points=args.points,
            validation_points=args.points, n_eval=2, bc_weight=1.0,
            sample_with_replacement=args.fast_sampler,
        ),
        model=FieldConfig(
            num_layers=args.num_layers, layer_size=args.layer_size,
            omega=30.0, omega0=30.0,
            compute_dtype=args.compute_dtype or None,
        ),
        maml=MamlConfig(
            bsize=args.bsize, inner_steps=args.inner_steps, inner_lr=1e-4,
            outer_lr=1e-5, inner_grad_clip=100.0, grad_clip=100.0,
            unroll=args.unroll if unroll is None else unroll,
        ),
        train=TrainConfig(remat_inner_steps=not args.no_remat),
    )
    c = maml_driver.build(cfg)
    params, lrs = c["init_params"], c["inner_lrs"]
    if args.bf16:
        import jax.numpy as jnp

        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params
        )
    opt_state = c["outer_opt"].init(params)
    lr_opt_state = c["lr_opt"].init(lrs)
    key = jax.random.PRNGKey(0)
    return c["train_step_many"], (key, params, lrs, opt_state, lr_opt_state)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--pde", default="poisson")
    p.add_argument("--layer_size", type=int, default=64)
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--bsize", type=int, default=16)
    p.add_argument("--points", type=int, default=1024)
    p.add_argument("--inner_steps", type=int, default=5)
    p.add_argument("--block", type=int, default=100,
                   help="outer steps per device computation (lax.scan)")
    p.add_argument("--blocks", type=int, default=5,
                   help="timed repetitions of the block")
    p.add_argument("--trace_dir", default="",
                   help="also capture a jax.profiler trace of one block")
    p.add_argument("--bf16", action="store_true",
                   help="cast model params (not LRs/opt state) to bfloat16 "
                        "(storage-only; x(f32) @ w(bf16) promotes back to "
                        "f32 under jnp rules, so compute stays f32 — use "
                        "--compute_dtype for real mixed-precision compute)")
    p.add_argument("--compute_dtype", default="",
                   help="model.compute_dtype: store inter-layer h/J/D in "
                        "this dtype (e.g. bfloat16) with f32 matmul "
                        "accumulation — halves carried-tensor traffic")
    p.add_argument("--no_remat", action="store_true",
                   help="disable inner-unroll rematerialization")
    p.add_argument("--unroll", type=int, default=1,
                   help="inner-loop scan unroll factor for the TIMED step")
    p.add_argument("--fast_sampler", action="store_true",
                   help="sort-free with-replacement point draws "
                        "(task.sample_with_replacement)")
    args = p.parse_args(argv)

    import jax

    step_many, step_args = build_step(args)

    # FLOPs/bytes must come from a program with NO multi-trip loops: XLA's
    # cost analysis counts while-loop bodies once regardless of trip count
    # (verified empirically: identical flops for 1 vs 2 outer steps and 5
    # vs 10 inner steps). Lowering ONE outer step with the inner scan fully
    # unrolled makes the counts exact.
    cost_step, cost_args = build_step(args, unroll=args.inner_steps)
    ca = cost_step.lower(*cost_args, n_steps=1).compile().cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device
        ca = ca[0]
    flops_block = float(ca.get("flops", 0.0)) * args.block
    bytes_block = float(ca.get("bytes accessed", 0.0)) * args.block

    compiled = step_many.lower(*step_args, n_steps=args.block).compile()

    # warmup on the compiled executable; host fetch = hard barrier
    out = compiled(*step_args)
    np.asarray(out[7])
    state = out[:4]
    key = step_args[0]

    t0 = time.perf_counter()
    for _ in range(args.blocks):
        key, sk = jax.random.split(key)
        out = compiled(sk, *state)
        state = out[:4]
    ml = np.asarray(out[7])
    dt = time.perf_counter() - t0
    assert np.isfinite(ml).all(), "non-finite meta loss during roofline run"

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
        key, sk = jax.random.split(key)
        out = compiled(sk, *state)
        np.asarray(out[7])
        jax.profiler.stop_trace()
        print(f"roofline: wrote profiler trace to {args.trace_dir}",
              file=sys.stderr)

    steps = args.blocks * args.block
    steps_per_sec = steps / dt
    flops_step = flops_block / args.block
    bytes_step = bytes_block / args.block
    tflops_sustained = flops_step * steps_per_sec / 1e12
    gbps_sustained = bytes_step * steps_per_sec / 1e9

    dev = jax.devices()[0]
    peak = PEAKS.get(dev.device_kind, {})
    result = {
        "metric": "maml_train_step_roofline",
        "pde": args.pde,
        "device": dev.device_kind,
        "config": {
            "layer_size": args.layer_size, "num_layers": args.num_layers,
            "bsize": args.bsize, "points": args.points,
            "inner_steps": args.inner_steps, "bf16": args.bf16,
            "compute_dtype": args.compute_dtype or "float32",
            "remat": not args.no_remat, "unroll": args.unroll,
            "fast_sampler": args.fast_sampler,
        },
        "steps_per_sec": round(steps_per_sec, 3),
        "ms_per_step": round(1e3 / steps_per_sec, 4),
        "gflops_per_step": round(flops_step / 1e9, 3),
        "mb_accessed_per_step": round(bytes_step / 1e6, 3),
        "sustained_tflops": round(tflops_sustained, 3),
        "sustained_hbm_gbps": round(gbps_sustained, 2),
        "arithmetic_intensity": round(
            flops_step / bytes_step, 2) if bytes_step else None,
    }
    if peak:
        result["mfu_vs_bf16_peak"] = round(
            tflops_sustained / peak["bf16_tflops"], 4)
        result["hbm_util"] = round(gbps_sustained / peak["hbm_gbps"], 4)
        # roofline ridge point: FLOPs/byte where compute == bandwidth bound
        result["ridge_flops_per_byte"] = round(
            peak["bf16_tflops"] * 1e12 / (peak["hbm_gbps"] * 1e9), 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
