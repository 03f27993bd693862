"""Headline benchmark: Poisson + MAML meta-training outer-step throughput.

Runs the paper's flagship config (pipeline/pipleline_maml_meta.sh poisson:
bsize 16, 5 inner steps, 1024 inner/outer collocation points, 3x64 SIREN
omega=30) and prints ONE JSON line.

Protocol: the training computation is metapde_tpu's train_step_many — a
lax.scan of full second-order MAML outer steps (fused Taylor-mode residuals,
learned per-step inner LRs, grad clip, both optimizers) executed as one XLA
computation per 100-step block. Timing is wall clock across 10 blocks with a
forced host fetch of the per-step losses at the end; on the axon tunnel,
block_until_ready can return before execution finishes, so only a device->
host copy is a trustworthy barrier.

Baseline: the reference's logged outer-step time on its T4 GPU is 3.21 s
(BASELINE.md: resultAnalysis.ipynb cell 8, step 11500 sample log line), i.e.
0.3115 outer-steps/sec. vs_baseline = our steps/sec divided by that.
"""

import json
import os
import signal
import sys
import time

import numpy as np

REF_STEP_TIME_S = 3.21  # reference T4 GPU seconds per outer step


def _classify_tpu_pipeline_proc(argv, env):
    """Classify a process as 'queue' | 'supervisor' | 'trainer' | None.

    Matching is structural (argv[0] interpreter + argv[1]/module slots),
    never on joined command-line text: a `bash -c` wrapper, grep, or
    editor whose ARGUMENT text mentions these names must never match
    (self-kill footgun). CPU-pinned trainers (JAX_PLATFORMS=cpu in env)
    are not TPU pipeline members. Pure function; unit-tested in
    tests/test_utils.py."""
    if not argv or not argv[0]:
        return None
    exe = os.path.basename(argv[0])
    if exe in ("bash", "sh", "dash"):
        script = os.path.basename(argv[1]) if len(argv) > 1 else ""
        if script.startswith("queue_round") and script.endswith(".sh"):
            return "queue"
        if script in ("supervise.sh", "supervise2.sh"):
            return "supervisor"
        return None
    if exe.startswith("python"):
        if ("-m" in argv[:3]
                and any(a.startswith("metapde_tpu.cli.") for a in argv[1:4])
                and "JAX_PLATFORMS=cpu" not in env):
            return "trainer"
    return None


def _ensure_exclusive_tpu(wait_s: float = 120.0):
    """Stop any running TPU training pipeline before benchmarking.

    Two processes through the axon TPU relay wedge BOTH (the first
    flatlines silently), so a bench started while a supervised training
    queue holds the chip would hang and take the training down with it.
    This preempts, by exact PID: (1) TPU queue scripts (so a dying
    supervisor doesn't trigger the queue's next TPU stage mid-bench),
    (2) pipeline/supervise.sh supervisors (so they don't relaunch their
    child), (3) TPU-bound metapde_tpu.cli.* trainers. CPU-pinned jobs
    (JAX_PLATFORMS=cpu in their environment) are left alone. Training
    loses at most the steps since its last checkpoint; supervised runs
    resume from there when re-queued.

    Set BENCH_NO_PREEMPT=1 to skip (e.g. benching on a machine where you
    know the chip is free and want the queues untouched).
    """
    if os.environ.get("BENCH_NO_PREEMPT"):
        return
    me = os.getpid()

    def scan():
        queues, supers, trainers = [], [], []
        for pid in os.listdir("/proc"):
            if not pid.isdigit() or int(pid) == me:
                continue
            try:
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    argv = f.read().decode(errors="ignore").split("\0")
                with open(f"/proc/{pid}/environ", "rb") as f:
                    env = f.read().decode(errors="ignore")
            except OSError:
                continue
            kind = _classify_tpu_pipeline_proc(argv, env)
            if kind == "queue":
                queues.append(int(pid))
            elif kind == "supervisor":
                supers.append(int(pid))
            elif kind == "trainer":
                trainers.append(int(pid))
        return queues, supers, trainers

    def alive():
        q, s, t = scan()
        return q + s + t

    victims = alive()
    if not victims:
        return
    for group in scan():  # ordered: queues, then supervisors, then trainers
        for pid in group:
            print(f"bench: preempting TPU pipeline pid {pid}",
                  file=sys.stderr, flush=True)
            try:
                os.kill(pid, signal.SIGTERM)
            except OSError:
                pass
        time.sleep(2.0)
    deadline = time.time() + wait_s
    while time.time() < deadline and alive():
        time.sleep(2.0)
    for pid in alive():
        try:
            os.kill(pid, signal.SIGKILL)
        except OSError:
            pass
    time.sleep(5.0)  # let the relay drop the dead client cleanly


def _await_tpu(wait_s: float) -> bool:
    """Wait (bounded) for the axon TPU tunnel to serve jax.devices().

    The tunnel wedges for hours at a time (jax.devices() then blocks
    forever, observed >=10 min); probing in THIS process would leave a
    dead client registered, so each probe is a fresh subprocess with its
    own timeout. Returns True as soon as one probe succeeds, False once
    wait_s is exhausted."""
    import subprocess
    deadline = time.time() + wait_s
    first = True
    while first or time.time() < deadline:
        first = False
        try:
            rc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=180, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            ).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return True
        print(f"bench: TPU tunnel probe failed "
              f"({max(0, deadline - time.time()):.0f}s of patience left)",
              file=sys.stderr, flush=True)
        if time.time() + 60 < deadline:
            time.sleep(60)
        else:
            break
    return False


def _arm_watchdog(seconds: int):
    """Hard cap on total bench runtime: if the tunnel wedges after the
    probe succeeded, emit a schema-valid JSON line and exit instead of
    hanging the round driver."""

    def _fire(signum, frame):
        print(json.dumps({
            "metric": "poisson_maml_outer_steps_per_sec",
            "value": 0.0, "unit": "steps/s", "vs_baseline": 0.0,
            "error": f"bench watchdog fired after {seconds}s (TPU tunnel hang)",
        }), flush=True)
        os._exit(2)

    signal.signal(signal.SIGALRM, _fire)
    signal.alarm(seconds)


def _measure_window_refs(jax):
    """Fixed micro-reference computations for cross-window normalization.

    Identical bench code measured 49.8 vs 24.0 steps/s on different tunnel
    windows (RESULTS.md round-2 perf-study preamble) — a 2x environmental
    swing on the same chip. These two canned probes separate the axes so a
    headline number can be normalized across windows:
      - window_ref_compute_ms: one dispatch of a 200-deep bf16 1024^2
        matmul+tanh chain (device execution rate);
      - window_ref_roundtrip_ms: median of 30 trivial dispatch+fetch
        round trips (tunnel/dispatch latency).
    Cross-window comparison: steps/s * (ref_ms_then / ref_ms_now) for
    whichever axis dominates the measured regime (the flagship step is
    latency/traffic-bound at width 64 — roofline, RESULTS.md)."""
    import jax.numpy as jnp

    @jax.jit
    def chain(x):
        def body(c, _):
            return jnp.tanh(c @ x), ()
        c, _ = jax.lax.scan(body, x, None, length=200)
        return c

    x = jnp.ones((1024, 1024), jnp.bfloat16) * 0.001
    np.asarray(chain(x))  # compile + warm
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(chain(x))
        times.append((time.perf_counter() - t0) * 1e3)
    compute_ms = float(np.median(times))

    @jax.jit
    def tiny(y):
        return y + 1.0

    y = jnp.zeros((), jnp.float32)
    np.asarray(tiny(y))
    times = []
    for _ in range(30):
        t0 = time.perf_counter()
        y = tiny(y)
        np.asarray(y)
        times.append((time.perf_counter() - t0) * 1e3)
    roundtrip_ms = float(np.median(times))
    return round(compute_ms, 3), round(roundtrip_ms, 3)


def _load_r03_anchors():
    """(compute_ms, roundtrip_ms) window refs from the round-3 bench, the
    anchor window for cross-round normalization. Falls back to the recorded
    BENCH_r03 constants when the file is absent (fresh clone)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_r03.json")
    try:
        with open(path) as f:
            d = json.load(f)
        d = d.get("parsed", d)  # driver wraps the JSON line under "parsed"
        return (float(d["window_ref_compute_ms"]),
                float(d["window_ref_roundtrip_ms"]))
    except Exception:
        return (132.731, 29.299)  # BENCH_r03.json as committed 2026-08-20


def main():
    _ensure_exclusive_tpu()
    backend = "tpu"
    if not _await_tpu(float(os.environ.get("BENCH_TPU_WAIT_S", "1800"))):
        # Tunnel stayed down: measure on CPU rather than hang. The JSON
        # stays schema-valid and honestly labeled; vs_baseline is the
        # real CPU-vs-reference-GPU ratio.
        print("bench: TPU tunnel unavailable; falling back to CPU backend",
              file=sys.stderr, flush=True)
        os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
        backend = "cpu"
    _arm_watchdog(int(os.environ.get("BENCH_HARD_TIMEOUT_S", "5400")))
    import jax

    if backend == "cpu":
        # sitecustomize pre-imports jax with the axon plugin registered,
        # so the env var alone is too late for THIS process; the config
        # flip works because no backend has been initialized yet.
        jax.config.update("jax_platforms", "cpu")

    from metapde_tpu.config import (
        Config, FieldConfig, MamlConfig, TaskConfig, TrainConfig,
    )
    from metapde_tpu.train import maml_driver

    cfg = Config(
        task=TaskConfig(
            pde="poisson", inner_points=1024, outer_points=1024,
            validation_points=1024, n_eval=8, bc_weight=1.0,
            # sort-free with-replacement point draws: the reference samples
            # n of 3n candidates WITHOUT replacement (poisson_common.py:118,
            # replace=False), whose jit lowering is a full sort per loss
            # call that dominated the step (RESULTS.md perf-study: 2.33x).
            # Distributional equivalence: tests/test_fast_sampler.py;
            # end-to-end accuracy parity at 10k steps: probe10k_fast
            # 1.53e-2 vs f32 control (RESULTS.md round-2 probe table).
            sample_with_replacement=True,
        ),
        model=FieldConfig(num_layers=3, layer_size=64, omega=30.0, omega0=30.0,
                          # bf16-stored carried tensors, f32 accumulate +
                          # master params: +10% on top of the fast sampler
                          # (2.57x combined); accuracy parity probe
                          # probe10k_fast_bf16 1.51e-2 (best of the panel)
                          compute_dtype="bfloat16"),
        maml=MamlConfig(
            bsize=16, inner_steps=5, inner_lr=1e-4, outer_lr=1e-5,
            inner_grad_clip=100.0, grad_clip=100.0,
            # fastest measured flagship variant (RESULTS.md round-2
            # roofline table): fully-unrolled inner scan without remat is
            # +13% steps/s over the remat+loop default at this model size
            # (recompute saves traffic only when the loop is a real loop)
            unroll=5,
        ),
        train=TrainConfig(remat_inner_steps=False),
    )
    c = maml_driver.build(cfg)
    params, lrs = c["init_params"], c["inner_lrs"]
    opt_state = c["outer_opt"].init(params)
    lr_opt_state = c["lr_opt"].init(lrs)
    many = c["train_step_many"]
    key = jax.random.PRNGKey(0)
    # CPU fallback: a second-order MAML outer step is ~seconds on this
    # 1-core host; 100-step blocks would blow past the watchdog.
    block, n_blocks = (100, 10) if backend == "tpu" else (4, 3)

    # warmup / compile; fetch forces real completion
    out = many(key, params, lrs, opt_state, lr_opt_state, n_steps=block)
    np.asarray(out[7])
    state = out[:4]

    t0 = time.perf_counter()
    for _ in range(n_blocks):
        key, sk = jax.random.split(key)
        out = many(sk, *state, n_steps=block)
        state = out[:4]
    last_losses = np.asarray(out[7])  # host fetch = hard barrier
    dt = time.perf_counter() - t0
    assert np.isfinite(last_losses).all()

    steps_per_sec = n_blocks * block / dt
    # north-star secondary metric (BASELINE.json): collocation-point
    # residual evaluations/s/chip inside the doubly-differentiated unroll
    # = bsize * (inner_steps * inner_points + (inner_steps + 1) * outer
    # points) per outer step
    pt_evals_per_step = cfg.maml.bsize * (
        cfg.maml.inner_steps * cfg.task.inner_points
        + (cfg.maml.inner_steps + 1) * cfg.task.outer_points
    )
    ref_compute_ms, ref_roundtrip_ms = _measure_window_refs(jax)
    result = {
        "metric": "poisson_maml_outer_steps_per_sec",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec * REF_STEP_TIME_S, 3),
        "residual_pt_evals_per_sec": round(steps_per_sec * pt_evals_per_step),
        # fixed micro-reference timings for cross-window normalization
        # (see _measure_window_refs): quote steps/s * (ref_then/ref_now)
        "window_ref_compute_ms": ref_compute_ms,
        "window_ref_roundtrip_ms": ref_roundtrip_ms,
    }
    # The window refs above are DIAGNOSTICS ONLY for this metric (VERDICT
    # r4 item 7): the flagship number runs as 100-step device-resident
    # blocks and measured flat across three rounds' windows (61.70/61.72/
    # 61.73 while window_ref_compute_ms swung 66-133 ms), so scaling it by
    # a window ref amplifies probe noise into a fake 1.5x spread — the
    # round-4 RESULTS/BENCH contradiction. Normalize by these refs ONLY
    # for per-dispatch (latency-bound) metrics, e.g. deployment_time;
    # never the steps/s headline. The r03 anchors stay recorded for that
    # use.
    anchors = _load_r03_anchors()
    if anchors and backend == "tpu":
        result["window_anchor_r03_compute_ms"] = anchors[0]
        result["window_anchor_r03_roundtrip_ms"] = anchors[1]
    if backend != "tpu":
        result["backend"] = backend  # CPU fallback run (TPU tunnel down)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
