#!/usr/bin/env python
"""Multi-process (multi-host) sampled-MPC scale-out bench and demo.

BASELINE.json config 5: "multi-host 32k-scenario MPC sweep ... with
cross-host cost reduction".  One controller process per host; the lane
axis shards over every device of every process and the consensus argmin
runs as a global collective (parallel/distributed.py).

Two ways to run:

* Hardware-free rig (this machine, virtual CPU devices, gloo):
      python examples/multihost_bench.py --procs 2 --devices-per-proc 4 \
          --B 64 --N 8 --ticks 3
  The launcher spawns one worker copy of itself per process and prints a
  JSON line from worker 0, plus a scaling-efficiency line comparing
  against a single-process run of the same global problem.

* Real pod slice (one copy per host):
      python examples/multihost_bench.py --worker --coordinator host0:8476 \
          --procs <n_hosts> --proc-id <i> --B 32768 --N 32

The worker path is identical in both cases — that is the point.
"""
import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def worker(args) -> None:
    from indy7_mpc_tpu.parallel import distributed as dist

    dist.initialize(
        args.coordinator,
        args.procs,
        args.proc_id,
        cpu_devices_per_process=(
            args.devices_per_proc if args.devices_per_proc > 0 else None
        ),
    )
    import jax
    import jax.numpy as jnp
    import numpy as np

    from indy7_mpc_tpu.config import CostConfig, SampleConfig, SQPConfig
    from indy7_mpc_tpu.models import indy7
    from indy7_mpc_tpu.mpc.sampled import init_wrench_batch
    from indy7_mpc_tpu.parallel import make_sharded_sampled_tick

    B, N, dt = args.B, args.N, 0.01
    dtype = jnp.float32
    model = indy7(dtype=dtype)
    cost_cfg = CostConfig()
    sqp_cfg = SQPConfig(max_iters=args.sqp_iters)
    sample_cfg = SampleConfig(batch_size=B, f_ext_std=10.0,
                              f_ext_resample_std=1.0)

    mesh = dist.global_lane_mesh()
    tick = make_sharded_sampled_tick(
        model, cost_cfg, sqp_cfg, sample_cfg, dt, mesh
    )

    key = jax.random.PRNGKey(42)
    f_full = np.asarray(init_wrench_batch(key, sample_cfg, dtype))
    f_batch = dist.global_lanes(mesh, f_full)

    rep = lambda v: dist.replicated_global(mesh, np.asarray(v, np.float32))
    x0 = rep(np.zeros(12))
    u0 = rep(np.zeros(6))
    goals = rep(np.tile([0.3, 0.2, 0.6], (N, 1)))
    X = rep(np.zeros((N, 12)))
    U = rep(np.zeros((N - 1, 6)))
    keyg = dist.replicated_global(mesh, np.asarray(key))

    out = tick(keyg, x0, x0, u0, goals, X, U, f_batch)   # compile + warmup
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.ticks):
        out = tick(keyg, x0, x0, u0, goals, X, U, out.f_batch)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0

    if jax.process_index() == 0:
        per_tick = elapsed / args.ticks
        print(json.dumps({
            "procs": args.procs,
            "devices": len(jax.devices()),
            "B": B,
            "N": N,
            "tick_s": round(per_tick, 6),
            "solves_per_sec": round(B / per_tick, 1),
            "best_idx": int(dist.fetch_replicated(out.best_idx)),
            "u": [round(float(v), 6) for v in dist.fetch_replicated(out.u)],
            "f_est": [round(float(v), 5)
                      for v in dist.fetch_replicated(out.f_est)],
        }), flush=True)


def launch(args) -> None:
    """Spawn --procs worker copies on this machine (CPU rig) and report."""

    def run(procs, dpp, port):
        cmd_base = [
            sys.executable, os.path.abspath(__file__), "--worker",
            "--coordinator", f"localhost:{port}",
            "--procs", str(procs), "--devices-per-proc", str(dpp),
            "--B", str(args.B), "--N", str(args.N),
            "--ticks", str(args.ticks), "--sqp-iters", str(args.sqp_iters),
        ]
        env = dict(os.environ)
        env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        env["JAX_PLATFORMS"] = "cpu"
        ps = [
            subprocess.Popen(
                cmd_base + ["--proc-id", str(i)],
                stdout=subprocess.PIPE if i == 0 else subprocess.DEVNULL,
                stderr=subprocess.DEVNULL, text=True, env=env,
            )
            for i in range(procs)
        ]
        out0, _ = ps[0].communicate(timeout=args.timeout)
        for p in ps[1:]:
            p.wait(timeout=args.timeout)
        for p in ps:
            if p.returncode != 0:
                raise RuntimeError(f"worker rc={p.returncode}")
        line = [l for l in out0.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    total_dev = args.procs * args.devices_per_proc
    multi = run(args.procs, args.devices_per_proc, args.port)
    print(json.dumps(multi))
    if args.efficiency:
        single = run(1, total_dev, args.port + 1)
        eff = multi["solves_per_sec"] / max(single["solves_per_sec"], 1e-9)
        print(json.dumps({
            "metric": "multiproc_scaling_efficiency",
            "value": round(eff, 3),
            "single_proc_solves_per_sec": single["solves_per_sec"],
            "multi_proc_solves_per_sec": multi["solves_per_sec"],
            "consensus_match": multi["best_idx"] == single["best_idx"],
        }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--coordinator", default="localhost:8476")
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--proc-id", type=int, default=0)
    ap.add_argument("--devices-per-proc", type=int, default=4)
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--N", type=int, default=8)
    ap.add_argument("--ticks", type=int, default=3)
    ap.add_argument("--sqp-iters", type=int, default=1)
    ap.add_argument("--port", type=int, default=8476)
    ap.add_argument("--timeout", type=float, default=900.0)
    ap.add_argument("--efficiency", action="store_true",
                    help="also run single-process and report efficiency")
    args = ap.parse_args()
    if args.worker:
        worker(args)
    else:
        launch(args)


if __name__ == "__main__":
    main()
