#!/usr/bin/env python
"""Profiling harness: XLA trace + per-stage timing of the batched solve.

The reference's only profiling surface is solver-returned timings
(solve_time_us / pcg_stats / line_search_stats, gato_controller.py:96-101)
and wall-clock deltas.  This tool adds what it lacks (SURVEY.md section
5.1: "No tracer, no flamegraphs"): a real device trace viewable in
Perfetto/TensorBoard plus a stage-by-stage latency table
(linearize / QP / line search / full solve) for both solver paths.

Usage:
  python tools/profile_solve.py [B] [N] [--trace DIR] [--backend pallas|vmap]
On the TPU chip the trace captures kernel-level timing; on CPU it still
produces a usable host-side trace.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timeit(fn, args, iters=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("B", nargs="?", type=int, default=64)
    ap.add_argument("N", nargs="?", type=int, default=32)
    ap.add_argument("--trace", default=None,
                    help="directory for a jax.profiler trace")
    ap.add_argument("--backend", default="pallas",
                    choices=["pallas", "vmap"])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from indy7_mpc_tpu.utils.cache import enable_cache

    enable_cache()
    from indy7_mpc_tpu.config import CostConfig, SampleConfig, SQPConfig
    from indy7_mpc_tpu.models import indy7
    from indy7_mpc_tpu.mpc.sampled import init_wrench_batch
    from indy7_mpc_tpu.ops import kkt, riccati
    from indy7_mpc_tpu.solvers import sqp as sqp_vmap
    from indy7_mpc_tpu.solvers import sqp_pallas

    B, N, dt = args.B, args.N, 0.01
    dtype = jnp.float32
    model = indy7(dtype=dtype)
    cost_cfg = CostConfig()
    sqp_cfg = SQPConfig(max_iters=2)
    sqp_mod = sqp_pallas if args.backend == "pallas" else sqp_vmap

    key = jax.random.PRNGKey(42)
    wrench_b = init_wrench_batch(
        key, SampleConfig(batch_size=B, f_ext_std=20.0), dtype
    )
    xs_b = jnp.zeros((B, 12), dtype)
    goals_b = jnp.tile(jnp.asarray([0.35, 0.35, 0.6], dtype), (B, N, 1))
    X_b = jnp.zeros((B, N, 12), dtype)
    U_b = jnp.zeros((B, N - 1, 6), dtype)

    solve = jax.jit(lambda *a: sqp_mod.batch_solve(
        model, cost_cfg, sqp_cfg, dt, *a[:4], wrench_world_batch=a[4]
    ))
    lin = jax.jit(jax.vmap(
        lambda X, U, w: kkt.build_qp_gn(model, cost_cfg, X, U, goals_b[0],
                                        dt, wrench_world=w)
    ))
    qp = jax.jit(jax.vmap(lambda b, x: riccati.solve(b, x, 1e-6)))

    dev = jax.devices()[0].device_kind
    print(f"# device={dev} backend={args.backend} B={B} N={N}")

    t_full = timeit(solve, (xs_b, goals_b, X_b, U_b, wrench_b), args.iters)
    blocks = lin(X_b, U_b, wrench_b)
    t_lin = timeit(lin, (X_b, U_b, wrench_b), args.iters)
    t_qp = timeit(qp, (blocks, xs_b), args.iters)

    rows = [
        ("linearize+cost (vmap)", t_lin),
        ("riccati QP (vmap)", t_qp),
        (f"full solve ({args.backend})", t_full),
    ]
    print(f"{'stage':<28} {'per call':>12} {'per lane':>12} {'solves/s':>12}")
    for name, t in rows:
        print(f"{name:<28} {t * 1e6:>10.0f}us {t / B * 1e6:>10.1f}us "
              f"{B / t:>12.0f}")

    if args.trace:
        with jax.profiler.trace(args.trace):
            out = solve(xs_b, goals_b, X_b, U_b, wrench_b)
            jax.block_until_ready(out)
        print(f"# trace written to {args.trace} "
              "(open with Perfetto / TensorBoard)")


if __name__ == "__main__":
    main()
