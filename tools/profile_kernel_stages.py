#!/usr/bin/env python
"""Attribute fused-kernel time to its four stages via prefix truncation.

Times sqp_solve_pallas at stages=1..4 (each SQP iteration truncated after
linearize / backward sweep / forward rollout / full).  Differences between
consecutive rows are each stage's share.  Usage:

  python tools/profile_kernel_stages.py [B] [N] [--iters I]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("B", nargs="?", type=int, default=64)
    ap.add_argument("N", nargs="?", type=int, default=32)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    from indy7_mpc_tpu.utils.cache import enable_cache

    enable_cache()
    from indy7_mpc_tpu.config import CostConfig, SampleConfig, SQPConfig
    from indy7_mpc_tpu.models import indy7
    from indy7_mpc_tpu.mpc.sampled import init_wrench_batch
    from indy7_mpc_tpu.ops.pallas import sqp_kernel

    B, N, dt = args.B, args.N, 0.01
    dtype = jnp.float32
    model = indy7(dtype=dtype)
    cost_cfg = CostConfig()
    sqp_cfg = SQPConfig(max_iters=2)

    key = jax.random.PRNGKey(42)
    wrench_b = init_wrench_batch(
        key, SampleConfig(batch_size=B, f_ext_std=20.0), dtype
    ).T
    xs_b = jnp.zeros((12, B), dtype)
    goals_b = jnp.tile(
        jnp.asarray([0.35, 0.35, 0.6], dtype)[None, :, None], (N, 1, B)
    )
    X_b = jnp.zeros((N, 12, B), dtype)
    U_b = jnp.zeros((N - 1, 6, B), dtype)

    print(f"# device={jax.devices()[0].device_kind} B={B} N={N} "
          f"iters={sqp_cfg.max_iters}")
    prev = 0.0
    names = {1: "linearize", 2: "+riccati bwd", 3: "+fwd rollout",
             4: "+line search (full)"}
    R = 20  # chained solves per dispatch: amortizes host/tunnel latency
    for stages in (1, 2, 3, 4):
        def chained(xs, goals, X, U, w, s=stages):
            def body(_, XU):
                Xc, Uc = XU
                out = sqp_kernel.sqp_solve_pallas(
                    model, cost_cfg, sqp_cfg, dt, xs, goals, Xc, Uc, w,
                    tile=min(B, 128), stages=s,
                )
                return out[0], out[1]

            return jax.lax.fori_loop(0, R, body, (X, U))

        fn = jax.jit(chained)
        out = fn(xs_b, goals_b, X_b, U_b, wrench_b)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(xs_b, goals_b, X_b, U_b, wrench_b)
        jax.block_until_ready(out)
        t = (time.perf_counter() - t0) / (args.iters * R)
        print(f"stages<={stages} {names[stages]:<22} {t * 1e6:8.0f} us "
              f"(delta {max(t - prev, 0.0) * 1e6:8.0f} us)")
        prev = t


if __name__ == "__main__":
    main()
