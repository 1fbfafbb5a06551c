"""Fully-fused device-resident sampled-MPC tick (two kernels + ~a dozen ops).

The round-4 flagship tick (mpc/sampled.py make_loop_tick) spent 60-80%
of its time in unfused XLA op chains around the solve kernel
(VERDICT r4: 2,703 us/tick vs 507 us solve at B=64/N=64).  This module
rebuilds the SAME tick — identical carry/trace contracts, identical RNG
streams — as:

  1. the fused SQP solve kernel (ops/pallas/sqp_kernel.py), fed
     lane-major directly (no (B, ...) <-> (..., B) transposes);
  2. the tick-epilogue kernel (ops/pallas/tick_kernel.py): consensus
     scoring + argmin + winner gather + ground-truth plant + trace FK;
  3. a handful of XLA ops: the reference-window slice, input broadcasts,
     the winner-trajectory gather for the warm start, wrench resampling,
     and the true-disturbance walk.

Semantics mirror gato_controller.py:201-256 exactly as make_loop_tick
does; equivalence against the unfused tick is enforced by
tests/test_fused_tick.py (nominal plant: trajectories match to f32
tolerance; perturbed plant: identical pre-drawn noise stream).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import (
    CostConfig, MPCConfig, PlantConfig, SampleConfig, SQPConfig,
)
from ..models.robot import RobotModel
from ..ops.pallas import sqp_kernel, tick_kernel
from ..sim.plant import perturb_model
from .sampled import (
    SampledLoopCarry, SampledTrace, resample_wrench_batch,
)


def _pad_lanes(B: int) -> int:
    """Padded lane count: multiple of 8 up to 128, of 128 beyond (the
    solve kernel tiles lanes at min(T, 128))."""
    if B <= 128:
        return max(8, -(-B // 8) * 8)
    return -(-B // 128) * 128


def make_fused_loop_tick(
    model: RobotModel,
    cost_cfg: CostConfig,
    sqp_cfg: SQPConfig,
    mpc_cfg: MPCConfig,
    sample_cfg: SampleConfig,
    ref_traj,
    f_true_walk: bool = True,
    plant_cfg: Optional[PlantConfig] = None,
    plant_model: Optional[RobotModel] = None,
    interpret: bool = False,
):
    """``tick(carry, _) -> (carry, SampledTrace)`` — drop-in for
    mpc.sampled.make_loop_tick on TPU (gn formulation + riccati backend).

    ``interpret=True`` runs both kernels in pallas interpret mode (CPU
    equivalence tests only — far too slow for real runs).
    """
    if cost_cfg.formulation != "gn" or sqp_cfg.qp_backend != "riccati":
        raise ValueError(
            "fused tick covers the production config only "
            "(formulation='gn', qp_backend='riccati')"
        )
    N, dt = mpc_cfg.N, mpc_cfg.dt
    B = sample_cfg.batch_size
    T = _pad_lanes(B)
    dtype = jnp.float32
    ref_traj = jnp.asarray(ref_traj, dtype)
    pcfg = plant_cfg or PlantConfig(substeps=mpc_cfg.sim_substeps)
    pm = perturb_model(
        model if plant_model is None else plant_model, pcfg
    )
    noise_on = bool(pcfg.torque_noise_std)

    def tick(carry: SampledLoopCarry, _):
        key, k_tick, k_walk, k_plant = jax.random.split(carry.key, 4)
        goals = jax.lax.dynamic_slice_in_dim(ref_traj, carry.ref_offset, N, 0)

        # ---- solve (lane-major, lanes padded by replication) ----
        x = carry.x.astype(dtype)
        xs_b = jnp.broadcast_to(x[:, None], (12, T))
        goals_b = jnp.broadcast_to(goals[:, :, None], (N, 3, T))
        X_b = jnp.broadcast_to(
            carry.X_best.astype(dtype).at[0].set(x)[:, :, None], (N, 12, T)
        )
        U_b = jnp.broadcast_to(
            carry.U_best.astype(dtype)[:, :, None], (N - 1, 6, T)
        )
        fb_T = jnp.zeros((6, T), dtype).at[:, :B].set(
            carry.f_batch.astype(dtype).T
        )
        X, U, _rho, _alphas, _steps = sqp_kernel.sqp_solve_pallas(
            model, cost_cfg, sqp_cfg, dt,
            xs_b, goals_b, X_b, U_b,
            wrench_b=fb_T, tile=min(T, 128), interpret=interpret,
        )

        # ---- everything after the solve, in one kernel ----
        # Pre-draw the plant's actuation noise on the IDENTICAL
        # jax.random stream the unfused plant_step consumes (split chain
        # per substep, sim/plant.py plant_step sub()).
        if noise_on:
            draws, k = [], k_plant
            for _s in range(pcfg.substeps):
                k, ks = jax.random.split(k)
                draws.append(
                    pcfg.torque_noise_std
                    * jax.random.normal(ks, (6,), dtype)
                )
            noise = jnp.stack(draws)
        else:
            noise = None
        ep = tick_kernel.tick_epilogue(
            model, pm, pcfg, dt,
            x, carry.x_last, carry.u_last,
            fb_T, U[0], carry.f_true, noise=noise, B=B,
            interpret=interpret,
        )

        # Winner trajectory for next tick's warm start (one gather each).
        X_best = jnp.take(X, ep.best, axis=2).astype(carry.X_best.dtype)
        U_best = jnp.take(U, ep.best, axis=2).astype(carry.U_best.dtype)

        key_r, _ = jax.random.split(k_tick)
        f_new = resample_wrench_batch(
            key_r, carry.f_batch, ep.best, sample_cfg
        )

        # True-disturbance random walk (gato_controller.py:236-239).
        walked = carry.f_true.at[:3].set(
            jnp.clip(
                carry.f_true[:3]
                + jax.random.normal(k_walk, (3,), carry.x.dtype),
                -20.0, 20.0,
            )
        )
        do_walk = jnp.logical_and(
            jnp.asarray(f_true_walk), carry.ref_offset % 200 == 0
        )
        f_true = jnp.where(do_walk, walked, carry.f_true)

        trace = SampledTrace(
            tracking_error=jnp.sqrt(jnp.sum((ep.eep - goals[0]) ** 2)),
            ee_pos=ep.eep,
            ee_ref=goals[0],
            q=carry.x[:model.nq],
            u=ep.u,
            best_idx=ep.best,
            f_est=ep.f_est,
            f_true=carry.f_true,
            x=carry.x,
        )
        new_carry = SampledLoopCarry(
            x=ep.x_next.astype(carry.x.dtype),
            x_last=carry.x,
            u_last=ep.u.astype(carry.u_last.dtype),
            X_best=X_best,
            U_best=U_best,
            f_batch=f_new,
            f_true=f_true,
            key=key,
            ref_offset=carry.ref_offset + 1,
        )
        return new_carry, trace

    return tick
