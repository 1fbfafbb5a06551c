"""The non-solve remainder of a sampled-MPC control tick as ONE Pallas kernel.

Round-4 profiling showed ~60-80% of the device-resident tick living
*outside* the fused SQP kernel (BASELINE_TPU.md device table: 2,703 us
whole tick vs 507 us solve at B=64/N=64): the consensus scoring
(B one-step RK4 predictions, gato_controller.py:109-118), the
ground-truth plant step (sim/plant.py plant_step: RK4 substeps +
friction + actuation noise + joint stops), the winner gather and the FK
for the trace each ran as long chains of small XLA ops costing ~1 us
apiece on this stack.  This kernel fuses all of them:

  * consensus: per-lane RK4 prediction of the NEXT state under each
    wrench hypothesis from the controller's model (the reference's
    ``sim_forward`` + CPU argmin, gato_controller.py:105-118) — lane-major
    over the full hypothesis batch;
  * argmin + one-hot winner reduction (first-index tie-break, matching
    ``jnp.argmin``), yielding the applied control u = U_best[0] and the
    wrench estimate f_est without a host or XLA gather;
  * the ground-truth plant tick (sim/plant.py plant_step semantics,
    bit-matching the XLA path's math): torque clamp to the actuator
    ``ctrlrange``, ``substeps`` RK4 sub-intervals with the world wrench
    re-mapped to the EE joint frame at each substep start, unmodeled
    friction ``-kv v - kc tanh(v/0.01)`` inside every stage, per-substep
    actuation noise (pre-drawn outside, same jax.random stream), and
    MuJoCo-style hard joint stops after every substep — computed on a
    narrow 8-lane slice so large hypothesis batches don't pay for the
    single-state plant;
  * the controller-model FK of the observed state (the per-tick
    ``ee_positions`` trace entry, gato_controller.py:242-247).

Only ~a dozen XLA ops remain per tick (reference-window slice, input
broadcasts, resampling, trace packing) — see mpc/fused_tick.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import PlantConfig
from ...models.robot import RobotModel
from .. import lane_rbd as LR

NX, NQ, NU = 12, 6, 6
TP = 8  # plant/FK lane-slice width (one f32 sublane tile)


class PlantOpts(NamedTuple):
    """Static (trace-time) plant parameters for the in-kernel plant step."""

    substeps: int
    viscous: float
    coulomb: float
    noise: bool
    velocity_saturation: bool


def _rows(a, n):
    return [a[i] for i in range(n)]


def _rk4(sm, q, v, stage, h):
    """Component-wise RK4 matching dynamics/integrators.rk4_step (the
    averaged-velocity position update of the reference's utils.py:3-18).

    ``stage.fd(q, v)`` supplies stage accelerations (friction/noise
    folded into the torque); returns (q_next, v_next) component lists.
    """

    def fd(qq, vv):
        return stage.fd(qq, vv)

    half = h / 2.0
    k1q = v
    k1v = fd(q, v)
    q2 = [q[i] + half * k1q[i] for i in range(NQ)]
    k2q = [v[i] + half * k1v[i] for i in range(NQ)]
    k2v = fd(q2, k2q)
    q3 = [q[i] + half * k2q[i] for i in range(NQ)]
    k3q = [v[i] + half * k2v[i] for i in range(NQ)]
    k3v = fd(q3, k3q)
    q4 = [q[i] + h * k3q[i] for i in range(NQ)]
    k4q = [v[i] + h * k3v[i] for i in range(NQ)]
    k4v = fd(q4, k4q)
    qn = [
        q[i] + (h / 6.0) * (k1q[i] + 2 * k2q[i] + 2 * k3q[i] + k4q[i])
        for i in range(NQ)
    ]
    vn = [
        v[i] + (h / 6.0) * (k1v[i] + 2 * k2v[i] + 2 * k3v[i] + k4v[i])
        for i in range(NQ)
    ]
    return qn, vn


class _Stage(NamedTuple):
    """Stage-dynamics closure: a(q, v) with friction/noise-adjusted torque."""

    sm: object
    u: tuple
    f_ext: object
    friction: Optional[tuple]

    def fd(self, q, v):
        tau = list(self.u)
        if self.friction is not None:
            kv, kc = self.friction
            tau = [
                tau[i] - kv * v[i] - kc * jnp.tanh(v[i] / 0.01)
                for i in range(NQ)
            ]
        a, _ = LR.forward_dynamics(self.sm, q, v, tau, f_ext_ee=self.f_ext)
        return a


def _apply_limits(sm, q, v, vel_lim, velocity_saturation):
    """Lane-major apply_joint_limits (sim/plant.py): optional servo
    velocity saturation, then hard position stops with the outward
    velocity component zeroed."""
    out_q, out_v = [], []
    for i in range(NQ):
        qi, vi = q[i], v[i]
        if velocity_saturation:
            vl = float(vel_lim[i])
            vi = jnp.clip(vi, -vl, vl)
        hi = float(sm.q_upper[i])
        lo = float(sm.q_lower[i])
        vi = jnp.where(qi > hi, jnp.minimum(vi, 0.0), vi)
        vi = jnp.where(qi < lo, jnp.maximum(vi, 0.0), vi)
        out_q.append(jnp.clip(qi, lo, hi))
        out_v.append(vi)
    return out_q, out_v


def _tick_kernel(
    smc,            # controller StaticModel (consensus + FK)
    smp,            # plant StaticModel (possibly perturbed)
    opts: PlantOpts,
    effort_lim,     # np (6,) actuator clamp (shared ctrlrange)
    vel_lim,        # np (6,) URDF velocity limits (saturation opt-in)
    dt: float,
    B: int,         # true lane count (lanes >= B are padding)
    # refs:
    xlast_ref, ulast_ref, fb_ref, U0_ref, xcur_ref, ftrue_ref, noise_ref,
    err_ref, best_ref, xnext_ref, u_ref, eep_ref, fest_ref,
):
    T = fb_ref.shape[-1]
    dtype = jnp.float32

    # ---- consensus: one RK4 prediction per wrench hypothesis ----
    # (predict_next_states semantics: controller model, torque clamp,
    # wrench mapped at the start state, joint stops applied after.)
    ql = _rows(xlast_ref, NQ)
    vl = [xlast_ref[NQ + i] for i in range(NQ)]
    uu = [
        jnp.clip(ulast_ref[i], -float(effort_lim[i]), float(effort_lim[i]))
        for i in range(NU)
    ]
    w = _rows(fb_ref, 6)
    fe = LR.world_wrench_to_ee(smc, ql, w)
    stage = _Stage(smc, tuple(uu), fe, None)
    qn, vn = _rk4(smc, ql, vl, stage, dt)
    qn, vn = _apply_limits(smc, qn, vn, vel_lim, False)

    # Observed state (scalar per component, from the narrow slice).
    xobs = [xcur_ref[i][0] for i in range(NX)]
    err = sum(
        (qn[i] - xobs[i]) ** 2 for i in range(NQ)
    ) + sum((vn[i] - xobs[NQ + i]) ** 2 for i in range(NQ))
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)[0]
    err = jnp.where(lane_id < B, err, jnp.asarray(3.4e38, dtype))
    err_ref[...] = err[None, :]

    # ---- argmin winner (first-index tie-break == jnp.argmin) ----
    m = jnp.min(err)
    best = jnp.min(jnp.where(err == m, lane_id, T))
    onehot = (lane_id == best).astype(dtype)
    best_ref[...] = jnp.broadcast_to(best.astype(dtype), (1, TP))

    # Winner gathers as one-hot reductions (no lane-axis dynamic slice).
    u_best = [jnp.sum(U0_ref[i] * onehot) for i in range(NU)]
    f_est = [jnp.sum(fb_ref[i] * onehot) for i in range(6)]
    u_ref[...] = jnp.stack(
        [jnp.broadcast_to(u_best[i], (TP,)) for i in range(NU)]
    )
    fest_ref[...] = jnp.stack(
        [jnp.broadcast_to(f_est[i], (TP,)) for i in range(6)]
    )

    # ---- ground-truth plant tick on the narrow slice ----
    q = [xcur_ref[i] for i in range(NQ)]
    v = [xcur_ref[NQ + i] for i in range(NQ)]
    u_cl = [
        jnp.broadcast_to(
            jnp.clip(
                u_best[i], -float(effort_lim[i]), float(effort_lim[i])
            ),
            (TP,),
        )
        for i in range(NU)
    ]
    friction = (
        (opts.viscous, opts.coulomb)
        if (opts.viscous or opts.coulomb)
        else None
    )
    h = dt / opts.substeps
    ftr = _rows(ftrue_ref, 6)
    for s in range(opts.substeps):
        us = list(u_cl)
        if opts.noise:
            us = [us[i] + noise_ref[s * NU + i] for i in range(NU)]
        fe_p = LR.world_wrench_to_ee(smp, q, ftr)
        stage = _Stage(smp, tuple(us), fe_p, friction)
        q, v = _rk4(smp, q, v, stage, h)
        q, v = _apply_limits(smp, q, v, vel_lim, opts.velocity_saturation)
    xnext_ref[...] = jnp.stack(q + v)

    # ---- trace FK of the observed state (controller model) ----
    eep = LR.ee_pos(smc, [xcur_ref[i] for i in range(NQ)])
    eep_ref[...] = jnp.stack(list(eep))


class TickEpilogue(NamedTuple):
    err: jnp.ndarray     # (B,) consensus errors
    best: jnp.ndarray    # () int32 winning lane
    x_next: jnp.ndarray  # (12,) plant state after the tick
    u: jnp.ndarray       # (6,) applied control (pre-clamp, = U_best[0])
    eep: jnp.ndarray     # (3,) EE position of the observed state
    f_est: jnp.ndarray   # (6,) winning wrench hypothesis


def tick_epilogue(
    model: RobotModel,
    plant_model: RobotModel,
    plant_cfg: Optional[PlantConfig],
    dt: float,
    x_cur,          # (12,) observed/current plant state
    x_last,         # (12,) previous state (consensus replay start)
    u_last,         # (6,)  previously applied control
    f_batch_T,      # (6, T) lane-major wrench hypotheses (padded)
    U0_T,           # (6, T) lane-major first controls from the solve
    f_true,         # (6,) true plant wrench
    noise=None,     # (substeps, 6) pre-drawn actuation noise or None
    B: Optional[int] = None,
    interpret: bool = False,
) -> TickEpilogue:
    """Everything after the batched solve, in one kernel call.

    ``f_batch_T``/``U0_T`` are lane-major with T a multiple of 8 (the
    fused solve's padded lane count); ``B`` is the true hypothesis count
    (default T).  Cited semantics: consensus gato_controller.py:105-118,
    resample-side winner gather :120-129, plant sim/plant.py plant_step.
    """
    cfg = plant_cfg or PlantConfig()
    T = f_batch_T.shape[-1]
    if T % TP:
        raise ValueError(f"lane count {T} not a multiple of {TP}")
    B = T if B is None else B
    dtype = jnp.float32
    smc = LR.static_model(model)
    smp = LR.static_model(plant_model)
    opts = PlantOpts(
        substeps=cfg.substeps,
        viscous=cfg.viscous_friction,
        coulomb=cfg.coulomb_friction,
        noise=bool(cfg.torque_noise_std) and noise is not None,
        velocity_saturation=cfg.velocity_saturation,
    )
    if noise is None:
        noise = jnp.zeros((cfg.substeps, 6), dtype)

    kernel = functools.partial(
        _tick_kernel, smc, smp, opts,
        np.asarray(model.effort_limit, np.float64),
        np.asarray(model.velocity_limit, np.float64),
        float(dt), int(B),
    )

    def vspec(rows, width):
        return pl.BlockSpec((rows, width), memory_space=pltpu.VMEM)

    xlast_b = jnp.broadcast_to(
        jnp.asarray(x_last, dtype)[:, None], (NX, T)
    )
    ulast_b = jnp.broadcast_to(
        jnp.asarray(u_last, dtype)[:, None], (NU, T)
    )
    xcur_b = jnp.broadcast_to(jnp.asarray(x_cur, dtype)[:, None], (NX, TP))
    ftrue_b = jnp.broadcast_to(jnp.asarray(f_true, dtype)[:, None], (6, TP))
    noise_b = jnp.broadcast_to(
        jnp.asarray(noise, dtype).reshape(-1)[:, None],
        (cfg.substeps * NU, TP),
    )

    out = pl.pallas_call(
        kernel,
        in_specs=[
            vspec(NX, T), vspec(NU, T), vspec(6, T), vspec(NU, T),
            vspec(NX, TP), vspec(6, TP), vspec(cfg.substeps * NU, TP),
        ],
        out_specs=(
            vspec(1, T), vspec(1, TP), vspec(NX, TP), vspec(NU, TP),
            vspec(3, TP), vspec(6, TP),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, T), dtype),
            jax.ShapeDtypeStruct((1, TP), dtype),
            jax.ShapeDtypeStruct((NX, TP), dtype),
            jax.ShapeDtypeStruct((NU, TP), dtype),
            jax.ShapeDtypeStruct((3, TP), dtype),
            jax.ShapeDtypeStruct((6, TP), dtype),
        ),
        interpret=interpret,
    )(xlast_b, ulast_b, f_batch_T, U0_T, xcur_b, ftrue_b, noise_b)
    err, best, xnext, u, eep, fest = out
    return TickEpilogue(
        err=err[0, :B],
        best=best[0, 0].astype(jnp.int32),
        x_next=xnext[:, 0],
        u=u[:, 0],
        eep=eep[:, 0],
        f_est=fest[:, 0],
    )
