"""Configuration dataclasses (replacing the reference's scattered constants).

The reference configures via constructor kwargs and commented-out blocks
(gato_controller.py:325-341, osqp_solver.py:7); here everything is explicit,
hashable, and jit-static.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class CostConfig:
    """End-effector tracking cost (reference: osqp_solver.py:7, 103-135).

    Running EE-position weight is 1, terminal weight ``QN``; velocity and
    torque regularization ``dQ``/``R`` are scaled by ``1/(|ee_err| + eps)``
    when ``regularize`` is on (osqp_solver.py:114-115).
    """

    dQ: float = 0.01
    R: float = 1e-5
    QN: float = 100.0
    regularize: bool = True
    eps: float = 1.0
    # Joint-range barrier (the "gn" formulation only): adds
    # Qmod * q_barrier * sum_j relu(|q_j| - (limit_j - margin))^2 to the
    # tracking cost (Qmod = 1 running / QN terminal), with the matching
    # GN gradient/diagonal-Hessian in the QP blocks.  The plant enforces
    # hard joint stops (sim/plant.py apply_joint_limits); without this
    # term the limit-blind controller plans THROUGH a stop and the
    # consensus estimator misreads the clamp as an external wrench
    # (measured: fig-8 runs rode joints 3/4 at their stops for ~1000
    # ticks, 3-5x tracking degradation).  The reference has no analog —
    # its controller simply never meets MuJoCo's limits on the recorded
    # runs.  Set to 0.0 to disable.
    q_barrier: float = 25.0
    q_barrier_margin: float = 0.1
    # QP formulation:
    #   "gn"        — delta-variable Gauss-Newton (H = J^T J): well-
    #                 conditioned, fast SQP convergence (the default).
    #   "reference" — the reference's absolute-variable outer-product
    #                 Hessian (osqp_solver.py:103-135), kept for parity
    #                 tests against the OSQP-style oracle; ignores the
    #                 joint-range barrier.
    formulation: str = "gn"


@dataclasses.dataclass(frozen=True)
class SQPConfig:
    """SQP outer loop (reference: osqp_sqp.py:49-93, GATO solver defaults)."""

    max_iters: int = 2
    merit_mu: float = 10.0
    num_alphas: int = 8  # line search alphas 1, 1/2, ..., 1/128 (osqp_sqp.py:58)
    step_tol: float = 1e-3  # step-norm exit (osqp_sqp.py:90-91)
    rho: float = 1e-6  # Levenberg regularization on Quu (solver "rho" state)
    rho_max: float = 1e2
    rho_factor: float = 4.0  # backoff multiplier when the QP step is rejected
    # QP backend:
    #   "riccati"       — exact O(N) backward/forward sweep (the default);
    #   "riccati_pscan" — same QP, backward pass as an associative scan
    #                     (O(log N) depth; horizon-parallel);
    #   "pcg"           — GATO-style dual Schur-complement PCG with
    #                     block-Jacobi preconditioning (the reference CUDA
    #                     solver's method, gato_controller.py:98-99);
    #   "admm"          — OSQP's operator-splitting ADMM on the same
    #                     structured blocks (the reference CPU path's
    #                     solver, osqp_solver.py:39-41, 137-143),
    #                     factor-once block-tridiagonal Cholesky.
    qp_backend: str = "riccati"
    pcg_tol: float = 1e-7
    pcg_max_iters: int = 60
    # ADMM backend knobs (OSQP defaults: sigma 1e-6, alpha 1.6; rho fixed
    # at the equality-constraint scaling rho*1e3 since refactoring on rho
    # updates would defeat the factor-once structure under jit).
    admm_sigma: float = 1e-6
    admm_rho: float = 1e3
    admm_alpha: float = 1.6
    admm_eps: float = 1e-6
    admm_max_iters: int = 200
    # Q-block regularization: PCG needs PD H, and the dual system's
    # conditioning is ~cond(Q)^2 — 1e-4 keeps CG convergent on the
    # rank-deficient GN position Hessians (the CUDA reference likewise
    # regularizes statically).
    pcg_primal_reg: float = 1e-4


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    """Closed-loop MPC settings (reference: osqp_mpc.py, gato_controller.py)."""

    N: int = 32            # horizon knots
    dt: float = 0.01       # knot spacing (s)
    sim_substeps: int = 1  # plant RK4 substeps per control tick
    goal_switch_dist: float = 0.1   # osqp_mpc.py:34
    divergence_dist: float = 1.1    # osqp_mpc.py:41


@dataclasses.dataclass(frozen=True)
class PlantConfig:
    """Ground-truth plant physics perturbations (model-mismatch validation).

    The reference validates against a *different* engine (MuJoCo, with
    actuator sensor noise — indy7.xml:62-75 ``noise="0.001"`` — and its
    own integrator), so its closed-loop numbers are produced under model
    error.  A plant built from this config deliberately mismatches the
    controller's model the same way:

      * ``param_scale_pct`` — per-link mass/inertia scaled by a seeded
        uniform factor in [1-pct, 1+pct] (inertial parameter error);
      * ``torque_noise_std`` — zero-mean gaussian actuation noise (N m)
        re-drawn every plant substep;
      * ``viscous_friction`` / ``coulomb_friction`` — unmodeled joint
        friction tau_f = -kv v - kc tanh(v / 0.01), applied inside every
        integrator stage;
      * ``substeps`` — finer plant integration than the controller's
        one-RK4-per-tick linearization assumes.

    The same seeded perturbation is implemented bit-identically in the
    native C++ plant (native/plant/rbd.cpp perturb_model, splitmix64) so
    external-plant runs validate under the same mismatch.
    """

    substeps: int = 1
    param_scale_pct: float = 0.0
    torque_noise_std: float = 0.0
    viscous_friction: float = 0.0
    coulomb_friction: float = 0.0
    seed: int = 0
    # Servo-side velocity saturation at the URDF <limit velocity> values.
    # OFF by default to match the reference plant's physics: MuJoCo
    # enforces the MJCF joint range but not velocity limits (its recorded
    # runs exceed them, stats/single joint4 ~25 rad/s).  Joint POSITION
    # limits are always enforced (sim/plant.py apply_joint_limits).
    velocity_saturation: bool = False


#: The standard model-mismatch validation plant: ~±4% inertial parameter
#: error, 0.1 N·m actuation noise, light unmodeled joint friction, and
#: 5x finer integration than the controller's linearization grid.
PERTURBED_PLANT = PlantConfig(
    substeps=5,
    param_scale_pct=0.04,
    torque_noise_std=0.1,
    viscous_friction=0.05,
    coulomb_friction=0.1,
    seed=7,
)


@dataclasses.dataclass(frozen=True)
class SampleConfig:
    """Wrench-hypothesis sampling (reference: gato_controller.py:77-129)."""

    batch_size: int = 16
    f_ext_std: float = 20.0
    f_ext_resample_std: float = 1.0
    decay: float = 0.97  # gato_controller.py:128
