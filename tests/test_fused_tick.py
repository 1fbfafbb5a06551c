"""Fused two-kernel tick (mpc/fused_tick.py) vs the readable XLA tick.

The fused path must be a drop-in for make_loop_tick: same carry/trace
contracts, same RNG streams, same physics.  The XLA tick (fused=False)
is the oracle; both run at pinned f32 matmul precision (sim/plant.py
plant_step note).  TPU-only: the solve kernel needs real hardware
(interpret-mode compiles are ~10 min; see tests/test_pallas_kernel.py).
"""
import os

import numpy as np
import pytest

TPU = os.environ.get("INDY7_TEST_TPU") == "1"
pytestmark = pytest.mark.skipif(
    not TPU, reason="fused tick needs TPU hardware (INDY7_TEST_TPU=1)"
)

INIT_Q = [1.5799, 0.0631, -1.1807, 1.0927, -0.6255, -0.0190]


def _setup(B=16, N=16, plant_cfg=None):
    import jax.numpy as jnp

    from indy7_mpc_tpu.config import (
        CostConfig, MPCConfig, SampleConfig, SQPConfig,
    )
    from indy7_mpc_tpu.models import indy7
    from indy7_mpc_tpu.mpc import reference

    model = indy7(dtype=jnp.float32)
    cost_cfg = CostConfig()
    sqp_cfg = SQPConfig(max_iters=2)
    mpc_cfg = MPCConfig(N=N, dt=0.01)
    sample_cfg = SampleConfig(
        batch_size=B, f_ext_std=20.0, f_ext_resample_std=1.0
    )
    ref = reference.figure8(
        A_x=0.5, A_z=0.55, offset=[0.0, 0.4, 0.45], period=10, dt=0.01,
        cycles=2,
    )
    ref = jnp.asarray(
        np.asarray(reference.with_padding(ref, 200), np.float32)
    )
    return model, cost_cfg, sqp_cfg, mpc_cfg, sample_cfg, ref


def _run(fused, ticks, B=16, N=16, plant_cfg=None, seed=42):
    import jax
    import jax.numpy as jnp

    from indy7_mpc_tpu.mpc.sampled import (
        init_loop_carry, make_loop_tick,
    )

    model, cost_cfg, sqp_cfg, mpc_cfg, sample_cfg, ref = _setup(
        B=B, N=N, plant_cfg=plant_cfg
    )
    tick = make_loop_tick(
        model, cost_cfg, sqp_cfg, mpc_cfg, sample_cfg, ref,
        f_true_walk=True, plant_cfg=plant_cfg, fused=fused,
    )
    x0 = jnp.zeros(12, jnp.float32).at[:6].set(
        jnp.asarray(INIT_Q, jnp.float32)
    )
    carry = init_loop_carry(
        model, mpc_cfg, sample_cfg, x0,
        jnp.asarray([-60.0, 20.0, -40.0, 0, 0, 0], jnp.float32),
        jax.random.PRNGKey(seed),
    )
    run = jax.jit(
        lambda c: jax.lax.scan(tick, c, None, length=ticks)
    )
    carry, trace = run(carry)
    jax.block_until_ready(carry)
    return carry, trace


def test_fused_matches_xla_tick_nominal():
    """Single-seed nominal closed loop: fused and XLA ticks must track
    each other (identical RNG streams; physics differs only by kernel
    f32 vs XLA-highest f32 roundoff, which compounds through the loop)."""
    ticks = 10
    c_f, t_f = _run(fused=True, ticks=ticks)
    c_x, t_x = _run(fused=False, ticks=ticks)

    # Winning lanes agree tick-for-tick (argmin over well-separated
    # hypothesis errors) and the applied controls stay close.
    assert np.array_equal(
        np.asarray(t_f.best_idx), np.asarray(t_x.best_idx)
    )
    np.testing.assert_allclose(
        np.asarray(t_f.u), np.asarray(t_x.u), atol=2e-2, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(t_f.tracking_error), np.asarray(t_x.tracking_error),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(c_f.x), np.asarray(c_x.x), atol=5e-3
    )
    # Resampled hypotheses share the stream exactly (winner index equal,
    # same keys) up to the f32 winner-wrench gather.
    np.testing.assert_allclose(
        np.asarray(c_f.f_batch), np.asarray(c_x.f_batch), atol=1e-4
    )


def test_fused_matches_xla_tick_perturbed():
    """Perturbed plant (5x substeps, friction, actuation noise on an
    identical pre-drawn stream, seeded inertial error)."""
    from indy7_mpc_tpu.config import PERTURBED_PLANT

    ticks = 6
    c_f, t_f = _run(fused=True, ticks=ticks, plant_cfg=PERTURBED_PLANT)
    c_x, t_x = _run(fused=False, ticks=ticks, plant_cfg=PERTURBED_PLANT)
    assert np.array_equal(
        np.asarray(t_f.best_idx), np.asarray(t_x.best_idx)
    )
    np.testing.assert_allclose(
        np.asarray(t_f.tracking_error), np.asarray(t_x.tracking_error),
        atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(c_f.x), np.asarray(c_x.x), atol=5e-3
    )


def test_fused_long_run_finite_and_tracking():
    """200 fused ticks at the production horizon stay finite and track
    the figure-8 (smoke-level bound, full goldens in stats_tpu/)."""
    _, t = _run(fused=True, ticks=200, B=16, N=64)
    te = np.asarray(t.tracking_error)
    assert np.all(np.isfinite(te))
    assert te[-50:].mean() < 0.2


def test_epilogue_kernel_matches_xla_pieces():
    """One epilogue-kernel call vs the individual XLA pieces it fuses
    (consensus errors, winner, plant step, FK)."""
    import jax
    import jax.numpy as jnp

    from indy7_mpc_tpu.config import PERTURBED_PLANT, SampleConfig
    from indy7_mpc_tpu.dynamics.kinematics import ee_pos
    from indy7_mpc_tpu.models import indy7
    from indy7_mpc_tpu.mpc.sampled import find_best_lane, init_wrench_batch
    from indy7_mpc_tpu.ops.pallas import tick_kernel
    from indy7_mpc_tpu.sim.plant import make_plant_step

    model = indy7(dtype=jnp.float32)
    B, dt = 16, 0.01
    cfg = PERTURBED_PLANT
    pm, step_fn = make_plant_step(model, cfg)
    x_cur = jnp.asarray(
        np.r_[INIT_Q, 0.1 * np.ones(6)], jnp.float32
    )
    x_last = x_cur + 0.01 * jax.random.normal(
        jax.random.PRNGKey(0), (12,), jnp.float32
    )
    u_last = 5.0 * jax.random.normal(
        jax.random.PRNGKey(1), (6,), jnp.float32
    )
    f_batch = init_wrench_batch(
        jax.random.PRNGKey(2), SampleConfig(batch_size=B, f_ext_std=20.0)
    )
    U0 = 3.0 * jax.random.normal(jax.random.PRNGKey(3), (B, 6), jnp.float32)
    f_true = jnp.asarray([-60.0, 20.0, -40.0, 0, 0, 0], jnp.float32)

    best_ref, err_ref = find_best_lane(
        model, x_last, u_last, x_cur, dt, f_batch
    )
    k_plant = jax.random.PRNGKey(7)
    x_next_ref = step_fn(x_cur, U0[best_ref], f_true, k_plant, dt)

    draws, k = [], k_plant
    for _ in range(cfg.substeps):
        k, ks = jax.random.split(k)
        draws.append(
            cfg.torque_noise_std
            * jax.random.normal(ks, (6,), jnp.float32)
        )
    noise = jnp.stack(draws)

    ep = tick_kernel.tick_epilogue(
        model, pm, cfg, dt, x_cur, x_last, u_last,
        f_batch.T, U0.T, f_true, noise=noise, B=B,
    )
    assert int(ep.best) == int(best_ref)
    np.testing.assert_allclose(
        np.asarray(ep.err), np.asarray(err_ref) ** 2, rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ep.x_next), np.asarray(x_next_ref), atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(ep.u), np.asarray(U0[best_ref]))
    np.testing.assert_allclose(
        np.asarray(ep.f_est), np.asarray(f_batch[best_ref])
    )
    with jax.default_matmul_precision("highest"):
        eep_ref = ee_pos(model, x_cur[:6])
    np.testing.assert_allclose(
        np.asarray(ep.eep), np.asarray(eep_ref), atol=1e-5
    )


def test_sampled_tick_kernel_consensus_matches_readable():
    """The host-mode sampled_tick's in-kernel consensus (auto path on
    TPU) must pick the same winner and controls as the readable
    predict-and-argmin path (forced by injecting the default solver as
    an explicit batch_solve_fn)."""
    import jax
    import jax.numpy as jnp

    from indy7_mpc_tpu.config import CostConfig, SampleConfig, SQPConfig
    from indy7_mpc_tpu.models import indy7
    from indy7_mpc_tpu.mpc.sampled import init_wrench_batch, sampled_tick
    from indy7_mpc_tpu.solvers.select import default_batch_solve_fn

    model = indy7(dtype=jnp.float32)
    B, N, dt = 16, 16, 0.01
    cost_cfg = CostConfig()
    sqp_cfg = SQPConfig(max_iters=2)
    sample_cfg = SampleConfig(batch_size=B, f_ext_std=20.0)
    key = jax.random.PRNGKey(5)
    x = jnp.zeros(12, jnp.float32).at[:6].set(
        jnp.asarray(INIT_Q, jnp.float32)
    )
    x_last = x + 0.005 * jax.random.normal(key, (12,), jnp.float32)
    u_last = 4.0 * jax.random.normal(jax.random.PRNGKey(6), (6,),
                                     jnp.float32)
    goals = jnp.tile(jnp.asarray([0.35, 0.35, 0.6], jnp.float32), (N, 1))
    X = jnp.zeros((N, 12), jnp.float32)
    U = jnp.zeros((N - 1, 6), jnp.float32)
    f_batch = init_wrench_batch(jax.random.PRNGKey(7), sample_cfg)

    args = (model, cost_cfg, sqp_cfg, sample_cfg, dt, key, x, x_last,
            u_last, goals, X, U, f_batch)
    out_auto = sampled_tick(*args)  # TPU: kernel consensus
    out_ref = sampled_tick(         # readable consensus, same solver
        *args,
        batch_solve_fn=default_batch_solve_fn(model, cost_cfg, sqp_cfg, dt),
    )
    assert int(out_auto.best_idx) == int(out_ref.best_idx)
    np.testing.assert_allclose(
        np.asarray(out_auto.u), np.asarray(out_ref.u), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_auto.f_batch), np.asarray(out_ref.f_batch),
        atol=1e-6,
    )
