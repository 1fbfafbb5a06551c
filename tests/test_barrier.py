"""Joint-range barrier cost (config.CostConfig.q_barrier).

The plant enforces hard joint stops (sim/plant.py apply_joint_limits);
the barrier keeps the limit-blind GN controller from planning THROUGH a
stop (measured failure: fig-8 runs rode joints 3/4 at their stops for
~1000 ticks with 3-5x tracking degradation — see config.py docstring).
"""
import jax
import jax.numpy as jnp
import numpy as np

from indy7_mpc_tpu.config import CostConfig, SQPConfig
from indy7_mpc_tpu.ops import kkt


def test_barrier_terms_zero_inside_band(model64):
    cfg = CostConfig()
    q = jnp.asarray([0.0, 1.0, -2.0, 2.5, -2.9, 3.0])  # inside hi-0.1
    val, grad, hess = kkt.barrier_terms(model64, cfg, q)
    assert float(val) == 0.0
    np.testing.assert_array_equal(np.asarray(grad), 0.0)
    np.testing.assert_array_equal(np.asarray(hess), 0.0)


def test_barrier_terms_outside_band(model64):
    cfg = CostConfig(q_barrier=25.0, q_barrier_margin=0.1)
    hi = np.asarray(model64.q_upper)
    q = jnp.zeros(6, jnp.float64).at[2].set(hi[2])  # 0.1 past the band
    val, grad, hess = kkt.barrier_terms(model64, cfg, q)
    d = 0.1
    np.testing.assert_allclose(float(val), 25.0 * d * d, rtol=1e-9)
    np.testing.assert_allclose(float(grad[2]), 2 * 25.0 * d, rtol=1e-9)
    assert float(hess[2]) == 2 * 25.0
    assert float(grad[0]) == 0.0 and float(hess[0]) == 0.0
    # Gradient is the derivative of the value (autodiff check).
    g_ad = jax.grad(lambda qq: kkt.barrier_terms(model64, cfg, qq)[0])(q)
    np.testing.assert_allclose(np.asarray(g_ad), np.asarray(grad), atol=1e-12)


def test_barrier_blocks_match_autodiff(model64):
    """cost_blocks_gn's barrier gradient must be the exact gradient of
    eepos_cost's barrier term around any trajectory point."""
    cfg = CostConfig(q_barrier=25.0, q_barrier_margin=0.1)
    cfg0 = CostConfig(q_barrier=0.0)
    N = 4
    rng = np.random.default_rng(5)
    X = jnp.asarray(rng.normal(size=(N, 12)) * 0.4)
    X = X.at[1, 3].set(float(model64.q_upper[3]) + 0.05)  # past the stop
    U = jnp.asarray(rng.normal(size=(N - 1, 6)))
    goals = jnp.asarray(rng.normal(size=(N, 3)) * 0.2 + 0.4)

    def total_cost(Xv, cfg_):
        qc, vc, uc = kkt.eepos_cost(model64, cfg_, Xv, U, goals)
        return qc + vc + uc

    gb, qb, _, _ = kkt.cost_blocks_gn(model64, cfg, X, U, goals)
    g0, q0, _, _ = kkt.cost_blocks_gn(model64, cfg0, X, U, goals)
    # Gradient difference (barrier part) == autodiff of the cost diff.
    grad_diff = np.asarray(qb - q0)
    ad = jax.grad(
        lambda Xv: total_cost(Xv, cfg) - total_cost(Xv, cfg0)
    )(X)
    np.testing.assert_allclose(
        grad_diff, np.asarray(ad)[:, :12], atol=1e-10
    )
    # Hessian difference is the expected diagonal on (knot 1, joint 3).
    H_diff = np.asarray(gb - g0)
    expect = np.zeros_like(H_diff)
    expect[1, 3, 3] = 2 * 25.0
    np.testing.assert_allclose(H_diff, expect, atol=1e-12)


def test_solver_respects_barrier(model64):
    """A goal reachable only by swinging joint 0 far: with the barrier the
    solved trajectory stays inside the position limits; without it the
    warm-started solve runs past them."""
    from indy7_mpc_tpu.dynamics import ee_pos
    from indy7_mpc_tpu.solvers import sqp as sqp_mod

    m = model64
    N, dt = 6, 0.01
    hi = float(np.asarray(m.q_upper)[0])
    # Warm start already deep past the limit: the barrier must pull the
    # plan back inside; the unbarriered solver has no reason to.
    q_bad = jnp.zeros(6, jnp.float64).at[0].set(hi + 0.4)
    X = jnp.tile(jnp.concatenate([q_bad, jnp.zeros(6)]), (N, 1))
    xs = X[0]
    U = jnp.zeros((N - 1, 6), jnp.float64)
    goals = jnp.tile(ee_pos(m, q_bad[:6]), (N, 1))

    sqp_cfg = SQPConfig(max_iters=3)
    # jit both solves: eager per-op dispatch of the f64 solver costs
    # ~2 min on this box; compiled (and persistently cached) it is
    # seconds (quick-lane budget, VERDICT r4 #6).
    solve_b = jax.jit(lambda xs, goals, X, U: sqp_mod.solve(
        m, CostConfig(q_barrier=200.0), sqp_cfg, dt, xs, goals, X, U
    ))
    solve_0 = jax.jit(lambda xs, goals, X, U: sqp_mod.solve(
        m, CostConfig(q_barrier=0.0), sqp_cfg, dt, xs, goals, X, U
    ))
    res_b = solve_b(xs, goals, X, U)
    res_0 = solve_0(xs, goals, X, U)
    q0_b = np.asarray(res_b.X)[1:, 0]   # x0 is pinned; later knots move
    q0_0 = np.asarray(res_0.X)[1:, 0]
    # Barrier drives the tail of the plan back toward the range; the
    # unbarriered plan stays out (goal sits at the out-of-range pose).
    assert q0_b[-1] < q0_0[-1] - 0.05, (q0_b[-1], q0_0[-1])
    assert q0_b[-1] < hi + 0.05, q0_b[-1]
