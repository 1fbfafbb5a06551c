"""Fused Pallas SQP kernel vs the dense-KKT oracle (TPU-only).

The kernel can only compile for real TPU hardware (Mosaic); on the CPU
test mesh these tests skip.  Run them on the bench chip with:
    JAX_PLATFORMS=axon python -m pytest tests/test_pallas_kernel.py
They assert the fused kernel matches ops/riccati + ops/kkt (which are
themselves dense-KKT-oracle-verified in f64) to f32 tolerance.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon")
    and "TPU" not in jax.devices()[0].device_kind.upper(),
    reason="fused SQP kernel requires TPU hardware",
)


def _problem(rng, B, N, x_scale=0.05, u_scale=0.5, wrench=True):
    xs_b = jnp.asarray(rng.normal(size=(B, 12)) * x_scale, jnp.float32)
    goals_b = jnp.asarray(rng.normal(size=(B, N, 3)) * 0.3, jnp.float32)
    X_b = jnp.asarray(rng.normal(size=(B, N, 12)) * x_scale, jnp.float32)
    U_b = jnp.asarray(rng.normal(size=(B, N - 1, 6)) * u_scale, jnp.float32)
    w_b = None
    if wrench:
        w_b = jnp.asarray(rng.normal(size=(B, 6)) * 8, jnp.float32)
        w_b = w_b.at[:, 3:].set(0.0)
    return xs_b, goals_b, X_b, U_b, w_b


def _replay_oracle(m, cost, scfg, dt, xs, goals, X0, U0, w, alphas, rho0):
    """CPU replay of the kernel's masked SQP iteration, driven by the
    kernel's own accepted-alpha log.

    Mirrors ops/pallas/sqp_kernel.py's update/rho/done semantics exactly:
    take = ~done & alpha>0 -> X += alpha dZ; rejected = ~done & alpha==0
    -> rho *= rho_factor (clipped); done |= take & alpha||dZ|| < tol.
    The oracle MUST run on the host CPU: TPU-computed f32 linalg drifts
    2-10% from the true KKT solution and would swamp the kernel's error.
    """
    from indy7_mpc_tpu.ops import kkt, riccati

    cpu = jax.devices("cpu")[0]
    X = np.array(X0)
    X[0] = np.asarray(xs)
    U = np.array(U0)
    rho = float(rho0)
    done = False
    for it in range(scfg.max_iters):
        alpha = float(alphas[it])
        if done:
            continue
        with jax.default_device(cpu):
            blocks = kkt.build_qp_gn(
                m, cost, jnp.asarray(X), jnp.asarray(U), goals, dt,
                wrench_world=w,
            )
            sol = riccati.solve(blocks, jnp.zeros(12), rho)
        dX, dU = np.asarray(sol.X), np.asarray(sol.U)
        if alpha > 0.0:
            X = X + alpha * dX
            U = U + alpha * dU
            step = alpha * np.sqrt((dX**2).sum() + (dU**2).sum())
            if step < scfg.step_tol:
                done = True
        else:
            rho = float(
                np.clip(rho * scfg.rho_factor, scfg.rho, scfg.rho_max)
            )
    return X, U, rho


def _assert_lane_matches(res, lane, X_exp, U_exp, atol):
    u_scale = max(1.0, np.abs(U_exp).max())
    x_scale = max(1.0, np.abs(X_exp).max())
    np.testing.assert_allclose(
        np.asarray(res.U[lane]) / u_scale, U_exp / u_scale, atol=atol
    )
    np.testing.assert_allclose(
        np.asarray(res.X[lane]) / x_scale, X_exp / x_scale, atol=atol
    )


def test_kernel_matches_oracle():
    """Original single-iteration cold-start config (N=8)."""
    from indy7_mpc_tpu.config import CostConfig, SQPConfig
    from indy7_mpc_tpu.models import indy7
    from indy7_mpc_tpu.ops import kkt, riccati
    from indy7_mpc_tpu.solvers import sqp_pallas

    m = indy7(dtype=jnp.float32)
    cost = CostConfig()
    scfg = SQPConfig(max_iters=1)
    N, dt, B = 8, 0.01, 128
    rng = np.random.default_rng(5)
    xs_b, goals_b, X_b, U_b, w_b = _problem(rng, B, N)

    res = jax.jit(
        lambda *a: sqp_pallas.batch_solve(
            m, cost, scfg, dt, a[0], a[1], a[2], a[3],
            wrench_world_batch=a[4],
        )
    )(xs_b, goals_b, X_b, U_b, w_b)

    cpu = jax.devices("cpu")[0]
    for lane in range(0, B, 17):
        Xw = X_b[lane].at[0].set(xs_b[lane])
        with jax.default_device(cpu):
            blocks = kkt.build_qp_gn(
                m, cost, Xw, U_b[lane], goals_b[lane], dt,
                wrench_world=w_b[lane],
            )
            sol = riccati.solve(blocks, jnp.zeros(12), scfg.rho)
        alpha = float(res.stats.alphas[lane, 0])
        X_exp = np.asarray(Xw + alpha * sol.X)
        U_exp = np.asarray(U_b[lane] + alpha * sol.U)
        _assert_lane_matches(res, lane, X_exp, U_exp, 2e-3)


@pytest.mark.parametrize("N,wrench", [(32, True), (64, True), (64, False)])
def test_kernel_production_config_multi_iter(N, wrench):
    """The configs the framework ships with (VERDICT r2 ask #2):
    max_iters=2 at N=32 (bench north-star) and N=64 (record_runs /
    bench headline), wrench-on and wrench-free, replayed against the
    CPU oracle per the kernel's accepted alpha sequence."""
    from indy7_mpc_tpu.config import CostConfig, SQPConfig
    from indy7_mpc_tpu.models import indy7
    from indy7_mpc_tpu.solvers import sqp_pallas

    m = indy7(dtype=jnp.float32)
    cost = CostConfig()
    scfg = SQPConfig(max_iters=2)
    dt, B = 0.01, 128
    rng = np.random.default_rng(11)
    xs_b, goals_b, X_b, U_b, w_b = _problem(rng, B, N, wrench=wrench)

    res = jax.jit(
        lambda *a: sqp_pallas.batch_solve(
            m, cost, scfg, dt, a[0], a[1], a[2], a[3],
            wrench_world_batch=a[4],
        )
    )(xs_b, goals_b, X_b, U_b, w_b)

    assert np.all(np.isfinite(np.asarray(res.X)))
    for lane in range(0, B, 31):
        X_exp, U_exp, rho_exp = _replay_oracle(
            m, cost, scfg, dt, xs_b[lane], goals_b[lane],
            X_b[lane], U_b[lane],
            None if w_b is None else w_b[lane],
            np.asarray(res.stats.alphas[lane]), scfg.rho,
        )
        _assert_lane_matches(res, lane, X_exp, U_exp, 6e-3)
        np.testing.assert_allclose(
            float(res.state.rho[lane]), rho_exp, rtol=1e-5
        )


def test_kernel_rejection_escalates_rho():
    """Lanes engineered to reject QP steps (absurd warm starts far from
    the linearization's validity region): every rejected iteration must
    escalate the lane's Levenberg rho by rho_factor (clipped), and the
    trajectory must stay at the warm start for rejected iterations —
    the kernel's done/rejected masking (sqp_kernel.py stage 4)."""
    from indy7_mpc_tpu.config import CostConfig, SQPConfig
    from indy7_mpc_tpu.models import indy7
    from indy7_mpc_tpu.solvers import sqp_pallas

    m = indy7(dtype=jnp.float32)
    # Barrier off: the engineered warm starts sit ~150 rad outside the
    # joint range, where the barrier dominates the merit (~1e8) and f32
    # alpha ties flip against the f64 oracle.  This test exercises the
    # rejection/rho machinery, which is barrier-independent.
    cost = CostConfig(q_barrier=0.0)
    scfg = SQPConfig(max_iters=2)
    N, dt, B = 32, 0.01, 128
    rng = np.random.default_rng(3)
    # Per-lane severity ramp: warm starts grow from mild to absurd
    # (torques up to ~200x the actuator limits, velocities to ~100 rad/s),
    # so one batch covers accept / reject-then-accept / always-reject.
    # For the extreme lanes the QP delta is so large that even the 1/128
    # candidate lands far outside the linearization's validity and the
    # merit increases at every alpha — a genuine full rejection.
    xs_b, goals_b, X_b, U_b, w_b = _problem(
        rng, B, N, x_scale=1.0, u_scale=100.0
    )
    ramp = jnp.linspace(1.0, 160.0, B)
    X_b = X_b * ramp[:, None, None]
    U_b = U_b * ramp[:, None, None]
    xs_b = xs_b * ramp[:, None]

    res = jax.jit(
        lambda *a: sqp_pallas.batch_solve(
            m, cost, scfg, dt, a[0], a[1], a[2], a[3],
            wrench_world_batch=a[4],
        )
    )(xs_b, goals_b, X_b, U_b, w_b)

    alphas = np.asarray(res.stats.alphas)
    rejected_lanes = np.nonzero((alphas == 0.0).any(axis=1))[0]
    # The engineered problem must actually exercise the rejection path.
    assert rejected_lanes.size > 0, "no lane rejected — test ineffective"

    for lane in rejected_lanes[::7]:
        X_exp, U_exp, rho_exp = _replay_oracle(
            m, cost, scfg, dt, xs_b[lane], goals_b[lane],
            X_b[lane], U_b[lane], w_b[lane],
            alphas[lane], scfg.rho,
        )
        np.testing.assert_allclose(
            float(res.state.rho[lane]), rho_exp, rtol=1e-5
        )
        _assert_lane_matches(res, int(lane), X_exp, U_exp, 6e-3)


def test_kernel_warm_started_second_solve():
    """Warm-started chained solve (the closed loop's steady state): feed
    the first solve's trajectory and rho state back in and oracle-check
    the second solve too."""
    from indy7_mpc_tpu.config import CostConfig, SQPConfig
    from indy7_mpc_tpu.models import indy7
    from indy7_mpc_tpu.solvers import sqp_pallas

    m = indy7(dtype=jnp.float32)
    cost = CostConfig()
    scfg = SQPConfig(max_iters=2)
    N, dt, B = 64, 0.01, 128
    rng = np.random.default_rng(17)
    xs_b, goals_b, X_b, U_b, w_b = _problem(rng, B, N)

    solve = jax.jit(
        lambda xs, g, X, U, w, st: sqp_pallas.batch_solve(
            m, cost, scfg, dt, xs, g, X, U,
            wrench_world_batch=w, state=st,
        )
    )
    res1 = solve(xs_b, goals_b, X_b, U_b, w_b, None)
    res2 = solve(xs_b, goals_b, res1.X, res1.U, w_b, res1.state)

    for lane in range(0, B, 41):
        X_exp, U_exp, rho_exp = _replay_oracle(
            m, cost, scfg, dt, xs_b[lane], goals_b[lane],
            np.asarray(res1.X[lane]), np.asarray(res1.U[lane]),
            w_b[lane],
            np.asarray(res2.stats.alphas[lane]),
            float(res1.state.rho[lane]),
        )
        _assert_lane_matches(res2, lane, X_exp, U_exp, 6e-3)
        np.testing.assert_allclose(
            float(res2.state.rho[lane]), rho_exp, rtol=1e-5
        )


def test_kernel_sharded_matches_unsharded():
    """The production kernel under the lane mesh (shard_map) must equal
    the plain kernel call — on real hardware this runs the actual Mosaic
    kernel per mesh device (VERDICT r2 ask #1)."""
    from indy7_mpc_tpu.config import CostConfig, SQPConfig
    from indy7_mpc_tpu.models import indy7
    from indy7_mpc_tpu.parallel import (
        make_lane_mesh, make_sharded_batch_solve, shard_lanes,
    )
    from indy7_mpc_tpu.solvers import sqp_pallas

    m = indy7(dtype=jnp.float32)
    cost = CostConfig()
    scfg = SQPConfig(max_iters=2)
    N, dt, B = 32, 0.01, 128
    rng = np.random.default_rng(23)
    xs_b, goals_b, X_b, U_b, w_b = _problem(rng, B, N)

    plain = jax.jit(
        lambda *a: sqp_pallas.batch_solve(
            m, cost, scfg, dt, a[0], a[1], a[2], a[3],
            wrench_world_batch=a[4],
        )
    )(xs_b, goals_b, X_b, U_b, w_b)

    mesh = make_lane_mesh()
    solve = make_sharded_batch_solve(
        m, cost, scfg, dt, mesh, backend="pallas"
    )
    args = shard_lanes(mesh, (xs_b, goals_b, X_b, U_b, w_b))
    sharded = solve(*args)

    np.testing.assert_allclose(
        np.asarray(sharded.X), np.asarray(plain.X), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sharded.U), np.asarray(plain.U), atol=1e-5
    )
    assert len(sharded.X.sharding.device_set) == len(mesh.devices.flat)
