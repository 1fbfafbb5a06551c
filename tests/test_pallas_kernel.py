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


def test_kernel_matches_oracle():
    from indy7_mpc_tpu.config import CostConfig, SQPConfig
    from indy7_mpc_tpu.models import indy7
    from indy7_mpc_tpu.ops import kkt, riccati
    from indy7_mpc_tpu.solvers import sqp_pallas

    m = indy7(dtype=jnp.float32)
    cost = CostConfig()
    scfg = SQPConfig(max_iters=1)
    N, dt, B = 8, 0.01, 128
    rng = np.random.default_rng(5)
    xs_b = jnp.asarray(rng.normal(size=(B, 12)) * 0.05, jnp.float32)
    goals_b = jnp.asarray(rng.normal(size=(B, N, 3)) * 0.3, jnp.float32)
    X_b = jnp.asarray(rng.normal(size=(B, N, 12)) * 0.05, jnp.float32)
    U_b = jnp.asarray(rng.normal(size=(B, N - 1, 6)) * 0.5, jnp.float32)
    w_b = jnp.asarray(rng.normal(size=(B, 6)) * 8, jnp.float32)
    w_b = w_b.at[:, 3:].set(0.0)

    res = jax.jit(
        lambda *a: sqp_pallas.batch_solve(
            m, cost, scfg, dt, a[0], a[1], a[2], a[3],
            wrench_world_batch=a[4],
        )
    )(xs_b, goals_b, X_b, U_b, w_b)

    # Oracle: per-lane blocks + Riccati; candidate step with the kernel's
    # own accepted alpha must reproduce the kernel trajectory.  The oracle
    # MUST run on the host CPU: computed on the TPU itself, its f32
    # default-precision matmuls and linalg solves drift 2-10% from the
    # true solution (measured), which would swamp the kernel's error.
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
        scale = max(1.0, np.abs(U_exp).max())
        np.testing.assert_allclose(
            np.asarray(res.U[lane]) / scale, U_exp / scale, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(res.X[lane]), X_exp, atol=2e-3
        )
