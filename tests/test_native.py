"""Native C++ plant vs JAX dynamics parity (skips if not built).

Build with ``make -C native/plant`` (tools/gen_model_header.py keeps the
C++ model in lockstep with the embedded Python parameters).
"""
import numpy as np
import pytest

from indy7_mpc_tpu.sim import native


@pytest.fixture(autouse=True)
def _built(native_build):
    """Build-on-demand: the parity tests always run (conftest fixture)."""


@pytest.fixture(scope="module")
def jx():
    import jax.numpy as jnp

    from indy7_mpc_tpu.models import indy7

    return indy7(dtype=jnp.float64)


def test_native_matches_jax(jx, rng):
    import jax.numpy as jnp

    from indy7_mpc_tpu.dynamics import (
        ee_pos,
        forward_dynamics,
        rnea,
        world_wrench_to_ee_joint,
    )
    from indy7_mpc_tpu.sim.plant import plant_step

    for _ in range(5):
        q = rng.normal(size=6) * 0.8
        v = rng.normal(size=6)
        tau = rng.normal(size=6) * 10
        x = np.concatenate([q, v])
        w = np.concatenate([rng.normal(size=3) * 15, np.zeros(3)])

        np.testing.assert_allclose(
            native.ee_position(q), np.asarray(ee_pos(jx, jnp.asarray(q))),
            atol=1e-11,
        )
        np.testing.assert_allclose(
            native.rnea(q, v, tau),
            np.asarray(rnea(jx, jnp.asarray(q), jnp.asarray(v),
                            jnp.asarray(tau))),
            atol=1e-10,
        )
        fl = world_wrench_to_ee_joint(jx, jnp.asarray(q), jnp.asarray(w))
        np.testing.assert_allclose(
            native.forward_dynamics(x, tau, w),
            np.asarray(
                forward_dynamics(jx, jnp.asarray(q), jnp.asarray(v),
                                 jnp.asarray(tau), f_ext_ee=fl)
            ),
            atol=1e-9,
        )
        np.testing.assert_allclose(
            native.rk4_step(x, tau, 0.01, w),
            np.asarray(
                plant_step(jx, jnp.asarray(x), jnp.asarray(tau), 0.01,
                           wrench_world=jnp.asarray(w))
            ),
            atol=1e-10,
        )
