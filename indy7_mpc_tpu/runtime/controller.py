"""Real-time sampled-MPC controller runtime (external-plant mode).

The host-side equivalent of the reference's ROS 2 node
(gato_controller.py:144-351) without the ROS dependency: a 100 Hz loop
over a Transport, per-tick sampled solve (device), watchdog, disturbance
random walk, and reference-schema stats recording.

Tick semantics mirror ``GATO_Controller.joint_callback``
(gato_controller.py:201-256):
  * the reference window advances by elapsed/dt per tick (:214-216);
  * all lanes warm-start from the previous best trajectory with the
    measured state pinned (:217-218, 249);
  * consensus lane selection + hypothesis resampling per tick (:225-226);
  * the true disturbance random-walks every 200 reference steps, clipped
    to +-20 N, and is published to the plant (:236-239);
  * watchdog exit after 10 s without a plant state (:297-303).
"""
from __future__ import annotations

import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CostConfig, MPCConfig, SampleConfig, SQPConfig
from ..models.robot import RobotModel
from ..mpc.sampled import init_wrench_batch, sampled_tick
from .stats import RunRecorder

JOINT_STATE_TIMEOUT = 10.0  # gato_controller.py:16-17


class SampledController:
    """Host-side controller state machine around the jitted device tick."""

    def __init__(
        self,
        model: RobotModel,
        cost_cfg: CostConfig,
        sqp_cfg: SQPConfig,
        mpc_cfg: MPCConfig,
        sample_cfg: SampleConfig,
        ref_traj: np.ndarray,
        seed: int = 42,
        batch_solve_fn: Optional[Callable] = None,
        f_ext_actual=None,
    ):
        self.model = model
        self.mpc_cfg = mpc_cfg
        self.sample_cfg = sample_cfg
        self.ref_traj = jnp.asarray(ref_traj, jnp.float32)
        self.key = jax.random.PRNGKey(seed)
        self.key, k0 = jax.random.split(self.key)

        N, dt = mpc_cfg.N, mpc_cfg.dt
        self.ref_offset = 0.0
        self.f_batch = init_wrench_batch(k0, sample_cfg, jnp.float32)
        self.f_ext_actual = np.zeros(3) if f_ext_actual is None else np.asarray(
            f_ext_actual, float
        )
        self.X_best = jnp.zeros((N, model.nx), jnp.float32)
        self.U_best = jnp.zeros((N - 1, model.nu), jnp.float32)
        self.x_last = None
        self.u_last = jnp.zeros(model.nu, jnp.float32)

        self._tick = jax.jit(
            lambda key, x, x_last, u_last, goals, X, U, f: sampled_tick(
                model, cost_cfg, sqp_cfg, sample_cfg, dt,
                key, x, x_last, u_last, goals, X, U, f,
                batch_solve_fn=batch_solve_fn,
            )
        )

    def goal_window(self) -> jnp.ndarray:
        off = int(self.ref_offset)
        off = min(off, self.ref_traj.shape[0] - self.mpc_cfg.N)
        return jax.lax.dynamic_slice_in_dim(
            self.ref_traj, off, self.mpc_cfg.N, 0
        )

    def on_state(self, x_obs: np.ndarray, elapsed: float):
        """One control tick; returns (u, info dict)."""
        x = jnp.asarray(x_obs, jnp.float32)
        if self.x_last is None:
            self.x_last = x
        self.ref_offset += elapsed / self.mpc_cfg.dt
        goals = self.goal_window()

        self.key, k = jax.random.split(self.key)
        t0 = time.perf_counter()
        out = self._tick(
            k, x, self.x_last, self.u_last, goals,
            self.X_best, self.U_best, self.f_batch,
        )
        u = np.asarray(out.u)
        solve_time_us = (time.perf_counter() - t0) * 1e6

        self.X_best = out.X_best
        self.U_best = out.U_best
        self.f_batch = out.f_batch
        self.x_last = x
        self.u_last = out.u
        info = {
            "best_idx": int(out.best_idx),
            "f_est": np.asarray(out.f_est),
            "solve_time_us": solve_time_us,
            "ee_ref": np.asarray(goals[0]),
        }
        return u, info

    def save_checkpoint(self, path: str) -> str:
        """Persist the controller's full warm-start/estimator state.

        The reference's only "resume" is in-memory warm starting
        (SURVEY.md section 5.4); here the same state — RNG key, reference
        window offset, wrench hypotheses, best trajectory, last
        state/control — round-trips through one .npz so a run can stop
        and resume bit-identically (tests/test_runtime.py).
        """
        np.savez(
            path,
            key=np.asarray(self.key),
            ref_offset=np.asarray(self.ref_offset),
            f_batch=np.asarray(self.f_batch),
            f_ext_actual=self.f_ext_actual,
            X_best=np.asarray(self.X_best),
            U_best=np.asarray(self.U_best),
            x_last=(
                np.asarray(self.x_last)
                if self.x_last is not None
                else np.full(self.model.nx, np.nan)
            ),
            u_last=np.asarray(self.u_last),
        )
        return path

    def load_checkpoint(self, path: str) -> None:
        """Restore state saved by :meth:`save_checkpoint`."""
        z = np.load(path)
        self.key = jnp.asarray(z["key"])
        self.ref_offset = float(z["ref_offset"])
        self.f_batch = jnp.asarray(z["f_batch"])
        self.f_ext_actual = np.asarray(z["f_ext_actual"])
        self.X_best = jnp.asarray(z["X_best"])
        self.U_best = jnp.asarray(z["U_best"])
        x_last = z["x_last"]
        self.x_last = None if np.any(np.isnan(x_last)) else jnp.asarray(x_last)
        self.u_last = jnp.asarray(z["u_last"])

    def maybe_walk_disturbance(self, rng: np.random.Generator):
        """Random-walk the true wrench every 200 ref steps
        (gato_controller.py:236-239); returns it when it changed."""
        if int(self.ref_offset) % 200 == 0:
            noise = rng.normal(0, 1.0, size=3)
            self.f_ext_actual = np.clip(self.f_ext_actual + noise, -20, 20)
            return self.f_ext_actual
        return None


def run_control_loop(
    controller: SampledController,
    transport,
    duration: float,
    rate_hz: float = 100.0,
    recorder: Optional[RunRecorder] = None,
    walk_disturbance: bool = True,
    seed: int = 42,
    realtime: bool = True,
    max_ticks: Optional[int] = None,
):
    """Closed loop against an external (or in-process) plant.

    Stops after ``duration`` seconds of wall clock or ``max_ticks`` control
    ticks, whichever comes first.  Returns the recorder (created if none
    was given).
    """
    recorder = recorder or RunRecorder()
    rng = np.random.default_rng(seed)
    period = 1.0 / rate_hz
    transport.send_wrench(controller.f_ext_actual)

    ticks = 0
    deadline = time.time() + duration
    last_state_time = time.time()
    last_tick = time.time()
    while time.time() < deadline and (max_ticks is None or ticks < max_ticks):
        state = transport.recv_state()
        now = time.time()
        if state is None:
            if now - last_state_time > JOINT_STATE_TIMEOUT:
                raise TimeoutError(
                    f"no plant state for {JOINT_STATE_TIMEOUT}s (watchdog)"
                )
            continue
        last_state_time = now
        elapsed = now - last_tick
        last_tick = now

        u, info = controller.on_state(state.x, elapsed if realtime else period)
        transport.send_command(u)

        if walk_disturbance:
            w = controller.maybe_walk_disturbance(rng)
            if w is not None:
                transport.send_wrench(w)

        tracking_error = float(
            np.linalg.norm(state.ee_pos - info["ee_ref"])
        )
        recorder.record(
            elapsed, tracking_error, state.ee_pos, info["ee_ref"],
            state.x[:6], info["solve_time_us"],
        )
        recorder.maybe_save()
        ticks += 1

        if realtime:
            sleep = period - (time.time() - now)
            if sleep > 0:
                time.sleep(sleep)
    return recorder
