"""Controller <-> plant transports (the DDS replacement).

The reference wires its controller and MuJoCo simulator over three ROS 2
DDS topics with queue depth 1 — latest-wins, lossy
(gato_controller.py:163-167, sim_node.cpp:225-237).  Here the same
contract is a small Transport interface with two implementations:

  * :class:`UdpTransport` — datagram pub/sub on localhost, pairing with
    the native C++ plant process (native/plant); latest-wins by design.
    Wire format: little-endian float64 arrays with a 1-byte tag,
    mirroring the three topics (state up; command / wrench down).
  * :class:`InProcessPlant` — the device-resident JAX plant behind the
    same interface, for tests and single-process deployments.

The reference's EE-position side channel (smuggled through
JointState.effort[0:3], sim_node.cpp:343-345) becomes an explicit field.
"""
from __future__ import annotations

import socket
import struct
import time
from typing import NamedTuple, Optional

import numpy as np

TAG_STATE = 1      # plant -> controller: q (6), v (6), ee_pos (3)
TAG_COMMAND = 2    # controller -> plant: torque (6)
TAG_WRENCH = 3     # controller -> plant: world wrench force (3)
TAG_RESET = 4      # controller -> plant: reset to the initial pose and
                   # hold for a fresh command (the reference sim's 'R'
                   # key, sim_node.cpp:44-46, 107-130, 288-291)


class PlantState(NamedTuple):
    x: np.ndarray        # (12,) [q, v]
    ee_pos: np.ndarray   # (3,) world EE position from the plant
    stamp: float         # host wall-clock receive time
    # Plant's own simulation time (s), when the plant reports it (native
    # plant_node protocol v2, 16th double).  Lets the controller advance
    # its reference by PLANT time — exact under plant_node
    # --realtime-scale and immune to transport jitter.  None for plants
    # that do not report it (plant time == wall time assumed).
    sim_time: Optional[float] = None


class UdpTransport:
    """Latest-wins datagram link to an external plant process."""

    def __init__(
        self,
        plant_addr=("127.0.0.1", 7461),
        listen_addr=("127.0.0.1", 7460),
        recv_timeout: float = 0.1,
    ):
        self.plant_addr = plant_addr
        self.recv_timeout = recv_timeout
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind(listen_addr)
        self.sock.settimeout(recv_timeout)

    @staticmethod
    def _sim_time_of(pkt) -> Optional[float]:
        if len(pkt) >= 1 + 16 * 8:
            return float(
                np.frombuffer(pkt[1 + 15 * 8:1 + 16 * 8], dtype="<f8")[0]
            )
        return None

    def recv_state(self) -> Optional[PlantState]:
        data = None
        best_t = None
        # Drain the queue, keeping the NEWEST state by the plant's own
        # sim-time stamp (protocol v2, 16th double) — the stamp is a
        # monotone sequence number, so datagrams reordered inside the
        # drain window cannot shadow a newer state with an older one.
        # Stampless (v1) packets fall back to arrival order, but never
        # displace a stamped packet: once best_t is set, only a newer
        # stamp wins (otherwise one stray v1 datagram would reset the
        # reorder guard and let an older stamped packet through).
        while True:
            try:
                pkt, _ = self.sock.recvfrom(512)
                if len(pkt) >= 1 + 15 * 8 and pkt[0] == TAG_STATE:
                    t = self._sim_time_of(pkt)
                    if data is None or (
                        t is None and best_t is None
                    ) or (t is not None and (best_t is None or t >= best_t)):
                        data = pkt
                        if t is not None:
                            best_t = t
                self.sock.settimeout(0.0)
            except (socket.timeout, BlockingIOError):
                break
        self.sock.settimeout(self.recv_timeout)
        if data is None:
            return None
        vals = np.frombuffer(data[1:1 + 15 * 8], dtype="<f8")
        return PlantState(
            x=vals[:12].copy(), ee_pos=vals[12:15].copy(),
            stamp=time.time(), sim_time=self._sim_time_of(data),
        )

    def send_command(self, u) -> None:
        u = np.asarray(u, "<f8")
        self.sock.sendto(
            bytes([TAG_COMMAND]) + u.tobytes(), self.plant_addr
        )

    def send_wrench(self, force3) -> None:
        f = np.asarray(force3, "<f8")
        self.sock.sendto(bytes([TAG_WRENCH]) + f.tobytes(), self.plant_addr)

    def send_reset(self) -> None:
        """Reset the plant to its initial pose (plant_node kTagReset)."""
        self.sock.sendto(bytes([TAG_RESET]), self.plant_addr)

    def close(self) -> None:
        self.sock.close()


class InProcessPlant:
    """Device-resident plant behind the Transport interface.

    ``plant_cfg`` (config.PlantConfig) builds a deliberately mismatched
    ground-truth plant — seeded inertial error, joint friction, actuation
    noise, finer substeps — so closed-loop validation does not run against
    the controller's own model (the role MuJoCo plays for the reference,
    sim_node.cpp:184-201).
    """

    def __init__(self, model, x0, dt: float, substeps: int = 1,
                 plant_cfg=None, noise_seed: int = 123,
                 mirror_port: Optional[int] = None):
        import jax
        import jax.numpy as jnp

        from ..dynamics.kinematics import ee_pos
        from ..sim.plant import make_plant_step, plant_step

        self.model = model
        self.dt = dt
        self._x0 = jnp.asarray(x0, jnp.float32)
        self.x = self._x0
        self.wrench = jnp.zeros(6, jnp.float32)
        # Live-telemetry tap (tools/live_view.py): duplicate each state
        # onto a local mirror port in the plant_node wire format, so the
        # in-process flagship mode has the same live view as the native
        # plant's --mirror (the reference's GLFW role).
        self._mirror = None
        self._sim_time = 0.0
        if mirror_port:
            self._mirror = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            self._mirror_addr = ("127.0.0.1", int(mirror_port))
        if plant_cfg is None:
            raw_step = lambda x, u, w, k: plant_step(
                model, x, u, dt, wrench_world=w, substeps=substeps
            )
        else:
            _, _pstep = make_plant_step(model, plant_cfg)
            raw_step = lambda x, u, w, k: _pstep(x, u, w, k, dt)

        def _step_fn(x, u, w, key):
            key, k = jax.random.split(key)
            return raw_step(x, u, w, k), key

        self._step = jax.jit(_step_fn)
        self._key = jax.random.PRNGKey(noise_seed)
        # EE is reported from the NOMINAL kinematics (geometry is exact;
        # only inertials are perturbed).
        self._ee = jax.jit(lambda x: ee_pos(model, x[: model.nq]))
        self._pending_u = None
        # Warm-up compiles (discarded) so no jit compile fires mid-loop:
        # the step itself AND the wrench-update scatter (send_wrench's
        # .at[:3].set compiles on first use — observed as a ~100 ms
        # stall at the first disturbance-walk tick, tools/latency_decomp).
        jax.block_until_ready(
            self._step(self.x, jnp.zeros(model.nu, jnp.float32),
                       self.wrench, self._key)
        )
        jax.block_until_ready(
            self.wrench.at[:3].set(jnp.zeros(3, jnp.float32))
        )

    def recv_state(self) -> PlantState:
        # Returns the raw device state with ee_pos=None: the controller
        # computes EE/tracking on device inside its tick, so the loop
        # never pays a plant-side sync (external transports report their
        # own ee_pos; see run_control_loop).
        return PlantState(x=self.x, ee_pos=None, stamp=time.time())

    def send_command(self, u) -> None:
        import jax.numpy as jnp

        self.x, self._key = self._step(
            self.x, jnp.asarray(u, jnp.float32), self.wrench, self._key
        )
        self._sim_time += self.dt
        if self._mirror is not None:
            self.mirror_state(self.x, self._sim_time)

    def send_wrench(self, force3) -> None:
        import jax.numpy as jnp

        self.wrench = self.wrench.at[:3].set(jnp.asarray(force3, jnp.float32))

    def send_reset(self) -> None:
        """Back to the initial pose, zero velocity (plant_node kTagReset
        / sim_node.cpp 'R' semantics); sim time stays monotone."""
        self.x = self._x0

    def mirror_state(self, x, sim_time: float) -> None:
        """Emit one plant_node-format state packet on the mirror port
        (no-op without ``mirror_port``)."""
        if self._mirror is None:
            return
        x = np.asarray(x, "<f8")
        ee = np.asarray(self._ee(x.astype(np.float32)), "<f8")
        # Wire format (protocol v2): tag, 12 state doubles, 3 EE doubles,
        # sim-time double — identical to plant_node's state packet.
        pkt = (
            bytes([TAG_STATE]) + x.tobytes() + ee.tobytes()
            + np.asarray([sim_time], "<f8").tobytes()
        )
        self._mirror.sendto(pkt, self._mirror_addr)

    def close(self) -> None:
        if self._mirror is not None:
            self._mirror.close()
