"""Plant-side bridge adapter: drives the in-framework simulator against a
remote solver server over the QMM protocol.

This reproduces the reference's *process architecture* (SURVEY.md sections
3.2-3.4): plant physics in one process (here: this adapter stepping the JAX
octorotor+arm plant at 1 kHz), the MPPI solvers in another (bridge server),
talking the robot_states / robot_cmd / drone_pose topic contract over the
wire.  It is also the template for adapting a *real* plant or the original
Gazebo sim: implement ``read_state``/``apply_cmd`` against your transport
and keep the loop.

Usage:
    server = BridgeServer(...); server.start()
    adapter = SimAdapter(server.host, server.port)
    result = adapter.run(seconds=2.0)
"""

from __future__ import annotations

import socket
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import multirotor as mr
from ..models import rigid_body as rb, kinova
from ..sim import closed_loop as cl
from ..sim import flight_control as fc
from ..utils import rotations as rot
from . import protocol as proto


@dataclass
class SimAdapter:
    host: str
    port: int
    physics_dt: float = 0.001
    control_decimation: int = 10      # solver round trip every N physics ticks
    vehicle: mr.MultirotorParams = field(default_factory=mr.MultirotorParams)
    arm_mass_lump: float = 5.54

    def __post_init__(self):
        self._sock = socket.create_connection((self.host, self.port))
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self._decoder = proto.Decoder()
        self._spec = kinova.chain()
        self._inertials = kinova.inertials()
        # Plant state: full quaternion base + arm at home.
        self.plant = mr.init_state(self.vehicle, pos=(0.0, 0.0, 2.1))
        self.plant = self.plant._replace(
            rotor_speed=jnp.full(
                (self.vehicle.n_rotors,),
                self.vehicle.hover_rotor_speed(self.arm_mass_lump),
            )
        )
        self.q = jnp.asarray(kinova.Q_HOME, jnp.float32)
        self.qdot = jnp.zeros(7)
        self.ctrl = fc.init_ctrl_state(self.vehicle.mass + self.arm_mass_lump)
        self.gains = fc.FlightGains()
        self.setpoint = fc.hover_setpoint(self.plant.pos)
        self.tau_arm = jnp.zeros(7)

    # -- wire helpers --------------------------------------------------------

    def _robot_states(self) -> proto.Frame:
        """Pack the reference's 14+13 state vector (controller.cpp:304-337)."""
        quat_xyzw = rot.quat_to_xyzw(self.plant.quat)
        payload = (
            list(np.asarray(self.plant.pos, np.float32))
            + list(np.asarray(quat_xyzw, np.float32))
            + list(np.asarray(self.q, np.float32))
            + list(np.asarray(self.plant.vel, np.float32))
            + list(np.asarray(self.plant.omega, np.float32))
            + list(np.asarray(self.qdot, np.float32))
        )
        return proto.Frame(proto.MsgType.ROBOT_STATES, [float(x) for x in payload])

    def _exchange(self) -> None:
        self._sock.sendall(proto.encode(self._robot_states()))
        got_cmd = got_pose = False
        while not (got_cmd and got_pose):
            data = self._sock.recv(4096)
            if not data:
                raise ConnectionError("solver server closed")
            self._decoder.feed(data)
            for f in self._decoder.frames():
                if f.type == proto.MsgType.ROBOT_CMD:
                    self.tau_arm = jnp.asarray(f.payload, jnp.float32)
                    got_cmd = True
                elif f.type == proto.MsgType.DRONE_POSE:
                    self.setpoint = fc.hover_setpoint(
                        jnp.asarray(f.payload, jnp.float32)
                    )
                    got_pose = True

    # -- physics -------------------------------------------------------------

    def _tick(self) -> None:
        import jax.numpy as jnp

        from ..models.whole_body import arm_gravity_torque_fast

        base_rot = rot.quat_to_matrix(self.plant.quat)
        qdd = rb.forward_dynamics(
            self._spec, self._inertials, self.q, self.qdot, self.tau_arm,
            base_rot=base_rot,
        )
        self.qdot = self.qdot + qdd * self.physics_dt
        self.q = self.q + self.qdot * self.physics_dt

        # Arm gravity moment: disturbs the base AND is fed forward to the
        # backstepping law — exactly the reference's manipulator handling
        # (controller.cpp harrier_grav_feedback into computeQuadControl).
        tau_g = arm_gravity_torque_fast(
            self._spec, self._inertials, self.q, base_rot
        )
        u, self.ctrl = fc.backstepping_step(
            self.gains, self.vehicle, self.ctrl, self.setpoint,
            pos=self.plant.pos, vel_world=self.plant.vel,
            rpy=cl.rpy_of(self.plant), omega_body=self.plant.omega,
            dt=self.physics_dt, tau_g=tau_g,
        )
        self.plant = mr.step(
            self.vehicle, self.plant, fc.allocate(self.vehicle, u),
            self.physics_dt, extra_mass=self.arm_mass_lump,
            external_wrench_body=(jnp.zeros(3), tau_g),
        )

    def run(self, seconds: float) -> dict:
        n = int(round(seconds / self.physics_dt))
        pos_log = []
        for i in range(n):
            if i % self.control_decimation == 0:
                self._exchange()
            self._tick()
            pos_log.append(np.asarray(self.plant.pos))
        self._sock.sendall(proto.encode(proto.Frame(proto.MsgType.SHUTDOWN, [])))
        self._sock.close()
        pos = np.stack(pos_log)
        return {
            "pos": pos,
            "q": np.asarray(self.q),
            "final_setpoint": np.asarray(self.setpoint.pos),
        }
