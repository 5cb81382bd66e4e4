"""Solver bridge server: hosts the TPU MPPI solvers behind the QMM protocol.

The runtime replacement for the reference's two Python ROS nodes
(``kinova.py`` and ``drone.py``, SURVEY.md sections 3.3-3.4): a plant (the
in-framework simulator, a Gazebo adapter, or a real vehicle) connects over
TCP, streams ``ROBOT_STATES`` frames, and receives ``ROBOT_CMD`` (7 arm
efforts) and ``DRONE_POSE`` (xyz setpoint) frames back — the exact topic
contract of ``controller.cpp:165-180``.

Solver state (warm starts, PRNG keys, the torque-tracking gains of
``kinova.py:184``) stays device-resident between requests; only the 27-float
state crosses the boundary in and 10 floats come back out (BASELINE.md's
latency budget note).  Teleop frames from the native tools
(``native/src/teleop_*.cpp``) adjust the targets.
"""

from __future__ import annotations

import socket
import threading
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models import chain as chain_mod
from ..models import kinova, rigid_body as rb
from ..solver import arm as arm_solver
from ..solver import drone as drone_solver
from ..utils.pose import Pose
from . import protocol as proto
from .action import ActionManager, ActionStatus

TELEOP_STEP_M = 0.3          # uav_teleop_node nudge (+-0.3 m)
TELEOP_STEP_JOINT = np.deg2rad(10.0)  # robot_teleop_node nudge


@dataclass
class SolverSession:
    """Per-connection solver state: arm MPPI + drone MPPI + teleop targets."""

    arm_params: arm_solver.ArmMPPIParams = field(default_factory=arm_solver.ArmMPPIParams)
    drone_params: drone_solver.DroneMPPIParams = field(default_factory=drone_solver.DroneMPPIParams)
    seed: int = 0

    def __post_init__(self):
        self._arm_step, arm_init = arm_solver.make_arm_solver(self.arm_params)
        self._drone_step, drone_init = drone_solver.make_drone_solver(self.drone_params)
        self._arm_step = jax.jit(self._arm_step)
        self._drone_step = jax.jit(self._drone_step)
        key = jax.random.key(self.seed)
        ka, kd = jax.random.split(key)
        self._arm_state = arm_init(ka)
        self._drone_state = drone_init(kd)
        self._spec = kinova.chain()
        self._inertials = kinova.inertials()
        self.ee_target = arm_solver.default_target()
        self.drone_target = np.asarray(drone_solver.DEFAULT_TARGET, np.float32)
        self.arm_nudge = np.zeros(7, np.float32)
        self.land = False
        self.gripper_cmd = 0.0
        self.actions = ActionManager()
        # Latest joystick flight command ([roll, pitch, yaw_rate, thrust],
        # rotors_joy_interface contract) for plant adapters flying in
        # attitude mode; None until a RPYT frame arrives.
        self.rpyt = None

    def telemetry(self) -> proto.Frame:
        """Live session view for dashboards (MsgType.TELEMETRY layout)."""
        states = getattr(self, "latest_states", [0.0] * 27)
        payload = (
            list(states)
            + [float(x) for x in self.drone_target]
            + [float(x) for x in np.asarray(self.ee_target.position)]
            + [1.0 if self.land else 0.0, float(self.gripper_cmd)]
        )
        return proto.Frame(proto.MsgType.TELEMETRY, payload)

    def handle_states(self, payload) -> list:
        """ROBOT_STATES -> [ROBOT_CMD frame, DRONE_POSE frame]."""
        self.latest_states = list(payload)
        base_pos, base_quat_xyzw, q, base_v, qd = proto.split_robot_states(payload)
        if self.land:
            # Land command (teleop code 9): descend toward the current xy at
            # a fixed rate, mirroring the reference's landing behavior
            # (controller.cpp Land: descend, cut motors near ground).
            self.drone_target[0:2] = np.asarray(base_pos[:2], np.float32)
            self.drone_target[2] = max(0.0, float(base_pos[2]) - 0.4)
        q = jnp.asarray(q, jnp.float32)
        qd_j = jnp.asarray(qd, jnp.float32)
        base_pose = Pose.from_xyzw(
            jnp.asarray(base_pos, jnp.float32), jnp.asarray(base_quat_xyzw, jnp.float32)
        )

        # Arm MPPI solve + the reference's inertia-weighted tracking torque
        # (kinova.py:184): tau = M (400 (qdes - q) - 40 qd) + nle.
        obs = arm_solver.ArmObs(
            q=q, qdot=qd_j, base_pose=base_pose, target=self.ee_target
        )
        out, self._arm_state = self._arm_step(self._arm_state, obs)
        m = rb.mass_matrix(self._spec, self._inertials, q)
        nle = rb.nonlinear_effects(
            self._spec, self._inertials, q, qd_j, base_rot=base_pose.rotation_matrix
        )
        tau = m @ (400.0 * (out.qdes - q) - 40.0 * qd_j) + nle
        tau_np = np.asarray(tau, np.float32)

        # Drone MPPI setpoint (drone.py:239-241 contract: position only).
        dobs = drone_solver.DroneObs(
            x=jnp.asarray(base_pos, jnp.float32),
            v=jnp.asarray(base_v[:3], jnp.float32),
            target=jnp.asarray(self.drone_target),
        )
        dout, self._drone_state = self._drone_step(self._drone_state, dobs)
        xdes = np.asarray(dout.xdes, np.float32)

        replies = [
            proto.Frame(proto.MsgType.ROBOT_CMD, [float(t) for t in tau_np]),
            proto.Frame(proto.MsgType.DRONE_POSE, [float(x) for x in xdes]),
        ]
        goal = self.actions.active
        if goal is not None and goal.status == ActionStatus.ACTIVE:
            ee_pos, _ = chain_mod.forward_kinematics_posquat(
                self._spec, q, base_pos=base_pose.position, base_quat=base_pose.quat
            )
            ee_err_l1 = float(jnp.sum(jnp.abs(ee_pos - self.ee_target.position)))
            replies.extend(
                self.actions.on_tick(ee_err_l1, np.asarray(base_pos, np.float32))
            )
        return replies

    def handle_teleop_uav(self, code: int) -> None:
        """Reference gear_callback code table (controller.cpp:741-809)."""
        step = TELEOP_STEP_M
        if code == 1:
            self.drone_target[0] += step
        elif code == 2:
            self.drone_target[0] -= step
        elif code == 3:
            self.drone_target[1] += step
        elif code == 4:
            self.drone_target[1] -= step
        elif code == 5:
            self.drone_target[2] += step
        elif code == 6:
            self.drone_target[2] -= step
        elif code == 9:
            self.land = True

    def handle_teleop_arm(self, code: int) -> None:
        """Reference kinova_callback codes: odd/even pairs nudge joint
        +-10 deg (applied plant-side in the reference, controller.cpp:813+;
        here accumulated for plant adapters to consume, like the land flag).
        Codes 15/16 = gripper close/open command (plant adapters drive the
        aperture via sim/scenario.MissionState.gripper_cmd)."""
        if 1 <= code <= 14:
            joint = (code + 1) // 2 - 1
            sign = 1.0 if code % 2 == 1 else -1.0
            self.arm_nudge[joint] += sign * TELEOP_STEP_JOINT
        elif code == 15:
            self.gripper_cmd = 1.0
        elif code == 16:
            self.gripper_cmd = 0.0


@dataclass
class WholeBodySession:
    """Whole-body MPPI behind the same wire contract as SolverSession.

    One coupled solver replaces the reference's two independent nodes: the
    arm efforts go out as ROBOT_CMD (the ``kinova.py:184`` tracking law
    around the solver's qdes + the tube-feedback servo correction) and the
    base position carrot as DRONE_POSE — so any plant adapter that speaks
    the reference topics (the in-framework sim, the Gazebo-side
    ``ros_adapter``) gets whole-body control with zero changes on its side.
    Position-cascade mode only (its base command IS a position setpoint,
    which is exactly the DRONE_POSE contract).
    """

    params: "object" = None
    seed: int = 0
    setpoint_lookahead: int = 10

    def __post_init__(self):
        from ..solver import serving, whole_body as wbs

        self._serving = serving
        if self.params is None:
            self.params = wbs.position_mode_params(n_samples=512, n_horizon=50)
        # The fused bridge head (solver/serving.make_bridge_step): solve +
        # tracking law + carrot prediction in ONE jitted dispatch with ONE
        # host readback per tick (previously two fetches — through a remote
        # device tunnel each readback pays a fixed latency quantum,
        # benchmarks/probe_tunnel.py).
        self._bstep, binit = serving.make_bridge_step(
            self.params, setpoint_lookahead=self.setpoint_lookahead
        )
        self._carry = binit(jax.random.key(self.seed))
        self.ee_target = arm_solver.default_target()
        self.drone_target = np.asarray([0.0, 0.0, 2.1], np.float32)
        self.arm_nudge = np.zeros(7, np.float32)
        self.land = False
        self.gripper_cmd = 0.0
        self.actions = ActionManager()
        self.rpyt = None

    telemetry = SolverSession.telemetry
    handle_teleop_uav = SolverSession.handle_teleop_uav
    handle_teleop_arm = SolverSession.handle_teleop_arm

    def handle_states(self, payload) -> list:
        self.latest_states = list(payload)
        base_pos, base_quat_xyzw, q, base_v, qd = proto.split_robot_states(payload)
        if self.land:
            self.drone_target[0:2] = np.asarray(base_pos[:2], np.float32)
            self.drone_target[2] = max(0.0, float(base_pos[2]) - 0.4)

        # Wire (reference xyzw quaternion, controller.cpp:312-315) -> the
        # packed obs contract (solver/serving layout, wxyz).
        quat_wxyz = np.asarray(base_quat_xyzw, np.float32)[[3, 0, 1, 2]]
        obs_vec = np.concatenate([
            np.asarray(base_pos, np.float32), quat_wxyz,
            np.asarray(q, np.float32),
            np.asarray(base_v[:3], np.float32),   # world vel (adapter contract)
            np.asarray(base_v[3:6], np.float32),  # body rates
            np.asarray(qd, np.float32),
        ])
        target_vec = np.concatenate([
            np.asarray(self.ee_target.position, np.float32),
            np.asarray(self.ee_target.quat, np.float32),
            np.asarray(self.drone_target, np.float32),
        ])
        reply, self._carry = self._bstep(self._carry, obs_vec, target_vec)
        reply = np.asarray(reply, np.float32)
        return [
            proto.Frame(proto.MsgType.ROBOT_CMD, [float(t) for t in reply[:7]]),
            proto.Frame(proto.MsgType.DRONE_POSE, [float(x) for x in reply[7:10]]),
        ]


class BridgeServer:
    """Threaded TCP server around ONE shared SolverSession.

    The session is shared across connections (created lazily on first use,
    all handler calls serialized by a lock): the plant streams states on one
    connection while teleop tools and dashboards steer/observe the SAME
    controller state from theirs — the reference's one-controller /
    many-UI-nodes topic topology (``controller.cpp:165-180``).  One plant
    per server; run several servers for several plants.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 session_factory: Optional[Callable[[], SolverSession]] = None):
        self._sock = socket.create_server((host, port))
        self.host, self.port = self._sock.getsockname()
        self._factory = session_factory or SolverSession
        self._threads = []
        self._stop = threading.Event()
        self._session: Optional[SolverSession] = None
        # RLock: dispatch branches hold it while lazily building the
        # session (sess() -> session() re-acquires).
        self._session_lock = threading.RLock()
        # Latest camera frame (IMAGE payload) — held on the SERVER, not the
        # session, so camera publishers/viewers never trigger the lazy
        # (expensive, jit-compiling) solver-session build.
        self._latest_image: list = []
        self._image_lock = threading.Lock()

    def session(self) -> SolverSession:
        with self._session_lock:
            if self._session is None:
                self._session = self._factory()
            return self._session

    def serve_forever(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            t = threading.Thread(target=self._handle, args=(conn,), daemon=True)
            t.start()
            self._threads.append(t)

    def start(self) -> threading.Thread:
        t = threading.Thread(target=self.serve_forever, daemon=True)
        t.start()
        return t

    def stop(self) -> None:
        self._stop.set()
        try:
            self._sock.close()
        except OSError:
            pass

    def _handle(self, conn: socket.socket) -> None:
        # Deferred: camera publishers/viewers (IMAGE/IMAGE_REQ/PING only)
        # must not pay the solver-session jit build.
        session = None

        def sess():
            nonlocal session
            if session is None:
                session = self.session()
            return session

        decoder = proto.Decoder()
        conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        with conn:
            while True:
                data = conn.recv(4096)
                if not data:
                    return
                decoder.feed(data)
                for frame in decoder.frames():
                    if frame.type == proto.MsgType.SHUTDOWN:
                        return
                    elif frame.type == proto.MsgType.ROBOT_STATES:
                        with self._session_lock:
                            replies = sess().handle_states(frame.payload)
                        for reply in replies:
                            conn.sendall(proto.encode(reply))
                    elif frame.type == proto.MsgType.TELEOP_UAV:
                        with self._session_lock:
                            sess().handle_teleop_uav(int(frame.payload[0]))
                    elif frame.type == proto.MsgType.TELEOP_ARM:
                        with self._session_lock:
                            sess().handle_teleop_arm(int(frame.payload[0]))
                    elif frame.type == proto.MsgType.ACTION_GOAL:
                        with self._session_lock:
                            s_ = sess()
                            replies = s_.actions.handle_goal(
                                frame.payload, s_
                            )
                        for reply in replies:
                            conn.sendall(proto.encode(reply))
                    elif frame.type == proto.MsgType.ACTION_CANCEL:
                        with self._session_lock:
                            s_ = sess()
                            replies = s_.actions.handle_cancel(
                                frame.payload, s_
                            )
                        for reply in replies:
                            conn.sendall(proto.encode(reply))
                    elif frame.type == proto.MsgType.RPYT:
                        sess().rpyt = np.asarray(frame.payload[:4], np.float32)
                    elif frame.type == proto.MsgType.MONITOR:
                        with self._session_lock:
                            tele = sess().telemetry()
                        conn.sendall(proto.encode(tele))
                    elif frame.type == proto.MsgType.IMAGE:
                        # Camera stream (gst-plugin analog): keep the latest
                        # frame for dashboard polls.
                        with self._image_lock:
                            self._latest_image = frame.payload
                    elif frame.type == proto.MsgType.IMAGE_REQ:
                        with self._image_lock:
                            img = self._latest_image
                        conn.sendall(proto.encode(
                            proto.Frame(proto.MsgType.IMAGE, img)
                        ))
                    elif frame.type == proto.MsgType.PING:
                        conn.sendall(proto.encode(proto.Frame(proto.MsgType.PING, [])))
