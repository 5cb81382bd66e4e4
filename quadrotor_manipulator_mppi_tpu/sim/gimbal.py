"""3-axis camera gimbal: world-frame PID stabilization of the depth camera.

In-framework analog of the reference's vendored gimbal plugin
(``/root/reference/src/rotors_simulator/rotors_gazebo_plugins/src/external/
gazebo_gimbal_controller_plugin.cpp``): three revolute joints built
yaw-roll-pitch (variable axes, the CGO3 gimbal layout,
``gazebo_gimbal_controller_plugin.cpp:270-277``), P-only PID per axis with
output clamps (gains ``pitchPid.Init(5, 0, 0, 0, 0, 0.3, -0.3)`` /
``yawPid.Init(1.0, ...)``, ``:31-37``), commands interpreted as WORLD-frame
camera angles (the plugin reads the camera IMU's world orientation and
servos the joints against it, ``:270-296``) so the camera holds its
pointing through base motion.  Default pitch command is straight down
(``pitchCommand = 0.5 pi``, ``:35``).

Differences from the plugin, by design:

* the joint physics (inertia + viscous damping, integrated semi-implicitly)
  replaces Gazebo's joint solver — same P-force-on-joint control law;
* joint-limit handling keeps the plugin's error-clamping scheme
  (``:298-342``) in its simplified intent: the commanded world angles are
  clamped so the implied joint target stays inside the limits, and the
  integrated joint state saturates at the stops;
* everything is a pure ``jnp`` function over a state pytree, steppable
  inside a jitted episode and batchable with ``vmap``.

The gimbal carries :mod:`~.depth_camera`: :func:`camera_rotation` yields the
optical->world rotation that module's ``depth_render`` consumes, and
:func:`point_at` computes the world pitch/yaw command that aims the optical
axis at a world target.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import rotations as rot

Array = jax.Array


@dataclass(frozen=True)
class GimbalParams:
    """Per-axis P gains / force clamps from the reference plugin's PID init
    (``gazebo_gimbal_controller_plugin.cpp:31-34``); joint inertia/damping
    model the small camera-arm links the plugin's forces act on."""

    kp_pitch: float = 5.0
    kp_roll: float = 5.0
    kp_yaw: float = 1.0
    force_limit_rp: float = 0.3    # [N*m] pitch/roll clamp (cmdMax 0.3)
    force_limit_yaw: float = 1.0   # [N*m] yaw clamp (cmdMax 1.0)
    inertia: float = 0.004         # [kg*m^2] per joint
    damping: float = 0.12          # [N*m*s/rad]
    # Joint limits (CGO3-like): pitch can sweep horizon -> straight down and
    # beyond; roll trims; yaw is continuous (no limit).
    pitch_limits: Tuple[float, float] = (-0.5, 2.2)
    roll_limits: Tuple[float, float] = (-0.785, 0.785)


class GimbalState(NamedTuple):
    angles: Array   # (3,) joint angles [pitch, roll, yaw]
    rates: Array    # (3,)


def init_gimbal(dtype=jnp.float32) -> GimbalState:
    return GimbalState(angles=jnp.zeros(3, dtype), rates=jnp.zeros(3, dtype))


def quat_to_zxy(q: Array) -> Array:
    """World orientation -> (pitch, roll, yaw) in the plugin's ZXY-variable
    decomposition (``QtoZXY`` + ``ThreeAxisRot``,
    ``gazebo_gimbal_controller_plugin.cpp:206-229``): R = Rz(yaw) Rx(roll)
    Ry(pitch)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    pitch = jnp.arctan2(-2.0 * (x * z - w * y), w * w - x * x - y * y + z * z)
    roll = jnp.arcsin(jnp.clip(2.0 * (y * z + w * x), -1.0, 1.0))
    yaw = jnp.arctan2(-2.0 * (x * y - w * z), w * w - x * x + y * y - z * z)
    return jnp.stack([pitch, roll, yaw], axis=-1)


def _joint_quat(angles: Array) -> Array:
    """Joint stack orientation (gimbal base -> camera): yaw about z, then
    roll about x, then pitch about y — the plugin's
    yaw-roll-pitch-variable-axis construction (``:272-273``)."""
    dtype = angles.dtype
    half = 0.5 * angles

    def axis_quat(h, axis):
        v = jnp.zeros(3, dtype).at[axis].set(jnp.sin(h))
        return jnp.concatenate([jnp.cos(h)[None], v])

    qz = axis_quat(half[2], 2)
    qx = axis_quat(half[1], 0)
    qy = axis_quat(half[0], 1)
    return rot.quat_multiply(rot.quat_multiply(qz, qx), qy)


def camera_quat(state: GimbalState, base_quat: Array) -> Array:
    """World orientation of the camera head (the plugin's camera-IMU
    reading): base attitude composed with the joint stack."""
    return rot.quat_multiply(base_quat, _joint_quat(state.angles))


# Optical (z forward, x right, y down — depth_camera convention) expressed
# in the camera-head frame (x forward, y left, z up).
_R_HEAD_OPTICAL = np.asarray(
    [[0.0, 0.0, 1.0],
     [-1.0, 0.0, 0.0],
     [0.0, -1.0, 0.0]], np.float32
)


def camera_rotation(state: GimbalState, base_quat: Array) -> Array:
    """Optical -> world rotation for :func:`~.depth_camera.depth_render`."""
    r_head = rot.quat_to_matrix(camera_quat(state, base_quat))
    return r_head @ jnp.asarray(_R_HEAD_OPTICAL, r_head.dtype)


def point_at(cam_pos: Array, target: Array) -> Array:
    """World (pitch, roll, yaw) command aiming the optical axis at
    ``target``; roll is kept level (the plugin's default roll command 0,
    ``:36``).  Pitch 0 = horizon, +pi/2 = straight down (matching the
    plugin's down-pointing default, ``:35``)."""
    d = target - cam_pos
    yaw = jnp.arctan2(d[..., 1], d[..., 0])
    pitch = jnp.arctan2(-d[..., 2], jnp.hypot(d[..., 0], d[..., 1]))
    return jnp.stack([pitch, jnp.zeros_like(yaw), yaw], axis=-1)


def _shortest(a: Array) -> Array:
    """Wrap to (-pi, pi] (``ShortestAngularDistance``, ``:387-406``)."""
    return a - 2.0 * jnp.pi * jnp.round(a / (2.0 * jnp.pi))


def gimbal_step(
    params: GimbalParams,
    state: GimbalState,
    cmd_pry_world: Array,   # (3,) world-frame [pitch, roll, yaw] command
    base_quat: Array,       # (4,) base body->world (wxyz)
    dt: float,
) -> GimbalState:
    """One control tick: world-frame P servo -> joint forces -> joint
    dynamics (the plugin's ``OnUpdate``, ``:232-365``)."""
    dtype = state.angles.dtype
    cur = quat_to_zxy(camera_quat(state, base_quat))       # (pitch, roll, yaw)
    err = _shortest(cmd_pry_world - cur)

    # Error clamping at the joint limits (plugin ``:298-342``): never demand
    # a correction that would push the joint past its stop.
    lo = jnp.asarray(
        [params.pitch_limits[0], params.roll_limits[0], -jnp.inf], dtype
    )
    hi = jnp.asarray(
        [params.pitch_limits[1], params.roll_limits[1], jnp.inf], dtype
    )
    err = jnp.clip(err, lo - state.angles, hi - state.angles)

    kp = jnp.asarray([params.kp_pitch, params.kp_roll, params.kp_yaw], dtype)
    fmax = jnp.asarray(
        [params.force_limit_rp, params.force_limit_rp, params.force_limit_yaw],
        dtype,
    )
    force = jnp.clip(kp * err, -fmax, fmax)

    acc = (force - params.damping * state.rates) / params.inertia
    rates = state.rates + acc * dt
    raw = state.angles + rates * dt
    angles = jnp.clip(raw, lo, hi)
    rates = jnp.where((raw < lo) | (raw > hi), 0.0, rates)
    return GimbalState(angles=angles, rates=rates)
