"""Free-body graspable object for the pick_weight task.

The reference's ``worlds/pick_weight.world`` places a graspable weight on a
support stand as an independent Gazebo rigid body: before the gripper closes
it can be pushed off, knocked over, or dropped — grasp success depends on the
approach not disturbing it.  Round-1/2 approximated the object as a static
grasp point (rigid attach on gripper close); this module makes it a real
point-mass free body so the approach phase has object contact:

* **support contact** — penalty spring-damper + regularized Coulomb friction
  against the stand's top disc (within ``stand_radius`` of the stand axis)
  and the ground plane, the same contact law as the landing-gear feet
  (``models/multirotor.ground_contact_wrench``);
* **end-effector contact** — sphere-sphere penalty between the gripper palm
  and the object, so flying the EE through the grasp point *pushes the
  object away* instead of teleporting through it (the failure mode the
  reference world actually exhibits); the equal-and-opposite reaction is
  returned for the plant to feel.  The contact radius is gripper-state
  dependent: an OPEN gripper's fingers straddle the object (the reference's
  j2s7s300 three-finger hand opens wider than the 8 cm weight), so the push
  engages only once the object center reaches the palm itself
  (``ee_radius_open``, default 0 — contact onset at ``radius`` < the
  ``grasp_tol`` aperture); a CLOSED (but not attached) gripper presents the
  full fist (``ee_radius``).  This keeps the geometry consistent with the
  grasp criterion — with a single full-fist radius the open-gripper
  approach pushed the object away at 0.10 m while attach demanded 0.05 m,
  which is geometrically unsatisfiable (round-2 regression);
* **grasp attach** — when the gripper commands closed AND the palm is within
  ``grasp_tol`` of the object, the object becomes a rigid follower of the EE
  (the reference's added-mass attach, ``controller.cpp:159-161``; the
  carried-mass dynamics transfer is handled by the whole-body loop's
  ``payload_mass`` path).

Everything is pure-functional and scan/vmap safe: the object state is a tiny
pytree threaded through the episode carry, stepped with semi-implicit Euler
substeps (light object + stiff contact wants a smaller dt than the 100 Hz
control tick).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

GRAVITY = 9.80665


@dataclass(frozen=True)
class GraspableParams:
    mass: float = 0.5                      # pick_weight weight [kg]
    radius: float = 0.04                   # object bounding sphere [m]
    ee_radius: float = 0.06                # closed-gripper fist sphere [m]
    ee_radius_open: float = 0.0            # open gripper: fingers straddle;
    #   palm contact engages at `radius + ee_radius_open` — must stay below
    #   grasp_tol or the approach can never satisfy the attach criterion
    grasp_tol: float = 0.05                # attach reach (aperture) [m]
    # Support stand: top disc the object rests on (world frame).
    stand_center_xy: Tuple[float, float] = (0.0, 0.0)
    stand_top_z: float = 0.0
    stand_radius: float = 0.25
    ground_z: float = 0.0
    # Contact law (matches GroundContactParams semantics).
    stiffness: float = 3000.0              # N/m
    damping: float = 30.0                  # N·s/m
    friction_mu: float = 0.8
    friction_vel_eps: float = 1e-3
    # EE push contact (slightly softer: fingers, not steel).
    ee_stiffness: float = 800.0
    ee_damping: float = 10.0
    n_substeps: int = 10                   # substeps per control tick


class GraspableState(NamedTuple):
    pos: Array       # (3,) world
    vel: Array       # (3,)
    attached: Array  # () bool


def init_graspable(
    params: GraspableParams, pos=None, dtype=jnp.float32
) -> GraspableState:
    """Object at rest on the stand top (default: centered on the stand)."""
    if pos is None:
        cx, cy = params.stand_center_xy
        pos = (cx, cy, params.stand_top_z + params.radius)
    return GraspableState(
        pos=jnp.asarray(pos, dtype),
        vel=jnp.zeros(3, dtype),
        attached=jnp.zeros((), jnp.bool_),
    )


def _support_force(params: GraspableParams, pos: Array, vel: Array) -> Array:
    """Penalty contact against stand-top disc and ground plane (world)."""
    dtype = pos.dtype
    cxy = jnp.asarray(params.stand_center_xy, dtype)
    on_stand = jnp.linalg.norm(pos[:2] - cxy) < params.stand_radius
    support_z = jnp.where(on_stand, params.stand_top_z, params.ground_z)
    pen = jnp.maximum(support_z + params.radius - pos[2], 0.0)
    active = pen > 0.0
    fn = jnp.maximum(params.stiffness * pen - params.damping * vel[2], 0.0) * active
    ft = -params.friction_mu * fn * vel[:2] / (
        jnp.linalg.norm(vel[:2]) + params.friction_vel_eps
    )
    return jnp.concatenate([ft, fn[None]])


def _ee_push_force(
    params: GraspableParams,
    pos: Array,
    vel: Array,
    ee_pos: Array,
    ee_vel: Array,
    ee_radius: Array,
) -> Array:
    """Sphere-sphere penalty force ON THE OBJECT from the gripper palm."""
    d = pos - ee_pos
    dist = jnp.linalg.norm(d)
    n = d / (dist + 1e-9)
    pen = jnp.maximum(params.radius + ee_radius - dist, 0.0)
    rel_vn = jnp.dot(vel - ee_vel, n)
    fn = jnp.maximum(params.ee_stiffness * pen - params.ee_damping * rel_vn, 0.0)
    return fn * n * (pen > 0.0)


def graspable_step(
    params: GraspableParams,
    state: GraspableState,
    ee_pos: Array,
    ee_vel: Array,
    gripper_closed: Array,
    dt: float,
) -> Tuple[GraspableState, Array]:
    """Advance the object one control tick.

    ``ee_pos``/``ee_vel`` are the gripper palm's world position/velocity,
    held constant over the tick's internal substeps (it moves ~mm per 10 ms).
    Returns ``(new_state, reaction_force_world)`` — the mean force the object
    exerts BACK on the end effector over the tick (zero while attached: the
    carried-load coupling is the whole-body loop's ``payload_mass`` path, a
    separate rigid model; double-counting it here would apply the weight
    twice).
    """
    dtype = state.pos.dtype
    sub_dt = dt / params.n_substeps
    g = jnp.asarray([0.0, 0.0, -GRAVITY * params.mass], dtype)
    # Open fingers straddle the object; a closed fist presents ee_radius.
    ee_r = jnp.where(
        jnp.asarray(gripper_closed), params.ee_radius, params.ee_radius_open
    )

    def substep(carry, _):
        pos, vel, f_acc = carry
        f_push = _ee_push_force(params, pos, vel, ee_pos, ee_vel, ee_r)
        f = g + _support_force(params, pos, vel) + f_push
        vel = vel + f / params.mass * sub_dt
        pos = pos + vel * sub_dt
        return (pos, vel, f_acc + f_push), None

    (pos, vel, f_push_sum), _ = jax.lax.scan(
        substep, (state.pos, state.vel, jnp.zeros(3, dtype)), None,
        length=params.n_substeps,
    )

    # Attach: gripper closed with the palm at the object.
    near = jnp.linalg.norm(state.pos - ee_pos) < params.grasp_tol
    attached = state.attached | (jnp.asarray(gripper_closed) & near)

    # While attached the object is a rigid follower of the EE.
    pos = jnp.where(attached, ee_pos, pos)
    vel = jnp.where(attached, ee_vel, vel)
    reaction = jnp.where(attached, 0.0, -f_push_sum / params.n_substeps)

    return GraspableState(pos=pos, vel=vel, attached=attached), reaction
