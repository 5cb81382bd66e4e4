"""Pose container as a JAX pytree.

Functional replacement for the reference's property-based torch ``Pose``
(``/root/reference/src/mav_mppi/scripts/utils/pose.py:4-113``): position +
unit quaternion with conversion helpers.  Being a NamedTuple it passes through
jit/vmap/scan, and its quaternion is **wxyz scalar-first** (see
``utils/rotations.py`` for the convention note on the reference's xyzw/wxyz
mixup, which we fix rather than reproduce).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import rotations as rot
from .se3 import Transform

Array = jax.Array


class Pose(NamedTuple):
    position: Array   # [..., 3]
    quat: Array       # [..., 4] wxyz

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "Pose":
        return cls(
            position=jnp.zeros(batch_shape + (3,), dtype),
            quat=jnp.broadcast_to(
                jnp.array([1.0, 0.0, 0.0, 0.0], dtype), batch_shape + (4,)
            ),
        )

    @classmethod
    def from_xyzw(cls, position: Array, quat_xyzw: Array) -> "Pose":
        """Build from ROS-order quaternion (geometry_msgs layout)."""
        return cls(position=position, quat=rot.quat_from_xyzw(quat_xyzw))

    @classmethod
    def from_transform(cls, t: Transform) -> "Pose":
        return cls(position=t.trans, quat=rot.matrix_to_quat(t.rot))

    def to_transform(self) -> Transform:
        return Transform(rot=rot.quat_to_matrix(self.quat), trans=self.position)

    @property
    def rotation_matrix(self) -> Array:
        return rot.quat_to_matrix(self.quat)

    def compose(self, other: "Pose") -> "Pose":
        return Pose(
            position=self.position + rot.quat_rotate(self.quat, other.position),
            quat=rot.quat_multiply(self.quat, other.quat),
        )

    def inverse(self) -> "Pose":
        qc = rot.quat_conjugate(self.quat)
        return Pose(position=-rot.quat_rotate(qc, self.position), quat=qc)


def position_error_l1(a: Pose, b: Pose) -> Array:
    """Sum of absolute position differences — the reference's reach metric
    (``utils/pose.py:121`` ``pos_diff``, threshold 0.005 in ``mppi.py:117``)."""
    return jnp.sum(jnp.abs(a.position - b.position), axis=-1)


def orientation_error_vec(a: Pose, b: Pose) -> Array:
    """Rotation error vector log(Ra^T Rb), [..., 3]."""
    return rot.so3_error(a.rotation_matrix, b.rotation_matrix)
