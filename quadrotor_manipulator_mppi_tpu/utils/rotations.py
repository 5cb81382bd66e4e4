"""Batched 3D rotation representations and conversions in pure JAX.

Functional parity surface with the reference's vendored PyTorch3D transforms
module (``/root/reference/src/mav_mppi/scripts/utils/rotation_conversions.py:45-651``),
re-implemented from the textbook definitions for TPU:

* every function maps over arbitrary leading batch dims (``[...]``),
* no data-dependent control flow — branch selection is done with ``jnp.where``
  so everything traces into a single XLA program,
* no matrix inverses — inverse rotations are transposes,
* quaternions are **wxyz (scalar-first)** and documented as such.  The
  reference stores ROS xyzw quaternions but feeds them into scalar-first
  converters unchanged (``utils/pose.py:30-32`` vs ``rotation_conversions.py:45``),
  a latent convention bug we intentionally do not replicate; use
  :func:`quat_from_xyzw` / :func:`quat_to_xyzw` at ROS boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-12


# ---------------------------------------------------------------------------
# Quaternion helpers (wxyz, scalar-first)
# ---------------------------------------------------------------------------

def quat_from_xyzw(q_xyzw: Array) -> Array:
    """ROS-order (x, y, z, w) -> scalar-first (w, x, y, z)."""
    return jnp.concatenate([q_xyzw[..., 3:4], q_xyzw[..., :3]], axis=-1)


def quat_to_xyzw(q_wxyz: Array) -> Array:
    """Scalar-first (w, x, y, z) -> ROS-order (x, y, z, w)."""
    return jnp.concatenate([q_wxyz[..., 1:4], q_wxyz[..., 0:1]], axis=-1)


def quat_normalize(q: Array) -> Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(_EPS)


def quat_conjugate(q: Array) -> Array:
    """Conjugate == inverse for unit quaternions."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(a: Array, b: Array) -> Array:
    """Hamilton product a*b, both wxyz, batched."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: Array, v: Array) -> Array:
    """Rotate vectors v ([..., 3]) by unit quaternions q ([..., 4] wxyz).

    Uses the expanded Rodrigues form: v' = v + 2*w*(u x v) + 2*(u x (u x v)).
    """
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    uuv = jnp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_to_matrix(q: Array) -> Array:
    """Unit quaternion (wxyz) -> rotation matrix [..., 3, 3]."""
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz),       2.0 * (xz + wy),
            2.0 * (xy + wz),       1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy),       2.0 * (yz + wx),       1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: Array) -> Array:
    """Rotation matrix [..., 3, 3] -> unit quaternion wxyz, branchless.

    Computes all four Shepperd candidates and selects the best-conditioned one
    with ``where`` (no data-dependent branching, safe under vmap/jit).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four candidate squared magnitudes (4*q_i^2), each >= 0.
    t_w = 1.0 + m00 + m11 + m22
    t_x = 1.0 + m00 - m11 - m22
    t_y = 1.0 - m00 + m11 - m22
    t_z = 1.0 - m00 - m11 + m22

    def safe_sqrt(t):
        return jnp.sqrt(jnp.maximum(t, _EPS))

    sw, sx, sy, sz = safe_sqrt(t_w), safe_sqrt(t_x), safe_sqrt(t_y), safe_sqrt(t_z)

    q_w = jnp.stack([sw * sw, m21 - m12, m02 - m20, m10 - m01], axis=-1) / (2.0 * sw)[..., None]
    q_x = jnp.stack([m21 - m12, sx * sx, m01 + m10, m02 + m20], axis=-1) / (2.0 * sx)[..., None]
    q_y = jnp.stack([m02 - m20, m01 + m10, sy * sy, m12 + m21], axis=-1) / (2.0 * sy)[..., None]
    q_z = jnp.stack([m10 - m01, m02 + m20, m12 + m21, sz * sz], axis=-1) / (2.0 * sz)[..., None]

    ts = jnp.stack([t_w, t_x, t_y, t_z], axis=-1)
    best = jnp.argmax(ts, axis=-1)
    cand = jnp.stack([q_w, q_x, q_y, q_z], axis=-2)  # [..., 4 candidates, 4]
    q = jnp.take_along_axis(cand, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    # Canonicalize to w >= 0 and unit norm.
    q = jnp.where(q[..., 0:1] < 0, -q, q)
    return quat_normalize(q)


def quat_from_axis_angle(axis_angle: Array) -> Array:
    """Rotation vector [..., 3] (axis * angle) -> quaternion wxyz."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sinc-style small-angle-safe scale: sin(a/2)/a
    scale = jnp.where(angle > 1e-6, jnp.sin(half) / jnp.maximum(angle, _EPS), 0.5 - angle * angle / 48.0)
    return jnp.concatenate([jnp.cos(half), axis_angle * scale], axis=-1)


def quat_to_axis_angle(q: Array) -> Array:
    """Quaternion wxyz -> rotation vector [..., 3]."""
    q = jnp.where(q[..., 0:1] < 0, -q, q)  # shortest arc
    w = jnp.clip(q[..., 0:1], -1.0, 1.0)
    v = q[..., 1:4]
    norm_v = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm_v, w)
    scale = jnp.where(norm_v > 1e-6, angle / jnp.maximum(norm_v, _EPS), 2.0 / jnp.maximum(w, _EPS))
    return v * scale


def axis_angle_to_matrix(axis_angle: Array) -> Array:
    return quat_to_matrix(quat_from_axis_angle(axis_angle))


def matrix_to_axis_angle(m: Array) -> Array:
    return quat_to_axis_angle(matrix_to_quat(m))


# ---------------------------------------------------------------------------
# Single-axis rotations and Euler angles
# ---------------------------------------------------------------------------

def _rot_x(a: Array) -> Array:
    c, s = jnp.cos(a), jnp.sin(a)
    o, i = jnp.zeros_like(a), jnp.ones_like(a)
    m = jnp.stack([i, o, o, o, c, -s, o, s, c], axis=-1)
    return m.reshape(a.shape + (3, 3))


def _rot_y(a: Array) -> Array:
    c, s = jnp.cos(a), jnp.sin(a)
    o, i = jnp.zeros_like(a), jnp.ones_like(a)
    m = jnp.stack([c, o, s, o, i, o, -s, o, c], axis=-1)
    return m.reshape(a.shape + (3, 3))


def _rot_z(a: Array) -> Array:
    c, s = jnp.cos(a), jnp.sin(a)
    o, i = jnp.zeros_like(a), jnp.ones_like(a)
    m = jnp.stack([c, -s, o, s, c, o, o, o, i], axis=-1)
    return m.reshape(a.shape + (3, 3))


_AXIS_ROT = {"X": _rot_x, "Y": _rot_y, "Z": _rot_z}


def euler_to_matrix(angles: Array, convention: str = "ZYX") -> Array:
    """Euler/Tait-Bryan angles [..., 3] -> rotation matrix.

    ``convention="ZYX"`` composes ``Rz(a0) @ Ry(a1) @ Rx(a2)`` — same intrinsic
    composition order as the reference's converter used throughout its pose
    costs (``rotation_conversions.py:205`` semantics).
    """
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"bad euler convention: {convention}")
    r0 = _AXIS_ROT[convention[0]](angles[..., 0])
    r1 = _AXIS_ROT[convention[1]](angles[..., 1])
    r2 = _AXIS_ROT[convention[2]](angles[..., 2])
    return r0 @ r1 @ r2


# Index/sign table for Tait-Bryan (all-distinct-axes) extraction.
_AXIS_IDX = {"X": 0, "Y": 1, "Z": 2}


def matrix_to_euler(m: Array, convention: str = "ZYX") -> Array:
    """Rotation matrix -> Tait-Bryan angles for all-distinct-axes conventions.

    Standard closed-form extraction: for R = R_i(a0) R_j(a1) R_k(a2), the
    central angle comes from ``R[i, k] = ±sin(a1)`` and the outer angles from
    ``atan2`` of adjacent elements.  Gimbal-lock inputs resolve the usual way
    (a2 forced toward 0), matching common library behavior.
    """
    if len(convention) != 3 or len(set(convention)) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"only proper Tait-Bryan conventions supported, got {convention}")
    i0, i1, i2 = (_AXIS_IDX[c] for c in convention)
    # Parity: even permutations (XYZ, YZX, ZXY) have sign +? The element
    # m[i0, i2] equals -s for even (e.g. XYZ: m02=+s? check) — derive via the
    # standard result: for convention abc, m[a, c] = sign * sin(a1) where
    # sign = +1 if (a, c) is a cyclic (even) pair, else -1... verified in tests
    # against scipy for all six conventions.
    even = (i1 - i0) % 3 == 1  # cyclic order i0 -> i1 -> i2
    sign = 1.0 if even else -1.0
    # central angle
    sin_a1 = sign * m[..., i0, i2]
    a1 = jnp.arcsin(jnp.clip(sin_a1, -1.0, 1.0))
    # outer angles
    a0 = jnp.arctan2(-sign * m[..., i1, i2], m[..., i2, i2])
    a2 = jnp.arctan2(-sign * m[..., i0, i1], m[..., i0, i0])
    return jnp.stack([a0, a1, a2], axis=-1)


# ---------------------------------------------------------------------------
# 6D rotation representation (Zhou et al. — continuity for learning; parity
# with the reference's rotation_6d_* surface, rotation_conversions.py:616-651)
# ---------------------------------------------------------------------------

def rotation_6d_to_matrix(d6: Array) -> Array:
    """[..., 6] (two 3-vectors) -> rotation matrix via Gram-Schmidt."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True).clip(_EPS)
    a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2p / jnp.linalg.norm(a2p, axis=-1, keepdims=True).clip(_EPS)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(m: Array) -> Array:
    """Rotation matrix -> [..., 6]: first two rows, flattened."""
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


# ---------------------------------------------------------------------------
# SO(3) log map (rotation error vectors without euler extraction)
# ---------------------------------------------------------------------------

def so3_log(m: Array) -> Array:
    """Rotation matrix -> rotation vector (axis*angle), small-angle safe."""
    return matrix_to_axis_angle(m)


def so3_error(r: Array, r_target: Array) -> Array:
    """Rotation error vector log(R^T R*) — transpose, never inverse.

    The reference computes ``inv(R) @ R*`` with ``torch.linalg.inv``
    (``cost/pose_cost.py:32``); for rotations the transpose is exact and free.
    """
    return so3_log(jnp.swapaxes(r, -1, -2) @ r_target)
