"""Fused Pallas MPPI solve for the whole-body quadrotor + arm task.

The ROADMAP "whole-body Pallas fusion" item: the XLA path materializes the
(K, H, ...) noise, joint, attitude, FK and cost tensors in HBM between
fusions — at K=16384, H=100 that is gigabytes of round-trip traffic per
solve and the measured bottleneck (FK alone ~7 ms of an ~11 ms solve).
This kernel runs sample -> rollout -> FK -> cost entirely in VMEM, tiled
over samples, with the same two-pass regenerated-noise scheme as
``drone_kernel``:

* **Pass 1 (cost)** seeds the per-core PRNG per tile, draws the tile's
  noise in VMEM (one (H, TILE) block per action, fixed order), rolls out the
  base + arm, runs the 7-joint quaternion FK and the full cost stack, and
  emits only the per-sample cost S.
* **Pass 2 (update)** regenerates the identical noise and accumulates the
  importance-weighted noise average (and, for adaptive-sigma configs, the
  weighted second moment) per tile.  Softmin weighting, Savitzky-Golay
  smoothing, clamping and warm-start bookkeeping stay in XLA — they are
  O(H*A) and not worth fusing.

Layout: samples ride the 128-lane axis; every per-channel quantity is an
(H, TILE) block so the VPU runs the quaternion algebra at full width, and
every horizon recurrence (arm double integration, PD-closed attitude or
identified position response, rotor lag, velocity/position cumsums) is a
host-precomputed (H, H) matrix applied on the MXU — the parallel-in-time
factorization of ``models/whole_body.py`` carried into one kernel.  All
three control modes are fused: attitude and position ride linear-response
matmuls; the wrench mode's nonlinear attitude recurrence runs as an
in-kernel Hillis-Steele quaternion prefix scan (log2(H) VPU rounds — the
kernel form of the XLA path's ``lax.associative_scan``) with the arm
gravity-moment coupling computed by a per-link COM chain walk in VMEM.

Parity: with explicit noise (``use_prng=False``) the step consumes the same
``jax.random`` stream as the XLA solver, so the two paths agree to float
tolerance end to end (tested).  The in-kernel PRNG variant (production) is
a different stream — validated distributionally and behaviorally, like the
drone kernel (see its header for the signed-int32 ``prng_random_bits``
masking note).

Reference behavior being accelerated: the whole-body capability the
reference declares as future work (``README.md:30-34``); cost semantics per
``cost_manager.py:30-43`` / ``pose_cost.py`` / ``joint_space_cost.py:59-80``
as implemented in ``solver/whole_body.py``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models import kinova
from ...models.chain import matrix_to_quat_np
from ...models.whole_body import (
    N_BASE_ACTIONS,
    _attitude_response_matrices,
    _drag_decay_operator,
    _rotor_lag_matrix,
)
from ...ops import sampling
from ...utils import savgol
from .drone_kernel import TILE, _normals

A_TOTAL = N_BASE_ACTIONS + kinova.N_JOINTS  # 11

# Scalar-pack layout (SMEM f32 vector) — indices into ``sc_ref``.
_SC_Q0 = 0           # 7: arm joint positions
_SC_QD0 = 7          # 7: arm joint velocities
_SC_POS0 = 14        # 3: base position
_SC_VEL0 = 17        # 3: base velocity
_SC_TPOS = 20        # 3: EE target position
_SC_TQUAT = 23       # 4: EE target quaternion (wxyz)
_SC_BTGT = 27        # 3: base station-keeping target
_SC_SIGMA = 30       # 11: live per-action exploration std
_SC_BQ0 = 41         # 4: initial base attitude quaternion (wxyz; wrench mode)
_SC_OM0 = 45         # 3: initial body rates (wrench mode)
_SC_GB = 48          # 3: gravity vector in the base frame (wrench mode)
_SC_LEN = 51

# Column layout of the per-step ``cols`` block (H, _COL_LEN).
_COL_TCOL = 0        # dt * (t + 1)
_COL_GAMMA = 1       # gamma^t
_COL_WPOS = 2        # EE position weight (stage for t<H-1, terminal at H-1)
_COL_WORI = 3        # EE orientation weight
_COL_WBASE = 4       # base position-error weight (0 at the terminal step)
_COL_HOM = 5         # 6: homogeneous response columns (per axis: pos, vel)
_COL_VHOM = 11       # linear-drag velocity decay alpha^(t+1) (ones: no drag)
_COL_PHOM = 12       # dt * cumsum(alpha^(t+1)) — initial-velocity term of pos
_COL_OHOM = 13       # rate-damping omega decay (1-dt*kd)^(t+1) (wrench mode)
_COL_LEN = 14


# atan(t) ~ t * P(t^2) on [0, 1]: degree-15 odd least-squares fit on
# Chebyshev nodes, max abs error 4.1e-8 rad — below f32 resolution, so the
# kernel's orientation metric matches the XLA atan2 path to float noise.
_ATAN_COEFFS = (0.99999946, -0.33330107, 0.1994851, -0.13915803,
                0.096562564, -0.056063175, 0.02194661, -0.0040733092)


def _atan2_nonneg(y, x):
    """atan2 restricted to y, x >= 0 (first quadrant) — Mosaic lowers no
    inverse trig, so: octant reduction (atan of min/max, reflect at pi/2)
    + the polynomial above."""
    num = jnp.minimum(y, x)
    den = jnp.maximum(y, x)
    t = num / (den + 1e-30)
    t2 = t * t
    p = _ATAN_COEFFS[-1]
    for coef in _ATAN_COEFFS[-2::-1]:
        p = coef + t2 * p
    p = t * p
    return jnp.where(y > x, (np.pi / 2) - p, p)


def _quat_mul(a, b):
    """Hamilton product on component tuples of (H, T) blocks (wxyz)."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _quat_rotate_const(q, v):
    """Rotate the constant 3-vector ``v`` by quaternions ``q`` (component
    tuple of (H, T) blocks): v + 2*(w*(u x v) + u x (u x v))."""
    w, x, y, z = q
    vx, vy, vz = float(v[0]), float(v[1]), float(v[2])
    # u x v (u variable, v constant)
    cx = y * vz - z * vy
    cy = z * vx - x * vz
    cz = x * vy - y * vx
    # u x (u x v)
    dx = y * cz - z * cy
    dy = z * cx - x * cz
    dz = x * cy - y * cx
    return (
        vx + 2.0 * (w * cx + dx),
        vy + 2.0 * (w * cy + dy),
        vz + 2.0 * (w * cz + dz),
    )


def _quat_from_rpy(r, p, y):
    """(roll, pitch, yaw) (H, T) blocks -> wxyz quaternion components
    (qz(yaw) * qy(pitch) * qx(roll)) — matches whole_body._quat_from_rpy."""
    cr, sr = jnp.cos(0.5 * r), jnp.sin(0.5 * r)
    cp, sp = jnp.cos(0.5 * p), jnp.sin(0.5 * p)
    cy, sy = jnp.cos(0.5 * y), jnp.sin(0.5 * y)
    return (
        cy * cp * cr + sy * sp * sr,
        cy * cp * sr - sy * sp * cr,
        cy * sp * cr + sy * cp * sr,
        sy * cp * cr - cy * sp * sr,
    )


def _chain_constants():
    """Host-side (origin quaternion, origin translation) per Kinova joint.
    tip='link_7' has an identity tip frame (asserted by the builder)."""
    spec = kinova.chain("link_7")
    oq = [matrix_to_quat_np(spec.origin_rot[j]) for j in range(spec.n_joints)]
    ot = [spec.origin_trans[j] for j in range(spec.n_joints)]
    return spec, oq, ot


def _quat_from_rotvec(rx, ry, rz):
    """Rotation-vector (H, T) blocks -> wxyz quaternion components, with a
    series-safe small-angle branch (matches utils.rotations.quat_from_axis_angle)."""
    th2 = rx * rx + ry * ry + rz * rz
    th = jnp.sqrt(th2)
    w = jnp.cos(0.5 * th)
    k = jnp.where(
        th > 1e-6, jnp.sin(0.5 * th) / jnp.maximum(th, 1e-30), 0.5 - th2 / 48.0
    )
    return (w, rx * k, ry * k, rz * k)


def _quat_prefix_scan(q, h: int):
    """Inclusive prefix product p_t = dq_0 * ... * dq_t along the H
    (sublane) axis — a Hillis-Steele scan of log2(H) in-register rounds, the
    kernel realization of the XLA path's ``lax.associative_scan`` over
    quaternions (models/whole_body._base_rollout_parallel).  Order matters
    (quaternions don't commute): earlier elements multiply on the LEFT."""
    s = 1
    fills = (1.0, 0.0, 0.0, 0.0)  # identity quaternion
    while s < h:
        shifted = tuple(
            jnp.concatenate(
                [jnp.full((s, comp.shape[1]), fill, comp.dtype), comp[:-s, :]],
                axis=0,
            )
            for comp, fill in zip(q, fills)
        )
        q = _quat_mul(shifted, q)
        s *= 2
    return q


def _arm_gravity_moment(q_joints, gb, *, consts):
    """Arm gravity moment about the base origin, base frame, on (H, T)
    blocks: tau = sum_j m_j (com_j(q) x g_b) — the in-kernel version of
    ``models/whole_body.arm_gravity_torque_fast`` (reference feeds the same
    tau_g forward, controller.cpp:541-560).  One chain walk, recording each
    link's COM position."""
    oq, ot = consts["oq"], consts["ot"]
    coms, masses = consts["link_com"], consts["link_mass"]
    gx, gy, gz = gb
    one = jnp.ones_like(q_joints[0])
    zero = jnp.zeros_like(q_joints[0])
    tq = (one, zero, zero, zero)
    tpx = tpy = tpz = zero
    taux = tauy = tauz = zero
    for j in range(kinova.N_JOINTS):
        oqw, oqx, oqy, oqz = (float(v) for v in oq[j])
        rx, ry, rz = _quat_rotate_const(tq, ot[j])
        tpx, tpy, tpz = tpx + rx, tpy + ry, tpz + rz
        half = 0.5 * q_joints[j]
        cth, sth = jnp.cos(half), jnp.sin(half)
        jq = (oqw * cth - oqz * sth, oqx * cth + oqy * sth,
              oqy * cth - oqx * sth, oqz * cth + oqw * sth)
        tq = _quat_mul(tq, jq)
        cx, cy, cz = _quat_rotate_const(tq, coms[j])
        px, py, pz = tpx + cx, tpy + cy, tpz + cz
        m = float(masses[j])
        taux += m * (py * gz - pz * gy)
        tauy += m * (pz * gx - px * gz)
        tauz += m * (px * gy - py * gx)
    return taux, tauy, tauz


def _fk_tip(base_q, base_p, q_joints, oq, ot):
    """Quaternion-chain FK of the 7-joint arm on (H, T) blocks.

    base_q/base_p: component tuples; q_joints: list of 7 (H, T) blocks.
    Same composition as chain.forward_kinematics_posquat (all joints are
    revolute about local +z).
    """
    tq = base_q
    tpx, tpy, tpz = base_p
    for j in range(kinova.N_JOINTS):
        oqw, oqx, oqy, oqz = (float(v) for v in oq[j])
        # translate: tp += R(tq) @ origin_trans[j]
        rx, ry, rz = _quat_rotate_const(tq, ot[j])
        tpx, tpy, tpz = tpx + rx, tpy + ry, tpz + rz
        # rotate: tq = tq * (origin_quat[j] * rot_z(q_j))
        half = 0.5 * q_joints[j]
        c, s = jnp.cos(half), jnp.sin(half)
        jq = (oqw * c - oqz * s, oqx * c + oqy * s,
              oqy * c - oqx * s, oqz * c + oqw * s)
        tq = _quat_mul(tq, jq)
    return tq, (tpx, tpy, tpz)


def _mm(mat, x):
    return jnp.dot(mat, x, preferred_element_type=jnp.float32)


def _mm_multi(mat, xs):
    """Apply ONE (H, H) operator to several (H, T) blocks as a single wide
    matmul.  With H=50 the operator occupies (50/128)^2 of the MXU; the
    fixed cost of loading it into the systolic array is comparable to
    streaming one 128-lane block through it, so batching the N blocks that
    share an operator (7 arm joints, the 3 velocity/position axes, the
    wrench channels) amortizes the weight-load ~N-fold."""
    if len(xs) == 1:
        return [_mm(mat, xs[0])]
    t = xs[0].shape[-1]
    wide = jnp.concatenate(xs, axis=-1)
    out = jnp.dot(mat, wide, preferred_element_type=jnp.float32)
    return [out[:, i * t:(i + 1) * t] for i in range(len(xs))]


def _rollout_cost(v, sc_ref, cols_ref, mats_ref, *, consts):
    """Shared pass-1 math: per-action control blocks ``v`` (list of 11
    (H, T) arrays) -> per-sample cost (1, T)."""
    c = consts
    dt = c["dt"]
    tcol = cols_ref[:, _COL_TCOL:_COL_TCOL + 1]

    # ----- arm joints: q = q0 + qd0 * tcol + Q_arm @ qddot ------------------
    # Raw trajectory for the limit cost; limit-CLAMPED trajectory for FK and
    # the gravity-moment chain (mirrors models/whole_body.rollout: real
    # joints stop at their stops).
    q_mat = mats_ref[0]
    q_int = _mm_multi(q_mat, [v[N_BASE_ACTIONS + j]
                              for j in range(kinova.N_JOINTS)])
    q_raw = [
        sc_ref[_SC_Q0 + j] + sc_ref[_SC_QD0 + j] * tcol + q_int[j]
        for j in range(kinova.N_JOINTS)
    ]
    q_joints = [
        jnp.clip(q_raw[j], c["q_lo"][j], c["q_hi"][j])
        for j in range(kinova.N_JOINTS)
    ]

    # ----- base ------------------------------------------------------------
    def hom(i):
        return cols_ref[:, _COL_HOM + i:_COL_HOM + i + 1]

    vhom = cols_ref[:, _COL_VHOM:_COL_VHOM + 1]
    phom = cols_ref[:, _COL_PHOM:_COL_PHOM + 1]

    if c["mode"] == "attitude":
        lmat, fmat, dvmat = mats_ref[1], mats_ref[2], mats_ref[7]
        g_rp, go_rp, g_y, go_y = mats_ref[3], mats_ref[4], mats_ref[5], mats_ref[6]
        thrust = _mm(fmat, v[0]) if c["rotor_lag"] else v[0]
        g12 = _mm_multi(g_rp, [v[1], v[2]])
        go12 = _mm_multi(go_rp, [v[1], v[2]])
        roll = g12[0] + hom(0)
        om_r = go12[0] + hom(1)
        pitch = g12[1] + hom(2)
        om_p = go12[1] + hom(3)
        yaw = _mm(g_y, v[3]) + hom(4)
        om_y = _mm(go_y, v[3]) + hom(5)
        bq = _quat_from_rpy(roll, pitch, yaw)
        bw, bx, by, bz = bq
        zx = 2.0 * (bx * bz + bw * by)
        zy = 2.0 * (by * bz - bw * bx)
        zz = 1.0 - 2.0 * (bx * bx + by * by)
        inv_m = 1.0 / c["mass"]
        ax = zx * thrust * inv_m
        ay = zy * thrust * inv_m
        az = zz * thrust * inv_m - 9.81
        # dvmat is the drag-decay velocity operator (== lmat cumsum when
        # drag_kd = 0); vhom/phom carry the initial velocity's decay
        # (models/whole_body._drag_decay_operator).
        cvx, cvy, cvz = _mm_multi(dvmat, [ax, ay, az])
        lvx, lvy, lvz = _mm_multi(lmat, [cvx, cvy, cvz])
        vel = (sc_ref[_SC_VEL0] * vhom + dt * cvx,
               sc_ref[_SC_VEL0 + 1] * vhom + dt * cvy,
               sc_ref[_SC_VEL0 + 2] * vhom + dt * cvz)
        pos = (sc_ref[_SC_POS0] + sc_ref[_SC_VEL0] * phom + dt * dt * lvx,
               sc_ref[_SC_POS0 + 1] + sc_ref[_SC_VEL0 + 1] * phom + dt * dt * lvy,
               sc_ref[_SC_POS0 + 2] + sc_ref[_SC_VEL0 + 2] * phom + dt * dt * lvz)
        omega_sq = om_r * om_r + om_p * om_p + om_y * om_y
    elif c["mode"] == "wrench":
        # Direct-wrench rollout (models/whole_body._base_rollout_parallel):
        # rotor lag on the whole commanded wrench, arm gravity moment
        # coupling, omega cumsum, quaternion prefix scan for attitude,
        # velocity/position cumsums (drag-decay operator when drag_kd > 0).
        lmat, fmat, dvmat, omat = (
            mats_ref[1], mats_ref[2], mats_ref[3], mats_ref[4]
        )
        if c["rotor_lag"]:
            wrench = _mm_multi(fmat, [v[i] for i in range(4)])
        else:
            wrench = [v[i] for i in range(4)]
        thrust, taux, tauy, tauz = wrench
        if c["couple"]:
            gb = (sc_ref[_SC_GB], sc_ref[_SC_GB + 1], sc_ref[_SC_GB + 2])
            tgx, tgy, tgz = _arm_gravity_moment(q_joints, gb, consts=c)
            taux, tauy, tauz = taux + tgx, tauy + tgy, tauz + tgz
        ix, iy, iz = c["inertia"]
        # omat/ohom realize the rate-damping recurrence (== lmat/1s when
        # rate_damping = 0; models/whole_body._drag_decay_operator).
        ohom = cols_ref[:, _COL_OHOM:_COL_OHOM + 1]
        otx, oty, otz = _mm_multi(omat, [taux, tauy, tauz])
        om_r = sc_ref[_SC_OM0] * ohom + (dt / ix) * otx
        om_p = sc_ref[_SC_OM0 + 1] * ohom + (dt / iy) * oty
        om_y = sc_ref[_SC_OM0 + 2] * ohom + (dt / iz) * otz
        dq = _quat_from_rotvec(om_r * dt, om_p * dt, om_y * dt)
        prefix = _quat_prefix_scan(dq, c["h"])
        q0 = (sc_ref[_SC_BQ0], sc_ref[_SC_BQ0 + 1],
              sc_ref[_SC_BQ0 + 2], sc_ref[_SC_BQ0 + 3])
        bq = _quat_mul(q0, prefix)
        bw, bx, by, bz = bq
        zx = 2.0 * (bx * bz + bw * by)
        zy = 2.0 * (by * bz - bw * bx)
        zz = 1.0 - 2.0 * (bx * bx + by * by)
        inv_m = 1.0 / c["mass"]
        ax = zx * thrust * inv_m
        ay = zy * thrust * inv_m
        az = zz * thrust * inv_m - 9.81
        # dvmat is the drag-decay velocity operator (== lmat cumsum when
        # drag_kd = 0); vhom/phom carry the initial velocity's decay
        # (models/whole_body._drag_decay_operator).
        cvx, cvy, cvz = _mm_multi(dvmat, [ax, ay, az])
        lvx, lvy, lvz = _mm_multi(lmat, [cvx, cvy, cvz])
        vel = (sc_ref[_SC_VEL0] * vhom + dt * cvx,
               sc_ref[_SC_VEL0 + 1] * vhom + dt * cvy,
               sc_ref[_SC_VEL0 + 2] * vhom + dt * cvz)
        pos = (sc_ref[_SC_POS0] + sc_ref[_SC_VEL0] * phom + dt * dt * lvx,
               sc_ref[_SC_POS0 + 1] + sc_ref[_SC_VEL0 + 1] * phom + dt * dt * lvy,
               sc_ref[_SC_POS0 + 2] + sc_ref[_SC_VEL0 + 2] * phom + dt * dt * lvz)
        omega_sq = om_r * om_r + om_p * om_p + om_y * om_y
    else:  # position mode
        g_xy, go_xy, g_z, go_z, dmat = (
            mats_ref[1], mats_ref[2], mats_ref[3], mats_ref[4], mats_ref[5]
        )
        setps = [sc_ref[_SC_POS0 + i] + v[i] for i in range(3)]  # absolute
        g01 = _mm_multi(g_xy, setps[:2])
        go01 = _mm_multi(go_xy, setps[:2])
        gs = [g01[0], g01[1], _mm(g_z, setps[2])]
        gos = [go01[0], go01[1], _mm(go_z, setps[2])]
        pos, vel, acc = [], [], []
        for i, (kp, kd) in enumerate(
            [(c["pos_kp_xy"], c["pos_kd_xy"]),
             (c["pos_kp_xy"], c["pos_kd_xy"]),
             (c["pos_kp_z"], c["pos_kd_z"])]
        ):
            p = gs[i] + hom(2 * i)
            vv = gos[i] + hom(2 * i + 1)
            pos.append(p)
            vel.append(vv)
            acc.append(kp * (setps[i] - p) - kd * vv)
        pos, vel = tuple(pos), tuple(vel)
        inv_g = 1.0 / 9.81
        roll = -acc[1] * inv_g
        pitch = acc[0] * inv_g
        yaw = v[3]
        bq = _quat_from_rpy(roll, pitch, yaw)
        bw, bx, by, bz = bq
        om_r, om_p, om_y = _mm_multi(dmat, [roll, pitch, yaw])
        omega_sq = om_r * om_r + om_p * om_p + om_y * om_y

    # ----- FK + cost stack ---------------------------------------------------
    tq, tp = _fk_tip(bq, pos, q_joints, c["oq"], c["ot"])
    tw, tx, ty, tz = tq
    tpx, tpy, tpz = tp

    ex = tpx - sc_ref[_SC_TPOS]
    ey = tpy - sc_ref[_SC_TPOS + 1]
    ez = tpz - sc_ref[_SC_TPOS + 2]
    dp = jnp.sqrt(ex * ex + ey * ey + ez * ez)

    # err_q = conj(tq) * target_quat; geodesic angle = 2 atan2(|vec|, |w|).
    gw, gx, gy, gz = (sc_ref[_SC_TQUAT], sc_ref[_SC_TQUAT + 1],
                      sc_ref[_SC_TQUAT + 2], sc_ref[_SC_TQUAT + 3])
    ew = tw * gw + tx * gx + ty * gy + tz * gz
    evx = tw * gx - tx * gw - ty * gz + tz * gy
    evy = tw * gy + tx * gz - ty * gw - tz * gx
    evz = tw * gz - tx * gy + ty * gx - tz * gw
    nv = jnp.sqrt(evx * evx + evy * evy + evz * evz)
    dori = 2.0 * _atan2_nonneg(nv, jnp.abs(ew))

    step_cost = (
        cols_ref[:, _COL_WPOS:_COL_WPOS + 1] * dp
        + cols_ref[:, _COL_WORI:_COL_WORI + 1] * dori
    )

    if c["w_base"]:
        bex = pos[0] - sc_ref[_SC_BTGT]
        bey = pos[1] - sc_ref[_SC_BTGT + 1]
        bez = pos[2] - sc_ref[_SC_BTGT + 2]
        step_cost += cols_ref[:, _COL_WBASE:_COL_WBASE + 1] * (
            bex * bex + bey * bey + bez * bez
        )
    if c["w_att"]:
        r02 = 2.0 * (bx * bz + bw * by)
        r12 = 2.0 * (by * bz - bw * bx)
        step_cost += (c["w_att"] / c["h"]) * (r02 * r02 + r12 * r12)
    if c["w_omega"]:
        step_cost += (c["w_omega"] / c["h"]) * omega_sq
    if c["w_vel"]:
        step_cost += (c["w_vel"] / c["h"]) * (
            vel[0] * vel[0] + vel[1] * vel[1] + vel[2] * vel[2]
        )
    if c["w_action"]:
        act_sq = v[0] * v[0]
        for i in range(1, A_TOTAL):
            act_sq += v[i] * v[i]
        step_cost += c["w_action"] * cols_ref[:, _COL_GAMMA:_COL_GAMMA + 1] * act_sq
    if c["w_jl"] and c["jl_soft"]:
        vsq = None
        for j in range(kinova.N_JOINTS):
            vj = jnp.maximum(c["q_lo"][j] - q_raw[j], 0.0) + jnp.maximum(
                q_raw[j] - c["q_hi"][j], 0.0
            )
            vsq = vj * vj if vsq is None else vsq + vj * vj
        step_cost += (c["w_jl"] * 1e3) * cols_ref[:, _COL_GAMMA:_COL_GAMMA + 1] * vsq
    elif c["w_jl"]:
        viol = jnp.maximum(c["q_lo"][0] - q_raw[0], q_raw[0] - c["q_hi"][0])
        for j in range(1, kinova.N_JOINTS):
            viol = jnp.maximum(
                viol,
                jnp.maximum(c["q_lo"][j] - q_raw[j], q_raw[j] - c["q_hi"][j]),
            )
        out = jnp.where(viol > 0.0, 1.0, 0.0)
        step_cost += (c["w_jl"] * 1e10) * cols_ref[:, _COL_GAMMA:_COL_GAMMA + 1] * out
    for (ox, oy, oz), orad in zip(c["obs_centers"], c["obs_radii"]):
        dx, dy, dz = tpx - ox, tpy - oy, tpz - oz
        dist = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        pen = jnp.maximum(orad - dist, 0.0)
        step_cost += c["w_obs"] * pen * pen

    total = jnp.sum(step_cost, axis=0, keepdims=True)  # (1, T)
    if c["w_stop"]:
        # Terminal stopping-point cost (solver/whole_body WholeBodyCostParams
        # .stop_weight): |p_H + T_stop v_H - p*|^2 on the base — terminal
        # row only.
        hh = c["h"]
        ts = c["stop_horizon"]
        sx = pos[0][hh - 1:hh, :] + ts * vel[0][hh - 1:hh, :] - sc_ref[_SC_BTGT]
        sy = (pos[1][hh - 1:hh, :] + ts * vel[1][hh - 1:hh, :]
              - sc_ref[_SC_BTGT + 1])
        sz = (pos[2][hh - 1:hh, :] + ts * vel[2][hh - 1:hh, :]
              - sc_ref[_SC_BTGT + 2])
        total += c["w_stop"] * (sx * sx + sy * sy + sz * sz)
    return total


def _normals_erfinv(shape) -> jax.Array:
    """Standard normals via the inverse normal CDF: z = sqrt(2) erfinv(2u-1).

    One bits-draw + one transcendental per normal — measured ~20% faster
    than the drone kernel's Box-Muller (two draws + log/sqrt/cos) at
    K=16384, H=100.  ``erf_inv`` is a Mosaic-lowered primitive.  The 24-bit
    masking note from ``drone_kernel._normals`` applies.

    The argument is formed as (bits - (2^23 - 0.5)) / 2^23 rather than
    2u - 1: the latter rounds to exactly 1.0f for top bit patterns (f32 ulp
    at 1 is 2^-24) and ``erf_inv(1.0) = inf``; this form is exact in f32 and
    caps at +-(1 - 2^-24) -> |z| = sqrt(2) erfinv(1 - 2^-24) <= ~5.4 (the
    truncated tail mass is ~6e-8 — immeasurable; hardware-verified max in
    tests_tpu/test_tpu_hardware.py).
    """
    bits = pltpu.prng_random_bits(shape) & 0xFFFFFF
    x = (bits.astype(jnp.float32) - float(2**23 - 0.5)) * (1.0 / (1 << 23))
    return np.sqrt(2.0) * jax.lax.erf_inv(x)


def _draw_noise(sc_ref, *, consts):
    """The tile's noise, one (H, T) block per action, fixed draw order —
    pass 1 and pass 2 must call this identically for regeneration."""
    return [
        sc_ref[_SC_SIGMA + a] * _normals_erfinv((consts["h"], consts["tile"]))
        for a in range(A_TOTAL)
    ]


def _softmin_partials(s_row, inv_lam):
    """Per-tile logsumexp partials for the softmin: (tile min m_i, local
    normalizer e_i = sum exp((m_i - s)/lam)) — so the XLA glue between the
    passes reduces length-n_tiles vectors instead of exp/sum over all K
    (rho = min_i m_i; eta = sum_i e_i exp((rho - m_i)/lam))."""
    m = jnp.min(s_row)
    e = jnp.sum(jnp.exp((m - s_row) * inv_lam))
    return (jnp.full((1, TILE), m, jnp.float32),
            jnp.full((1, TILE), e, jnp.float32))


def _cost_kernel(seed_ref, sc_ref, u_prev_ref, cols_ref, mats_ref,
                 s_ref, m_ref, e_ref, *, consts):
    tile = pl.program_id(0)
    pltpu.prng_seed(seed_ref[tile])
    eps = _draw_noise(sc_ref, consts=consts)
    v = [u_prev_ref[:, a:a + 1] + eps[a] for a in range(A_TOTAL)]
    s_row = _rollout_cost(v, sc_ref, cols_ref, mats_ref, consts=consts)
    s_ref[pl.ds(tile, 1), :] = s_row
    m_row, e_row = _softmin_partials(s_row, consts["inv_lam"])
    m_ref[pl.ds(tile, 1), :] = m_row
    e_ref[pl.ds(tile, 1), :] = e_row


def _cost_kernel_noise(noise_ref, sc_ref, u_prev_ref, cols_ref, mats_ref,
                       s_ref, m_ref, e_ref, *, consts):
    tile = pl.program_id(0)
    v = [u_prev_ref[:, a:a + 1] + noise_ref[0, a] for a in range(A_TOTAL)]
    s_row = _rollout_cost(v, sc_ref, cols_ref, mats_ref, consts=consts)
    s_ref[pl.ds(tile, 1), :] = s_row
    m_row, e_row = _softmin_partials(s_row, consts["inv_lam"])
    m_ref[pl.ds(tile, 1), :] = m_row
    e_ref[pl.ds(tile, 1), :] = e_row


def _cost_kernel_store(seed_ref, sc_ref, u_prev_ref, cols_ref, mats_ref,
                       s_ref, m_ref, e_ref, noise_out_ref, *, consts):
    """Pass 1 with in-kernel PRNG that also SPILLS the drawn noise to HBM:
    pass 2 then streams it back (``_update_kernel_noise``) instead of
    regenerating — trading ~2 K H A bytes of HBM traffic (~22 us at K=4096,
    H=50 on v5e) for the second erfinv/bits pass."""
    tile = pl.program_id(0)
    pltpu.prng_seed(seed_ref[tile])
    eps = _draw_noise(sc_ref, consts=consts)
    for a in range(A_TOTAL):
        noise_out_ref[0, a] = eps[a]
    v = [u_prev_ref[:, a:a + 1] + eps[a] for a in range(A_TOTAL)]
    s_row = _rollout_cost(v, sc_ref, cols_ref, mats_ref, consts=consts)
    s_ref[pl.ds(tile, 1), :] = s_row
    m_row, e_row = _softmin_partials(s_row, consts["inv_lam"])
    m_ref[pl.ds(tile, 1), :] = m_row
    e_ref[pl.ds(tile, 1), :] = e_row


def _weighted_rows(eps, w_row):
    """(1, A*H) weighted-noise-sum row and (1, A) second-moment row for one
    tile — built in registers and stored with a single lane-aligned write
    (Mosaic rejects dynamic stores at non-128-aligned column offsets)."""
    du_row = jnp.concatenate(
        [jnp.sum(e * w_row, axis=1, keepdims=True).T for e in eps], axis=1
    )
    m2_row = jnp.concatenate(
        [jnp.sum(e * e * w_row).reshape(1, 1) for e in eps], axis=1
    )
    return du_row, m2_row


def _update_kernel(seed_ref, sc_ref, w_ref, du_ref, m2_ref, *, consts):
    tile = pl.program_id(0)
    pltpu.prng_seed(seed_ref[tile])
    eps = _draw_noise(sc_ref, consts=consts)
    du_row, m2_row = _weighted_rows(eps, w_ref[pl.ds(tile, 1), :])
    du_ref[pl.ds(tile, 1), :] = du_row
    m2_ref[pl.ds(tile, 1), :] = m2_row


def _update_kernel_noise(noise_ref, w_ref, du_ref, m2_ref, *, consts):
    tile = pl.program_id(0)
    eps = [noise_ref[0, a] for a in range(A_TOTAL)]
    du_row, m2_row = _weighted_rows(eps, w_ref[pl.ds(tile, 1), :])
    du_ref[pl.ds(tile, 1), :] = du_row
    m2_ref[pl.ds(tile, 1), :] = m2_row


def _fused_update_body(eps, tile, s_ref, se_ref, du_ref, m2_ref, *, consts):
    """Shared body of the FUSED update pass (single-chip production path):
    softmin weights computed in-kernel from the (rho, eta) SMEM scalars
    (no (K,)-wide XLA exp), and the weighted-noise rows accumulated into
    ONE (1, A*H) output row across grid steps — the tile-reduction XLA sum
    disappears; only the cheap fixed-size tail (reshape + SavGol matmul +
    clamp + warm decay on (H, A) arrays) stays outside."""
    rho = se_ref[0]
    eta = se_ref[1]
    w_row = jnp.exp((rho - s_ref[pl.ds(tile, 1), :]) * consts["inv_lam"]) / eta
    du_row, m2_row = _weighted_rows(eps, w_row)

    @pl.when(tile == 0)
    def _init():
        du_ref[0:1, :] = du_row

    @pl.when(tile > 0)
    def _acc():
        du_ref[0:1, :] += du_row

    m2_ref[pl.ds(tile, 1), :] = m2_row


def _update_kernel_fused(seed_ref, sc_ref, se_ref, s_ref, du_ref, m2_ref,
                         *, consts):
    tile = pl.program_id(0)
    pltpu.prng_seed(seed_ref[tile])
    eps = _draw_noise(sc_ref, consts=consts)
    _fused_update_body(eps, tile, s_ref, se_ref, du_ref, m2_ref, consts=consts)


def _update_kernel_fused_noise(noise_ref, se_ref, s_ref, du_ref, m2_ref,
                               *, consts):
    tile = pl.program_id(0)
    eps = [noise_ref[0, a] for a in range(A_TOTAL)]
    _fused_update_body(eps, tile, s_ref, se_ref, du_ref, m2_ref, consts=consts)


def _host_matrices(mp, h: int, dt: float) -> np.ndarray:
    """Stacked (M, H, H) horizon operators for the configured control mode."""
    lower = np.tril(np.ones((h, h)))
    strict = np.tril(np.ones((h, h)), k=-1)
    q_arm = dt * dt * (lower @ strict + 0.5 * lower)
    # Velocity operator: plain cumsum, or the linear-drag decay recurrence
    # (models/whole_body._drag_decay_operator) when drag_kd > 0.
    dvmat = (
        _drag_decay_operator(h, 1.0 - dt * mp.drag_kd)[0]
        if mp.drag_kd else lower
    )
    if mp.control_mode == "attitude":
        fmat = (_rotor_lag_matrix(h, dt, mp.rotor_lag_tau)
                if mp.rotor_lag_tau > 0.0 else np.eye(h))
        g_rp, go_rp, _ = _attitude_response_matrices(h, dt, mp.att_kp_rp, mp.att_kd_rp)
        g_y, go_y, _ = _attitude_response_matrices(h, dt, mp.att_kp_yaw, mp.att_kd_yaw)
        mats = [q_arm, lower, fmat, g_rp, go_rp, g_y, go_y, dvmat]
    elif mp.control_mode == "wrench":
        fmat = (_rotor_lag_matrix(h, dt, mp.rotor_lag_tau)
                if mp.rotor_lag_tau > 0.0 else np.eye(h))
        omat = (
            _drag_decay_operator(h, 1.0 - dt * mp.rate_damping)[0]
            if mp.rate_damping else lower
        )
        mats = [q_arm, lower, fmat, dvmat, omat]
    else:
        g_xy, go_xy, _ = _attitude_response_matrices(h, dt, mp.pos_kp_xy, mp.pos_kd_xy)
        g_z, go_z, _ = _attitude_response_matrices(h, dt, mp.pos_kp_z, mp.pos_kd_z)
        dmat = (np.eye(h) - np.eye(h, k=-1)) / dt
        dmat[0, :] = 0.0
        mats = [q_arm, g_xy, go_xy, g_z, go_z, dmat]
    return np.stack(mats).astype(np.float32)


def _host_static_cols(
    cp, h: int, dt: float, gamma: float, drag_kd: float = 0.0,
    rate_damping: float = 0.0,
) -> np.ndarray:
    cols = np.zeros((h, _COL_LEN), np.float32)
    cols[:, _COL_TCOL] = dt * np.arange(1, h + 1)
    cols[:, _COL_GAMMA] = gamma ** np.arange(h)
    cols[:, _COL_WPOS] = cp.stage_pose_weight
    cols[-1, _COL_WPOS] = cp.terminal_pose_weight
    cols[:, _COL_WORI] = cp.stage_orientation_weight
    cols[-1, _COL_WORI] = cp.terminal_orientation_weight
    cols[:, _COL_WBASE] = cp.base_pos_weight / h
    cols[-1, _COL_WBASE] = 0.0
    vhom = (1.0 - dt * drag_kd) ** np.arange(1, h + 1)
    cols[:, _COL_VHOM] = vhom
    cols[:, _COL_PHOM] = dt * np.cumsum(vhom)
    cols[:, _COL_OHOM] = (1.0 - dt * rate_damping) ** np.arange(1, h + 1)
    return cols


def make_whole_body_pallas_step(
    params,
    use_prng: bool = True,
    interpret: bool = False,
    axis_name=None,
    n_local_samples=None,
    tile: int = TILE,
    bench_pass: Optional[str] = None,
    noise_spill: bool = True,
):
    """Build ``step(state, obs) -> (u_seq, new_state)`` — the fused
    drop-in for the XLA ``make_step`` pipeline inside
    :func:`solver.whole_body.make_whole_body_solver`.

    ``use_prng=False`` streams ``jax.random`` noise from HBM (same stream as
    the XLA solver — parity testing / reproducibility across backends);
    ``use_prng=True`` generates noise in-kernel (production; zero noise HBM
    traffic).

    Multi-chip: trace with ``axis_name``/``n_local_samples`` inside
    ``shard_map`` — each device runs the fused kernels on its local K-shard
    and the softmin/update reductions between the two passes become ICI
    collectives (pmin + three psums), the same communication pattern as the
    sharded XLA path (``ops/weights.py``).  The per-device noise key is
    folded exactly like ``solver.mppi.make_step``'s, so a sharded
    explicit-noise solve reproduces the sharded XLA solve float-for-float.
    """
    from ...solver.mppi import MPPIState, _diag_sigma

    cfg, mp, cp = params.mppi, params.model, params.cost
    h, dt = cfg.n_horizon, cfg.dt
    k_local = n_local_samples or cfg.n_samples
    if cfg.n_action != A_TOTAL:
        raise ValueError(f"whole-body kernel expects {A_TOTAL} actions")
    if k_local % tile:
        raise ValueError(f"local sample count must be a multiple of {tile}")
    if tile % TILE:
        raise ValueError(f"tile must be a multiple of the {TILE}-lane width")
    if mp.control_mode not in ("attitude", "position", "wrench"):
        raise ValueError("unknown control mode for the fused kernel")
    if cp.ori_mode != "log":
        raise ValueError("fused kernel implements the 'log' orientation metric")
    if cfg.zero_mean_noise:
        raise ValueError("zero_mean_noise unsupported in the fused kernel")
    if cfg.adaptive_sigma and cfg.sigma_scale_fn is not None:
        raise ValueError("adaptive_sigma and sigma_scale_fn are exclusive")
    if np.ndim(cfg.sigma) == 2:
        raise ValueError("fused kernel requires scalar or diagonal sigma")
    if mp.control_mode in ("attitude", "wrench") and not mp.time_parallel:
        raise ValueError("fused kernel is parallel-in-time only")
    spec, oq, ot = _chain_constants()
    if mp.arm_tip != "link_7":
        raise ValueError("fused kernel bakes the link_7 tip frame")
    n_tiles = k_local // tile

    inertials = mp.inertials()
    consts = dict(
        h=h,
        dt=dt,
        mode=mp.control_mode,
        mass=mp.vehicle.mass + mp.arm_mass_lump,
        rotor_lag=mp.rotor_lag_tau > 0.0,
        couple=bool(mp.couple_arm_gravity),
        inertia=tuple(float(x) for x in mp.vehicle.inertia),
        link_com=tuple(tuple(float(v) for v in c) for c in inertials.com),
        link_mass=tuple(float(m) for m in inertials.mass),
        pos_kp_xy=mp.pos_kp_xy, pos_kd_xy=mp.pos_kd_xy,
        pos_kp_z=mp.pos_kp_z, pos_kd_z=mp.pos_kd_z,
        w_base=cp.base_pos_weight, w_att=cp.attitude_weight,
        w_omega=cp.omega_weight, w_vel=cp.vel_weight,
        w_action=cp.action_weight, w_jl=cp.joint_limit_weight,
        jl_soft=bool(getattr(cp, "joint_limit_soft", True)),
        q_lo=[float(x) for x in spec.lower],
        q_hi=[float(x) for x in spec.upper],
        oq=oq, ot=ot,
        w_obs=cp.obstacle_weight,
        obs_centers=tuple(tuple(float(v) for v in c) for c in cp.obstacle_centers),
        obs_radii=tuple(float(r) for r in cp.obstacle_radii),
        w_stop=float(getattr(cp, "stop_weight", 0.0)),
        stop_horizon=float(getattr(cp, "stop_horizon", 1.0)),
        tile=tile,
        inv_lam=1.0 / float(cfg.lam),
        savgol=bool(cfg.savgol_window),
        clip=(cfg.u_min is not None or cfg.u_max is not None),
        u_lo=tuple(np.broadcast_to(
            np.asarray(-np.inf if cfg.u_min is None else cfg.u_min, np.float64),
            (A_TOTAL,),
        ).tolist()),
        u_hi=tuple(np.broadcast_to(
            np.asarray(np.inf if cfg.u_max is None else cfg.u_max, np.float64),
            (A_TOTAL,),
        ).tolist()),
        warm_decay=float(cfg.warm_start_decay),
    )

    mats_np = _host_matrices(mp, h, dt)
    cols_static = _host_static_cols(cp, h, dt, cp.gamma, mp.drag_kd,
                                    mp.rate_damping)
    n_mats = mats_np.shape[0]

    vm = pltpu.VMEM
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    cols_spec = pl.BlockSpec((h, _COL_LEN), lambda i: (0, 0), memory_space=vm)
    mats_spec = pl.BlockSpec((n_mats, h, h), lambda i: (0, 0, 0), memory_space=vm)
    uprev_spec = pl.BlockSpec((h, A_TOTAL), lambda i: (0, 0), memory_space=vm)
    s_spec = pl.BlockSpec((n_tiles, tile), lambda i: (0, 0), memory_space=vm)
    part_spec = pl.BlockSpec((n_tiles, TILE), lambda i: (0, 0), memory_space=vm)
    noise_spec = pl.BlockSpec(
        (1, A_TOTAL, h, tile), lambda i: (i, 0, 0, 0), memory_space=vm
    )
    w_spec = pl.BlockSpec((n_tiles, tile), lambda i: (0, 0), memory_space=vm)
    du_spec = pl.BlockSpec((n_tiles, A_TOTAL * h), lambda i: (0, 0), memory_space=vm)
    m2_spec = pl.BlockSpec((n_tiles, A_TOTAL), lambda i: (0, 0), memory_space=vm)

    u_lo = None if cfg.u_min is None else jnp.asarray(cfg.u_min, jnp.float32)
    u_hi = None if cfg.u_max is None else jnp.asarray(cfg.u_max, jnp.float32)
    sigma_base = _diag_sigma(cfg, jnp.float32)
    nominal = (
        jnp.zeros((h, A_TOTAL), jnp.float32)
        if cfg.nominal_action is None
        else jnp.broadcast_to(
            jnp.asarray(cfg.nominal_action, jnp.float32), (h, A_TOTAL)
        )
    )

    def _hom_cols(obs):
        """Traced homogeneous-response columns (H, 6)."""
        if mp.control_mode == "wrench":
            # Initial state enters through the SMEM scalars instead.
            return jnp.zeros((h, 6), jnp.float32)
        if mp.control_mode == "attitude":
            _, _, hom_rp = _attitude_response_matrices(h, dt, mp.att_kp_rp, mp.att_kd_rp)
            _, _, hom_y = _attitude_response_matrices(h, dt, mp.att_kp_yaw, mp.att_kd_yaw)
            rpy0, om0 = obs.state.base.rpy, obs.state.base.omega
            cols = []
            for i, homm in enumerate([hom_rp, hom_rp, hom_y]):
                x0 = jnp.stack([rpy0[i], om0[i]])
                tr = jnp.einsum("hij,j->hi", jnp.asarray(homm, jnp.float32), x0)
                cols += [tr[:, 0], tr[:, 1]]
        else:
            _, _, hom_xy = _attitude_response_matrices(h, dt, mp.pos_kp_xy, mp.pos_kd_xy)
            _, _, hom_z = _attitude_response_matrices(h, dt, mp.pos_kp_z, mp.pos_kd_z)
            pos0, vel0 = obs.state.base.pos, obs.state.base.vel
            cols = []
            for i, homm in enumerate([hom_xy, hom_xy, hom_z]):
                x0 = jnp.stack([pos0[i], vel0[i]])
                tr = jnp.einsum("hij,j->hi", jnp.asarray(homm, jnp.float32), x0)
                cols += [tr[:, 0], tr[:, 1]]
        return jnp.stack(cols, axis=-1)

    def step(state: MPPIState, obs) -> Tuple[jax.Array, MPPIState]:
        key, sub = jax.random.split(state.key)
        if axis_name is not None:
            # Same decorrelation as the XLA step (solver/mppi.py): fold the
            # device index so shards draw disjoint noise from one seed.
            sub = jax.random.fold_in(sub, jax.lax.axis_index(axis_name))
        sigma_live = (
            state.sigma if cfg.adaptive_sigma
            else jnp.asarray(sigma_base, jnp.float32)
        )
        if cfg.sigma_scale_fn is not None:
            # Task-space exploration scheduling (see MPPIConfig) — sigma is
            # already a dynamic kernel input, so the schedule costs nothing.
            sigma_live = sigma_live * cfg.sigma_scale_fn(obs)
        # Initial attitude quaternion + body rates + base-frame gravity —
        # consumed by the wrench rollout (packed always; 10 floats).
        from ...models.whole_body import _quat_from_rpy as _q_rpy
        from ...utils import rotations as _rot

        bq0 = _q_rpy(obs.state.base.rpy.astype(jnp.float32))
        r0 = _rot.quat_to_matrix(bq0)
        g_b = -9.81 * r0[2, :]
        sc = jnp.concatenate([
            obs.state.q.astype(jnp.float32),
            obs.state.qdot.astype(jnp.float32),
            obs.state.base.pos.astype(jnp.float32),
            obs.state.base.vel.astype(jnp.float32),
            obs.ee_target.position.astype(jnp.float32),
            obs.ee_target.quat.astype(jnp.float32),
            obs.base_target.astype(jnp.float32),
            sigma_live,
            bq0,
            obs.state.base.omega.astype(jnp.float32),
            g_b,
        ])
        cols = jnp.asarray(cols_static).at[:, _COL_HOM:_COL_HOM + 6].set(
            _hom_cols(obs)
        )
        mats = jnp.asarray(mats_np)
        u_prev = state.u_prev.astype(jnp.float32)

        s_shape = jax.ShapeDtypeStruct((n_tiles, tile), jnp.float32)
        part_shape = jax.ShapeDtypeStruct((n_tiles, TILE), jnp.float32)
        noise_t = None
        if use_prng and noise_spill:
            # In-kernel PRNG + spill: pass 1 writes the drawn noise blocks
            # to HBM and pass 2 streams them back — one erfinv pass total.
            seed = jax.random.randint(sub, (), 0, np.int32(2**31 - 1), jnp.int32)
            seed_arr = seed * np.int32(n_tiles) + jnp.arange(n_tiles, dtype=jnp.int32)
            noise_shape = jax.ShapeDtypeStruct(
                (n_tiles, A_TOTAL, h, tile), jnp.float32
            )
            s, m_part, e_part, noise_t = pl.pallas_call(
                functools.partial(_cost_kernel_store, consts=consts),
                grid=(n_tiles,),
                in_specs=[smem, smem, uprev_spec, cols_spec, mats_spec],
                out_specs=(s_spec, part_spec, part_spec, noise_spec),
                out_shape=(s_shape, part_shape, part_shape, noise_shape),
                interpret=interpret,
            )(seed_arr, sc, u_prev, cols, mats)
        elif use_prng:
            seed = jax.random.randint(sub, (), 0, np.int32(2**31 - 1), jnp.int32)
            seed_arr = seed * np.int32(n_tiles) + jnp.arange(n_tiles, dtype=jnp.int32)
            s, m_part, e_part = pl.pallas_call(
                functools.partial(_cost_kernel, consts=consts),
                grid=(n_tiles,),
                in_specs=[smem, smem, uprev_spec, cols_spec, mats_spec],
                out_specs=(s_spec, part_spec, part_spec),
                out_shape=(s_shape, part_shape, part_shape),
                interpret=interpret,
            )(seed_arr, sc, u_prev, cols, mats)
        else:
            noise = sampling.sample_noise(
                sub, k_local, h, A_TOTAL, sigma_live, jnp.float32
            )
            noise_t = noise.reshape(n_tiles, tile, h, A_TOTAL).transpose(0, 3, 2, 1)
            s, m_part, e_part = pl.pallas_call(
                functools.partial(_cost_kernel_noise, consts=consts),
                grid=(n_tiles,),
                in_specs=[noise_spec, smem, uprev_spec, cols_spec, mats_spec],
                out_specs=(s_spec, part_spec, part_spec),
                out_shape=(s_shape, part_shape, part_shape),
                interpret=interpret,
            )(noise_t, sc, u_prev, cols, mats)

        # Softmin normalizers from the per-tile logsumexp partials: the XLA
        # glue reduces length-n_tiles vectors, never the full (K,) costs.
        m_i = m_part[:, 0]
        e_i = e_part[:, 0]
        rho = jnp.min(m_i)
        if axis_name is not None:
            rho = jax.lax.pmin(rho, axis_name)
        eta = jnp.sum(e_i * jnp.exp((rho - m_i) / cfg.lam))
        if axis_name is not None:
            eta = jax.lax.psum(eta, axis_name)

        if bench_pass == "cost":
            # Instrumentation (benchmarks/kernel_split.py): stop after pass
            # 1 + the softmin normalizers, returning a rho-dependent dummy
            # so the cost pass cannot be dead-code-eliminated.  The key
            # advances, so scan-based timing draws fresh noise per solve
            # (LICM cannot hoist the kernel out of the loop).
            u_dummy = jnp.full((h, A_TOTAL), rho / jnp.maximum(eta, 1e-30))
            return u_dummy, MPPIState(
                u_prev=state.u_prev, key=key, sigma=state.sigma
            )

        # Single-chip production path: pass 2 also absorbs the update tail
        # (weights, tile reduction, SavGol smoothing, clamp, warm-start
        # decay) — zero per-(K,) XLA work between or after the passes.  The
        # sharded path keeps the explicit tail: du must cross the psum
        # BEFORE smoothing, preserving the pinned 3-collective contract.
        fused_tail = axis_name is None and not cfg.shift_warm_start
        if fused_tail:
            se = jnp.stack([rho, eta]).astype(jnp.float32)
            tail_shapes = (
                jax.ShapeDtypeStruct((1, A_TOTAL * h), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, A_TOTAL), jnp.float32),
            )
            du1_spec = pl.BlockSpec(
                (1, A_TOTAL * h), lambda i: (0, 0), memory_space=vm
            )
            if noise_t is not None:
                du_row, m2_part = pl.pallas_call(
                    functools.partial(_update_kernel_fused_noise, consts=consts),
                    grid=(n_tiles,),
                    in_specs=[noise_spec, smem, s_spec],
                    out_specs=(du1_spec, m2_spec),
                    out_shape=tail_shapes,
                    interpret=interpret,
                )(noise_t, se, s)
            elif use_prng:
                du_row, m2_part = pl.pallas_call(
                    functools.partial(_update_kernel_fused, consts=consts),
                    grid=(n_tiles,),
                    in_specs=[smem, smem, smem, s_spec],
                    out_specs=(du1_spec, m2_spec),
                    out_shape=tail_shapes,
                    interpret=interpret,
                )(seed_arr, sc, se, s)
            else:
                du_row, m2_part = pl.pallas_call(
                    functools.partial(_update_kernel_fused_noise, consts=consts),
                    grid=(n_tiles,),
                    in_specs=[noise_spec, smem, s_spec],
                    out_specs=(du1_spec, m2_spec),
                    out_shape=tail_shapes,
                    interpret=interpret,
                )(noise_t, se, s)
            du = du_row.reshape(A_TOTAL, h).T  # (H, A)
            if cfg.savgol_window:
                du = savgol.smooth(du, cfg.savgol_window, cfg.savgol_polyorder)
            u = u_prev + du
            if u_lo is not None or u_hi is not None:
                u = jnp.clip(u, u_lo, u_hi)
            warm = u
            if cfg.warm_start_decay < 1.0:
                warm = nominal + cfg.warm_start_decay * (u - nominal)
        else:
            w = jnp.exp((rho - s.reshape(-1)) / cfg.lam) / eta
            w_tiles = w.reshape(n_tiles, tile)

            out_shapes = (
                jax.ShapeDtypeStruct((n_tiles, A_TOTAL * h), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, A_TOTAL), jnp.float32),
            )
            if use_prng and noise_t is None:
                du_part, m2_part = pl.pallas_call(
                    functools.partial(_update_kernel, consts=consts),
                    grid=(n_tiles,),
                    in_specs=[smem, smem, w_spec],
                    out_specs=(du_spec, m2_spec),
                    out_shape=out_shapes,
                    interpret=interpret,
                )(seed_arr, sc, w_tiles)
            else:
                du_part, m2_part = pl.pallas_call(
                    functools.partial(_update_kernel_noise, consts=consts),
                    grid=(n_tiles,),
                    in_specs=[noise_spec, w_spec],
                    out_specs=(du_spec, m2_spec),
                    out_shape=out_shapes,
                    interpret=interpret,
                )(noise_t, w_tiles)

            du = jnp.sum(du_part, axis=0)
            if axis_name is not None:
                du = jax.lax.psum(du, axis_name)
            du = du.reshape(A_TOTAL, h).T  # (H, A)
            if cfg.savgol_window:
                du = savgol.smooth(du, cfg.savgol_window, cfg.savgol_polyorder)
            u = u_prev + du
            if u_lo is not None or u_hi is not None:
                u = jnp.clip(u, u_lo, u_hi)

            warm = (jnp.concatenate([u[1:], u[-1:]], axis=0)
                    if cfg.shift_warm_start else u)
            if cfg.warm_start_decay < 1.0:
                warm = nominal + cfg.warm_start_decay * (warm - nominal)

        sigma_next = state.sigma
        if cfg.adaptive_sigma:
            m2 = jnp.sum(m2_part, axis=0) / h
            if axis_name is not None:
                m2 = jax.lax.psum(m2, axis_name)
            var = (1.0 - cfg.adapt_beta) * state.sigma**2 + cfg.adapt_beta * m2
            sigma_next = jnp.clip(
                jnp.sqrt(var),
                cfg.sigma_min_scale * sigma_base,
                cfg.sigma_max_scale * sigma_base,
            )
        return u, MPPIState(u_prev=warm, key=key, sigma=sigma_next)

    return step
