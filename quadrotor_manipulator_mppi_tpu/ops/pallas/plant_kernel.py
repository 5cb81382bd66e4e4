"""Fused PLANT-TICK kernel: one Pallas call runs a full control period of
1 kHz whole-body plant physics on the TPU scalar unit.

Why: the jitted closed-loop episode spends ~0.3 of its 0.89 ms/step on the
10 physics substeps — hundreds of TINY sequential XLA ops (3-vector
arithmetic, 7x7 einsums, backstepping scalars) each paying device per-op
latency.  The math is pure scalar recurrence, so it maps onto Mosaic's
scalar core: all state lives in SMEM, every operation below is a scalar
expression, and the whole 10-substep loop is one ``fori_loop`` inside one
kernel (feasibility measured by ``benchmarks/probe_scalar_kernel.py``:
scalar sin/sqrt/exp/where/fori_loop agree exactly with XLA on v5e).

Scope = the SERVING configuration of ``sim/whole_body_loop``:

* position-cascade control mode (backstepping inner loop,
  ``controller.cpp:443-584`` behavior via ``sim/flight_control``),
* frozen-coefficient arm dynamics (``models/rigid_body.frozen_arm_coeffs``
  — the coefficients are kernel INPUTS, extracted once per control period
  outside),
* free flight (no wind/contact/graspable — those paths stay on XLA).

Everything is a behavioral twin of the XLA ``physics_tick`` in
``sim/whole_body_loop.make_whole_body_episode`` (same integrator order,
same clamps, same small-angle branches); parity is tested to float
tolerance in ``tests/test_plant_kernel.py`` and the episode factory swaps
it in under ``WholeBodyLoopConfig.plant_kernel``.

State vector layout (SMEM f32, ``STATE_SIZE``):
    [0:3]   base world position        [3:7]   base quaternion wxyz
    [7:10]  base world velocity        [10:13] body rates
    [13:21] rotor speeds (8)           [21:28] arm q
    [28:35] arm qdot                   [35:38] ctrl int_err
    [38:41] ctrl prev_err              [41:44] ctrl m_hat
    [44:46] ctrl n_hat

Dynamics-coefficient vector (``DYN_SIZE``): minv (49) | g_tau (21) |
g_n (9) | c_tau (343) — the FrozenArmCoeffs fields the substeps consume.
Command vector: [setpoint xyz, yaw_des].  Arm torque: (7,) held constant
over the period (the 100 Hz tracking law's output, kinova.py:184).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_J = 7
N_R = 8
STATE_SIZE = 46
DYN_SIZE = 49 + 21 + 9 + 343

_ATAN_COEFFS = (0.99999946, -0.33330107, 0.1994851, -0.13915803,
                0.09728062, -0.05680616, 0.02096637, -0.00391525)


def _atan_poly(t):
    t2 = t * t
    p = _ATAN_COEFFS[-1]
    for coef in _ATAN_COEFFS[-2::-1]:
        p = coef + t2 * p
    return t * p


def _atan2(y, x):
    """Full-quadrant scalar atan2 via octant reduction + the minimax poly
    (Mosaic lowers no inverse trig; same coefficients as the whole-body
    kernel's first-quadrant helper)."""
    ay, ax = jnp.abs(y), jnp.abs(x)
    num = jnp.minimum(ay, ax)
    den = jnp.maximum(ay, ax)
    a = _atan_poly(num / (den + 1e-30))
    a = jnp.where(ay > ax, (np.pi / 2) - a, a)
    a = jnp.where(x < 0.0, np.pi - a, a)
    return jnp.where(y < 0.0, -a, a)


def _asin(x):
    x = jnp.clip(x, -1.0, 1.0)
    return _atan2(x, jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0)))


def pack_plant(plant) -> jax.Array:
    """WholeBodyPlant -> the (STATE_SIZE,) kernel state vector."""
    b, c = plant.base, plant.ctrl
    return jnp.concatenate([
        b.pos, b.quat, b.vel, b.omega, b.rotor_speed, plant.q, plant.qdot,
        c.int_err, c.prev_err, c.m_hat, c.n_hat,
    ]).astype(jnp.float32)


def unpack_plant(vec, plant_template):
    """Kernel state vector -> WholeBodyPlant (same pytree types)."""
    b = plant_template.base._replace(
        pos=vec[0:3], quat=vec[3:7], vel=vec[7:10], omega=vec[10:13],
        rotor_speed=vec[13:21],
    )
    c = plant_template.ctrl._replace(
        int_err=vec[35:38], prev_err=vec[38:41], m_hat=vec[41:44],
        n_hat=vec[44:46],
    )
    return plant_template._replace(base=b, q=vec[21:28], qdot=vec[28:35],
                                   ctrl=c)


def pack_dyn(dyn) -> jax.Array:
    """FrozenArmCoeffs -> the (DYN_SIZE,) coefficient vector."""
    return jnp.concatenate([
        dyn.minv.reshape(-1), dyn.g_tau.reshape(-1), dyn.g_n.reshape(-1),
        dyn.c_tau.reshape(-1),
    ]).astype(jnp.float32)


def make_plant_tick_kernel(vehicle, gains, spec, *, substeps: int = 10,
                           dt: float = 0.001, extra_mass: float,
                           interpret: bool = False):
    """Build ``tick(state_vec, dyn_vec, cmd4, tau7) -> state_vec'`` running
    ``substeps`` physics steps of the position-mode serving plant in one
    Pallas call."""
    ixx, iyy, izz = (float(v) for v in vehicle.inertia)
    mass = float(vehicle.mass) + float(extra_mass)
    xlen, ylen = float(vehicle.xlen), float(vehicle.ylen)
    alloc = [[float(v) for v in row] for row in vehicle.allocation_matrix()]
    pinv = [[float(v) for v in row] for row in vehicle.allocation_pinv()]
    a_up = float(np.exp(-dt / vehicle.time_constant_up))
    a_dn = float(np.exp(-dt / vehicle.time_constant_down))
    w_max = float(vehicle.max_rotor_speed)
    c_drag = float(vehicle.rotor_drag_coefficient)
    c_roll = float(vehicle.rolling_moment_coefficient)
    ground_z = float(vehicle.ground_z)
    q_lo = [float(v) for v in spec.lower]
    q_hi = [float(v) for v in spec.upper]
    g = gains

    def kernel(s_ref, d_ref, cmd_ref, tau_ref, o_ref):
        # Hoist every input scalar out of the substep loop.
        minv = [[d_ref[i * N_J + j] for j in range(N_J)] for i in range(N_J)]
        off = 49
        g_tau = [[d_ref[off + i * 3 + j] for j in range(3)] for i in range(N_J)]
        off += 21
        g_n = [[d_ref[off + i * 3 + j] for j in range(3)] for i in range(3)]
        off += 9
        c_tau = [[[d_ref[off + (i * N_J + j) * N_J + k] for k in range(N_J)]
                  for j in range(N_J)] for i in range(N_J)]
        sp = [cmd_ref[0], cmd_ref[1], cmd_ref[2]]
        yaw_des = cmd_ref[3]
        tau_arm = [tau_ref[j] for j in range(N_J)]
        state0 = tuple(s_ref[i] for i in range(STATE_SIZE))

        def substep(_, s):
            (px, py, pz, qw, qx, qy, qz, vx, vy, vz, wr, wp, wy,
             *rest) = s
            rotor = list(rest[0:N_R])
            q = list(rest[N_R:N_R + N_J])
            qd = list(rest[N_R + N_J:N_R + 2 * N_J])
            ie = list(rest[N_R + 2 * N_J:N_R + 2 * N_J + 3])
            pe = list(rest[N_R + 2 * N_J + 3:N_R + 2 * N_J + 6])
            mh = list(rest[N_R + 2 * N_J + 6:N_R + 2 * N_J + 9])
            nh = list(rest[N_R + 2 * N_J + 9:N_R + 2 * N_J + 11])

            # --- frozen arm dynamics (rigid_body.frozen_* semantics) -----
            a0 = [9.81 * 2.0 * (qx * qz - qw * qy),
                  9.81 * 2.0 * (qy * qz + qw * qx),
                  9.81 * (1.0 - 2.0 * (qx * qx + qy * qy))]
            nle = []
            for i in range(N_J):
                acc_s = (g_tau[i][0] * a0[0] + g_tau[i][1] * a0[1]
                         + g_tau[i][2] * a0[2])
                for j in range(N_J):
                    row = c_tau[i][j]
                    acc_s += qd[j] * (row[0] * qd[0] + row[1] * qd[1]
                                      + row[2] * qd[2] + row[3] * qd[3]
                                      + row[4] * qd[4] + row[5] * qd[5]
                                      + row[6] * qd[6])
                nle.append(acc_s)
            rhs = [tau_arm[i] - nle[i] for i in range(N_J)]
            qdd = [sum(minv[i][j] * rhs[j] for j in range(N_J))
                   for i in range(N_J)]
            qd_n, q_n = [], []
            for j in range(N_J):
                qdj = qd[j] + qdd[j] * dt
                qraw = q[j] + qdj * dt
                qcl = jnp.clip(qraw, q_lo[j], q_hi[j])
                at_stop = jnp.logical_or(qraw < q_lo[j], qraw > q_hi[j])
                qd_n.append(jnp.where(at_stop, 0.0, qdj))
                q_n.append(qcl)
            # Arm gravity moment on the base (frozen_gravity_torque_on_base).
            tg = [-(g_n[i][0] * a0[0] + g_n[i][1] * a0[1] + g_n[i][2] * a0[2])
                  for i in range(3)]

            # --- attitude (ZYX euler from the quaternion's R) ------------
            m00 = 1.0 - 2.0 * (qy * qy + qz * qz)
            m10 = 2.0 * (qx * qy + qw * qz)
            m20 = 2.0 * (qx * qz - qw * qy)
            m21 = 2.0 * (qy * qz + qw * qx)
            m22 = 1.0 - 2.0 * (qx * qx + qy * qy)
            roll = _atan2(m21, m22)
            pitch = _asin(-m20)
            yaw = _atan2(m10, m00)

            # --- adaptive backstepping (flight_control.backstepping_step) -
            err = [sp[0] - px, sp[1] - py, sp[2] - pz]
            integ = [ie[i] + 0.5 * (err[i] + pe[i]) * dt for i in range(3)]
            e5, p5 = err[2], integ[2]
            e6 = g.kp_z * e5 + g.ki_z * p5 - vz
            az = (9.81 + g.ki_z * e5
                  + g.kp_z * (-g.kp_z * e5 - g.ki_z * p5 + e6)
                  + e5 + g.kd_z * e6)
            mz = mh[2] + 3.0 * e6 * az * dt
            u1 = (mz / (jnp.cos(roll) * jnp.cos(pitch))) * az

            def lateral(e, pint, v, kp, ki, kd, m_prev):
                e2 = kp * e + ki * pint - v
                a = (ki * e - kp * kp * e - ki * kp * pint + kp * e2
                     + e + kd * e2)
                m_new = m_prev + 2.0 * e2 * a * dt
                return (m_new / u1) * a, m_new

            ux, mx = lateral(err[0], integ[0], vx, g.kp_x, g.ki_x, g.kd_x,
                             mh[0])
            uy, my = lateral(err[1], integ[1], vy, g.kp_y, g.ki_y, g.kd_y,
                             mh[1])
            alpha, beta = jnp.cos(yaw_des), jnp.sin(yaw_des)
            v1 = alpha * ux + beta * uy
            v2 = beta * ux - alpha * uy
            sphi = jnp.clip(v2, -1.0, 1.0)
            cphi = jnp.sqrt(1.0 - sphi * sphi)
            roll_des = _atan2(sphi, cphi)
            v1 = v1 / jnp.cos(roll_des)
            stheta = jnp.clip(v1, -1.0, 1.0)
            ctheta = jnp.sqrt(1.0 - stheta * stheta)
            pitch_des = _atan2(stheta, ctheta)

            z1 = roll - roll_des
            z2 = wr - (0.0 - g.kp_roll * z1)
            nx = nh[0] + 3.0 * z2 * dt
            u2 = (ixx / ylen) * (
                -g.kp_roll * (z2 - g.kp_roll * z1) - z1 - g.kd_roll * z2
                - nx - xlen * tg[0] / ixx
            ) + (1.0 / ylen) * ((izz - iyy) * wp * wy)
            z3 = pitch - pitch_des
            z4 = wp - (0.0 - g.kp_pitch * z3)
            ny = nh[1] + 3.0 * z4 * dt
            u3 = (iyy / xlen) * (
                -g.kp_pitch * (z4 - g.kd_pitch * z3) - z3 - g.kd_pitch * z4
                - ny - ylen * tg[1] / iyy
            ) + (1.0 / xlen) * ((ixx - izz) * wr * wy)
            z5 = yaw - yaw_des
            z6 = wy - (0.0 - g.kp_yaw * z5)
            u4 = izz * (
                -g.kp_yaw * (z6 - g.kd_yaw * z5) - z5 - g.kd_yaw * z6
                - tg[2] / izz
            ) + (iyy - ixx) * wr * wp

            # --- allocation + asymmetric rotor lag -----------------------
            taut = [u2, u3, u4, u1]
            rotor_n = []
            for r in range(N_R):
                w2 = (pinv[r][0] * taut[0] + pinv[r][1] * taut[1]
                      + pinv[r][2] * taut[2] + pinv[r][3] * taut[3])
                wcmd = jnp.sqrt(jnp.maximum(w2, 0.0))
                wcmd = jnp.minimum(jnp.maximum(wcmd, 0.0), w_max)
                al = jnp.where(wcmd > rotor[r], a_up, a_dn)
                rotor_n.append(al * rotor[r] + (1.0 - al) * wcmd)

            # --- rotor wrench (wrench_from_rotors) -----------------------
            w2s = [rr * rr for rr in rotor_n]
            t_r = sum(alloc[0][r] * w2s[r] for r in range(N_R))
            t_p = sum(alloc[1][r] * w2s[r] for r in range(N_R))
            t_y = sum(alloc[2][r] * w2s[r] for r in range(N_R))
            thrust = sum(alloc[3][r] * w2s[r] for r in range(N_R))
            absw = sum(jnp.abs(rr) for rr in rotor_n)
            # body-frame airspeed (R^T v); z-component zeroed for drag
            vbx = m00 * vx + m10 * vy + m20 * vz
            vby = ((2.0 * (qx * qy - qw * qz)) * vx
                   + (1.0 - 2.0 * (qx * qx + qz * qz)) * vy + m21 * vz)
            fx = -c_drag * absw * vbx
            fy = -c_drag * absw * vby
            fz = thrust
            tq_r = t_r - c_roll * absw * vbx + tg[0]
            tq_p = t_p - c_roll * absw * vby + tg[1]
            tq_y = t_y + tg[2]

            # --- rigid-body integration (multirotor.step) ----------------
            m01 = 2.0 * (qx * qy - qw * qz)
            m02 = 2.0 * (qx * qz + qw * qy)
            m11 = 1.0 - 2.0 * (qx * qx + qz * qz)
            m12 = 2.0 * (qy * qz - qw * qx)
            ax = (m00 * fx + m01 * fy + m02 * fz) / mass
            ay = (m10 * fx + m11 * fy + m12 * fz) / mass
            az_w = (m20 * fx + m21 * fy + m22 * fz) / mass - 9.81
            wdx = (tq_r - (wp * (izz * wy) - wy * (iyy * wp))) / ixx
            wdy = (tq_p - (wy * (ixx * wr) - wr * (izz * wy))) / iyy
            wdz = (tq_y - (wr * (iyy * wp) - wp * (ixx * wr))) / izz
            vx_n, vy_n, vz_n = vx + ax * dt, vy + ay * dt, vz + az_w * dt
            px_n, py_n = px + vx_n * dt, py + vy_n * dt
            pz_n = pz + vz_n * dt
            wr_n, wp_n, wy_n = wr + wdx * dt, wp + wdy * dt, wy + wdz * dt
            # inelastic ground clamp (free-flight fallback of mr.step)
            on_g = pz_n <= ground_z
            pz_n = jnp.maximum(pz_n, ground_z)
            vx_n = jnp.where(on_g, 0.0, vx_n)
            vy_n = jnp.where(on_g, 0.0, vy_n)
            vz_n = jnp.where(on_g, jnp.maximum(vz_n, 0.0), vz_n)
            wr_n = jnp.where(on_g, 0.0, wr_n)
            wp_n = jnp.where(on_g, 0.0, wp_n)
            wy_n = jnp.where(on_g, 0.0, wy_n)
            # quaternion update (quat_from_axis_angle + multiply + normalize)
            aax, aay, aaz = wr_n * dt, wp_n * dt, wy_n * dt
            ang = jnp.sqrt(aax * aax + aay * aay + aaz * aaz)
            half = 0.5 * ang
            scale = jnp.where(ang > 1e-6,
                              jnp.sin(half) / jnp.maximum(ang, 1e-12),
                              0.5 - ang * ang / 48.0)
            dw, dx_, dy_, dz_ = (jnp.cos(half), aax * scale, aay * scale,
                                 aaz * scale)
            nqw = qw * dw - qx * dx_ - qy * dy_ - qz * dz_
            nqx = qw * dx_ + qx * dw + qy * dz_ - qz * dy_
            nqy = qw * dy_ - qx * dz_ + qy * dw + qz * dx_
            nqz = qw * dz_ + qx * dy_ - qy * dx_ + qz * dw
            nrm = jnp.maximum(
                jnp.sqrt(nqw * nqw + nqx * nqx + nqy * nqy + nqz * nqz),
                1e-12,
            )
            nqw, nqx, nqy, nqz = nqw / nrm, nqx / nrm, nqy / nrm, nqz / nrm

            return (px_n, py_n, pz_n, nqw, nqx, nqy, nqz, vx_n, vy_n, vz_n,
                    wr_n, wp_n, wy_n, *rotor_n, *q_n, *qd_n,
                    *integ, *err, mx, my, mz, nx, ny)

        out = jax.lax.fori_loop(0, substeps, substep, state0)
        for i in range(STATE_SIZE):
            o_ref[i] = out[i]

    def tick(state_vec, dyn_vec, cmd4, tau7):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((STATE_SIZE,), jnp.float32),
            interpret=interpret,
        )(state_vec.astype(jnp.float32), dyn_vec.astype(jnp.float32),
          cmd4.astype(jnp.float32), tau7.astype(jnp.float32))

    return tick
