"""Independent NumPy oracle of the reference solver math, for golden tests.

Implements the algorithms of
``/root/reference/src/mav_mppi/scripts/{mppi_solver,sampling,filter,cost}``
from their mathematical definitions in float64 NumPy (structured differently
from both the reference and the framework under test).  Tests drive the JAX
implementation and this oracle with identical injected noise and compare —
SURVEY.md section 4's strategy (b).
"""

from __future__ import annotations

import numpy as np


# --- sampling / kinematic rollout (standard_normal_noise.py:32-50) ----------

def double_integrate(accel, q0, v0, dt):
    """accel: (K, H, A); returns (q, v) with the reference's update order."""
    k, h, a = accel.shape
    q = np.zeros_like(accel)
    v = np.zeros_like(accel)
    v_run = np.broadcast_to(v0, (k, a)).copy()
    q_run = np.broadcast_to(q0, (k, a)).copy()
    for t in range(h):
        v_prev = v_run.copy()
        v_run = v_run + accel[:, t] * dt
        q_run = q_run + v_prev * dt + 0.5 * accel[:, t] * dt * dt
        q[:, t] = q_run
        v[:, t] = v_run
    return q, v


# --- softmin weights (mppi.py:173-193) --------------------------------------

def softmin_weights(s, lam):
    rho = s.min()
    w = np.exp(-(s - rho) / lam)
    return w / w.sum()


# --- Savitzky-Golay with reflect-flip padding (svg_filter.py:13-90) ---------

def savgol(seq, window, polyorder):
    """seq: (H, A). Direct per-column convolution implementation."""
    half = window // 2
    x = np.arange(-half, half + 1, dtype=np.float64)
    a = np.stack([x**i for i in range(polyorder + 1)], axis=1)
    coeffs = (np.linalg.inv(a.T @ a) @ a.T)[0]
    out = np.zeros_like(seq)
    for col in range(seq.shape[1]):
        data = seq[:, col]
        padded = np.concatenate([data[:half][::-1], data, data[-half:][::-1]])
        # conv1d with flipped kernel == correlation with coeffs (symmetric).
        for t in range(len(data)):
            out[t, col] = np.dot(coeffs, padded[t : t + window])
    return out


# --- rotation helpers (textbook; convention: wxyz) --------------------------

def quat_to_matrix(q):
    w, x, y, z = q / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def matrix_to_euler_zyx(m):
    """R = Rz(a) Ry(b) Rx(c) -> (a, b, c)."""
    b = np.arcsin(np.clip(-m[2, 0], -1, 1))
    a = np.arctan2(m[1, 0], m[0, 0])
    c = np.arctan2(m[2, 1], m[2, 2])
    return np.array([a, b, c])


# --- pose costs (pose_cost.py:24-63) ----------------------------------------

def pose_costs(ee_pos, ee_rot, target_pos, target_rot, w_sp, w_so, w_tp, w_to):
    """ee_pos: (K, H, 3); ee_rot: (K, H, 3, 3). Returns S (K,)."""
    k, h = ee_pos.shape[:2]
    s = np.zeros(k)
    for ki in range(k):
        for t in range(h):
            dp = np.linalg.norm(ee_pos[ki, t] - target_pos)
            err = ee_rot[ki, t].T @ target_rot
            do = np.linalg.norm(matrix_to_euler_zyx(err))
            if t < h - 1:
                s[ki] += w_sp * dp + w_so * do
            else:
                s[ki] += w_tp * dp + w_to * do
    return s


# --- drone costs (drone_mppi.py:87-107) -------------------------------------

def drone_costs(traj, target, w_stage=100.0, w_term=20.0):
    s = w_stage * ((traj[:, :-1, :] - target) ** 2).sum(axis=(1, 2))
    s = s + w_term * ((traj[:, -1, :] - target) ** 2).sum(axis=1)
    return s


# --- full arm MPPI update (mppi.py:122-162) ---------------------------------

def arm_mppi_update(u_prev, noise, q0, qdot0, fk_fn, target_pos, target_rot,
                    dt=0.01, lam=0.1,
                    w_sp=50.0, w_so=30.0, w_tp=40.0, w_to=30.0,
                    savgol_window=9):
    """One arm solve with injected noise.  fk_fn(q (7,)) -> 4x4 world pose.

    Returns (u_new, qdes, vdes) with the reference's exact update order,
    including its use of the previous plan's first acceleration in the
    position integration (mppi.py:156-158).
    """
    k, h, a = noise.shape
    qddot_prev = u_prev[0].copy()
    v = u_prev[None] + noise
    q, _ = double_integrate(v, q0, qdot0, dt)

    ee_pos = np.zeros((k, h, 3))
    ee_rot = np.zeros((k, h, 3, 3))
    for ki in range(k):
        for t in range(h):
            m = fk_fn(q[ki, t])
            ee_pos[ki, t] = m[:3, 3]
            ee_rot[ki, t] = m[:3, :3]

    s = pose_costs(ee_pos, ee_rot, target_pos, target_rot, w_sp, w_so, w_tp, w_to)
    w = softmin_weights(s, lam)
    du = (w[:, None, None] * noise).sum(axis=0)
    du = savgol(du, savgol_window, 2)
    u = u_prev + du
    vdes = qdot0 + u[0] * dt
    qdes = q0 + qddot_prev * dt + 0.5 * u[0] * dt * dt
    return u, qdes, vdes


# --- full drone MPPI update (drone_mppi.py:140-176) -------------------------

def drone_mppi_update(u_prev, noise, x0, v0, target, dt=0.01, lam=0.1):
    """One solve with injected noise. Returns (u_new, xdes, vdes)."""
    v = u_prev[None] + noise
    traj, _ = double_integrate(v, x0, v0, dt)
    s = drone_costs(traj, target)
    w = softmin_weights(s, lam)
    du = (w[:, None, None] * noise).sum(axis=0)
    du = savgol(du, 5, 2)
    u = u_prev + du
    vdes = v0 + dt * u[0]
    xdes = x0 + v0 * dt + 0.5 * u[0] * dt * dt
    return u, xdes, vdes
