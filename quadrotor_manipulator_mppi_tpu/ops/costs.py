"""MPPI cost library: every term the reference defines, as pure functions.

Parity map (all under ``/root/reference/src/mav_mppi/scripts/cost/``):

* :func:`pose_stage_cost` / :func:`pose_terminal_cost`   <- ``pose_cost.py:24-63``
* :func:`covariance_cost`                                <- ``covar_cost.py:20-26``
* :func:`action_cost`                                    <- ``action_cost.py:15-25``
* :func:`centering_cost` / :func:`joint_tracking_cost` /
  :func:`joint_limit_cost`                               <- ``joint_space_cost.py:18-80``
* :func:`gaussian_projected_dist_cost`                   <- ``dist_cost.py:34-47`` (STORM-style)
* :func:`position_stage_cost` / :func:`position_terminal_cost`
                                                         <- ``drone_mppi.py:87-107``

Terms the reference keeps wired-but-disabled (``cost_manager.py:83-87``) are
first-class here and toggled by their weights in :class:`ArmCostParams`.

Conventions: sample trajectories carry shape [..., K, H, A] (or (K, H) pose
batches); every term returns the per-sample cost S with shape [..., K].
Orientation errors use R^T (transpose) instead of the reference's
``torch.linalg.inv`` on rotation matrices — exact and cheaper — and support
both the reference's ZYX-euler-vector norm and the cleaner so(3) log norm.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import rotations as rot

Array = jax.Array


def _discount(gamma: float, horizon: int, dtype) -> Array:
    return jnp.asarray(gamma, dtype) ** jnp.arange(horizon, dtype=dtype)


# ---------------------------------------------------------------------------
# End-effector pose costs
# ---------------------------------------------------------------------------

def orientation_error_norm(
    ee_rot: Array, target_rot: Array, mode: str = "euler_zyx"
) -> Array:
    """|error(R, R*)| per element of the batch.

    ``euler_zyx`` reproduces the reference's metric — L2 norm of the ZYX euler
    extraction of the error rotation (``pose_cost.py:32-37``); ``log`` uses
    the geodesic rotation-vector norm (smooth at gimbal lock, preferred for
    new configs).
    """
    err = jnp.swapaxes(ee_rot, -1, -2) @ target_rot
    if mode == "euler_zyx":
        vec = rot.matrix_to_euler(err, "ZYX")
    elif mode == "log":
        vec = rot.matrix_to_axis_angle(err)
    else:
        raise ValueError(f"unknown orientation error mode {mode!r}")
    return jnp.linalg.norm(vec, axis=-1)


def orientation_error_norm_quat(
    ee_quat: Array, target_quat: Array, mode: str = "euler_zyx"
) -> Array:
    """Quaternion-path orientation error — identical metric to
    :func:`orientation_error_norm` but with zero batched matmuls: the error
    rotation is conj(q_ee) * q_target (elementwise), converted to the chosen
    vector without any ``dot_general`` (TPU: tiny batched matmuls pad the MXU
    catastrophically; see models/chain.forward_kinematics_posquat)."""
    err_q = rot.quat_multiply(rot.quat_conjugate(ee_quat), target_quat)
    if mode == "euler_zyx":
        vec = rot.matrix_to_euler(rot.quat_to_matrix(err_q), "ZYX")
    elif mode == "log":
        vec = rot.quat_to_axis_angle(err_q)
    else:
        raise ValueError(f"unknown orientation error mode {mode!r}")
    return jnp.linalg.norm(vec, axis=-1)


def pose_stage_cost_pq(
    ee_pos: Array,
    ee_quat: Array,
    target_pos: Array,
    target_quat: Array,
    w_pos: float,
    w_ori: float,
    ori_mode: str = "euler_zyx",
) -> Array:
    """Position+quaternion variant of :func:`pose_stage_cost`."""
    dp = jnp.linalg.norm(ee_pos[..., :-1, :] - target_pos, axis=-1)
    dori = orientation_error_norm_quat(
        ee_quat[..., :-1, :], target_quat, ori_mode
    )
    return jnp.sum(w_pos * dp + w_ori * dori, axis=-1)


def pose_terminal_cost_pq(
    ee_pos: Array,
    ee_quat: Array,
    target_pos: Array,
    target_quat: Array,
    w_pos: float,
    w_ori: float,
    ori_mode: str = "euler_zyx",
) -> Array:
    """Position+quaternion variant of :func:`pose_terminal_cost`."""
    dp = jnp.linalg.norm(ee_pos[..., -1, :] - target_pos, axis=-1)
    dori = orientation_error_norm_quat(ee_quat[..., -1, :], target_quat, ori_mode)
    return w_pos * dp + w_ori * dori


def pose_stage_cost(
    ee_pos: Array,
    ee_rot: Array,
    target_pos: Array,
    target_rot: Array,
    w_pos: float,
    w_ori: float,
    ori_mode: str = "euler_zyx",
) -> Array:
    """Sum over t = 0..H-2 of w_pos*|dp|_2 + w_ori*|dori| (``pose_cost.py:24-44``;
    its per-step discount is present-but-commented in the reference and
    likewise omitted here).

    ee_pos: [..., H, 3]; ee_rot: [..., H, 3, 3]. Targets broadcast.
    """
    dp = jnp.linalg.norm(ee_pos[..., :-1, :] - target_pos, axis=-1)
    dori = orientation_error_norm(ee_rot[..., :-1, :, :], target_rot, ori_mode)
    return jnp.sum(w_pos * dp + w_ori * dori, axis=-1)


def pose_terminal_cost(
    ee_pos: Array,
    ee_rot: Array,
    target_pos: Array,
    target_rot: Array,
    w_pos: float,
    w_ori: float,
    ori_mode: str = "euler_zyx",
) -> Array:
    """Terminal-step pose cost (``pose_cost.py:46-63``)."""
    dp = jnp.linalg.norm(ee_pos[..., -1, :] - target_pos, axis=-1)
    dori = orientation_error_norm(ee_rot[..., -1, :, :], target_rot, ori_mode)
    return w_pos * dp + w_ori * dori


# ---------------------------------------------------------------------------
# Point-position costs (drone MPPI)
# ---------------------------------------------------------------------------

def position_stage_cost(traj: Array, target: Array, weight: float) -> Array:
    """weight * sum_{t<H-1} |p_t - p*|^2  (``drone_mppi.py:87-96``)."""
    err = traj[..., :-1, :] - target
    return weight * jnp.sum(err * err, axis=(-1, -2))


def position_terminal_cost(traj: Array, target: Array, weight: float) -> Array:
    """weight * |p_{H-1} - p*|^2  (``drone_mppi.py:98-107``)."""
    err = traj[..., -1, :] - target
    return weight * jnp.sum(err * err, axis=-1)


# ---------------------------------------------------------------------------
# Control-space costs
# ---------------------------------------------------------------------------

def covariance_cost(
    u: Array,
    v: Array,
    sigma_inv: Array,
    weight: float,
    lam: float,
    alpha: float,
) -> Array:
    """Information-theoretic MPPI cross term
    weight * lambda*(1-alpha) * sum_t u_t^T Sigma^-1 v_t  (``covar_cost.py:20-26``).

    u: (H, A) nominal controls; v: [..., K, H, A] perturbed samples;
    sigma_inv: (A, A) — precomputed once, not inverted per call as the
    reference does (``covar_cost.py:22``).
    """
    gamma_p = lam * (1.0 - alpha)
    quad = jnp.einsum("ha,ab,...khb->...kh", u, sigma_inv, v)
    return weight * gamma_p * jnp.sum(quad, axis=-1)


def action_cost(v: Array, weight: float, gamma: float) -> Array:
    """weight * sum_t gamma^t |u_t|^2  (``action_cost.py:15-25``)."""
    h = v.shape[-2]
    g = _discount(gamma, h, v.dtype)
    return weight * jnp.sum(jnp.sum(v * v, axis=-1) * g, axis=-1)


# ---------------------------------------------------------------------------
# Joint-space costs
# ---------------------------------------------------------------------------

def centering_cost(q: Array, q_center: Array, weight: float, gamma: float) -> Array:
    """Keep joints near mid-range (``joint_space_cost.py:18-26``)."""
    h = q.shape[-2]
    g = _discount(gamma, h, q.dtype)
    d = q - q_center
    return weight * jnp.sum(jnp.sum(d * d, axis=-1) * g, axis=-1)


def joint_tracking_cost(q: Array, q_ref: Array, weight: float, gamma: float) -> Array:
    """Track a reference joint trajectory (``joint_space_cost.py:29-39``)."""
    h = q.shape[-2]
    g = _discount(gamma, h, q.dtype)
    d = q - q_ref
    return weight * jnp.sum(jnp.sum(d * d, axis=-1) * g, axis=-1)


def joint_limit_cost(
    q: Array,
    lower: Array,
    upper: Array,
    gamma: float,
    penalty: float = 1e10,
) -> Array:
    """Hard out-of-bounds penalty per offending step
    (``joint_space_cost.py:59-80``: any-joint-violation mask * 1e10, gamma-discounted)."""
    h = q.shape[-2]
    g = _discount(gamma, h, q.dtype)
    out = jnp.any((q < lower) | (q > upper), axis=-1)
    return jnp.sum(out.astype(q.dtype) * penalty * g, axis=-1)


def joint_limit_soft_cost(
    q: Array,
    lower: Array,
    upper: Array,
    gamma: float,
    weight: float = 1e3,
) -> Array:
    """Quadratic boundary-violation cost: weight * sum_t gamma^t sum_j viol^2.

    The smooth companion to :func:`joint_limit_cost` for clamped-at-limit
    rollouts: the reference's 1e10 cliff makes nearly every sample near a
    limit catastrophic (any of K*H*J entries crossing kills the whole
    sample), which freezes MPPI exploration against the limit surface —
    measured as a whole-arm stall when two joints pin (round 2).  With the
    rollout kinematics clamped (real joints stop at their stops), this term
    only needs to supply a gradient pushing plans back inside."""
    h = q.shape[-2]
    g = _discount(gamma, h, q.dtype)
    viol = jnp.maximum(lower - q, 0.0) + jnp.maximum(q - upper, 0.0)
    return weight * jnp.sum(jnp.sum(viol * viol, axis=-1) * g, axis=-1)


# ---------------------------------------------------------------------------
# STORM-style gaussian-projected distance cost (``dist_cost.py``)
# ---------------------------------------------------------------------------

def gaussian_projected_dist_cost(
    states: Array,
    goal: Array,
    dist_weight: float = 10.0,
    disp_weight: Optional[Array] = None,
    n: int = 0,
    c: float = 0.0,
    s: float = 0.0,
    r: float = 10.0,
) -> Array:
    """Weighted distance passed through STORM's gaussian projection
    (``dist_cost.py:34-47``): with c == 0 the projection is the identity,
    otherwise 1 - (-1)^n exp(-(d-s)^2 / 2c^2) + r (d-s)^4.  Returns per-step
    costs [..., H] (the reference leaves reduction to the caller)."""
    disp = states - goal
    if disp_weight is not None:
        disp = disp * disp_weight
    d = jnp.linalg.norm(disp, axis=-1)
    if c == 0.0:
        return dist_weight * d
    proj = 1.0 - ((-1.0) ** n) * jnp.exp(-((d - s) ** 2) / (2.0 * c * c)) + r * (d - s) ** 4
    return dist_weight * proj


# ---------------------------------------------------------------------------
# Obstacle costs (new capability — BASELINE.json config 4)
# ---------------------------------------------------------------------------

def sphere_obstacle_cost(
    points: Array,
    centers: Array,
    radii: Array,
    weight: float,
    margin: float = 0.0,
) -> Array:
    """Penetration-depth penalty of trajectory points against sphere obstacles.

    points: [..., H, 3]; centers: (O, 3); radii: (O,).  Smooth hinge on
    (radius + margin - distance), squared, summed over obstacles and steps.
    """
    d = jnp.linalg.norm(points[..., None, :] - centers, axis=-1)  # [..., H, O]
    pen = jnp.maximum(radii + margin - d, 0.0)
    return weight * jnp.sum(pen * pen, axis=(-1, -2))


# ---------------------------------------------------------------------------
# Aggregation — the reference's CostManager as a typed config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ArmCostParams:
    """Weights for the arm task stack (defaults = ``cost_manager.py:25-43``;
    zero weight disables a term, mirroring which terms the reference's
    ``compute_all_cost`` actually sums vs leaves commented out)."""

    stage_pose_weight: float = 50.0
    stage_orientation_weight: float = 30.0
    terminal_pose_weight: float = 40.0
    terminal_orientation_weight: float = 30.0
    covar_weight: float = 0.0       # defined 0.1, disabled in reference
    action_weight: float = 0.0      # defined 0.01, disabled
    centering_weight: float = 0.0   # defined 1.0, disabled
    joint_tracking_weight: float = 0.0
    joint_limit_weight: float = 0.0  # 1 enables the 1e10 penalty
    gamma: float = 0.98
    alpha: float = 0.1
    ori_mode: str = "euler_zyx"


def arm_total_cost(
    params: ArmCostParams,
    lam: float,
    ee_pos: Array,
    ee_rot: Array,
    q_samples: Array,
    v_samples: Array,
    u_prev: Array,
    sigma_inv: Array,
    target_pos: Array,
    target_rot: Array,
    q_center: Array,
    q_lower: Array,
    q_upper: Array,
    q_ref: Optional[Array] = None,
) -> Array:
    """Total per-sample cost S, summing exactly the enabled terms
    (``cost_manager.py:78-89``)."""
    s = pose_stage_cost(
        ee_pos, ee_rot, target_pos, target_rot,
        params.stage_pose_weight, params.stage_orientation_weight, params.ori_mode,
    )
    s = s + pose_terminal_cost(
        ee_pos, ee_rot, target_pos, target_rot,
        params.terminal_pose_weight, params.terminal_orientation_weight, params.ori_mode,
    )
    if params.covar_weight:
        s = s + covariance_cost(
            u_prev, v_samples, sigma_inv, params.covar_weight, lam, params.alpha
        )
    if params.action_weight:
        s = s + action_cost(v_samples, params.action_weight, params.gamma)
    if params.centering_weight:
        s = s + centering_cost(q_samples, q_center, params.centering_weight, params.gamma)
    if params.joint_tracking_weight and q_ref is not None:
        s = s + joint_tracking_cost(
            q_samples, q_ref, params.joint_tracking_weight, params.gamma
        )
    if params.joint_limit_weight:
        s = s + params.joint_limit_weight * joint_limit_cost(
            q_samples, q_lower, q_upper, params.gamma
        )
    return s
