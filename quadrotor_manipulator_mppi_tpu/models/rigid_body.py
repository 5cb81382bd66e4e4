"""Articulated rigid-body dynamics for serial chains in pure JAX.

Replaces the reference's Pinocchio usage — ``pin.computeAllTerms`` providing
the arm mass matrix and nonlinear effects for its computed-torque tracking law
(``/root/reference/src/mav_mppi/scripts/kinova.py:126,152-153,184``) — with an
in-framework recursive Newton-Euler (RNEA) written against the same
:class:`~..models.chain.ChainSpec` the FK uses.

Everything is expressed in link-local coordinates (Featherstone-style
propagation), unrolled over the (small, static) joint count at trace time, and
batched over arbitrary leading dims so the same code serves the single-state
controller path and vmapped MPPI rollouts.  The mass matrix is built by the
unit-acceleration method: column i of M(q) is ``RNEA(q, 0, e_i)`` with gravity
off — J extra RNEA passes, vmapped, which XLA fuses into one batched program
(J=7 here; CRBA would save little and scan poorly).

Reference numerics note: Pinocchio runs float64 on CPU; this module defaults
to float32 on TPU (tests check float64-vs-float32 drift stays within the
tolerances the tracking controller can absorb).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .chain import REVOLUTE, ChainSpec
from . import chain as chain_mod

Array = jax.Array

GRAVITY = 9.81


@dataclass(frozen=True)
class InertialParams:
    """Host-side per-link inertial constants (child-link frame).

    mass: (J,), com: (J, 3), inertia: (J, 3, 3) about the link frame origin?
    No — about the center of mass, as URDF ``<inertial>`` blocks specify.
    """

    mass: np.ndarray
    com: np.ndarray
    inertia: np.ndarray


class SpatialVel(NamedTuple):
    """Angular + linear velocity (or acceleration) of a frame, local coords."""

    ang: Array
    lin: Array


def _cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)


def rnea(
    spec: ChainSpec,
    params: InertialParams,
    q: Array,
    qd: Array,
    qdd: Array,
    gravity: float = GRAVITY,
    base_rot: Optional[Array] = None,
    base_vel: Optional[SpatialVel] = None,
    base_acc: Optional[SpatialVel] = None,
) -> Tuple[Array, SpatialVel]:
    """Inverse dynamics: joint torques realizing ``qdd`` at state ``(q, qd)``.

    Returns ``(tau [..., J], base reaction wrench)`` — the wrench is the force
    the chain exerts on its mounting body expressed in the base frame, needed
    by the whole-body coupled model and by the flight controller's arm-gravity
    feed-forward (behavioral parity with ``controller.cpp:587-610``'s
    closed-form gravity wrench).

    ``base_rot`` is the **base->world** (body-to-world) rotation
    ([..., 3, 3]) — the same convention as ``Pose.rotation_matrix`` and every
    in-repo caller; gravity is applied by the fictitious base acceleration
    trick (a0 = R^T (+g z_world)).  ``base_vel``/``base_acc`` let the caller
    couple in floating-base motion.
    """
    dtype = q.dtype
    batch = q.shape[:-1]
    j_n = spec.n_joints

    def bc(v):  # broadcast a (3,) const to batch
        return jnp.broadcast_to(jnp.asarray(v, dtype), batch + (3,))

    # Base-frame kinematic state.
    g_world = jnp.asarray([0.0, 0.0, gravity], dtype)
    if base_rot is None:
        a0_lin = bc(g_world)
    else:
        a0_lin = jnp.einsum("...ji,j->...i", base_rot, g_world)
        a0_lin = jnp.broadcast_to(a0_lin, batch + (3,))
    w = bc(jnp.zeros(3, dtype)) if base_vel is None else base_vel.ang
    v = bc(jnp.zeros(3, dtype)) if base_vel is None else base_vel.lin
    dw = bc(jnp.zeros(3, dtype)) if base_acc is None else base_acc.ang
    a = a0_lin if base_acc is None else base_acc.lin + a0_lin

    # Forward pass: propagate velocity/acceleration root -> tip.
    rs, ps, axes = [], [], []
    ws, dws, accs = [], [], []
    f_links, n_links = [], []
    for j in range(j_n):
        t = chain_mod.joint_transform(spec, j, q[..., j])
        # t.trans is the child-frame origin in the parent frame — equal to the
        # fixed origin for revolute joints, origin + q*axis for prismatic.
        r, p = t.rot, jnp.broadcast_to(t.trans, batch + (3,))
        axis = jnp.asarray(spec.axis[j], dtype)
        rs.append(r)
        ps.append(p)
        axes.append(axis)

        rt = jnp.swapaxes(r, -1, -2)
        if int(spec.joint_type[j]) == REVOLUTE:
            qd_j = qd[..., j : j + 1] * axis
            qdd_j = qdd[..., j : j + 1] * axis
            w_c = jnp.einsum("...ij,...j->...i", rt, w) + qd_j
            dw_c = (
                jnp.einsum("...ij,...j->...i", rt, dw)
                + qdd_j
                + _cross(jnp.einsum("...ij,...j->...i", rt, w), qd_j)
            )
            a_c = jnp.einsum(
                "...ij,...j->...i", rt, a + _cross(dw, p) + _cross(w, _cross(w, p))
            )
        else:  # prismatic
            qd_j = qd[..., j : j + 1] * axis
            qdd_j = qdd[..., j : j + 1] * axis
            w_c = jnp.einsum("...ij,...j->...i", rt, w)
            dw_c = jnp.einsum("...ij,...j->...i", rt, dw)
            a_c = (
                jnp.einsum(
                    "...ij,...j->...i", rt, a + _cross(dw, p) + _cross(w, _cross(w, p))
                )
                + qdd_j
                + 2.0 * _cross(w_c, qd_j)
            )
        w, dw, a = w_c, dw_c, a_c
        ws.append(w)
        dws.append(dw)
        accs.append(a)

        # Link inertial forces at the COM, expressed in the link frame.
        m_j = float(params.mass[j])
        c_j = jnp.asarray(params.com[j], dtype)
        i_j = jnp.asarray(params.inertia[j], dtype)
        a_com = a + _cross(dw, c_j) + _cross(w, _cross(w, c_j))
        f_links.append(m_j * a_com)
        iw = jnp.einsum("ij,...j->...i", i_j, w)
        n_links.append(jnp.einsum("ij,...j->...i", i_j, dw) + _cross(w, iw))

    # Backward pass: accumulate wrenches tip -> root.
    zero3 = jnp.zeros(batch + (3,), dtype)
    f_child, n_child = zero3, zero3
    taus = [None] * j_n
    for j in reversed(range(j_n)):
        c_j = jnp.asarray(params.com[j], dtype)
        f_j = f_links[j] + f_child
        n_j = n_links[j] + _cross(c_j, f_links[j]) + n_child
        if int(spec.joint_type[j]) == REVOLUTE:
            taus[j] = jnp.einsum("...i,i->...", n_j, axes[j])
        else:
            taus[j] = jnp.einsum("...i,i->...", f_j, axes[j])
        # Express in the parent frame for the next step up.
        f_parent = jnp.einsum("...ij,...j->...i", rs[j], f_j)
        n_parent = jnp.einsum("...ij,...j->...i", rs[j], n_j) + _cross(ps[j], f_parent)
        f_child, n_child = f_parent, n_parent

    tau = jnp.stack(taus, axis=-1)
    return tau, SpatialVel(ang=n_child, lin=f_child)


def gravity_torque(
    spec: ChainSpec, params: InertialParams, q: Array, base_rot: Optional[Array] = None
) -> Array:
    """g(q): torques holding the arm static under gravity."""
    z = jnp.zeros_like(q)
    tau, _ = rnea(spec, params, q, z, z, base_rot=base_rot)
    return tau


def nonlinear_effects(
    spec: ChainSpec,
    params: InertialParams,
    q: Array,
    qd: Array,
    base_rot: Optional[Array] = None,
) -> Array:
    """C(q, qd)qd + g(q) — Pinocchio's ``nle`` (computeAllTerms parity)."""
    tau, _ = rnea(spec, params, q, qd, jnp.zeros_like(q), base_rot=base_rot)
    return tau


def mass_matrix(spec: ChainSpec, params: InertialParams, q: Array) -> Array:
    """M(q) [..., J, J] by the unit-acceleration method, vmapped over columns."""
    j_n = spec.n_joints
    z = jnp.zeros_like(q)

    def column(e):
        tau, _ = rnea(spec, params, q, z, jnp.broadcast_to(e, q.shape), gravity=0.0)
        return tau

    eye = jnp.eye(j_n, dtype=q.dtype)
    cols = jax.vmap(column, in_axes=0, out_axes=-1)(eye)
    return cols


def forward_dynamics(
    spec: ChainSpec,
    params: InertialParams,
    q: Array,
    qd: Array,
    tau: Array,
    base_rot: Optional[Array] = None,
) -> Array:
    """qdd = M(q)^-1 (tau - nle(q, qd)) — articulated forward dynamics.

    Solved with a Cholesky factorization of the (symmetric PD) mass matrix.
    """
    m = mass_matrix(spec, params, q)
    return forward_dynamics_chol(
        spec, params, q, qd, tau, jnp.linalg.cholesky(m), base_rot=base_rot
    )


def forward_dynamics_chol(
    spec: ChainSpec,
    params: InertialParams,
    q: Array,
    qd: Array,
    tau: Array,
    chol: Array,
    base_rot: Optional[Array] = None,
) -> Array:
    """Forward dynamics with a caller-supplied Cholesky factor of M.

    The mass matrix costs J extra RNEA passes; callers integrating at a
    fine substep can factor M once per control period (M(q) drifts
    O(|qdot| dt) ~ 1e-3 relative over 10 ms) and amortize it — see
    ``sim/whole_body_loop.WholeBodyLoopConfig.mass_matrix_per_control``.
    """
    nle = nonlinear_effects(spec, params, q, qd, base_rot=base_rot)
    rhs = (tau - nle)[..., None]
    y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
    qdd = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), y, lower=False
    )
    return qdd[..., 0]
