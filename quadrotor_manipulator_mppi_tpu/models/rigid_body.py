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


class FrozenArmCoeffs(NamedTuple):
    """Per-configuration dynamics coefficients for the 1 kHz substep loop.

    At a *fixed* joint configuration q (and zero base spatial motion), the
    RNEA torque decomposes EXACTLY as

        tau(q, qd, 0; a0) = G_tau(q) a0  +  qd^T C_tau(q) qd

    where ``a0 = R_base^T (0, 0, +g)`` is the fictitious base acceleration
    that :func:`rnea` uses to realize gravity: the forward pass propagates
    ``a0`` linearly and the velocity products quadratically, with no cross
    terms, and the backward pass is linear in the link forces.  The same
    decomposition holds for the root reaction wrench.  Freezing q over one
    control period (the same approximation already accepted for the mass
    matrix — M(q) drifts O(|qd| dt) ~ 1e-3 relative in 10 ms) therefore
    turns each physics substep's arm dynamics (one full RNEA pass, hundreds
    of tiny sequential ops) into three einsums.  All coefficients come from
    ONE batched RNEA evaluation per control period
    (:func:`frozen_arm_coeffs`), which XLA fuses into a single program no
    slower than an unbatched pass.

    Replaces the per-substep ``pin.computeAllTerms`` role of the reference
    (``kinova.py:126``) on the serving path; the exact per-substep RNEA
    remains the default plant physics.
    """

    g_tau: Array   # (J, 3):   gravity torque = g_tau @ a0
    c_tau: Array   # (J, J, J) Coriolis/centrifugal tensor (torques)
    g_n: Array     # (3, 3):   root reaction moment (gravity part) = g_n @ a0
    c_n: Array     # (3, J, J) root moment velocity part
    g_f: Array     # (3, 3):   root reaction force (gravity part)
    c_f: Array     # (3, J, J)
    mass: Array    # (J, J)    M(q)
    chol: Array    # (J, J)    cholesky(M)
    minv: Array    # (J, J)    M(q)^-1 — the substep loop applies ONE tiny
    #                matvec instead of two sequential triangular solves
    #                (which lower poorly on TPU); M is 7x7 symmetric PD with
    #                benign conditioning, so the explicit inverse costs
    #                nothing in accuracy at f32 (tested)


def frozen_arm_coeffs(
    spec: ChainSpec, params: InertialParams, q: Array
) -> FrozenArmCoeffs:
    """Extract the exact (gravity-linear, velocity-quadratic) coefficients
    of the chain dynamics at configuration q with one batched RNEA.

    The quadratic part is recovered by polarization over the joint-velocity
    basis: with ``h(qd) = rnea(q, qd, 0, gravity=0)``,
    ``C[:, j, k] = (h(e_j + e_k) - h(e_j) - h(e_k)) / 2``.
    """
    dtype = q.dtype
    j_n = spec.n_joints
    eye = jnp.eye(j_n, dtype=dtype)
    zeros_j = jnp.zeros(j_n, dtype)
    zeros_3 = jnp.zeros(3, dtype)

    def probe(qd, qdd, a0):
        tau, w = rnea(
            spec, params, q, qd, qdd, gravity=0.0,
            base_acc=SpatialVel(ang=zeros_3, lin=a0),
        )
        return tau, w.ang, w.lin

    # One batched evaluation: J^2 velocity pairs + J singles + 3 gravity
    # directions + J mass-matrix columns.
    pair_qd = eye[:, None, :] + eye[None, :, :]          # (J, J, J)
    qd_b = jnp.concatenate([
        pair_qd.reshape(j_n * j_n, j_n), eye,
        jnp.zeros((3 + j_n, j_n), dtype),
    ])
    qdd_b = jnp.concatenate([
        jnp.zeros((j_n * j_n + j_n + 3, j_n), dtype), eye,
    ])
    a0_b = jnp.concatenate([
        jnp.zeros((j_n * j_n + j_n, 3), dtype), jnp.eye(3, dtype=dtype),
        jnp.zeros((j_n, 3), dtype),
    ])
    tau_b, n_b, f_b = jax.vmap(probe)(qd_b, qdd_b, a0_b)

    n_pair = j_n * j_n
    h_pair = (tau_b[:n_pair], n_b[:n_pair], f_b[:n_pair])
    sl_single = slice(n_pair, n_pair + j_n)
    h_single = (tau_b[sl_single], n_b[sl_single], f_b[sl_single])
    sl_grav = slice(n_pair + j_n, n_pair + j_n + 3)
    g_tau, g_n, g_f = tau_b[sl_grav].T, n_b[sl_grav].T, f_b[sl_grav].T
    mass = tau_b[n_pair + j_n + 3:].T                    # (J, J) symmetric

    def polarize(pair, single):
        p = pair.reshape(j_n, j_n, -1)                   # (J, J, dim)
        s = single                                       # (J, dim)
        c = 0.5 * (p - s[:, None, :] - s[None, :, :])
        return jnp.moveaxis(c, -1, 0)                    # (dim, J, J)

    c_tau, c_n, c_f = (polarize(p, s) for p, s in zip(h_pair, h_single))
    chol = jnp.linalg.cholesky(mass)
    minv = jax.scipy.linalg.cho_solve((chol, True), jnp.eye(j_n, dtype=dtype))
    return FrozenArmCoeffs(
        g_tau=g_tau, c_tau=c_tau, g_n=g_n, c_n=c_n, g_f=g_f, c_f=c_f,
        mass=mass, chol=chol, minv=minv,
    )


def gravity_accel(base_rot: Optional[Array], dtype, gravity: float = GRAVITY) -> Array:
    """The fictitious base acceleration a0 = R^T (0, 0, +g) that frozen
    coefficients contract against (identical to :func:`rnea`'s internal
    gravity handling)."""
    g_world = jnp.asarray([0.0, 0.0, gravity], dtype)
    if base_rot is None:
        return g_world
    return jnp.einsum("...ji,j->...i", base_rot, g_world)


def frozen_nle(co: FrozenArmCoeffs, a0: Array, qd: Array) -> Array:
    """C(q, qd)qd + g(q) from frozen coefficients — three einsums."""
    return co.g_tau @ a0 + jnp.einsum("ijk,...j,...k->...i", co.c_tau, qd, qd)


def frozen_forward_dynamics(
    co: FrozenArmCoeffs, a0: Array, qd: Array, tau: Array
) -> Array:
    """qdd = M^-1 (tau - nle) with every q-dependent quantity frozen."""
    rhs = tau - frozen_nle(co, a0, qd)
    return jnp.einsum("ij,...j->...i", co.minv, rhs)


def frozen_gravity_torque_on_base(co: FrozenArmCoeffs, a0: Array) -> Array:
    """Arm gravity *moment* on the base (base frame) from frozen
    coefficients — the quasi-static tau_g of
    :func:`~.whole_body.arm_gravity_torque_fast` (reaction = minus the root
    wrench the mount must apply, hence the sign)."""
    return -(co.g_n @ a0)


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
