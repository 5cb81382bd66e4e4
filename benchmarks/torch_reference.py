"""Reference-technology baseline: the MPPI solve implemented the way the
reference implements it — PyTorch tensors, materialized (K, H, 4, 4) FK,
per-DoF SavGol conv1d with per-call coefficient computation, Python loop over
the horizon for true dynamics (the reference's commented whole-quadrotor
rollout, ``drone_mppi.py:57-83``, uses exactly such a loop).

This is the denominator for the solves/s comparison (BASELINE.md: "benchmark
a faithful PyTorch/NumPy oracle of the reference solver (same K/H)").  It is
an independent implementation of the same math, not copied code; it runs on
whatever torch device is available (CPU in this image — the reference's CUDA
path is unavailable here, which is recorded alongside the number).
"""

from __future__ import annotations

import math
import time

import numpy as np
import torch


# --- building blocks -------------------------------------------------------

def savgol_torch(seq: torch.Tensor, window: int, order: int) -> torch.Tensor:
    """(H, A) smoothing, reference-style: per-column conv1d, coefficients
    rebuilt (and a matrix inverted) on every call."""
    half = window // 2
    cols = []
    for i in range(seq.shape[1]):
        data = seq[:, i]
        x = torch.arange(-half, half + 1, dtype=seq.dtype)
        a = torch.stack([x**k for k in range(order + 1)], dim=1)
        coeffs = (torch.linalg.inv(a.T @ a) @ a.T)[0]
        padded = torch.cat([data[:half].flip(0), data, data[-half:].flip(0)])
        smoothed = torch.nn.functional.conv1d(
            padded.view(1, 1, -1), coeffs.flip(0).view(1, 1, -1)
        ).view(-1)
        cols.append(smoothed)
    return torch.stack(cols, dim=1)


def make_44(rot: np.ndarray, trans: np.ndarray) -> torch.Tensor:
    m = torch.eye(4)
    m[:3, :3] = torch.tensor(rot, dtype=torch.float32)
    m[:3, 3] = torch.tensor(trans, dtype=torch.float32)
    return m


def fk_torch(origins_44, q: torch.Tensor, base_44: torch.Tensor) -> torch.Tensor:
    """Batched FK, reference-style (urdfparser.py:122-163): sequential
    4x4 matmuls over the joint chain with (K, H, 4, 4) intermediates,
    revolute axis = local z."""
    k, h, j = q.shape
    tf = base_44.expand(k, h, 4, 4).clone()
    for jj in range(j):
        c, s = torch.cos(q[:, :, jj]), torch.sin(q[:, :, jj])
        rz = torch.zeros(k, h, 4, 4)
        rz[:, :, 0, 0] = c
        rz[:, :, 0, 1] = -s
        rz[:, :, 1, 0] = s
        rz[:, :, 1, 1] = c
        rz[:, :, 2, 2] = 1.0
        rz[:, :, 3, 3] = 1.0
        tf = tf @ origins_44[jj] @ rz
    return tf


def double_integrate_torch(a: torch.Tensor, q0, v0, dt):
    v = torch.cumsum(a * dt, dim=1) + v0
    v_prev = torch.cat([v0.expand(a.shape[0], 1, a.shape[2]), v[:, :-1]], dim=1)
    q = torch.cumsum(v_prev * dt + 0.5 * a * dt * dt, dim=1) + q0
    return q, v


def softmin_torch(s: torch.Tensor, lam: float) -> torch.Tensor:
    rho = s.min()
    w = torch.exp(-(s - rho) / lam)
    return w / w.sum()


def euler_zyx_from_mats(m: torch.Tensor) -> torch.Tensor:
    b = torch.asin(torch.clamp(-m[..., 2, 0], -1, 1))
    a = torch.atan2(m[..., 1, 0], m[..., 0, 0])
    c = torch.atan2(m[..., 2, 1], m[..., 2, 2])
    return torch.stack([a, b, c], dim=-1)


# --- whole-body solve (reference technology) --------------------------------

class TorchWholeBodySolver:
    """Same math as solver/whole_body.py, in reference idiom."""

    def __init__(self, chain_spec, k=4096, h=50, dt=0.01, lam=0.1,
                 sigma=None, mass=20.24, inertia=(1.57, 3.93, 2.59)):
        self.k, self.h, self.dt, self.lam = k, h, dt, lam
        self.na = 11
        self.sigma = torch.tensor(
            sigma if sigma is not None else
            [30.0, 3.0, 3.0, 1.0] + [1.0] * 7, dtype=torch.float32
        )
        self.mass = mass
        self.inertia = torch.tensor(inertia)
        self.origins = [
            make_44(chain_spec.origin_rot[j], chain_spec.origin_trans[j])
            for j in range(chain_spec.n_joints)
        ]
        self.u_prev = torch.zeros(h, self.na)
        self.u_prev[:, 0] = mass * 9.81

    def solve(self, base_pos, q0, qdot0, target_pos, target_rot):
        k, h, dt = self.k, self.h, self.dt
        noise = torch.randn(k, h, self.na) * self.sigma
        v = self.u_prev.unsqueeze(0) + noise

        # Arm: cumsum double integration.
        q, _ = double_integrate_torch(
            v[:, :, 4:], q0.expand(k, 1, 7), qdot0.expand(k, 1, 7), dt
        )

        # Base: python loop over the horizon (reference rollout style).
        pos = base_pos.expand(k, 3).clone()
        vel = torch.zeros(k, 3)
        rpy = torch.zeros(k, 3)
        omega = torch.zeros(k, 3)
        base_mats = []
        base_poss = []
        tilt_acc = torch.zeros(k)
        for t in range(h):
            tau = v[:, t, 1:4]
            thrust = v[:, t, 0]
            omega = omega + dt * tau / self.inertia
            sphi, cphi = torch.sin(rpy[:, 0]), torch.cos(rpy[:, 0])
            tth = torch.tan(rpy[:, 1])
            cth = torch.cos(rpy[:, 1])
            jmat = torch.zeros(k, 3, 3)
            jmat[:, 0, 0] = 1
            jmat[:, 0, 1] = sphi * tth
            jmat[:, 0, 2] = cphi * tth
            jmat[:, 1, 1] = cphi
            jmat[:, 1, 2] = -sphi
            jmat[:, 2, 1] = sphi / cth
            jmat[:, 2, 2] = cphi / cth
            rpy = rpy + dt * torch.einsum("kij,kj->ki", jmat, omega)
            rpy = torch.atan2(torch.sin(rpy), torch.cos(rpy))
            ca, sa = torch.cos(rpy[:, 2]), torch.sin(rpy[:, 2])
            cb, sb = torch.cos(rpy[:, 1]), torch.sin(rpy[:, 1])
            cc, sc = torch.cos(rpy[:, 0]), torch.sin(rpy[:, 0])
            r = torch.zeros(k, 3, 3)
            r[:, 0, 0] = ca * cb
            r[:, 0, 1] = ca * sb * sc - sa * cc
            r[:, 0, 2] = ca * sb * cc + sa * sc
            r[:, 1, 0] = sa * cb
            r[:, 1, 1] = sa * sb * sc + ca * cc
            r[:, 1, 2] = sa * sb * cc - ca * sc
            r[:, 2, 0] = -sb
            r[:, 2, 1] = cb * sc
            r[:, 2, 2] = cb * cc
            acc = r[:, :, 2] * (thrust / self.mass).unsqueeze(1)
            acc = acc - torch.tensor([0.0, 0.0, 9.81])
            vel = vel + dt * acc
            pos = pos + dt * vel
            base_mats.append(r)
            base_poss.append(pos.clone())
            tilt_acc = tilt_acc + (rpy[:, 0] ** 2 + rpy[:, 1] ** 2)

        base_rot = torch.stack(base_mats, dim=1)   # (K, H, 3, 3)
        base_pos_traj = torch.stack(base_poss, dim=1)

        base44 = torch.zeros(k, h, 4, 4)
        base44[:, :, :3, :3] = base_rot
        base44[:, :, :3, 3] = base_pos_traj
        base44[:, :, 3, 3] = 1.0

        ee = fk_torch(self.origins, q, torch.eye(4))
        ee = base44 @ ee

        # Costs: EE pose (reference weights) + base regularization.
        dp = torch.norm(ee[:, :, :3, 3] - target_pos, dim=-1)
        err_rot = ee[:, :, :3, :3].transpose(-1, -2) @ target_rot
        dori = torch.norm(euler_zyx_from_mats(err_rot), dim=-1)
        s = (50.0 * dp[:, :-1] + 30.0 * dori[:, :-1]).sum(dim=1)
        s = s + 40.0 * dp[:, -1] + 30.0 * dori[:, -1]
        s = s + 20.0 / h * ((base_pos_traj[:, :-1] - base_pos) ** 2).sum(dim=(1, 2))
        s = s + 50.0 / h * tilt_acc

        w = softmin_torch(s, self.lam)
        du = (w.view(-1, 1, 1) * noise).sum(dim=0)
        du = savgol_torch(du, 9, 2)
        self.u_prev = self.u_prev + du
        return self.u_prev[0]


def benchmark_whole_body(k=4096, h=50, iters=3, warmup=1):
    """Returns solves/s of the reference-style torch implementation."""
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from quadrotor_manipulator_mppi_tpu.models import kinova

    torch.manual_seed(0)
    spec = kinova.chain()
    solver = TorchWholeBodySolver(spec, k=k, h=h)
    base_pos = torch.tensor([0.0, 0.0, 2.1])
    q0 = torch.tensor(kinova.Q_HOME, dtype=torch.float32)
    qdot0 = torch.zeros(7)
    target_pos = torch.tensor([0.1029, 0.4055, 1.6498])
    target_rot = torch.eye(3)
    for _ in range(warmup):
        solver.solve(base_pos, q0, qdot0, target_pos, target_rot)
    t0 = time.perf_counter()
    for _ in range(iters):
        solver.solve(base_pos, q0, qdot0, target_pos, target_rot)
    dt = time.perf_counter() - t0
    return iters / dt


if __name__ == "__main__":
    rate = benchmark_whole_body()
    print(f"torch reference whole-body: {rate:.3f} solve/s")
