"""TPU-native MPPI control framework for quadrotor aerial manipulation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
cold-deuu/Quadrotor_Manipulator_MPPI (reference at /root/reference): batched
stochastic MPPI solvers for a HarrierD7 octorotor carrying an inverted Kinova
j2s7s300 arm, an in-framework articulated-body kinematics/dynamics library
replacing Pinocchio, an in-framework plant simulator replacing Gazebo for
closed-loop evaluation, and multi-chip sharding of the sample/scenario axes
over a TPU mesh.

Layout:
  utils/      rotations, SE(3), poses, Savitzky-Golay, trajectories
  models/     kinematic chains, URDF loading, rigid-body dynamics, vehicles
  ops/        sampling, integrators, cost library, softmin reductions, Pallas
  solver/     the functional MPPI engine + task presets (arm, drone, whole-body)
  sim/        closed-loop plant harness, inner-loop flight control, sensors
  parallel/   mesh construction and sharded solvers
  bridge/     host-side bridge speaking the reference's topic contract
  evaluation/ hover/waypoint metrics (rotors_evaluation parity)
"""

import os as _os

import jax as _jax

# Control math lives in small 3x3/4x4 geometry matmuls where TPU's default
# bf16 matmul precision loses ~1e-3 absolute on meter-scale kinematics (the
# real-robot reach tolerance is 5e-3, reference mppi.py:117 — we refuse to
# spend half the error budget in the compiler default).  These matmuls are
# tiny and VPU/bandwidth-bound, so full-fp32 accumulation costs ~nothing.
# Opt out (e.g. for MXU-heavy research forks) with QMM_TPU_FAST_MATMUL=1.
if not _os.environ.get("QMM_TPU_FAST_MATMUL"):
    _jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
