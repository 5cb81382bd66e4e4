"""Feasibility probe for the scoped Pallas PLANT-TICK kernel (the next
episode-throughput lever — BASELINE.md episode decomposition).

The remaining ~0.3 ms of the 0.89 ms closed-loop episode step is ~600 tiny
sequential XLA ops (base plant + backstepping + logs at 1 kHz x 10
substeps).  Collapsing them into ONE Pallas kernel requires scalar-unit
math in Mosaic: SMEM-resident state, transcendentals (sin/sqrt/exp),
conditionals, and a fori_loop over substeps with a scalar carry.

This probe runs exactly that shape on the real chip and checks it against
plain JAX — measured on v5e: EXACT agreement, so the kernel is feasible.
What remains is engineering volume (~46 carried scalars: base pos/quat/
vel/omega/rotor + controller integrators + frozen arm-dynamics
coefficients in SMEM, ~1300 scalar ops per substep incl. the 7x7x7
Coriolis contraction, atan2/asin via the kernel's polynomial helpers) —
scoped for a future round rather than rushed; the episode remains
correct and 0.89 ms/step without it.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kern(x_ref, o_ref):
    a = x_ref[0]
    b = x_ref[1]

    def body(i, carry):
        u, v = carry
        u = u + jnp.sin(v) * 0.1 + jnp.sqrt(jnp.abs(v) + 1.0)
        v = v * 0.99 + jnp.where(u > 1.0, 0.01, -0.01) + jnp.exp(-u * u)
        u = jnp.minimum(jnp.maximum(u, -10.0), 10.0)
        return (u, v)

    u, v = jax.lax.fori_loop(0, 10, body, (a, b))
    o_ref[0] = u
    o_ref[1] = v


def reference(a, b):
    u, v = a, b
    for _ in range(10):
        u = u + jnp.sin(v) * 0.1 + jnp.sqrt(jnp.abs(v) + 1.0)
        v = v * 0.99 + jnp.where(u > 1.0, 0.01, -0.01) + jnp.exp(-u * u)
        u = jnp.clip(u, -10, 10)
    return u, v


def main():
    x = jnp.asarray([0.3, 0.7], jnp.float32)
    out = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((2,), jnp.float32),
    )(x)
    got = np.asarray(out)
    want = np.asarray([float(z) for z in reference(0.3, 0.7)])
    print("pallas scalar:", got)
    print("reference:   ", want)
    ok = np.allclose(got, want, atol=1e-6)
    print("feasible:", bool(ok))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
