"""Characterize this host's device tunnel: the per-call cost structure that
separates HOST-STEPPED serving latency from device compute.

Round-4 folklore said "~0.05 ms per array argument".  Round-5 measurement
(this script) shows the real structure on the axon tunnel:

* dispatch of a jitted call is cheap (~0.02-0.04 ms) and does NOT scale
  with the program's op count or its pallas-kernel count;
* buffer DONATION on the flagship solve costs ~0.2-0.3 ms/call of extra
  tunnel bookkeeping (measured on the real program; invisible on trivial
  ops) — the serving path threads state without donate_argnums here;
* any SYNCHRONOUS device->host read (np.asarray / device_get / float())
  pays a fixed ~25 ms quantum regardless of payload size — a polling
  interval in the tunnel's transfer path: transfers QUEUED before the poll
  all complete together (~1.7 ms/item for 20 queued), while a depth-1 lag
  pipeline still pays ~13 ms/item.  This is a property of this image's
  tunnel, not of TPU hardware — on a co-located host, D2H of 25 floats is
  microseconds.

Consequence for serving: keep the loop on device (the jitted episode pays
ZERO per-tick D2H), or pipeline replies several ticks deep if the tunnel's
readback quantum must be amortized.  Results land in BENCH_DETAILS.json
under "tunnel".
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DETAILS_PATH = os.path.join(REPO, "benchmarks", "BENCH_DETAILS.json")


def _bench(fn, iters=100, repeats=5):
    fn()
    for _ in range(3):
        fn()
    blocks = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        blocks.append((time.perf_counter() - t0) / iters * 1e3)
    return round(statistics.median(blocks), 4), round(min(blocks), 4)


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax

    out = {}

    f1 = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(jnp.zeros(25))
    jax.block_until_ready(f1(x))
    out["dispatch_1arg_ms"] = _bench(lambda: jax.block_until_ready(f1(x)))

    # Op-count scaling: optimization barriers force distinct HLO ops.
    def chain(n):
        def f(y):
            for _ in range(n):
                y = lax.optimization_barrier(y + 1.0)
            return y
        return jax.jit(f)

    for n in (10, 400):
        g = chain(n)
        h = {"x": jax.device_put(jnp.zeros(64))}

        def th(g=g, h=h):
            h["x"] = g(h["x"])
            return h["x"]

        jax.block_until_ready(th())
        out[f"dispatch_chain{n}ops_ms"] = _bench(th)

    # Donation cost: identical threaded chain with/without donate_argnums.
    fnd = jax.jit(lambda a, k: (a + 1.0, k))
    fdo = jax.jit(lambda a, k: (a + 1.0, k), donate_argnums=(0, 1))
    for name, fn in (("no_donate", fnd), ("donate", fdo)):
        h = {"c": (jax.device_put(jnp.zeros((50, 11))),
                   jax.device_put(jnp.zeros(4)))}

        def th(fn=fn, h=h):
            h["c"] = fn(*h["c"])
            return h["c"][0]

        jax.block_until_ready(th())
        out[f"threaded_{name}_ms"] = _bench(th)

    # D2H quantum: single fetch (median of 7 after one warmup — the very
    # first readback of a process can stall for hundreds of ms), and
    # whether queued fetches overlap.
    np.asarray(f1(x))  # warm the transfer path
    singles = []
    for i in range(7):
        o = f1(x + i)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        np.asarray(o)
        singles.append((time.perf_counter() - t0) * 1e3)
    out["d2h_single_ms"] = round(statistics.median(singles), 2)
    out["d2h_single_min_ms"] = round(min(singles), 2)
    outs = [f1(x + i) for i in range(20)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for oo in outs:
        oo.copy_to_host_async()
    _ = [np.asarray(oo) for oo in outs]
    out["d2h_20queued_ms_per_item"] = round(
        (time.perf_counter() - t0) / 20 * 1e3, 2
    )
    # Depth-1 lag pipeline: fetch reply i-1 while computing i.
    outs = [f1(x + i) for i in range(30)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    prev = None
    for oo in outs:
        oo.copy_to_host_async()
        if prev is not None:
            np.asarray(prev)
        prev = oo
    np.asarray(prev)
    out["d2h_depth1_pipeline_ms_per_item"] = round(
        (time.perf_counter() - t0) / 30 * 1e3, 2
    )

    dev = jax.devices()[0]
    out["device"] = f"{dev.platform}:{getattr(dev, 'device_kind', '?')}"
    print(json.dumps(out, indent=2))
    details = {}
    if os.path.exists(DETAILS_PATH):
        with open(DETAILS_PATH) as f:
            details = json.load(f)
    details["tunnel"] = out
    with open(DETAILS_PATH, "w") as f:
        json.dump(details, f, indent=2)


if __name__ == "__main__":
    main()
