"""Probe: do identical pallas_call instances compile once or N times?

One traced OC step carries ~9-10 pallas_call instances but only ~5
distinct kernels (fine apply, df apply, streamed cached-Ke at 3 level
shapes). If Mosaic's kernel-compile cache keys on the serialized kernel
IR, duplicate instances are nearly free and the 461 s cold compile at
256x128x128 is ~5 genuinely distinct kernels; if not, structural dedup
of the call sites would cut cold compile roughly in half (VERDICT r2
item 9).

Method: jit-compile (AOT .lower().compile(), no execution)
  a) f1(u, y)   = one fine Pallas apply
  b) f3(u, y)   = three chained fine Pallas applies (data-dependent, so
                  no CSE; identical kernel bodies)
in a fresh process with the persistent compile cache DISABLED, and
compare wall-clock. t(f3) ~ t(f1) + eps  => Mosaic dedups duplicates.
t(f3) ~ 3 t(f1)                          => each instance pays Mosaic.

Usage: python scripts/probe_mosaic_dedup.py [--dims 192,96,96]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dims", default="192,96,96")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    # NO persistent cache: we are measuring the compile itself
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.config.update("jax_enable_x64", True)

    from ndr_tpu.fem import pallas_kernels as pk
    from ndr_tpu.fem.simulator import problem_from_config
    from ndr_tpu.io.problem import load_problem

    cfg = load_problem("problems/3d/cantilever_flexion.json")
    dims = tuple(int(d) for d in args.dims.split(","))
    prob, grid = problem_from_config(cfg, dims=dims, dtype=jnp.float32)
    K0np = np.asarray(prob.K0, np.float64)

    u = jnp.zeros(grid.nodes_per_dim + (grid.ndim,), jnp.float32)
    y = jnp.full(grid.dims, 0.3, jnp.float32)

    def f1(u, y):
        return pk.apply_k_pallas(u, y, K0np, grid)

    def f3(u, y):
        for _ in range(3):
            u = pk.apply_k_pallas(u, y, K0np, grid)
        return u

    t0 = time.perf_counter()
    jax.jit(f1).lower(u, y).compile()
    t1 = time.perf_counter() - t0
    print(f"compile f1 (1 instance):  {t1:.1f}s", flush=True)

    t0 = time.perf_counter()
    jax.jit(f3).lower(u, y).compile()
    t3 = time.perf_counter() - t0
    print(f"compile f3 (3 instances): {t3:.1f}s", flush=True)
    print(f"ratio t3/t1 = {t3 / t1:.2f} "
          f"({'dedup works' if t3 < 1.6 * t1 else 'each instance pays'})",
          flush=True)


if __name__ == "__main__":
    main()
