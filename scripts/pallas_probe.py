"""On-device probe of the fused Pallas stiffness kernels.

Validates the fp32 fused apply and the two-float residual apply against
XLA oracles on the real TPU, and times compile + steady-state runtime at
a production-size grid (also probes the (97,97)-node-plane shape class
that kernel-faulted in round 1).

Usage: python scripts/pallas_probe.py [--dims "[192,96,96]"] [--reps 50]
"""

import argparse
import ast
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dims", default="[192,96,96]")
    p.add_argument("--reps", default=50, type=int)
    p.add_argument("--skip-df", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ndr_tpu.utils.jax_setup import setup
    setup()

    from ndr_tpu.fem import operators as ops
    from ndr_tpu.fem import pallas_kernels as pk
    from ndr_tpu.fem.simulator import problem_from_config
    from ndr_tpu.io.problem import load_problem

    dims = tuple(ast.literal_eval(args.dims))
    cfg = load_problem("problems/3d/cantilever_flexion.json")
    prob, grid = problem_from_config(cfg, dims=dims, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(grid.nodes_per_dim + (3,)), jnp.float32)
    young = prob.young(jnp.asarray(rng.uniform(0.05, 1.0, grid.dims), jnp.float32))
    K0 = np.asarray(prob.K0)

    nbytes = (2 * u.nbytes + young.nbytes)

    def bench(name, fn, *inputs):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*inputs))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = fn(*inputs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        gbps = nbytes / dt / 1e9
        print(f"{name}: compile+first {t_compile:.1f}s, "
              f"steady {dt*1e3:.2f} ms, ~{gbps:.0f} GB/s effective",
              flush=True)
        return out

    f_xla = bench("xla fp32 apply ", jax.jit(
        lambda u, y: ops.apply_k(u, y, jnp.asarray(K0, jnp.float32), grid)),
        u, young)
    f_pl = bench("pallas fp32    ", jax.jit(
        lambda u, y: pk.apply_k_pallas(u, y, K0, grid)), u, young)
    err = float(jnp.abs(f_pl - f_xla).max() / jnp.abs(f_xla).max())
    print(f"pallas vs XLA rel-max err: {err:.2e}")
    f_fl = bench("pallas flat    ", jax.jit(
        lambda u, y: pk.apply_k_pallas_flat(u, y, K0, grid)), u, young)
    err = float(jnp.abs(f_fl - f_xla).max() / jnp.abs(f_xla).max())
    print(f"flat vs XLA rel-max err: {err:.2e}")

    if args.skip_df:
        return
    # two-float residual apply vs the emulated-f64 XLA apply
    f64, f32 = jnp.float64, jnp.float32
    u64 = (u.astype(f64) * (1.0 + 1e-9)) * 1e3
    y64 = young.astype(f64) * (1.0 + 1e-10)
    u_hi = u64.astype(f32)
    u_lo = (u64 - u_hi.astype(f64)).astype(f32)
    y_hi = y64.astype(f32)
    y_lo = (y64 - y_hi.astype(f64)).astype(f32)
    f_64 = bench("xla f64 apply  ", jax.jit(
        lambda u, y: ops.apply_k(u, y, jnp.asarray(K0, f64), grid)),
        u64, y64)
    f_df = bench("pallas two-flt ", jax.jit(
        lambda a, b, c, d: pk.apply_k_pallas_df(a, b, c, d, K0, grid)),
        u_hi, u_lo, y_hi, y_lo)
    err = float(jnp.abs(f_df - f_64).max() / jnp.abs(f_64).max())
    print(f"two-float vs f64 rel-max err: {err:.2e} (floor ~1e-11)")
    f_dfl = bench("pallas 2flt flat", jax.jit(
        lambda a, b, c, d: pk.apply_k_pallas_df_flat(a, b, c, d, K0, grid)),
        u_hi, u_lo, y_hi, y_lo)
    err = float(jnp.abs(f_dfl - f_64).max() / jnp.abs(f_64).max())
    print(f"two-float flat vs f64 rel-max err: {err:.2e} (floor ~1e-11)")


if __name__ == "__main__":
    main()
