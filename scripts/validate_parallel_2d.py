"""2-D pencil decomposition validation at non-toy scale (VERDICT r3 #6).

Runs the classic OC driver path (`train_voxelfem --shards ...`) for
several steps at 64x32x32 over 8 virtual CPU devices, once with the 1-D
slab decomposition (``--shards 8``) and once with the 2-D pencil mesh
(``--shards 4,2`` — parallel.mesh.make_sharded_mgpcg_2d: composed x/y
face exchanges, coarse solve all-gathered over both mesh axes), and
checks the two compliance trajectories agree step by step. The unsharded
single-device trajectory is the oracle for both.

tests/test_parallel.py pins the same invariants at 12x8x4-class sizes in
the CI loop; this script is the committed at-scale artifact
(logs/parallel_2d_64.log). Reference scope: SURVEY.md §2.3 extension
clause (the reference is TBB shared-memory only; multi-chip is our
extension).

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/validate_parallel_2d.py [--dims 64,32,32] \
        [--steps 3] [--mgl 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

# unconditional: the ambient environment presets JAX_PLATFORMS=axon (the
# TPU plugin), but this is a virtual-device CPU validation — it must never
# land on (and block) the real chip
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

from ndr_tpu.utils.jax_setup import setup  # noqa: E402
setup()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from ndr_tpu.io.problem import load_problem  # noqa: E402
from ndr_tpu.training.classic import ground_truth_topopt  # noqa: E402


def run(cfg, dims, steps, mgl, shards):
    t0 = time.perf_counter()
    res = ground_truth_topopt(
        cfg, dims=dims, max_iter=steps, multigrid_levels=mgl, tol=1e-4,
        shards=shards, log=lambda s: None)
    dt = time.perf_counter() - t0
    traj = [float(c) for c in res.history]
    name = "x".join(map(str, shards)) if isinstance(shards, tuple) else str(shards)
    print(f"shards={name:5s} {dt:7.1f}s  traj=" +
          " ".join(f"{c:.6f}" for c in traj), flush=True)
    return np.asarray(traj)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dims", default="64,32,32")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--mgl", type=int, default=3)
    args = p.parse_args()

    dims = tuple(int(d) for d in args.dims.split(","))
    n_dev = len(jax.devices())
    assert n_dev >= 8, f"need 8 virtual devices, got {n_dev}"
    print(f"devices: {n_dev} x {jax.devices()[0].platform}", flush=True)

    cfg = load_problem("problems/3d/cantilever_flexion.json")

    t_ref = run(cfg, dims, args.steps, args.mgl, shards=0)     # unsharded oracle
    t_1d = run(cfg, dims, args.steps, args.mgl, shards=8)      # 1-D slab
    t_2d = run(cfg, dims, args.steps, args.mgl, shards=(4, 2)) # 2-D pencil

    # Decompositions change only the reduction/exchange order; the
    # trajectories must agree to fp32 solve noise at every step.
    err_1d = float(np.max(np.abs(t_1d - t_ref) / np.abs(t_ref)))
    err_2d = float(np.max(np.abs(t_2d - t_ref) / np.abs(t_ref)))
    err_x = float(np.max(np.abs(t_2d - t_1d) / np.abs(t_1d)))
    print(f"max rel err: 1-D vs unsharded {err_1d:.2e}, "
          f"2-D vs unsharded {err_2d:.2e}, 2-D vs 1-D {err_x:.2e}",
          flush=True)
    tol = 5e-3
    assert err_1d < tol and err_2d < tol and err_x < tol, \
        (err_1d, err_2d, err_x)
    print("OK", flush=True)


if __name__ == "__main__":
    main()
