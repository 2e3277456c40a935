"""Bisect the 256-class TPU-worker crash (round 5, VERDICT r4 next-3).

Observed 2026-08-20: per-step OC at 256x128x128 runs clean, but the
scan-of-32 lag8 program (~9 s in ONE device dispatch) kills the axon TPU
worker (`UNAVAILABLE: TPU worker process crashed`) deterministically —
3/3 fresh backends — while the 192-class scan-of-20 (~5 s/dispatch),
neural scan-of-60 (~3 s) and 2D scan-of-50 (~1.5 s) all pass. The same
scan-of-32 program ran at 280 ms/step in round 4
(logs/profile_oc_256_combo.json), so the program itself is proven-good:
the suspect is a service-side execution-length watchdog.

This script times the SAME lag8 OC program with a host loop over
scan-of-`block` dispatches (block*~0.28 s per dispatch) to find the
largest block that survives, i.e. per-dispatch wall ceiling.

Usage: python scripts/crash_bisect_256.py --blocks 8,16,32
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

from ndr_tpu.utils.jax_setup import setup
setup()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--blocks", default="8")
    p.add_argument("--lag", type=int, default=8)
    p.add_argument("--dims", default="256,128,128")
    p.add_argument("--mgl", type=int, default=5)
    args = p.parse_args()

    import bench

    dims = tuple(int(d) for d in args.dims.split(","))
    for block in [int(b) for b in args.blocks.split(",")]:
        t0 = time.time()
        try:
            s, c = bench._classic_bench(
                "problems/3d/cantilever_flexion.json", dims, args.mgl,
                warm=2, n=block, settings_kw=bench.BEST_256_SETTINGS,
                precond_lag=min(args.lag, block))
            print(f"BLOCK {block}: OK {s*1e3:.1f} ms/step "
                  f"(compliance {c:.2f}, wall {time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"BLOCK {block}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            raise SystemExit(1)


if __name__ == "__main__":
    main()
