"""Canary for the scan(oc_step(precond=leaves)) TPU-worker fault
(ROUND5.md §3, 2026-08-21): runs the lagged-preconditioner program at a
TINY grid so the whole probe costs ~2-4 min cold / seconds warm.

Exit 0  -> the service executes the precond-scan structure again
           (re-enable NDR_BENCH_LAG=8 / --precond-lag for the 10x path)
Exit 1  -> fault still present (keep the non-lag fallbacks)

Usage: python scripts/precond_scan_canary.py [--dims 64,32,32 --mgl 2]
"""

import argparse
import sys

sys.path.insert(0, ".")

from ndr_tpu.utils.jax_setup import setup
setup()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dims", default="64,32,32")
    p.add_argument("--mgl", type=int, default=2)
    p.add_argument("--lag", type=int, default=4)
    args = p.parse_args()
    dims = tuple(int(d) for d in args.dims.split(","))

    import bench
    try:
        s, c = bench._classic_bench(
            "problems/3d/cantilever_flexion.json", dims, args.mgl,
            warm=1, n=args.lag, settings_kw=bench.BEST_256_SETTINGS,
            precond_lag=args.lag)
        print(f"CANARY OK {s*1e3:.1f} ms/step (c={c:.2f}) — "
              "precond-scan structure executes", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"CANARY FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
