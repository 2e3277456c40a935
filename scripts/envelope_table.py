"""Format an mg_benchmark JSONL envelope into the README markdown table.

Usage: python scripts/envelope_table.py logs/mg_envelope_64x32x32_f100_cpu.json
(reference methodology: VoxelFEM/python/MGBenchmark.ipynb cells 8-14,
100 density fields per operating point)
"""

import json
import sys


def main():
    path = sys.argv[1]
    rows = [json.loads(l) for l in open(path) if l.strip().startswith("{")]
    rows = [r for r in rows if "Emin" in r]  # skip the trailing summary
    print("| Emin | cg tol | warm start | mean ‖u-u*‖/‖u*‖ | mean |c-c*|/c* | mean CG iters |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['Emin']:g} | {r['tol']:g} | {'yes' if r['warm'] else 'no'} "
              f"| {r['u_err_mean']:.2e} | {r['c_err_mean']:.2e} "
              f"| {r['cg_iters_mean']:.2f} |")


if __name__ == "__main__":
    main()
