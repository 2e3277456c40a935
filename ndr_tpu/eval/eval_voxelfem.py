"""CLI: re-evaluate saved density fields (optionally upsampled).

(reference: eval/eval_voxelfem.py)

Example:
    python -m ndr_tpu.eval.eval_voxelfem --prob problems/2d/mbb_beam.json \
        --densities logs/gt/run_densities.npy --upsample "[600, 200]"
"""

from __future__ import annotations

import argparse
import ast
import json

import numpy as np

from ndr_tpu.eval.evaluate import evaluate_density, upsample_density
from ndr_tpu.io.problem import load_problem


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--prob", required=True)
    p.add_argument("--densities", required=True, help=".npy density file")
    p.add_argument("--upsample", default=None, help="optional new grid dims")
    p.add_argument("--mgl", default=1, type=int)
    p.add_argument("--tol", default=1e-7, type=float)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax
    from ndr_tpu.utils.jax_setup import setup
    setup()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    cfg = load_problem(args.prob)
    density = np.load(args.densities)
    if args.upsample:
        new_dims = tuple(ast.literal_eval(args.upsample))
        density = np.asarray(upsample_density(jnp.asarray(density), new_dims))

    result = evaluate_density(cfg, density, multigrid_levels=args.mgl, tol=args.tol)
    print(json.dumps({
        "resolution": list(density.shape),
        "compliance": result.compliance,
        "binary_compliance": result.binary_compliance,
        "binary_volume": result.binary_volume,
    }))


if __name__ == "__main__":
    main()
