"""CLI: evaluate a trained Fourier-feature model at a test resolution.

(reference: eval/eval_fourfeat.py)

Example:
    python -m ndr_tpu.eval.eval_fourfeat --prob problems/3d/bridge.json \
        --checkpoint logs/ff/run.npz --grid "[128, 64, 32]"
"""

from __future__ import annotations

import argparse
import ast
import json
import sys

import numpy as np

from ndr_tpu import models
from ndr_tpu.eval.evaluate import evaluate_model_at_resolution
from ndr_tpu.io import export
from ndr_tpu.io.problem import load_problem
from ndr_tpu.utils import checkpoint as ckpt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--prob", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--grid", required=True, help="test resolution")
    p.add_argument("--es", default=1024, type=int)
    p.add_argument("--nn", default=512, type=int)
    p.add_argument("--nl", default=4, type=int)
    p.add_argument("--vcs", default="constrained_sigmoid")
    p.add_argument("--mgl", default=1, type=int)
    p.add_argument("--tol", default=1e-7, type=float)
    p.add_argument("--out", default=None, help="optional .vtr/.npy output prefix")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    from ndr_tpu.utils.jax_setup import setup
    setup()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = load_problem(args.prob)
    test_dims = tuple(ast.literal_eval(args.grid))
    ndim = len(test_dims)

    from ndr_tpu.ops import volume as vol
    mlp_cfg = models.MLPConfig(
        in_features=ndim, out_features=1, n_neurons=args.nn, n_layers=args.nl,
        embedding_size=args.es, scale=1.0,
        output_activation=None if vol.is_hard_mode(args.vcs) else "sigmoid",
    )
    import jax.numpy as jnp
    params_t, buffers_t = models.init_mlp(jax.random.PRNGKey(0), mlp_cfg)
    params, buffers, scale, step, _ = ckpt.load_checkpoint(
        args.checkpoint, params_t, buffers_t
    )
    sys.stderr.write(f"Loaded checkpoint (sigma={scale}, step={step})\n")

    result = evaluate_model_at_resolution(
        cfg, params, buffers, mlp_cfg, test_dims,
        volume_constraint_satisfier=args.vcs,
        multigrid_levels=args.mgl, tol=args.tol, mg_iterations=2,
    )
    print(json.dumps({
        "test_resolution": list(test_dims),
        "compliance": result.compliance,
        "binary_compliance": result.binary_compliance,
        "binary_volume": result.binary_volume,
    }))
    if args.out:
        np.save(args.out + "_densities.npy", result.density)
        export.write_vtr(args.out, {"density": result.density})


if __name__ == "__main__":
    main()
