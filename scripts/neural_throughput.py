"""Sustained neural-TO throughput / CG-growth measurement.

Runs the neural trainer at 64x32x16 (the reference ff/test.log
like-for-like config) for N steps per MG configuration, reporting
cg_iters and it/s every 20 steps — the evidence behind the README's
sustained-throughput rows (the reference logs 1.11 it/s on a 128-core
CPU node).

Usage: python scripts/neural_throughput.py [N] [config1,config2,...]
"""
import sys
import time

sys.path.insert(0, ".")

import dataclasses

from ndr_tpu.utils.jax_setup import setup
setup()

import jax

from ndr_tpu.io.problem import load_problem
from ndr_tpu.training.neural import NeuralTOConfig, build_trainer

N = int(sys.argv[1]) if len(sys.argv) > 1 else 300

CONFIGS = {
    "cheb2_mgl2": dict(smoother="chebyshev", cheb_degree=2, multigrid_levels=2),
    "cheb2_mgl3": dict(smoother="chebyshev", cheb_degree=2, multigrid_levels=3),
    "cheb4_mgl3": dict(smoother="chebyshev", cheb_degree=4, multigrid_levels=3),
    "gs_mgl3": dict(smoother="gs", multigrid_levels=3),
    "gs_mgl2": dict(smoother="gs", multigrid_levels=2),
}

names = sys.argv[2].split(",") if len(sys.argv) > 2 else list(CONFIGS)

cfg = load_problem("problems/3d/bridge.json")
cfg = dataclasses.replace(cfg, max_volume=0.4)

for name in names:
    kw = CONFIGS[name]
    ncfg = NeuralTOConfig(
        embedding_size=1024, n_neurons=512, n_layers=4,
        volume_constraint_satisfier="maxed_barrier", seed=cfg.seed, **kw,
    )
    state, train_step, aux = build_trainer(cfg, ncfg, dims=(64, 32, 16))
    state, m = train_step(state)
    jax.block_until_ready(state.u)
    t0 = time.perf_counter()
    tlast, sum_cg, cnt = t0, 0, 0
    for i in range(1, N):
        state, m = train_step(state)
        sum_cg += int(m["cg_iters"])
        cnt += 1
        if i % 20 == 0:
            jax.block_until_ready(state.u)
            t = time.perf_counter()
            print(f"[{name}] step {i:4d}: c={float(m['compliance']):9.3f} "
                  f"cg_iters(avg last {cnt})={sum_cg/cnt:6.1f} "
                  f"it/s={cnt/(t-tlast):5.2f}", flush=True)
            tlast, sum_cg, cnt = t, 0, 0
    t1 = time.perf_counter()
    print(f"[{name}] TOTAL {N-1} steps in {t1-t0:.1f}s = "
          f"{(N-1)/(t1-t0):.2f} it/s steady incl. all", flush=True)
