#!/bin/bash
# Round-4 queue v3b: runs after r4_queue3.sh drains. Lower-rank evidence:
#   1. prod_gs at the 256-class (VERDICT r3 weak-4: the Chebyshev-vs-GS
#      production-scale smoother cost comparison; previous attempt hit a
#      TPU worker fault)
#   2. neural sigma=1.0 full accuracy validation at the fast config
#      (bf16 hidden matmuls + degree-1 Chebyshev) vs logs/ns192_s1.log
#      (8.4721 soft / 8.4663 binary) — the gate for flipping the neural
#      defaults.
set -u
cd "$(dirname "$0")/.."
STATUS=/tmp/r4_jobs.status
source scripts/queue_lib.sh

until grep -q "queue3 rc=0" "$STATUS" 2>/dev/null; do sleep 30; done
note "queue v3b starting"

run_job prod_gs 2 2400 bash -c \
  'python scripts/profile_oc.py --variants prod_gs --scan 16 --warm 3 \
     --out logs/profile_oc_256_gs.json > logs/profile_oc_256_gs.log 2>&1'

run_job ns192_fast 1 5400 bash -c \
  'python -m ndr_tpu.training.train_xdg \
     --prob problems/3d/bridge.json --grid "[192,96,96]" --v0 0.4 \
     --mgl 3 --sigma 1.0 --iter 1500 --vcs constrained_sigmoid \
     --mlp-precision default --cheb-degree 1 --scan 20 \
     --jid ns192_s1_fast --log-every 100 > logs/ns192_s1_fast.log 2>&1'

note "queue3b rc=0"
