#!/bin/bash
# Round-4 queue v3 (fresh-VM session 2026-08-20): /tmp was wiped, so the
# v2 queue's results are gone and the persistent compile cache is cold.
# bench.py is already running in the foreground session (priming the TPU
# cache + producing the self-run artifact); this queue WAITS for it,
# then runs the remaining evidence jobs in rank order:
#   1. MG accuracy envelope on the production TPU config (VERDICT item 4)
#   2. neural 192-class full-step variant A/B (VERDICT item 3)
#   3. production 256-class full run, scan-chunked (north-star closure)
# Each job health-gates on the axon tunnel and retries once.
set -u
cd "$(dirname "$0")/.."
STATUS=/tmp/r4_jobs.status
source scripts/queue_lib.sh

# Gate on bench.py (avoid two processes contending for the one chip).
until grep -q "bench rc=0" "$STATUS" 2>/dev/null; do sleep 30; done
note "bench done; queue v3 starting"

# 1. MG envelope at the production TPU configuration.
run_job mg_envelope 2 2700 bash -c \
  'python scripts/mg_benchmark.py --fields 100 --refined --pallas on \
     > logs/mg_envelope_64x32x32_f100_tpu.json 2> /tmp/mgenv_tpu.err'

# 2. Neural 192-class variants, one process per variant (a crash loses
#    at most one variant; --out JSON merges).
: > logs/profile_neural_192_variants.log
for v in base mlpfast cheb1 mlpfast_cheb1; do
  run_job "neural_$v" 2 2400 bash -c \
    "python scripts/profile_neural.py --skip-phases --variants $v \
       --scan 20 --out logs/profile_neural_192_variants.json \
       >> logs/profile_neural_192_variants.log 2>&1"
done

# 3. Production full run (2700 iters, scan-chunked, lag8) — full-run
#    wall-clock confirmation of the 280 ms/step combo number.
run_job c256_full 2 3600 bash -c \
  'python -m ndr_tpu.training.train_voxelfem \
     --prob problems/3d/cantilever_flexion.json --grid "[256,128,128]" \
     --iter 2700 --mgl 5 --jid c3d_256_r4 --precond-lag 8 --scan 32 \
     --log-every 96 > logs/c256_full_r4.log 2>&1'

note "queue3 rc=0"
