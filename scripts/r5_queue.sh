#!/bin/bash
# Round-5 evidence queue (fallback driver: the builder session normally
# runs these jobs one at a time in the foreground; launching this script
# replays the same order unattended). Rank order = VERDICT r4:
#   1. neural 192-class full-step variant A/B with the round-5 levers
#      (precond_lag / cheb1 / bf16 MLP)            -> profile_neural_192_variants.json
#   2. production 256-class full run (2700 it, lag8, scan)  -> c256_full_r5.log
#   3. MG accuracy envelope, 100 fields, production TPU cfg -> mg_envelope_64x32x32_f100_tpu.json
#   4. neural sigma=1.0 full accuracy validation at the fast config
#      vs logs/ns192_s1.log (8.4721 soft / 8.4663 binary)   -> ns192_s1_fast.log
#   5. prod_gs 256-class smoother A/B                        -> profile_oc_256_gs.json
set -u
cd "$(dirname "$0")/.."
STATUS=/tmp/r5_jobs.status
source scripts/queue_lib.sh

# Gate on the foreground bench (one chip; no contention). The bench
# wrapper appends "bench rc=N" to $STATUS when it exits (success-only
# release per queue_lib.sh convention).
until grep -q "bench rc=0" "$STATUS" 2>/dev/null; do sleep 30; done
note "r5 queue starting"

: > logs/profile_neural_192_variants.log
# lag variants (cheb1_lag8, combo) excluded while the precond-scan
# service fault is live (ROUND5.md #3) — re-add once
# scripts/precond_scan_canary.py --dims 192,96,96 --mgl 3 passes
for v in base mlpfast cheb1 mlpfast_cheb1; do
  run_job "neural_$v" 2 2400 bash -c \
    "python scripts/profile_neural.py --skip-phases --variants $v \
       --scan 20 --out logs/profile_neural_192_variants.json \
       >> logs/profile_neural_192_variants.log 2>&1"
done

# --precond-lag 8 dropped while the ROUND5.md #3 fault is live (any
# scan(oc_step(precond=leaves)) program kills the TPU worker)
run_job c256_full 2 7200 bash -c \
  'python -m ndr_tpu.training.train_voxelfem \
     --prob problems/3d/cantilever_flexion.json --grid "[256,128,128]" \
     --iter 2700 --mgl 5 --jid c3d_256_r5 --scan 32 \
     --log-every 96 > logs/c256_full_r5.log 2>&1'

run_job mg_envelope 2 2700 bash -c \
  'python scripts/mg_benchmark.py --fields 100 --refined --pallas on \
     > logs/mg_envelope_64x32x32_f100_tpu.json 2> /tmp/mgenv_tpu.err'

run_job ns192_fast 1 5400 bash -c \
  'python -m ndr_tpu.training.train_xdg \
     --prob problems/3d/bridge.json --grid "[192,96,96]" --v0 0.4 \
     --mgl 3 --sigma 1.0 --iter 1500 --vcs constrained_sigmoid \
     --mlp-precision default --cheb-degree 1 --scan 24 \
     --jid ns192_s1_fast --log-every 100 > logs/ns192_s1_fast.log 2>&1'

run_job prod_gs 2 2400 bash -c \
  'python scripts/profile_oc.py --variants prod_gs --scan 16 --warm 3 \
     --out logs/profile_oc_256_gs.json > logs/profile_oc_256_gs.log 2>&1'

note "r5_queue rc=0"
