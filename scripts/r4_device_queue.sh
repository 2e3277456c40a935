#!/bin/bash
# Round-4 device-job queue v2: waits for the axon TPU tunnel to recover,
# then runs the remaining evidence runs back to back. The worker crashes
# and stays down for stretches (observed all evening 2026-08-19), so:
#   * each job re-waits for device health before starting,
#   * each job gets up to N attempts (a crash mid-run wastes only that
#     attempt),
#   * the neural A/B runs ONE VARIANT PER PROCESS (profile_neural.py
#     --skip-phases merges into a shared --out JSON), so a crash loses
#     at most one variant's work.
# Status lines land in /tmp/r4_queue.status.
set -u
cd "$(dirname "$0")/.."
STATUS=/tmp/r4_queue.status
note() { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }

probe() {
  timeout 90 python - <<'EOF' > /dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((512, 512))
assert float((x @ x).sum()) > 0
EOF
}

wait_up() {
  until probe; do
    note "tpu down"
    sleep 150
  done
  note "tpu UP"
}

# run_job NAME ATTEMPTS TIMEOUT_S CMD... — health-gate, run, retry.
run_job() {
  local name=$1 attempts=$2 tmo=$3 i rc
  shift 3
  for ((i = 1; i <= attempts; i++)); do
    wait_up
    note "job $name attempt $i start"
    timeout "$tmo" "$@"
    rc=$?
    note "job $name attempt $i rc=$rc"
    [ "$rc" -eq 0 ] && return 0
    sleep 60
  done
  note "job $name FAILED after $attempts attempts"
  return 1
}

note "queue v2 started"

# 1. Canary: known-good combo program, compile-cache hit expected.
run_job canary 2 1500 bash -c \
  'python scripts/profile_oc.py --variants lmax0_cheb1_lag8 \
     --scan 32 --warm 3 --out /tmp/canary2.json > /tmp/canary2.log 2>&1'

# 2. Neural 192-class full-step variants (VERDICT r3 item 3 A/B),
#    one process per variant, merged into one JSON.
: > logs/profile_neural_192_variants.log
for v in base mlpfast cheb1 mlpfast_cheb1; do
  run_job "neural_$v" 3 2700 bash -c \
    "python scripts/profile_neural.py --skip-phases --variants $v \
       --scan 20 --out logs/profile_neural_192_variants.json \
       >> logs/profile_neural_192_variants.log 2>&1"
done

# 3. MG accuracy envelope at the production TPU configuration
#    (fp32+refinement, Pallas on), reference's 100-field methodology.
run_job mg_envelope 3 3600 bash -c \
  'python scripts/mg_benchmark.py --fields 100 --refined --pallas on \
     > logs/mg_envelope_64x32x32_f100_tpu.json 2> /tmp/mgenv_tpu.err'

# 4. bench.py end to end (also primes every stage's compile cache for
#    the driver's round-end run). Early in the queue: the round's most
#    important artifact.
run_job bench 3 3300 bash -c \
  'NDR_BENCH_BUDGET=3000 python bench.py > /tmp/bench_r4_self.log 2>&1'

# 5. Production full run (2700 iters, scan=32, lag=8) -> c256_full_r4.log
run_job c256_full 3 3600 bash -c \
  'python -m ndr_tpu.training.train_voxelfem \
     --prob problems/3d/cantilever_flexion.json --grid "[256,128,128]" \
     --iter 2700 --mgl 5 --jid c3d_256_r4 --precond-lag 8 --scan 32 \
     --log-every 96 > logs/c256_full_r4.log 2>&1'

# 6. Neural sigma=1.0 accuracy validation at the fast config
#    (bf16 hidden matmuls + degree-1 Chebyshev) vs logs/ns192_s1.log
#    (8.4721 soft / 8.4663 binary at matmul=high, cheb=2).
run_job ns192_fast 2 5400 bash -c \
  'python -m ndr_tpu.training.train_xdg \
     --prob problems/3d/bridge.json --grid "[192,96,96]" --v0 0.4 \
     --mgl 3 --sigma 1.0 --iter 1500 --vcs constrained_sigmoid \
     --mlp-precision default --cheb-degree 1 --scan 20 \
     --jid ns192_s1_fast --log-every 100 > logs/ns192_s1_fast.log 2>&1'

note "queue v2 done"
