#!/bin/bash
# Round-4 device-job queue: waits for the axon TPU tunnel to recover,
# then runs the remaining evidence runs back to back. The worker has
# been observed to crash and stay down for stretches (2026-08-19), so
# each job re-waits for device health before starting and a failing job
# does not stop the later ones. Status lines land in /tmp/r4_queue.status.
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

note "queue started"

# 1. Canary: known-good combo program, compile-cache hit expected.
wait_up
note "job1 canary start"
timeout 1500 python scripts/profile_oc.py --variants lmax0_cheb1_lag8 \
  --scan 32 --warm 3 --out /tmp/canary2.json > /tmp/canary2.log 2>&1
note "job1 canary rc=$?"

# 2. Neural 192-class full-step variants (VERDICT r3 item 3 A/B).
wait_up
note "job2 neural variants start"
timeout 3600 python scripts/profile_neural.py \
  --variants base,mlpfast,cheb1,mlpfast_cheb1 --scan 20 \
  --out logs/profile_neural_192_variants.json \
  > logs/profile_neural_192_variants.log 2>&1
note "job2 neural variants rc=$?"

# 3. MG accuracy envelope at the production TPU configuration
#    (fp32+refinement, Pallas on), reference's 100-field methodology.
wait_up
note "job3 mg envelope tpu start"
timeout 3600 python scripts/mg_benchmark.py --fields 100 --refined \
  --pallas on > logs/mg_envelope_64x32x32_f100_tpu.json 2> /tmp/mgenv_tpu.err
note "job3 mg envelope rc=$?"

# 4. Production full run (2700 iters, scan=32, lag=8) -> c256_full_r4.log
wait_up
note "job4 c256_full_r4 start"
timeout 3600 python -m ndr_tpu.training.train_voxelfem \
  --prob problems/3d/cantilever_flexion.json --grid "[256,128,128]" \
  --iter 2700 --mgl 5 --jid c3d_256_r4 --precond-lag 8 --scan 32 \
  --log-every 96 > logs/c256_full_r4.log 2>&1
note "job4 c256_full_r4 rc=$?"

# 5. Neural sigma=1.0 accuracy validation at the fast config
#    (bf16 hidden matmuls + degree-1 Chebyshev) vs logs/ns192_s1.log
#    (8.4721 soft / 8.4663 binary at matmul=high, cheb=2).
wait_up
note "job5 ns192 fast-config validation start"
timeout 5400 python -m ndr_tpu.training.train_xdg \
  --prob problems/3d/bridge.json --grid "[192,96,96]" --v0 0.4 --mgl 3 \
  --sigma 1.0 --iter 1500 --vcs constrained_sigmoid \
  --mlp-precision default --cheb-degree 1 --scan 20 \
  --jid ns192_s1_fast --log-every 100 > logs/ns192_s1_fast.log 2>&1
note "job5 ns192 fast rc=$?"

# 6. bench.py end to end (also primes every stage's compile cache for
#    the driver's round-end run).
wait_up
note "job6 bench start"
NDR_BENCH_BUDGET=3000 timeout 3300 python bench.py > /tmp/bench_r4_self.log 2>&1
note "job6 bench rc=$?"
note "queue done"
