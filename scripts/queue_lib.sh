#!/bin/bash
# Shared helpers for the device evidence queues (ADVICE r4: probe/
# wait_up/run_job/note were copy-pasted across three queue scripts with
# drifts, which is how a gate-token mismatch slipped in — this is the
# single source now; `source scripts/queue_lib.sh` after setting STATUS).
#
# Gate convention: every queue script writes `note "<name> rc=$rc"` when
# it finishes, and downstream queues gate on `grep -q "<name> rc=0"` —
# an exact-token, success-only handshake (ADVICE r4: grepping for any
# `rc=` released queues behind failed runs).

# The evidence jobs must run on the real chip: an inherited
# JAX_PLATFORMS=cpu / XLA_FLAGS host-device-count (set by dryrun or test
# shells) would silently produce CPU timings labelled as TPU (ADVICE r4).
unset JAX_PLATFORMS
unset XLA_FLAGS

note() { echo "$(date +%H:%M:%S) $*" >> "$STATUS"; }

# Health probe: pinned to the TPU backend — asserts the platform so a
# CPU fallback can never pass as "tpu UP".
probe() {
  timeout 120 python - <<'EOF' > /dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == "tpu", jax.devices()
x = jnp.ones((512, 512))
assert float((x @ x).sum()) > 0
EOF
}

wait_up() {
  until probe; do
    note "tpu down"
    sleep 120
  done
  note "tpu up"
}

# run_job <name> <attempts> <timeout_s> <cmd...>
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
    sleep 45
  done
  note "job $name FAILED after $attempts attempts"
  return 1
}
