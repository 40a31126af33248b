# Shared helpers for the round-4 chip scripts (sourced, not executed).
#
# run_tpu: run a TPU-client python command with its PID recorded to
# /tmp/r4_tpu_job.pid so the stall killer (r4_stall_killer.sh) can kill a
# silently-wedged client BY PID (never by pattern match). Exit status is the
# child's.
run_tpu () {
  "$@" &
  local pid=$!
  echo "$pid" > /tmp/r4_tpu_job.pid
  wait "$pid"
  local rc=$?
  rm -f /tmp/r4_tpu_job.pid
  return $rc
}

# probe with retries: a wedged probe re-arms the far-end session hold
# (verify-skill runbook: budget a FULL 11 min after any killed client
# before the next contact, and make that contact the probe itself).
probe () {
  for attempt in 1 2 3 4 5; do
    echo "=== probe (attempt $attempt, $(date +%H:%M:%S)) ==="
    if timeout 280 python -c "import jax,numpy as np,jax.numpy as jnp; print(np.asarray(jax.jit(lambda a:(a@a).sum())(jnp.ones((256,256)))))"; then
      return 0
    fi
    echo "probe wedged; holding 680 s before the next attempt"
    sleep 680
  done
  echo "chip unreachable after 5 probe attempts"; return 1
}
