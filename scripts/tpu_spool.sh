#!/bin/bash
# Round-5 spool-based TPU job runner.
#
# Jobs are bash scripts at outputs/spool/NNN_name.job, executed lowest
# number first, one at a time (the tunneled chip is single-tenant). A
# sibling NNN_name.tmo file holds the per-job timeout in seconds
# (default 3600). Finished jobs are renamed to .done (rc recorded in
# spool.log); new jobs can be injected at any time while the runner
# lives. `touch outputs/spool/STOP` shuts the runner down after the
# current job.
#
# Replaces the fixed tpu_queue_r5*.sh chains: round-5 needs jobs
# injected mid-round (bench re-measures after config changes land)
# without restarting a serial queue.
cd /root/repo || exit 1
mkdir -p outputs/spool outputs/tpu_queue
LOG=outputs/tpu_queue/spool.log
export JAX_COMPILATION_CACHE_DIR=/root/repo/outputs/xla_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
assert jax.devices()[0].platform == "tpu"
x = jnp.ones((512, 512), jnp.bfloat16)
(x @ x).sum().block_until_ready()
EOF
}

echo "$(date -u +%F' '%T) spool runner start (pid $$)" >> "$LOG"
until probe; do
  echo "$(date -u +%F' '%T) tpu probe failed; retry in 60s" >> "$LOG"
  sleep 60
done
echo "$(date -u +%F' '%T) TPU UP" >> "$LOG"

while :; do
  if [ -e outputs/spool/STOP ]; then
    echo "$(date -u +%F' '%T) STOP sentinel seen; exiting" >> "$LOG"
    exit 0
  fi
  job=$(ls outputs/spool/*.job 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then
    sleep 20
    continue
  fi
  name=$(basename "$job" .job)
  tmo=3600
  [ -f "outputs/spool/$name.tmo" ] && tmo=$(cat "outputs/spool/$name.tmo")
  echo "$(date -u +%F' '%T) START $name (tmo=${tmo}s)" >> "$LOG"
  t0=$SECONDS
  timeout "$tmo" bash "$job" > "outputs/tpu_queue/$name.log" 2>&1
  rc=$?
  echo "$(date -u +%F' '%T) END $name rc=$rc wall=$((SECONDS - t0))s" >> "$LOG"
  mv "$job" "outputs/spool/$name.done"
done
