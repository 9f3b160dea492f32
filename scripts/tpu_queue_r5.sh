#!/bin/bash
# Round-5 TPU queue, session 1. Priorities (VERDICT r4):
#   1. roofline.json for the whole zoo (#4) — also pre-warms the bench
#      rows' XLA compile cache (same trainer+shapes as bench.py)
#   2. DimeNet++ config sweep toward >=1x anchor (#2)
# Later sessions append: eSCN accuracy retrain, QHNet precision resume,
# optimize-benchmark rerun, final bench cache warm.
cd /root/repo
mkdir -p outputs/tpu_queue
LOG=outputs/tpu_queue
export JAX_COMPILATION_CACHE_DIR=/root/repo/outputs/xla_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=2

probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
assert jax.devices()[0].platform == "tpu"
(x @ x).sum().block_until_ready()
EOF
}

echo "$(date -u +%T) r5 queue: probing TPU..." >> $LOG/queue.log
until probe; do
  echo "$(date -u +%T) tpu probe failed; retry in 60s" >> $LOG/queue.log
  sleep 60
done
echo "$(date -u +%T) TPU UP — starting r5 queue" >> $LOG/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -e "$LOG/$name.done" ] && { echo "skip $name (done)" >> $LOG/queue.log; return; }
  echo "$(date -u +%T) START $name" >> $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%T) END $name rc=$rc" >> $LOG/queue.log
  [ $rc -eq 0 ] && touch "$LOG/$name.done"
}

run roofline 5400 python examples/roofline_report.py --all --out results/roofline.json

run sweep_dimenetpp 3600 python examples/sweep_dimenetpp.py

echo "$(date -u +%T) R5 S1 QUEUE COMPLETE" >> $LOG/queue.log
touch $LOG/R5S1_DONE
