#!/bin/bash
# Round-4 TPU queue, part G (rerun of part E with the crash-proofed incremental profiler):
#   1. DimeNet++ step ablation FIRST (perf work on the 0.775x row needs
#      this data early in the session).
#   2. QHNet precision resume with cosine terminal decay to 1e-4
#      (VERDICT #5) — restarted after the part-D preemption.
cd /root/repo
LOG=outputs/tpu_queue
mkdir -p $LOG

probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
assert jax.devices()[0].platform == "tpu"
(x @ x).sum().block_until_ready()
EOF
}
until probe; do
  echo "$(date -u +%T) r4g: tpu probe failed; retry in 60s" >> $LOG/queue.log
  sleep 60
done
echo "$(date -u +%T) r4g queue start" >> $LOG/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -e "$LOG/$name.done" ] && { echo "skip $name (done)" >> $LOG/queue.log; return; }
  echo "$(date -u +%T) START $name" >> $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%T) END $name rc=$rc" >> $LOG/queue.log
  [ $rc -eq 0 ] && touch "$LOG/$name.done"
}

run profile_dimenetpp_r4g 1500 python examples/profile_step.py --model dimenetpp

run qhnet_precision_r4g 6000 python examples/hamiltonian_precision.py \
    --model qhnet --state outputs/hp_qhnet_state.msgpack \
    --out results/acc_qhnet_r4.json --schedule cosine --max-steps 20000 \
    --target 1e-4

touch $LOG/R4G_ALL_DONE
echo "$(date -u +%T) R4E QUEUE COMPLETE" >> $LOG/queue.log
