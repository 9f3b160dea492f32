#!/bin/bash
# Round-4 TPU queue, part H (chained after r4g):
#   1. Wait for the r4g qhnet chunk to finish (timeout 6000s from 15:19).
#   2. DimeNet++ config-matrix sweep (layout/remat/surrogate/batch) — the
#      r4g ablation localized the cost to the force second-order backward;
#      this picks the winning train-step config for the bench row.
#   3. QHNet precision RESUME chunk (state from the r4g run) toward the
#      1e-4 target with the cosine terminal decay.
cd /root/repo
LOG=outputs/tpu_queue
mkdir -p $LOG

# wait for r4g's qhnet job (the queue touches R4G_ALL_DONE as its last act;
# the pid file is the stale setsid wrapper, not the live queue bash)
while [ ! -e "$LOG/R4G_ALL_DONE" ]; do
  sleep 30
done

probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
assert jax.devices()[0].platform == "tpu"
(x @ x).sum().block_until_ready()
EOF
}
until probe; do
  echo "$(date -u +%T) r4h: tpu probe failed; retry in 60s" >> $LOG/queue.log
  sleep 60
done
echo "$(date -u +%T) r4h queue start" >> $LOG/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -e "$LOG/$name.done" ] && { echo "skip $name (done)" >> $LOG/queue.log; return; }
  echo "$(date -u +%T) START $name" >> $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%T) END $name rc=$rc" >> $LOG/queue.log
  [ $rc -eq 0 ] && touch "$LOG/$name.done"
}

run sweep_dimenetpp 2700 python examples/sweep_dimenetpp.py

# perf-frontier profiles (eSCN 1.14x, EqV2 1.04x): where does the step go?
run profile_escn_r4h 1500 python examples/profile_step.py --model escn
run profile_eqv2_r4h 1800 python examples/profile_step.py --model equiformer_v2

run qhnet_precision_r4h 6000 python examples/hamiltonian_precision.py \
    --model qhnet --state outputs/hp_qhnet_state.msgpack \
    --out results/acc_qhnet_r4.json --schedule cosine --max-steps 20000 \
    --target 1e-4

touch $LOG/R4H_ALL_DONE
echo "$(date -u +%T) R4H QUEUE COMPLETE" >> $LOG/queue.log
