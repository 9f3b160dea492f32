#!/bin/bash
# Round-3 session-5 TPU queue (fresh VM: prior sentinels/state lost).
# Priorities for a ~1h session:
#   1. bench the two kernel laggards (validates the DimeNet++ triplet fusion
#      and EqV2 K-compaction landed >=1x)
#   2. EquiformerV2 accuracy row (the only missing zoo row) — bounded epochs
#   3. DimeNet++ accuracy RERUN (on-disk number is a pre-fix divergence)
#   4. PhiSNet precision run (partial --out every chunk; any time left is value)
cd /root/repo
mkdir -p outputs/tpu_queue
LOG=outputs/tpu_queue
probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
assert jax.devices()[0].platform == "tpu"
(x @ x).sum().block_until_ready()
EOF
}

echo "$(date -u +%T) s5 queue: probing TPU..." >> $LOG/queue.log
until probe; do
  echo "$(date -u +%T) tpu probe failed; retry in 60s" >> $LOG/queue.log
  sleep 60
done
echo "$(date -u +%T) TPU UP — starting s5 queue" >> $LOG/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -e "$LOG/$name.done" ] && { echo "skip $name (done)" >> $LOG/queue.log; return; }
  echo "$(date -u +%T) START $name" >> $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%T) END $name rc=$rc" >> $LOG/queue.log
  [ $rc -eq 0 ] && touch "$LOG/$name.done"
}

run bench_dimenetpp 1500 python bench.py --model dimenetpp
run bench_eqv2      2100 python bench.py --model equiformer_v2

run acc_eqv2 4200 python examples/train_accuracy.py --model equiformer_v2 \
    --max-epochs 150 --out results/acc_equiformer_v2.json

run acc_dimenetpp 3600 python examples/train_accuracy.py --model dimenetpp \
    --max-epochs 1200 --out results/acc_dimenetpp.json

run phisnet_precision 20000 python examples/hamiltonian_precision.py --model phisnet \
    --state outputs/hp_phisnet_state.msgpack --out results/acc_phisnet.json \
    --target 1e-4 --max-steps 40000

echo "$(date -u +%T) S5 QUEUE COMPLETE" >> $LOG/queue.log
touch $LOG/S5_DONE
