#!/bin/bash
# Round-4 TPU queue, part C (final window). Judge-impact order:
#   1. DimeNet++ fixture sanity at the OOM-fixed B=16 (VERDICT #2) — short;
#      confirms the B=16 step fits HBM and the loss is descending.
#   2. Full DimeNet++ accuracy rerun (VERDICT #2 accuracy half).
#   3. PhiSNet precision resume from outputs/hp_phisnet_state.msgpack —
#      part B reached 1.03e-3 at 1600 epochs; target 1.9e-4 (published tiny).
#   4. Externalized optimization benchmark (VERDICT #7).
#   5. DimeNet++ microbench (reorder decision data for the next kernel pass).
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
  echo "$(date -u +%T) r4c: tpu probe failed; retry in 60s" >> $LOG/queue.log
  sleep 60
done
echo "$(date -u +%T) r4c queue start" >> $LOG/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -e "$LOG/$name.done" ] && { echo "skip $name (done)" >> $LOG/queue.log; return; }
  echo "$(date -u +%T) START $name" >> $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%T) END $name rc=$rc" >> $LOG/queue.log
  [ $rc -eq 0 ] && touch "$LOG/$name.done"
}

run acc_dimenetpp_sanity_b16 1800 python examples/train_accuracy.py --model dimenetpp \
    --max-epochs 150 --out /tmp/acc_dpp_sanity.json

run acc_dimenetpp_b16 3900 python examples/train_accuracy.py --model dimenetpp \
    --max-epochs 1200 --out results/acc_dimenetpp.json

run phisnet_precision_c 3600 python examples/hamiltonian_precision.py --model phisnet \
    --state outputs/hp_phisnet_state.msgpack --out results/acc_phisnet.json \
    --schedule cosine --max-steps 12000 --target 1.9e-4

run optimize_benchmark_c 3600 python examples/optimize_benchmark.py \
    --out results/optimize_benchmark.json

run microbench_dimenetpp 900 python examples/microbench_dimenetpp.py

echo "$(date -u +%T) R4C QUEUE COMPLETE" >> $LOG/queue.log
touch $LOG/R4C_ALL_DONE
