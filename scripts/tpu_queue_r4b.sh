#!/bin/bash
# Round-4 TPU queue, part B (reprioritized for the remaining round window).
# Waits for the part-A script to exit (its qhnet/optimize jobs were marked
# .done so it stops after phisnet_precision), then runs, in judge-impact
# order: PhiSNet precision resume (VERDICT #3) -> DimeNet++ fixture sanity
# at the OOM-fixed B=16 (VERDICT #2) -> full DimeNet++ accuracy ->
# externalized optimization benchmark (VERDICT #7) -> QHNet 1e-4 resume
# (VERDICT #5) if the window allows.
cd /root/repo
LOG=outputs/tpu_queue
mkdir -p $LOG

# wait for part A to finish (it touches R4_ALL_DONE on exit)
until [ -e $LOG/R4_ALL_DONE ]; do sleep 60; done

probe() {
  timeout 240 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
assert jax.devices()[0].platform == "tpu"
(x @ x).sum().block_until_ready()
EOF
}
until probe; do
  echo "$(date -u +%T) r4b: tpu probe failed; retry in 120s" >> $LOG/queue.log
  sleep 120
done
echo "$(date -u +%T) r4b queue start" >> $LOG/queue.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  [ -e "$LOG/$name.done" ] && { echo "skip $name (done)" >> $LOG/queue.log; return; }
  echo "$(date -u +%T) START $name" >> $LOG/queue.log
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  local rc=$?
  echo "$(date -u +%T) END $name rc=$rc" >> $LOG/queue.log
  [ $rc -eq 0 ] && touch "$LOG/$name.done"
}

# 1. PhiSNet precision resume: part A reached 1.48e-3 H-MAE at 1400 epochs
#    before its 5400 s cap; --state resumes the global step so the cosine
#    horizon continues. Target 1.9e-4 (published tiny H-MAE).
run phisnet_precision_b 3900 python examples/hamiltonian_precision.py --model phisnet \
    --state outputs/hp_phisnet_state.msgpack --out results/acc_phisnet.json \
    --schedule cosine --max-steps 12000 --target 1.9e-4

# 2. DimeNet++ fixture sanity at B=16 (the B=32 step needed 17.9 GB).
run acc_dimenetpp_sanity_b16 1500 python examples/train_accuracy.py --model dimenetpp \
    --max-epochs 150 --out /tmp/acc_dpp_sanity.json

# 3. Full DimeNet++ accuracy rerun (VERDICT #2 accuracy half).
run acc_dimenetpp_b16 4200 python examples/train_accuracy.py --model dimenetpp \
    --max-epochs 1500 --out results/acc_dimenetpp.json

# 4. Externalized optimization benchmark (VERDICT #7).
run optimize_benchmark 3900 python examples/optimize_benchmark.py \
    --out results/optimize_benchmark.json

# 5. QHNet to its 1e-4 target if the window allows (r3 datapoint 1.101e-4
#    already committed; this only supersedes it on improvement).
run qhnet_precision 5400 python examples/hamiltonian_precision.py --model qhnet \
    --state outputs/hp_qhnet_state.msgpack --out results/acc_qhnet_r4.json \
    --schedule cosine --max-steps 20000 --target 1e-4

echo "$(date -u +%T) R4B QUEUE COMPLETE" >> $LOG/queue.log
touch $LOG/R4B_ALL_DONE
